"""LLM-data-pipeline operators (beyond reference parity; BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
columns — every operator designed for 100 TB corpora:

- all hot paths are JVM-side column expressions or Arrow-batched Pandas
  UDFs (never row-at-a-time Python);
- candidate generation is always *blocked* (LSH bands, length buckets,
  hash prefixes) so no O(n²) step ever materializes at corpus scale;
- similarity scoring broadcasts the small query side.
"""

from hive_2_3_2_spark.llm import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
