"""Structured-Streaming surface (SURVEY §2.10).

The reference's "streaming" is transactional ingest
(hcatalog/streaming/.../HiveEndPoint.java:62 TransactionBatch writers into
ACID deltas + compactor). Spark-first, ingest is Structured Streaming
append to partitioned parquet; on top we expose the event-time operators
the north star adds: watermarked tumbling/sliding/session windows and
streaming dedup.

Scale: state stores are keyed by (window, key) / ids within the
watermark horizon; watermarks bound state size — the knobs that matter at
production scale are the watermark delay and shuffle partitions (state
store count = shuffle partitions).
"""

from hive_2_3_2_spark.streaming.ingest import (
    sessionized_stream,
    stream_dedup,
    stream_ingest,
    stream_rollup_sink,
    stream_upsert_sink,
    windowed_counts,
)
from hive_2_3_2_spark.streaming.stateful import (
    running_totals,
    sessionize_stateful,
    stream_static_enrich,
    stream_stream_interval_join,
)

__all__ = [
    "running_totals",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "sessionize_stateful",
    "sessionized_stream",
    "stream_dedup",
    "stream_ingest",
    "stream_rollup_sink",
    "stream_upsert_sink",
    "windowed_counts",
]
