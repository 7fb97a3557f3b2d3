"""hive_2_3_2_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Hive 2.3.2 (reference fork:
zhangheihei/hive-2.3.2 at /root/reference, read-only).

Architecture (SURVEY.md §7): a thin, well-tested Python layer over the
PySpark DataFrame/SQL API. Catalyst + Tungsten provide the physical layer
(pushdown, pruning, join selection, codegen, AQE, spill) — the reference's
entire ql/exec + optimizer stack maps onto it (SURVEY.md §2/§4). The custom
code here is the Hive surface Spark lacks: function gaps, HiveQL shims,
MERGE emulation, plus LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal) designed for 100 TB scale.
"""

from hive_2_3_2_spark.catalog import load_table, register_star_schema
from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.session import get_spark

__all__ = ["Engine", "get_spark", "load_table", "register_star_schema"]

__version__ = "0.1.0"
