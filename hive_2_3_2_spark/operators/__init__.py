"""DataFrame-level operator helpers mirroring SURVEY §2's inventory.

Most reference operators map 1:1 onto DataFrame methods (the suite/
modules demonstrate each); this package holds the helpers that need real
code: explicit join strategies (broadcast/salted-skew), Hive sort
semantics (ORDER/SORT/DISTRIBUTE/CLUSTER BY), top-k per group, MatchPath,
TRANSFORM, and grouping-set utilities.
"""

from hive_2_3_2_spark.operators.joins import (
    asof_join,
    broadcast_join,
    salted_skew_join,
)
from hive_2_3_2_spark.operators.ptf import match_path
from hive_2_3_2_spark.operators.rollup import (
    rollup_finalize,
    rollup_merge,
    rollup_partials,
    rollup_refresh,
    rollup_serve,
)
from hive_2_3_2_spark.operators.sorts import (
    cluster_by,
    distribute_by,
    hive_order_by,
    sort_by,
    top_k_per_group,
)
from hive_2_3_2_spark.operators.transform import transform_script

__all__ = [
    "asof_join",
    "broadcast_join",
    "cluster_by",
    "distribute_by",
    "hive_order_by",
    "match_path",
    "rollup_finalize",
    "rollup_merge",
    "rollup_partials",
    "rollup_refresh",
    "rollup_serve",
    "salted_skew_join",
    "sort_by",
    "top_k_per_group",
    "transform_script",
]
