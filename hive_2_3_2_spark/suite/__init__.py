"""Query suite registry — the correctness matrix for SURVEY.md §2.

Every implemented operator/capability registers one or more named queries:
a PySpark DataFrame callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables. The driver hash-compares the two at sf0.01; this
mirrors the reference's golden-file `.q`/`.q.out` strategy
(reference: itests/util/.../QTestUtil.java:140) with a live oracle.

Conventions (driver contract):
- alias every computed column identically in Spark code and oracle SQL;
- ROUND floating aggregates (double summation order differs between
  engines — same trick as QTestUtil's DigestPrintStream);
- CAST integer aggregates in the oracle to BIGINT (DuckDB sum() returns
  INT128, which would mismatch Spark's bigint schema).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a suite query (+ optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate suite query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Module order drives REGISTRY insertion order, and the round driver's
# CORRECTNESS gate samples the FIRST 50 registry entries — so each round
# the not-yet-driver-verified families go first and the order ROTATES:
#   r1 window (verified): tpch, tpch_extra, functions_scalar2/3, joins,
#     aggregates[0:10].
#   r2 window (verified): dml(5) + aggregates_sketch(2) + llm core(29) +
#     windows(6) + setops(6) + sorts[0:2].
#   r3 window (this order, exactly 50 never-driver-verified entries):
#     subqueries(7) + lateral(6) + functions_scalar(8) + events_windows(9)
#     + operators_misc(7) + hiveql_dialect(8) + misc_extra(4)
#     + llm_pipeline(1).
#   r4 queue (the 37 still unverified after r3): analytics_extra(3),
#     sorts tail(5), llm_cleaning(6), llm_embeddings(5), llm_lm(5),
#     fn_xpath_family(1), aggregates tail(4), dml_sql(7, incl. the DDL
#     statement entries), similarity_topk_pq(1).
# FREEZE RULE: new registry entries land in modules BELOW the window
# marker so registry growth can't outrun driver verification again.
_MODULES = [
    "subqueries",
    "lateral",
    "functions_scalar",
    "events_windows",
    "operators_misc",
    "hiveql_dialect",
    "misc_extra",
    "llm_pipeline",
    # --- 50-entry r3 window ends here ---
    "analytics_extra",
    "sorts",
    "llm_cleaning",
    "llm_embeddings",
    "llm_lm",
    "functions_scalar3",
    "aggregates",
    "dml",
    "dml_sql",
    "aggregates_sketch",
    "llm_sampling",
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "llm_chunking",
    "llm_multimodal",
    "windows",
    "setops",
    "tpch",
    "tpch_extra",
    "functions_scalar2",
    "joins",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every suite module (side effect: fills REGISTRY)."""
    for mod in _MODULES:
        importlib.import_module(f"hive_2_3_2_spark.suite.{mod}")
    return REGISTRY
