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


# The round driver's CORRECTNESS gate samples the FIRST 50 entries of
# queries()/oracle_sql(). Since r5 the window is an EXPLICIT name list
# (_WINDOW below) applied as a reorder in load_all() — modules stay in
# their natural order and the rotation plan is computed from
# verification_ledger.json (entry -> rounds driver-green) instead of
# hand-shuffling _MODULES. History of the module-order rotations:
#   r1 window (verified): tpch, tpch_extra, functions_scalar2/3, joins,
#     aggregates[0:10].
#   r2 window (verified): dml(5) + aggregates_sketch(2) + llm core(29) +
#     windows(6) + setops(6) + sorts[0:2].
#   r3 window (verified 50/50): subqueries(7) + lateral(6)
#     + functions_scalar(8) + events_windows(9) + operators_misc(7)
#     + hiveql_dialect(8) + misc_extra(4) + llm_pipeline(1).
#   r4 window (this order): ALL 38 entries with no green driver row ever —
#     analytics_extra(3), sorts tail(5), llm_cleaning(6),
#     llm_embeddings(5), llm_lm(5), fn_xpath_family(1), aggregates
#     tail(4, split into aggregates_tail so the 8 r1-verified aggregates
#     stay out of the window), dml_sql(7 + the new multi-clause MERGE
#     entry), and similarity_topk_ivf (re-queued: its only driver row
#     ever is r2's `err: no_oracle`; the recall-invariant oracle landed
#     in r3) + similarity_topk_pq — padded to 50 with re-verifications
#     (sorts[0:2], functions_scalar3's four r1-green entries,
#     similarity bruteforce/lsh, dml head). After r4: 185/185 registry
#     entries driver-verified at least once.
# FREEZE RULE: new registry entries land either INSIDE the current
# window (if added this round) or below it — growth can't outrun driver
# verification.
_MODULES = [
    "analytics_extra",  # 3 unverified                          (cum  3)
    "sorts",            # 5 unverified + 2 reverify             (cum 10)
    "llm_cleaning",     # 6 unverified + new length_outliers    (cum 17)
    "llm_embeddings",   # 5 unverified                          (cum 22)
    "llm_lm",           # 5 unverified + new mixture/zipf       (cum 29)
    "functions_scalar3",  # 1 unverified (xpath) + 4 reverify   (cum 34)
    "aggregates_tail",  # 4 unverified                          (cum 38)
    "dml_sql",          # 7 unverified + new merge_multi_clause (cum 46)
    "llm_similarity",   # ivf(requeue) + pq + 2 reverify        (cum 50)
    # --- 50-entry r4 window ends exactly at similarity_topk_pq ---
    "dml",
    "subqueries",
    "lateral",
    "functions_scalar",
    "events_windows",
    "operators_misc",
    "hiveql_dialect",
    "misc_extra",
    "llm_pipeline",
    "aggregates",
    "aggregates_sketch",
    "llm_sampling",
    "llm_dedup",
    "llm_text",
    "llm_chunking",
    "llm_multimodal",
    "windows",
    "setops",
    "tpch",
    "tpch_extra",
    "functions_scalar2",
    "joins",
    "llm_extra",  # r4 late additions — below the window → r5 queue
    "statements_extra",  # r4 late additions — below the window → r5 queue
    "dialect_extra",  # r5 dialect surface — names pulled into _WINDOW
]
# R5 WINDOW: the 18 entries with no driver row after r4 (the r4 verdict
# queue) + 2 new r5 entries (rename-migration, late-binding view —
# registered inside the window per the FREEZE RULE) + 30 high-value
# re-verifications (tpch head+heavies, dml_sql/dml head, and the r4
# perf-wave entries whose physical plans changed). tests/test_ledger.py
# asserts the window is exactly 50, covers every never-green entry, and
# that verification_ledger.json matches the CORRECTNESS_r0*.json union.
_WINDOW = [
    # -- never driver-verified (r4 verdict queue, order = ledger gaps) --
    "hiveql_macro_expansion",
    "ddl_sql_describe_formatted",
    "ddl_sql_temp_function",
    "ddl_sql_schema_evolution",
    "ddl_sql_view_stack",
    "ddl_sql_analyze_columns",
    "similarity_topk_ivfpq",
    "clean_decontaminate_embeddings",
    "clean_normalize_unicode",
    "text_vocab_tokenize",
    "text_nb_lang_classifier",
    "pipeline_quality_classifier_bootstrap",
    "join_smb_bucketed",
    "window_time_range_frame",
    "multimodal_real_decode_ppm",
    "sample_group_split_leakage_free",
    "events_cohort_retention",
    "events_funnel_ordered_steps",
    # -- new in r5 (freeze rule: new entries land inside the window) --
    "ddl_sql_rename_metadata_migration",
    "ddl_sql_drop_recreate_latebind_view",
    "hiveql_greatest_least_null",
    "op_matchpath_sql_invocation",
    "window_unordered_ranking",
    # -- re-verifications: headline tpch + the heavies --
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "tpch_q13_customer_distribution",
    # -- re-verifications: DML surface --
    "dml_sql_insert_into_select",
    "dml_sql_merge_statement",
    "dml_sql_merge_multi_clause",
    "dml_merge_upsert",
    "dml_delete_where",
    # -- re-verifications: r4 perf-wave entries whose plans changed --
    "clean_decontaminate_bloom",
    "dedup_ngram_jaccard_pairs",
    "dedup_connected_clusters",
    "op_match_path_sessions",
    "dedup_minhash_near_duplicates",
    "similarity_topk_ivf",
    "similarity_topk_bruteforce",
    # -- re-verifications: headline operator spread --
    "events_session_window",
    "events_tumbling_window",
    "join_skew_salted",
    "chunk_documents_overlapping",
    "text_tfidf_keywords",
    "window_rank_top_parts",
    "agg_count_distinct",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every suite module (side effect: fills REGISTRY), then
    return the registry with the driver-verification window first: the
    driver samples the first 50 entries, so _WINDOW controls exactly
    which queries get a CORRECTNESS row this round."""
    for mod in _MODULES:
        importlib.import_module(f"hive_2_3_2_spark.suite.{mod}")
    missing = [n for n in _WINDOW if n not in REGISTRY]
    if missing:
        raise ValueError(f"_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _WINDOW}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
