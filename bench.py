"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Methodology: one warm-up run of the first query (JVM/codegen warm-up, file
listing), then each headline query timed end-to-end (plan + execute +
collect-to-count) SPARK_GRAFT_BENCH_RUNS times (default 5); the reported
per-query number is the MEDIAN of those runs and the total is the sum of
medians — single-shot timings on a shared machine drift ±20% on
sub-second queries (r3 verdict #5), medians kill the scheduler noise.
Queries are the suite's TPC-H-shaped set — the same scan/join/agg/window
shapes the reference's perf suite exercises
(reference: ql/src/test/queries/clientpositive/perf/).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

# Headline set: keep to the expensive, representative shapes.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "window_rank_top_parts",
    "agg_rollup_order_priority",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "dedup_minhash_near_duplicates",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "join_skew_salted",
    "events_session_window",
    "chunk_documents_overlapping",
    "text_tfidf_keywords",
    # r13 addition (additions-only keeps the round-over-round A/B valid):
    # the IVF ANN probe path timed ALONE — similarity_topk_ivf's runtime
    # is dominated by the exact brute-force reference its recall oracle
    # needs, so it never measured the ANN path itself.
    "similarity_probe_only",
]


def main() -> None:
    from hive_2_3_2_spark.session import get_spark
    from hive_2_3_2_spark.suite import load_all

    registry = load_all()
    spark = get_spark(app_name="hive232-bench")
    names = [n for n in HEADLINE if n in registry] or sorted(registry)[:5]

    # Warm-up (not timed): triggers codegen, parquet footer reads, JIT,
    # and Python/Arrow worker startup (via a pandas-UDF query at the
    # smallest SF — different data dir, so no cached results leak into
    # the timed runs).
    registry[names[0]].fn(spark, SF_DIR).count()
    if "dedup_minhash_near_duplicates" in registry:
        registry["dedup_minhash_near_duplicates"].fn(
            spark, "/root/testdata/sf0.001"
        ).count()
    if "similarity_topk_ivf" in registry:
        # One-time index build is a deployment step, not a query — build it
        # here so the timed entry measures the probe path (r2 verdict #2).
        from hive_2_3_2_spark.suite.llm_similarity import ensure_ivf_index

        ensure_ivf_index(spark, SF_DIR)

    timings: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(N_RUNS):
            # Drop Spark's persisted-plan cache so every run pays its own
            # persists (dedup's shingle frame would otherwise be warm from
            # run 1 on — CacheManager matches canonicalized plans) —
            # the median should remove SCHEDULER noise, not first-run cost.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry[name].fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)

    sf = 0.1
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": N_RUNS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
