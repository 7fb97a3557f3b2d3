"""Round-12 optimization profiler.

For each headline query: capture .explain("formatted") to plans/r12/, and
time it N ways — the bench's count() action and the guide §1.4 noop sink —
so we can see (a) where time goes and (b) whether count() under-measures
any query via column pruning.

Usage:
  python tools/profile_r12.py plans [names...]   # capture explain only
  python tools/profile_r12.py time  [names...]   # time count vs noop
  python tools/profile_r12.py both  [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
SUFFIX = os.environ.get("PROFILE_SUFFIX", "before")

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
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = sys.argv[2:] or HEADLINE

    from hive_2_3_2_spark.session import get_spark
    from hive_2_3_2_spark.suite import load_all

    registry = load_all()
    spark = get_spark(app_name="profile-r12")

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    # Warm-up, mirroring bench.py.
    registry[names[0]].fn(spark, SF_DIR).count()
    if "dedup_minhash_near_duplicates" in registry:
        registry["dedup_minhash_near_duplicates"].fn(spark, "/root/testdata/sf0.001").count()
    if "similarity_topk_ivf" in [n for n in names]:
        from hive_2_3_2_spark.suite.llm_similarity import ensure_ivf_index

        ensure_ivf_index(spark, SF_DIR)

    results = {}
    for name in names:
        fn = registry[name].fn
        if mode in ("plans", "both"):
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{SUFFIX}.txt"), "w") as f:
                f.write(plan)
        if mode in ("time", "both"):
            counts, noops = [], []
            for _ in range(N_RUNS):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}: count")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                counts.append(time.perf_counter() - t0)
            for _ in range(N_RUNS):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                noops.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            results[name] = {
                "count_median": round(statistics.median(counts), 3),
                "noop_median": round(statistics.median(noops), 3),
                "count_runs": [round(x, 3) for x in counts],
                "noop_runs": [round(x, 3) for x in noops],
            }
            print(
                f"{name}: count={results[name]['count_median']} noop={results[name]['noop_median']}",
                flush=True,
            )

    if results:
        import json

        out = os.path.join(plans_dir, f"timings_{SUFFIX}.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps({n: r["count_median"] for n, r in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
