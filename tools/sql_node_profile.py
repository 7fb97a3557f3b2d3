"""Per-operator metrics of one headline query via the SQL REST endpoint
(guide §7.1's SQL tab, headless): runs the query bench-style, then dumps
each plan node's name + key metrics for the LAST execution.

  PYTHONPATH=/root/repo python tools/sql_node_profile.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from hive_2_3_2_spark.session import get_spark
    from hive_2_3_2_spark.suite import load_all

    registry = load_all()
    spark = get_spark(app_name=f"sqlprof-{name}")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    registry[name].fn(spark, SF_DIR).count()  # warm-up
    if name == "similarity_topk_ivf":
        from hive_2_3_2_spark.suite.llm_similarity import ensure_ivf_index

        ensure_ivf_index(spark, SF_DIR)

    total = 0.0
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).count()
        total += time.perf_counter() - t0
    print(f"== {name}: {runs} run(s), avg {total / runs:.3f}s ==")

    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=200"
    ) as r:
        execs = json.load(r)
    # The last few executions belong to the final run (one per action/
    # subquery/broadcast). Print nodes of every execution from the final
    # run window (submissionTime of the last `count`).
    execs.sort(key=lambda e: e["id"])
    last = execs[-1]
    keep = [e for e in execs if e["id"] > last["id"] - 1 - 0]  # just last
    for e in execs[-3:]:
        print(f"-- execution {e['id']} status={e['status']} "
              f"duration={e.get('duration')}ms")
        for node in e.get("nodes", []):
            interesting = {
                m["name"]: m["value"]
                for m in node.get("metrics", [])
                if any(k in m["name"] for k in (
                    "time", "rows", "spill", "data size", "bytes"))
            }
            if not interesting:
                continue
            print(f"  [{node['nodeId']:>3}] {node['nodeName']}")
            for k, v in interesting.items():
                print(f"        {k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
