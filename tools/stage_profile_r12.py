"""Per-stage wall/task-time profile of one headline query via the Spark
status REST API (guide §7.1's stage view, headless). Runs the query once
(after bench-style warm-up), then dumps each stage's name, wall time,
task count, executorRunTime, shuffle bytes.

  PYTHONPATH=/root/repo python tools/stage_profile_r12.py <query> [runs]
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
    spark = get_spark(app_name=f"stageprof-{name}")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # Warm-up like bench.py.
    registry[name].fn(spark, SF_DIR).count()
    if name == "similarity_topk_ivf":
        from hive_2_3_2_spark.suite.llm_similarity import ensure_ivf_index

        ensure_ivf_index(spark, SF_DIR)

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    total = 0.0
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, SF_DIR).count()
        total += time.perf_counter() - t0
    print(f"== {name}: {runs} run(s), total {total:.3f}s ==")
    rows = []
    for s in stages():
        if s["stageId"] in seen or s["status"] == "SKIPPED":
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        wall = "?"
        if sub and comp:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            wall = (
                datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
            ).total_seconds()
        rows.append(
            (
                s["stageId"],
                wall,
                s["numCompleteTasks"],
                s["executorRunTime"] / 1000.0,
                s.get("executorDeserializeTime", 0) / 1000.0,
                s["shuffleReadBytes"],
                s["shuffleWriteBytes"],
                (s.get("description") or s["name"])[:90],
            )
        )
    rows.sort(key=lambda r: -(r[1] if isinstance(r[1], float) else 0))
    print(f"{'id':>4} {'wall_s':>7} {'tasks':>5} {'run_s':>8} {'deser_s':>7} {'shRead':>10} {'shWrite':>10}  name")
    for r in rows:
        w = f"{r[1]:.3f}" if isinstance(r[1], float) else r[1]
        print(f"{r[0]:>4} {w:>7} {r[2]:>5} {r[3]:>8.3f} {r[4]:>7.3f} {r[5]:>10} {r[6]:>10}  {r[7]}")
    spark.stop()


if __name__ == "__main__":
    main()
