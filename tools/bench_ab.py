"""Same-machine A/B bench attribution (r9 verdict item #9): run the
16-query headline bench from TWO (or more) git states, interleaved
A,B,A,B,..., on one quiet machine, and report per-query medians side
by side. Separates code effects from environment drift — a round-over-
round delta that reproduces across interleaved runs is code; one that
doesn't is machine state.

    python tools/bench_ab.py --refs <oldref> HEAD --runs 2 \
        --sf-dir /root/testdata/sf0.1 --out BENCH_AB.json

Each ref gets a detached git worktree (removed afterwards); bench.py
runs there in a fresh process per run. The interleave order alternates
refs so slow drift (thermal, cache) hits both sides equally.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", nargs="+", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH_AB.json")
    args = ap.parse_args()

    trees: dict[str, str] = {}
    for ref in args.refs:
        if ref == "HEAD":
            trees[ref] = REPO
            continue
        wt = tempfile.mkdtemp(prefix=f"benchab_{ref[:8]}_")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ref],
            cwd=REPO, check=True, capture_output=True,
        )
        trees[ref] = wt

    results: dict[str, list[dict]] = {r: [] for r in args.refs}
    try:
        for i in range(args.runs):
            for ref in args.refs:
                env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir)
                out = subprocess.run(
                    [sys.executable, "bench.py"], cwd=trees[ref],
                    env=env, capture_output=True, text=True,
                    check=True,
                ).stdout.strip().split("\n")[-1]
                rec = json.loads(out)
                results[ref].append(rec)
                print(f"run {i} {ref}: {rec['value']}s", flush=True)
    finally:
        for ref, wt in trees.items():
            if wt != REPO:
                subprocess.run(
                    ["git", "worktree", "remove", "--force", wt],
                    cwd=REPO, capture_output=True,
                )

    summary: dict = {"refs": {}, "queries": {}}
    all_q = list(results[args.refs[0]][0]["queries"])
    for ref in args.refs:
        summary["refs"][ref] = {
            "totals": [r["value"] for r in results[ref]],
            "median_total": statistics.median(
                r["value"] for r in results[ref]
            ),
        }
    for q in all_q:
        summary["queries"][q] = {
            ref: statistics.median(
                r["queries"][q] for r in results[ref]
            )
            for ref in args.refs
        }
    json.dump(summary, open(os.path.join(REPO, args.out), "w"),
              indent=1)
    print(json.dumps({r: summary["refs"][r]["median_total"]
                      for r in args.refs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
