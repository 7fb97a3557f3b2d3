"""Round-handoff freshness + self-containment gate.

Freshness (the r9 verdict's "What's wrong #1", third occurrence of the
class): the committed sweep artifacts must be newer than the last
commit that touched engine code, or the round ends with a sweep that
never saw its final engine state.

Self-containment (the r10 verdict's "What's wrong #1"): every
QFILE_SWEEP mismatch and every value/row_count-class fixture
divergence must carry its adjudication string IN the artifact, and
every BENCH_sf1_registry flagged entry must carry a verdict — prose
adjudications that live only in COVERAGE.md can't ship.

    python tools/handoff_gate.py            # check, exit 1 on stale
    python tools/handoff_gate.py --explain  # print the timestamps

Checks, for each artifact in ARTIFACTS, that its git-committed content
is from a commit NOT OLDER than the last commit touching ENGINE_PATHS.
Working-tree mtimes are advisory only (a rebuilt checkout resets them);
the commit graph is the truth. The intended end-of-round sequence:

    1. ...final engine commit...
    2. python tools/qfile_value_sweep.py --out QFILE_SWEEP.json
    3. python tools/sweep_registry.py --out BENCH_sf1_registry.json
    4. git commit QFILE_SWEEP.json BENCH_sf1_registry.json
    5. python tools/handoff_gate.py   # must print OK
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = ["QFILE_SWEEP.json", "BENCH_sf1_registry.json"]
ENGINE_PATHS = ["hive_2_3_2_spark", "__spark_entry__.py", "bench.py"]


def _last_commit_time(paths: list[str]) -> tuple[int, str]:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct %h %s", "--"] + paths,
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        return 0, "(none)"
    ts, rest = out.split(" ", 1)
    return int(ts), rest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()
    eng_ts, eng_info = _last_commit_time(ENGINE_PATHS)
    stale = []
    for art in ARTIFACTS:
        art_ts, art_info = _last_commit_time([art])
        if args.explain:
            print(f"{art}: committed {art_ts} ({art_info})")
        if art_ts < eng_ts:
            stale.append((art, art_ts, art_info))
    if args.explain:
        print(f"engine: committed {eng_ts} ({eng_info})")
    if stale:
        print("HANDOFF GATE: STALE — refresh and commit these sweeps "
              f"AFTER the last engine commit ({eng_info}):")
        for art, ts, info in stale:
            print(f"  {art} (from {info})")
        return 1
    unadjudicated = _unadjudicated()
    if unadjudicated:
        print("HANDOFF GATE: UNADJUDICATED — these artifact entries "
              "need an adjudication/verdict string before shipping:")
        for line in unadjudicated:
            print(f"  {line}")
        return 1
    print("HANDOFF GATE: OK — sweep artifacts are at or after the "
          f"last engine commit ({eng_info}) and fully adjudicated")
    return 0


def _unadjudicated() -> list[str]:
    """Artifact entries that claim a divergence without a verdict."""
    out: list[str] = []
    sweep_path = os.path.join(REPO, "QFILE_SWEEP.json")
    if os.path.exists(sweep_path):
        sweep = json.load(open(sweep_path))
        for m in sweep.get("mismatches", []):
            if not m.get("adjudication"):
                out.append(
                    f"QFILE_SWEEP mismatch {m['file']}: "
                    f"{' '.join(m['stmt'][:80].split())}"
                )
        for d in sweep.get("fixture_divergent", []):
            # err/tie-limit classes self-adjudicate in the sweep;
            # value and row_count divergences need a human verdict
            if d.get("class") in (None, "value", "row_count") and not \
                    d.get("adjudication"):
                out.append(
                    f"QFILE_SWEEP fixture_divergent {d['file']}."
                    f"{d['table']} (class={d.get('class')})"
                )
        for e in sweep.get("spark_errors", []):
            if not e.get("adjudication"):
                out.append(
                    f"QFILE_SWEEP spark_error {e['file']}: "
                    f"{' '.join(e.get('stmt', '')[:80].split())}"
                )
        for e in sweep.get("duck_errors", []):
            if e.get("status") not in ("duck_cannot", "untranslated"):
                out.append(
                    f"QFILE_SWEEP duck_error without status "
                    f"{e['file']}: "
                    f"{' '.join(e.get('stmt', '')[:80].split())}"
                )
    bench_path = os.path.join(REPO, "BENCH_sf1_registry.json")
    if os.path.exists(bench_path):
        bench = json.load(open(bench_path))
        verdicts = bench.get("verdicts", {})
        for name in bench.get("flagged", []):
            if not verdicts.get(name):
                out.append(f"BENCH_sf1_registry flag {name}")
    return out


if __name__ == "__main__":
    sys.exit(main())
