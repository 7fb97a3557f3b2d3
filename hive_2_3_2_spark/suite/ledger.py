"""Verification ledger — entry name → rounds with a green driver row.

The round driver writes ``CORRECTNESS_r0N.json`` (entry → rows/schema/
hash match booleans) for the first 50 registry entries each round. The
ledger is the computed union of those files: for every registry entry,
the sorted list of rounds in which it was fully green (rows + schema +
hash, no error). ``verification_ledger.json`` (committed next to this
module) is the materialized form; ``tests/test_ledger.py`` asserts it
matches a fresh computation, so the rotation plan for the next window
(`_WINDOW` in ``suite/__init__``) is computed, not hand-maintained —
every entry with an empty rounds list MUST appear inside the window.

The committed file records ``through_round`` — the newest CORRECTNESS
round it incorporates — and the freshness test compares only up to that
round, because the driver writes the NEXT round's file after the
round's final commit (a strict equality against all files on disk would
fail the moment the new round lands). Regenerate at the START of each
round, after the driver's file appears:

    python -m hive_2_3_2_spark.suite.ledger
"""

from __future__ import annotations

import glob
import json
import os
import re

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(os.path.dirname(_HERE))
LEDGER_PATH = os.path.join(_HERE, "verification_ledger.json")


def _is_green(row: dict) -> bool:
    return (
        row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
        and row.get("err") in (None, "")
    )


def correctness_files(
    repo_root: str = REPO_ROOT, through_round: int | None = None
) -> list[tuple[int, str]]:
    """Sorted (round, path) pairs, optionally capped at through_round."""
    out = []
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is None or rnd <= through_round:
            out.append((rnd, path))
    return sorted(out)


def compute_ledger(
    repo_root: str = REPO_ROOT, through_round: int | None = None
) -> dict:
    """{"through_round": N, "entries": {name: sorted green rounds}} for
    every entry in the suite registry (empty list = never verified:
    those entries form the next round's window head)."""
    from hive_2_3_2_spark.suite import load_all

    files = correctness_files(repo_root, through_round)
    entries: dict[str, list[int]] = {name: [] for name in load_all()}
    for rnd, path in files:
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if name in entries and _is_green(row):
                entries[name].append(rnd)
    return {
        "through_round": max((r for r, _ in files), default=0),
        "entries": {n: sorted(r) for n, r in entries.items()},
    }


def load_committed() -> dict:
    with open(LEDGER_PATH) as f:
        return json.load(f)


if __name__ == "__main__":
    ledger = compute_ledger()
    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    never = [n for n, r in ledger["entries"].items() if not r]
    print(
        f"wrote {LEDGER_PATH}: through r{ledger['through_round']}, "
        f"{len(ledger['entries'])} entries, "
        f"{len(never)} never-verified: {never}"
    )
