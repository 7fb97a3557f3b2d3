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

Regenerate after a round lands a new CORRECTNESS file:

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


def compute_ledger(repo_root: str = REPO_ROOT) -> dict[str, list[int]]:
    """entry → sorted rounds with a fully-green driver CORRECTNESS row,
    for every entry in the suite registry (empty list = never verified:
    those entries form the next round's window head)."""
    from hive_2_3_2_spark.suite import load_all

    ledger: dict[str, list[int]] = {name: [] for name in load_all()}
    pattern = os.path.join(repo_root, "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if name in ledger and _is_green(row):
                ledger[name].append(rnd)
    return {name: sorted(rounds) for name, rounds in ledger.items()}


def load_committed() -> dict[str, list[int]]:
    with open(LEDGER_PATH) as f:
        return json.load(f)


if __name__ == "__main__":
    ledger = compute_ledger()
    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    never = [n for n, r in ledger.items() if not r]
    print(
        f"wrote {LEDGER_PATH}: {len(ledger)} entries, "
        f"{len(never)} never-verified: {never}"
    )
