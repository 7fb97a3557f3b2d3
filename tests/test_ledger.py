"""Registry-hygiene gate: the verification ledger and the driver window.

The ledger (suite/verification_ledger.json) records, per registry entry,
the rounds in which the round driver's CORRECTNESS gate was fully green,
through the round stamped in its ``through_round`` field. The gate
samples the FIRST 50 entries of queries(), so the window list in
suite/__init__ must put every never-verified entry inside the first 50
— otherwise registry growth outruns driver verification (the r3/r4
judge's recurring systemic gap). These tests make that invariant, and
the ledger's freshness, mechanical instead of hand-maintained. The
freshness check is bounded by through_round so the driver landing the
NEXT round's CORRECTNESS file (which happens after the round's final
commit) doesn't retroactively fail the committed tree — the new file is
incorporated by regenerating at the next round's start
(python -m hive_2_3_2_spark.suite.ledger).
"""

from __future__ import annotations

import json

from hive_2_3_2_spark.suite import _WINDOW, load_all
from hive_2_3_2_spark.suite.ledger import (
    compute_ledger,
    correctness_files,
    load_committed,
)


def test_committed_ledger_matches_correctness_files():
    committed = load_committed()
    fresh = compute_ledger(through_round=committed["through_round"])
    assert committed == fresh


def test_ledger_covers_every_registry_entry():
    assert set(load_committed()["entries"]) == set(load_all())


def test_window_is_exactly_the_driver_sample():
    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50
    first50 = list(load_all())[:50]
    assert first50 == _WINDOW


def test_every_never_verified_entry_is_inside_the_window():
    entries = load_committed()["entries"]
    never = {name for name, rounds in entries.items() if not rounds}
    outside = never - set(_WINDOW)
    assert not outside, (
        f"entries with no green driver row outside the 50-entry window "
        f"(freeze rule violated): {sorted(outside)}"
    )


def test_no_entry_has_a_red_only_history():
    """Every entry that ever appeared in a CORRECTNESS file (through
    the ledger's round) either has a green round or sits in the current
    window for re-verification."""
    committed = load_committed()
    entries = committed["entries"]
    appeared = set()
    for _rnd, path in correctness_files(
        through_round=committed["through_round"]
    ):
        with open(path) as f:
            appeared |= set(json.load(f))
    red_ever = {
        n for n in appeared if n in entries and not entries[n]
    } - set(_WINDOW)
    assert not red_ever, f"red-only entries not queued for retry: {red_ever}"
