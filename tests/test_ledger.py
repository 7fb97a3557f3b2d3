"""Registry-hygiene gate: the verification ledger and the driver window.

The ledger (suite/verification_ledger.json) records, per registry entry,
the rounds in which the round driver's CORRECTNESS gate was fully green.
The gate samples the FIRST 50 entries of queries(), so the window list
in suite/__init__ must put every never-verified entry inside the first
50 — otherwise registry growth outruns driver verification (the r3/r4
judge's recurring systemic gap). These tests make that invariant, and
the ledger's freshness, mechanical instead of hand-maintained.
"""

from __future__ import annotations

from hive_2_3_2_spark.suite import _WINDOW, load_all
from hive_2_3_2_spark.suite.ledger import compute_ledger, load_committed


def test_committed_ledger_matches_correctness_files():
    assert load_committed() == compute_ledger()


def test_ledger_covers_every_registry_entry():
    assert set(load_committed()) == set(load_all())


def test_window_is_exactly_the_driver_sample():
    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50
    first50 = list(load_all())[:50]
    assert first50 == _WINDOW


def test_every_never_verified_entry_is_inside_the_window():
    ledger = load_committed()
    never = {name for name, rounds in ledger.items() if not rounds}
    outside = never - set(_WINDOW)
    assert not outside, (
        f"entries with no green driver row outside the 50-entry window "
        f"(freeze rule violated): {sorted(outside)}"
    )


def test_no_entry_has_a_red_only_history():
    """Every entry that ever appeared in a CORRECTNESS file either has a
    green round or sits in the current window for re-verification."""
    ledger = load_committed()
    import glob
    import json
    import os

    from hive_2_3_2_spark.suite.ledger import REPO_ROOT

    appeared = set()
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        with open(path) as f:
            appeared |= set(json.load(f))
    red_ever = {
        n for n in appeared if n in ledger and not ledger[n]
    } - set(_WINDOW)
    assert not red_ever, f"red-only entries not queued for retry: {red_ever}"
