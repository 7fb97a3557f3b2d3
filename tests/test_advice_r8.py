"""Round-8 ADVICE regressions (the r7 advisor's findings).

1. `_pin_distinct_window_decimal` must not guess `cands[0]` when the
   analyzer error's seed expression fails to match `_DW_ERR_ELEM` AND
   several distinct-window folds are present — pinning the first would
   cast SOME fold to THIS error's accumulator type (silent result-type
   change). With exactly one candidate the guess is still safe.
2. Engine stats-store hygiene on DROP/RENAME and the empty-source
   INSERT OVERWRITE partition semantics are covered in
   tests/test_stats_optimizer.py and tests/test_advice_r7.py (extended
   this round); the adaptive sign-bits dimensionality clamp in
   tests/test_llm.py.
"""

from __future__ import annotations

from hive_2_3_2_spark.engine import _pin_distinct_window_decimal

_SEED = "IF(FALSE, ({elem}) + CAST(0 AS BIGINT), NULL)"
_MERGE = "(__dwa, __dwv) -> coalesce(__dwa, CAST(0 AS BIGINT)) + __dwv"


def _fold(elem: str) -> str:
    return f"aggregate(collect_set({elem}), {_SEED.format(elem=elem)}, {_MERGE})"


def _err(elem: str) -> str:
    return (
        '[DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE] ... "aggregate(...)" '
        'requires the "DECIMAL(12, 2)" type ... '
        f"IF(false, (({elem}) + CAST(0 AS BIGINT)), NULL)"
    )


def test_matched_elem_pins_that_candidate():
    q = f"SELECT {_fold('d')}, {_fold('e')} FROM t"
    out = _pin_distinct_window_decimal(q, _err("e"))
    assert out is not None
    # only the SECOND fold's merge lambda got the decimal cast
    assert out.count("AS DECIMAL(12, 2)") == 1
    assert out.index("AS DECIMAL(12, 2)") > out.index("collect_set(e)")


def test_unmatched_elem_with_multiple_candidates_surfaces_error():
    """Message-format drift: the error names an expression that matches
    no candidate. With 2+ folds the old cands[0] fallback could pin the
    WRONG one — the rewrite must decline (return None)."""
    q = f"SELECT {_fold('d')}, {_fold('e')} FROM t"
    assert _pin_distinct_window_decimal(q, _err("zzz_drifted")) is None


def test_unmatched_elem_with_single_candidate_still_pins():
    q = f"SELECT {_fold('d')} FROM t"
    out = _pin_distinct_window_decimal(q, _err("zzz_drifted"))
    assert out is not None
    assert "AS DECIMAL(12, 2)" in out
