"""Formatted-plan helpers + physical-property assertions."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The EXPLAIN text (exec/ExplainTask.java:117 parity).

    Captures ``DataFrame.explain`` output rather than calling the
    private ``PythonSQLUtils`` py4j bridge — works identically under
    classic PySpark and Spark Connect (where there is no py4j at all)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters: line — i.e. the
    predicate reached the parquet scan instead of running post-scan.
    (Hive needs its ppd/PredicatePushDown.java chain for this; Catalyst
    does it natively — this guards against writing filters in ways that
    break pushdown, e.g. through opaque UDFs.)"""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed)
    for frag in fragments:
        assert frag in joined, (
            f"filter {frag!r} not pushed to scan.\nPushedFilters lines: "
            f"{pushed}\nfull plan:\n{plan}"
        )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema — verifies column pruning
    (ColumnPruner parity, optimizer/ColumnPruner.java)."""
    plan = explain_str(df)
    out: list[str] = []
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            inner = ln.split("struct<", 1)[-1].rsplit(">", 1)[0]
            out.extend(
                f.split(":")[0].strip() for f in inner.split(",") if ":" in f
            )
    return out


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    """Assert ≥expect broadcast joins in the physical plan (map-join
    conversion parity, optimizer/ConvertJoinMapJoin.java:78)."""
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= expect, f"expected ≥{expect} broadcast joins, plan:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct in the plan (CrossProductCheck parity,
    optimizer/physical/CrossProductCheck.java) — at 100 TB an accidental
    cartesian is a cluster-killer."""
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, f"cartesian product!\n{plan}"
