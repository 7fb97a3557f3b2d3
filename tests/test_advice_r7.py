"""Regression tests for the round-6 ADVICE findings.

Four items: Hive all-peers semantics for order-less rank-family
windows (WindowingSpec.ensureOrderSpec orders by the partition keys),
word-boundary OVER matching (aliases like ``overall`` after a distinct
aggregate), type-preserving DISTINCT windowed SUM/AVG (BIGINT for
integral, DECIMAL stays DECIMAL), and crash-safe static-partition
INSERT OVERWRITE (stage-then-commit, no drop-before-query data loss).
"""

from __future__ import annotations

import os
import shutil

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


@pytest.fixture(scope="module")
def tview(spark):
    spark.createDataFrame(
        [(1, 10, 1.5), (1, 10, 2.5), (1, 20, 2.5), (2, None, None)],
        "a int, c int, f double",
    ).selectExpr("a", "c", "f", "cast(f as decimal(10,2)) d") \
        .createOrReplaceTempView("advice7_t")
    yield "advice7_t"
    spark.catalog.dropTempView("advice7_t")


# --------------------------- rank family without ORDER BY = all peers


def test_rank_family_partition_only_all_peers(eng, tview):
    """ADVICE r6 (high): Hive's WindowingSpec.ensureOrderSpec orders an
    order-less window by its PARTITION keys, so every row in a
    partition is a peer — rank=1, dense_rank=1, percent_rank=0,
    cume_dist=1 for ALL rows (reference:
    ql/src/java/org/apache/hadoop/hive/ql/parse/WindowingSpec.java).
    The old rewrite injected an arbitrary total order, silently
    returning distinct 1..n."""
    rows = eng.sql(
        f"select a, rank() over (partition by a) r, "
        f"dense_rank() over (partition by a) dr, "
        f"percent_rank() over (partition by a) pr, "
        f"cume_dist() over (partition by a) cd from {tview}"
    ).collect()
    assert rows
    for r in rows:
        assert (r.r, r.dr, r.pr, r.cd) == (1, 1, 0.0, 1.0)


def test_rank_family_empty_over_all_peers(eng, tview):
    """Same contract with no partition at all: the whole result set is
    one peer group."""
    rows = eng.sql(
        f"select rank() over () r, percent_rank() over () pr, "
        f"cume_dist() over () cd from {tview}"
    ).collect()
    assert rows
    for r in rows:
        assert (r.r, r.pr, r.cd) == (1, 0.0, 1.0)


def test_row_number_partition_only_still_numbers(eng, tview):
    """row_number IS order-agnostic — any 1..n numbering is valid, so
    the arbitrary-order rewrite must stay in place for it."""
    rows = eng.sql(
        f"select a, row_number() over (partition by a) rn from {tview}"
    ).collect()
    got = sorted(r.rn for r in rows if r.a == 1)
    assert got == [1, 2, 3]


# ------------------------------------- OVER word boundary in aliases


def test_distinct_aggregate_alias_starting_with_over(eng, tview):
    """ADVICE r6: ``count(distinct x) overall`` must parse as an alias,
    not as OVER + named window 'all'."""
    rows = {
        r.a: r.overall
        for r in eng.sql(
            f"select a, count(distinct c) overall from {tview} group by a"
        ).collect()
    }
    assert rows == {1: 2, 2: 0}


def test_nested_window_alias_starting_with_over(eng, tview):
    """Same word-boundary contract inside the nested-window hoist
    path: an 'over_'-prefixed alias after sum(lag(..)) must survive."""
    rows = eng.sql(
        f"select a, sum(c) over_totals from {tview} group by a"
    ).collect()
    assert {r.a: r.over_totals for r in rows} == {1: 40, 2: None}


# --------------------------- DISTINCT window aggregates keep the type


def test_sum_distinct_window_integral_is_bigint(eng, tview):
    """ADVICE r6: SUM(DISTINCT int) OVER returns BIGINT like Hive (the
    old fold widened to DOUBLE)."""
    df = eng.sql(
        f"select a, sum(distinct c) over (partition by a) s from {tview}"
    )
    assert dict(df.dtypes)["s"] == "bigint"
    assert {(r.a, r.s) for r in df.collect()} == {(1, 30), (2, None)}


def test_sum_avg_distinct_window_decimal_stays_decimal(eng, tview):
    """ADVICE r6: SUM/AVG(DISTINCT decimal) OVER keeps a DECIMAL result
    (scale preserved, no binary-float round-off). The accumulator type
    is pinned by the DATATYPE_MISMATCH retry
    (_pin_distinct_window_decimal)."""
    df = eng.sql(
        f"select a, sum(distinct d) over (partition by a) s, "
        f"avg(distinct d) over (partition by a) v from {tview}"
    )
    types = dict(df.dtypes)
    assert types["s"].startswith("decimal(")
    assert types["v"].startswith("decimal(")
    got = {(r.a, None if r.s is None else str(r.s)) for r in df.collect()}
    assert got == {(1, "4.00"), (2, None)}


def test_mixed_distinct_window_types_one_statement(eng, tview):
    """Several DISTINCT window aggregates of different types in ONE
    statement: the retry loop must pin each failing decimal lambda to
    ITS OWN accumulator type without touching the integral/double
    ones."""
    df = eng.sql(
        f"select a, sum(distinct c) over (partition by a) sc, "
        f"sum(distinct f) over (partition by a) sf, "
        f"sum(distinct d) over (partition by a) sd, "
        f"avg(distinct d) over (partition by a) ad from {tview}"
    )
    types = dict(df.dtypes)
    assert types["sc"] == "bigint"
    assert types["sf"] == "double"
    assert types["sd"].startswith("decimal(")
    assert types["ad"].startswith("decimal(")
    one = next(r for r in df.collect() if r.a == 1)
    assert (one.sc, one.sf, str(one.sd)) == (30, 4.0, "4.00")


# --------------------- static-partition INSERT OVERWRITE is staged


@pytest.fixture()
def ptable(spark, eng):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("adv7_part", "adv7_src"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    eng.sql(
        "CREATE TABLE adv7_part (k INT, v STRING) "
        "PARTITIONED BY (ds STRING) STORED AS PARQUET"
    )
    eng.sql(
        "INSERT INTO TABLE adv7_part PARTITION (ds='d1') "
        "VALUES (1, 'one'), (2, 'two')"
    )
    yield "adv7_part"
    for t in ("adv7_part", "adv7_src"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


def test_static_overwrite_failing_source_keeps_partition(eng, ptable):
    """ADVICE r6: a source query that fails MID-EXECUTION must leave
    the pre-existing partition data intact — Hive stages to scratch and
    moves only on success; the old path dropped the partition before
    the query ran."""
    with pytest.raises(Exception):
        eng.sql(
            f"INSERT OVERWRITE TABLE {ptable} PARTITION (ds='d1') "
            "SELECT k, raise_error('mid-query failure') FROM "
            f"(SELECT 9 k)"
        )
    kept = eng.sql(
        f"SELECT k, v FROM {ptable} WHERE ds='d1' ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in kept] == [(1, "one"), (2, "two")]


def test_static_overwrite_success_replaces_partition(eng, ptable):
    rows = eng.sql(
        f"INSERT OVERWRITE TABLE {ptable} PARTITION (ds='d1') "
        "VALUES (7, 'seven')"
    ).collect()
    assert rows[0][0] == 1
    got = eng.sql(f"SELECT k, v FROM {ptable} WHERE ds='d1'").collect()
    assert [(r.k, r.v) for r in got] == [(7, "seven")]
    # untouched sibling partition semantics: insert into d2, overwrite
    # d1 again, d2 must survive
    eng.sql(
        f"INSERT INTO TABLE {ptable} PARTITION (ds='d2') VALUES (3, 'x')"
    )
    eng.sql(
        f"INSERT OVERWRITE TABLE {ptable} PARTITION (ds='d1') "
        "VALUES (8, 'eight')"
    )
    assert eng.sql(
        f"SELECT count(*) c FROM {ptable} WHERE ds='d2'"
    ).collect()[0].c == 1


def test_static_overwrite_empty_source_clears_partition(eng, ptable):
    """Replace-with-empty: a cleanly-evaluated empty source clears the
    target partition's CONTENTS but keeps it registered — Hive's
    MoveTask replaces the directory, not the partition metadata, so
    SHOW PARTITIONS must still list it (r7 ADVICE; the old post-success
    DROP lost the metadata too)."""
    eng.sql(
        f"INSERT OVERWRITE TABLE {ptable} PARTITION (ds='d1') "
        f"SELECT k, v FROM {ptable} WHERE 1=0"
    )
    assert (
        eng.sql(f"SELECT count(*) c FROM {ptable} WHERE ds='d1'")
        .collect()[0].c == 0
    )
    parts = [
        r[0] for r in eng.sql(f"SHOW PARTITIONS {ptable}").collect()
    ]
    assert "ds=d1" in parts


def test_static_overwrite_empty_source_registers_new_partition(
    eng, ptable
):
    """Hive registers the static target partition even for a zero-row
    INSERT OVERWRITE into a partition that never existed."""
    eng.sql(
        f"INSERT OVERWRITE TABLE {ptable} PARTITION (ds='dnew') "
        f"SELECT k, v FROM {ptable} WHERE 1=0"
    )
    parts = [
        r[0] for r in eng.sql(f"SHOW PARTITIONS {ptable}").collect()
    ]
    assert "ds=dnew" in parts
    assert (
        eng.sql(f"SELECT count(*) c FROM {ptable} WHERE ds='dnew'")
        .collect()[0].c == 0
    )
