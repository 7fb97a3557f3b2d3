"""Operator helper tests: salted joins, top-k, MatchPath, TRANSFORM,
plan-property assertions (pushdown/broadcast/pruning), sampling bounds."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.operators import (
    cluster_by,
    match_path,
    salted_skew_join,
    top_k_per_group,
    transform_script,
)
from hive_2_3_2_spark.operators.transform import transform_pandas
from hive_2_3_2_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    scan_read_schema,
)


def test_salted_skew_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).count()
    salted = salted_skew_join(
        li.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        "k",
        salt_buckets=8,
    ).count()
    assert plain == salted


def test_salted_skew_join_rejects_unsafe_join_types(spark, sf_dir):
    """Right/full outer and semi/anti would multiply unmatched right rows
    by the salt factor — must raise, not silently return wrong rows."""
    import pytest

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    for how in ("right", "full", "left_semi", "left_anti", "outer"):
        with pytest.raises(ValueError, match="salt"):
            salted_skew_join(li, orders, "k", how=how)
    # left outer stays allowed (unmatched LEFT rows are not replicated)
    assert (
        salted_skew_join(li, orders, "k", how="left").count()
        == li.join(orders, "k", "left").count()
    )


def test_top_k_per_group_matches_window_query(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    got = top_k_per_group(
        part, ["p_brand"], [F.desc("p_retailprice"), F.asc("p_partkey")], 3
    )
    # every brand has ≤3 rows and they are the max-price ones
    agg = got.groupBy("p_brand").count().collect()
    assert all(r["count"] <= 3 for r in agg)
    top1 = {
        (r.p_brand, r.p_partkey)
        for r in top_k_per_group(
            part, ["p_brand"], [F.desc("p_retailprice"), F.asc("p_partkey")], 1
        ).collect()
    }
    oracle_top1 = {
        (r.p_brand, r.p_partkey)
        for r in part.groupBy("p_brand")
        .agg(
            F.min_by(
                "p_partkey", F.struct(-F.col("p_retailprice"), F.col("p_partkey"))
            ).alias("p_partkey")
        )
        .collect()
    }
    assert top1 == oracle_top1


def test_match_path_flight_pattern(spark):
    """MatchPath.java's canonical example: runs of late events."""
    rows = [
        (1, 1, 70), (1, 2, 10), (1, 3, 80), (1, 4, 90), (1, 5, 20),
        (2, 1, 10), (2, 2, 20),
    ]
    df = spark.createDataFrame(rows, ["userid", "ts", "lateness"])
    out = match_path(
        df,
        "userid",
        "ts",
        {"L": lambda p: p["lateness"] > 60, "O": lambda p: p["lateness"] <= 60},
        pattern="L+",
        result_cols=["userid", "ts"],
    ).collect()
    got = {(r.userid, r.ts, r.match_len) for r in out}
    assert got == {(1, 1, 1), (1, 3, 2)}


def test_transform_script_and_pandas(spark, sf_dir):
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    out = transform_script(
        spark,
        "region",
        ["r_regionkey", "r_name"],
        "cat",
        ["k", "name"],
    ).collect()
    assert len(out) == 5
    assert {r.name for r in out} == {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }
    df = load_table(spark, sf_dir, "region")
    out2 = transform_pandas(
        df,
        lambda pdf: pd.DataFrame({"n": pdf["r_name"].str.lower()}),
        "n string",
    ).collect()
    assert {r.n for r in out2} == {
        "africa", "america", "asia", "europe", "middle east"
    }


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey")
    assert_pushed_filters(li, "l_quantity", "l_returnflag")


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(li)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_dim_join_broadcasts(spark, sf_dir):
    from hive_2_3_2_spark.suite.tpch import q3

    assert_broadcast_join(q3(spark, sf_dir), expect=1)
    assert_no_cartesian(q3(spark, sf_dir))


def test_cluster_by_clusters_partitions(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    out = cluster_by(li, "l_suppkey", n=8)

    def check(it):
        seen = set()
        prev = None
        for row in it:
            if row.l_suppkey != prev:
                assert row.l_suppkey not in seen, "not clustered"
                seen.add(row.l_suppkey)
                prev = row.l_suppkey
        return iter([])

    out.rdd.mapPartitions(lambda it: check(it)).count()


def test_sample_fraction_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    n = li.sample(fraction=0.1, seed=42).count()
    assert 0.07 * total < n < 0.13 * total


def test_asof_join_handmade_edges(spark):
    """Tie at equal ts matches the right row; left rows before any right
    row get null; carries per-key independently."""
    from hive_2_3_2_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 11, 211)],
        "k int, ts int, rv int",
    )
    got = {
        r.lv: r.rv
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    assert got == {"a": 100, "b": 150, "c": None, "d": None}


def test_banded_range_join_matches_naive(spark):
    """Banded equi-join + residual == naive inequality join, including
    intervals spanning several bands and negative coordinates."""
    from hive_2_3_2_spark.operators.joins import banded_range_join

    pts = spark.createDataFrame(
        [(1, 1, -7.0), (2, 1, 0.0), (3, 1, 5.5), (4, 2, 5.5), (5, 1, 99.0)],
        ["pid", "k", "x"],
    )
    ivs = spark.createDataFrame(
        [(10, 1, -10.0, 6.0), (11, 1, 5.0, 5.5), (12, 2, -100.0, 100.0)],
        ["iid", "k", "s", "e"],
    )
    got = {
        (r.pid, r.iid)
        for r in banded_range_join(pts, ivs, "x", "s", "e", 4.0, keys=["k"]).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.join(ivs, "k")
        .filter("x >= s AND x <= e")
        .collect()
    }
    assert got == naive and len(naive) == 5


def test_rollup_refresh_incremental_matches_full_recompute(spark, sf_dir, tmp_path):
    """File-backed continuous aggregate: build from history, fold in the
    tail slice, and the finalized table must equal a flat recompute.
    Untouched date partitions must not be rewritten (pruned refresh)."""
    import os
    from datetime import timedelta

    from hive_2_3_2_spark.operators import (
        rollup_finalize,
        rollup_partials,
        rollup_refresh,
    )

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0].m
    cutoff = mx - timedelta(days=1)
    path = str(tmp_path / "rollup")

    rollup_refresh(spark, path, ev.filter(F.col("ts") < F.lit(cutoff)))

    # snapshot the files of partitions the tail slice will NOT touch
    touched_dates = {
        str(r[0])
        for r in ev.filter(F.col("ts") >= F.lit(cutoff))
        .select(F.to_date(F.date_trunc("hour", "ts")))
        .distinct()
        .collect()
    }
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("bucket_date=")
        and d.split("=", 1)[1] not in touched_dates
    }
    assert before, "expected at least one untouched partition"

    rollup_refresh(spark, path, ev.filter(F.col("ts") >= F.lit(cutoff)))

    after = {d: sorted(os.listdir(os.path.join(path, d))) for d in before}
    assert after == before  # pruned overwrite left untouched dates alone

    got = rollup_finalize(spark.read.parquet(path)).orderBy(
        "bucket_start", "event_type"
    )
    want = rollup_finalize(rollup_partials(ev)).orderBy(
        "bucket_start", "event_type"
    )
    assert got.collect() == want.collect()


def test_count_min_sketch_merge_and_guarantee(spark):
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.operators.sketches import (
        count_min_build,
        count_min_merge,
        count_min_probe,
    )

    rows = [(f"tok{i % 37}", 1) for i in range(500)] + [("hot", 1)] * 200
    df = spark.createDataFrame(rows, ["item", "w"])
    sk = count_min_build(df, "item", depth=3, width=64)
    # counters are additive: sharded build == whole build
    h1 = count_min_build(df.filter(F.col("item") != "hot"), "item", depth=3, width=64)
    h2 = count_min_build(df.filter(F.col("item") == "hot"), "item", depth=3, width=64)
    assert {(r.r, r.b, r.c) for r in count_min_merge([h1, h2]).collect()} == {
        (r.r, r.b, r.c) for r in sk.collect()
    }
    # point estimates always over-estimate; the heavy hitter dominates
    probes = df.select("item").distinct()
    est = {
        r.item: r.estimate
        for r in count_min_probe(sk, probes, "item", depth=3, width=64).collect()
    }
    exact = {r.item: r.c for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()}
    assert all(est[i] >= exact[i] for i in exact)
    assert est["hot"] >= 200
    # absent item: estimate is collision mass only, far below the hitter
    ghost = spark.createDataFrame([("zzz-not-present",)], ["item"])
    g = count_min_probe(sk, ghost, "item", depth=3, width=64).collect()[0].estimate
    assert g < 200
