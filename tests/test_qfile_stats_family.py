"""clientpositive `.q` slice, round 8: the stats family — the
reference's own tests for the StatsOptimizer path built in r7
(reference: ql/src/test/queries/clientpositive/metadata_only_queries.q,
metadata_only_queries_with_filters.q, stats0.q-stats19.q,
stats_invalidation.q; engine: StatsOptimizer.java behind
hive.compute.query.using.stats).

Replayed shapes: count(*)/count(1)/count(col), min/max, sum(literal),
interleaved constant select items, PARTITIONED tables (per-partition
stats aggregated over the pruned list), partition-column WHERE filters
— each diffed against DuckDB over the same rows AND plan-asserted
(stats-answered = LocalRelation/ExistingRDD, no scan, no aggregate).
The must-NOT-answer boundaries the goldens pin: un-analyzed columns,
data-column predicates, GROUP BY, expressions over aggregates, and
partitions without stats — all fall back to real execution with
correct values.

Divergence (documented): Hive autogathers basic stats on INSERT
(hive.stats.autogather=true); this engine gathers only on explicit
ANALYZE, so shapes the goldens answer pre-ANALYZE are replayed
post-ANALYZE here.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.plans import explain_str

from tests.conftest import assert_matches_oracle

# over10k-parity shape (subset): numeric spread + strings + booleans +
# NULLs in several columns. Deterministic.
ROWS = []
for idx in range(300):
    t = idx % 70
    ROWS.append((
        t,
        (idx * 7) % 256 if idx % 11 else None,          # si with NULLs
        idx - 150,                                       # i
        idx * 1_000_003,                                 # b
        float(idx) / 4 if idx % 13 else None,            # f with NULLs
        float(idx) * 2.5,                                # d
        bool(idx % 2) if idx % 17 else None,             # bo with NULLs
        f"s_{idx % 37}" if idx % 5 else None,            # s with NULLs
        idx % 97,                                        # ts (unanalyzed)
    ))
SCHEMA = ("t int, si int, i int, b bigint, f float, d double, "
          "bo boolean, s string, ts int")
_COLS = "t, si, i, b, f, d, bo, s"  # analyzed set — ts deliberately out


def _is_stats_answered(df) -> bool:
    plan = explain_str(df)
    return (
        "ExistingRDD" in plan
        and "Scan parquet" not in plan
        and "Aggregate" not in plan
    )


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_stats")
    eng = Engine(spark=spark)
    df = spark.createDataFrame(ROWS, SCHEMA)
    p_flat = str(root / "stats_tbl")
    df.coalesce(2).write.parquet(p_flat)
    eng.register_table("stats_tbl", p_flat)
    # partitioned twin: dt INT partitions 2010/2011/2012 by t range —
    # the metadata_only_queries_with_filters.q layout
    p_part = str(root / "stats_tbl_part")
    from pyspark.sql import functions as F

    dfp = df.withColumn(
        "dt",
        F.when(F.col("t") < 30, 2010)
        .when(F.col("t") < 60, 2011)
        .otherwise(2012),
    )
    dfp.repartition("dt").write.partitionBy("dt").parquet(p_part)
    eng.register_table("stats_tbl_part", p_part, ["dt"])
    eng.sql("SET hive.compute.query.using.stats=true")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW stats_tbl AS SELECT * FROM "
        f"read_parquet('{p_flat}/*.parquet')"
    )
    con.execute(
        "CREATE VIEW stats_tbl_part AS SELECT * FROM "
        f"read_parquet('{p_part}/*/*.parquet', hive_partitioning=1)"
    )
    yield eng, con
    con.close()


def _chk(eng, con, sql, answered, duck_sql=None):
    df = eng.sql(sql)
    assert _is_stats_answered(df) == answered, explain_str(df)
    assert_matches_oracle(df, con, duck_sql or sql)
    return df


def test_q_metadata_only_unpartitioned(qenv):
    """metadata_only_queries.q head: count/sum(literal)/constants after
    basic ANALYZE; count(col)/min/max after FOR COLUMNS."""
    eng, con = qenv
    sql1 = (
        "SELECT count(*) AS c, sum(1) AS s1, "
        "sum(0.2) AS s02, count(1) AS c1, count(s) AS cs, "
        "count(bo) AS cbo, count(si) AS csi FROM stats_tbl"
    )
    duck1 = sql1.replace("sum(1) AS s1", "CAST(sum(1) AS BIGINT) AS s1")
    # pre-ANALYZE: real execution, same values (autogather divergence)
    _chk(eng, con, sql1, answered=False, duck_sql=duck1)
    eng.sql("ANALYZE TABLE stats_tbl COMPUTE STATISTICS")
    eng.sql(
        f"ANALYZE TABLE stats_tbl COMPUTE STATISTICS FOR COLUMNS {_COLS}"
    )
    _chk(eng, con, sql1, answered=True, duck_sql=duck1)
    # the constant-interleaved golden shape
    _chk(
        eng, con,
        "SELECT count(*) AS c, '1' AS one, sum(1) AS s1, "
        "sum(0.2) AS s02, 2 AS two, count(1) AS c1, count(s) AS cs, "
        "3+4.0 AS three, count(bo) AS cbo, count(si) AS csi, "
        "max(i) AS mxi, min(b) AS mnb FROM stats_tbl",
        answered=True,
        duck_sql="SELECT count(*) AS c, '1' AS one, CAST(sum(1) AS "
        "BIGINT) AS s1, sum(0.2) AS s02, 2 AS two, count(1) AS c1, "
        "count(s) AS cs, 3+4.0 AS three, count(bo) AS cbo, "
        "count(si) AS csi, max(i) AS mxi, min(b) AS mnb FROM stats_tbl",
    )
    # min/max across every numeric type
    _chk(
        eng, con,
        "SELECT min(i) AS mni, max(i) AS mxi, min(b) AS mnb, "
        "max(b) AS mxb, min(d) AS mnd, max(d) AS mxd "
        "FROM stats_tbl",
        answered=True,
    )


def test_q_metadata_only_boundaries_fall_back(qenv):
    """The goldens' must-NOT-answer shapes: un-analyzed column,
    GROUP BY, data-column WHERE, expression over an aggregate,
    count(DISTINCT), min of a STRING column."""
    eng, con = qenv
    eng.sql("ANALYZE TABLE stats_tbl COMPUTE STATISTICS")
    eng.sql(
        f"ANALYZE TABLE stats_tbl COMPUTE STATISTICS FOR COLUMNS {_COLS}"
    )
    # count(ts): ts outside the FOR COLUMNS list (golden: explain shows
    # a full job for count(ts) — dec/ts were never analyzed)
    _chk(eng, con, "SELECT count(ts) AS cts FROM stats_tbl",
         answered=False)
    # group by '1' (metadata_only_queries.q tail)
    _chk(
        eng, con,
        "SELECT count('1') AS c FROM stats_tbl GROUP BY '1'",
        answered=False,
    )
    # data-column predicate
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM stats_tbl WHERE t > 10",
        answered=False,
    )
    # expression over an aggregate (metadata_only_queries_with_filters
    # tail: select count(*)/2)
    _chk(
        eng, con,
        "SELECT CAST(count(*)/2 AS DOUBLE) AS h FROM stats_tbl",
        answered=False,
    )
    _chk(
        eng, con,
        "SELECT count(DISTINCT t) AS cd FROM stats_tbl",
        answered=False,
    )
    # min of STRING: stats carry lengths, not extrema (the reference's
    # unsupported-type bail-out)
    _chk(eng, con, "SELECT min(s) AS mns FROM stats_tbl",
         answered=False)


def test_q_metadata_only_partitioned(qenv):
    """metadata_only_queries.q partitioned half: ANALYZE per-partition
    (the PARTITION (dt) all-partitions form), whole-table aggregates
    answered from the SUM over partition stats."""
    eng, con = qenv
    out = eng.sql(
        "ANALYZE TABLE stats_tbl_part PARTITION (dt) COMPUTE STATISTICS"
    ).collect()
    assert {r.partition for r in out} == {"dt=2010", "dt=2011", "dt=2012"}
    assert sum(r.num_rows for r in out) == len(ROWS)
    eng.sql(
        "ANALYZE TABLE stats_tbl_part COMPUTE STATISTICS "
        f"FOR COLUMNS {_COLS}"
    )
    _chk(
        eng, con,
        "SELECT count(*) AS c, sum(1) AS s1, "
        "count(s) AS cs, count(bo) AS cbo, count(si) AS csi, "
        "max(i) AS mxi, min(b) AS mnb FROM stats_tbl_part",
        answered=True,
        duck_sql="SELECT count(*) AS c, CAST(sum(1) AS BIGINT) AS s1, "
        "count(s) AS cs, count(bo) AS cbo, count(si) AS csi, "
        "max(i) AS mxi, min(b) AS mnb FROM stats_tbl_part",
    )
    _chk(
        eng, con,
        "SELECT min(i) AS mni, max(i) AS mxi, min(d) AS mnd, "
        "max(d) AS mxd FROM stats_tbl_part",
        answered=True,
    )


def test_q_metadata_only_with_filters(qenv):
    """metadata_only_queries_with_filters.q: partition-column equality
    and range predicates served from the PRUNED partition list."""
    eng, con = qenv
    eng.sql(
        "ANALYZE TABLE stats_tbl_part PARTITION (dt) COMPUTE STATISTICS"
    )
    eng.sql(
        "ANALYZE TABLE stats_tbl_part COMPUTE STATISTICS "
        f"FOR COLUMNS {_COLS}"
    )
    _chk(
        eng, con,
        "SELECT count(*) AS c, count(1) AS c1, sum(1) "
        "AS s1, count(s) AS cs, count(bo) AS cbo, count(si) AS csi, "
        "max(i) AS mxi, min(b) AS mnb, min(d) AS mnd "
        "FROM stats_tbl_part WHERE dt = 2010",
        answered=True,
        duck_sql="SELECT count(*) AS c, count(1) AS c1, CAST(sum(1) AS "
        "BIGINT) AS s1, count(s) AS cs, count(bo) AS cbo, count(si) AS "
        "csi, max(i) AS mxi, min(b) AS mnb, min(d) AS mnd "
        "FROM stats_tbl_part WHERE dt = 2010",
    )
    _chk(
        eng, con,
        "SELECT count(*) AS c, sum(2) AS s2, "
        "count(s) AS cs, max(i) AS mxi, min(b) AS mnb FROM "
        "stats_tbl_part WHERE dt > 2010",
        answered=True,
        duck_sql="SELECT count(*) AS c, CAST(sum(2) AS BIGINT) AS s2, "
        "count(s) AS cs, max(i) AS mxi, min(b) AS mnb FROM "
        "stats_tbl_part WHERE dt > 2010",
    )
    # compound partition predicate
    _chk(
        eng, con,
        "SELECT count(*) AS c FROM stats_tbl_part "
        "WHERE dt >= 2010 AND dt <> 2011",
        answered=True,
    )
    # pruned to ZERO partitions: count 0, min/max NULL — like real
    # execution over an empty selection
    _chk(
        eng, con,
        "SELECT count(*) AS c, min(i) AS mni FROM stats_tbl_part "
        "WHERE dt = 1999",
        answered=True,
    )


def test_q_stats_partial_partition_coverage(qenv, spark, tmp_path):
    """stats_invalidation/partial coverage boundary: only ONE partition
    analyzed → whole-table query falls back, the covered partition's
    filtered query answers; a WRITE invalidates everything."""
    eng = Engine(spark=spark)
    eng.sql("SET hive.compute.query.using.stats=true")
    from pyspark.sql import functions as F

    p = str(tmp_path / "cover_t")
    df = spark.createDataFrame(
        [(i, 2010 + i % 2) for i in range(40)], "x int, dt int"
    )
    df.repartition("dt").write.partitionBy("dt").parquet(p)
    eng.register_table("cover_t", p, ["dt"])
    eng.sql(
        "ANALYZE TABLE cover_t PARTITION (dt=2010) COMPUTE STATISTICS"
    )
    whole = eng.sql("SELECT count(*) AS c FROM cover_t")
    assert not _is_stats_answered(whole)
    assert whole.collect()[0].c == 40
    covered = eng.sql("SELECT count(*) AS c FROM cover_t WHERE dt = 2010")
    assert _is_stats_answered(covered), explain_str(covered)
    assert covered.collect()[0].c == 20
    # complete the coverage → whole table now answers
    eng.sql(
        "ANALYZE TABLE cover_t PARTITION (dt=2011) COMPUTE STATISTICS"
    )
    whole2 = eng.sql("SELECT count(*) AS c FROM cover_t")
    assert _is_stats_answered(whole2), explain_str(whole2)
    assert whole2.collect()[0].c == 40
    # engine write → event invalidation, fallback with fresh value
    eng.sql("INSERT INTO TABLE cover_t PARTITION (dt=2010) VALUES (99)")
    after = eng.sql("SELECT count(*) AS c FROM cover_t WHERE dt = 2010")
    assert not _is_stats_answered(after)
    assert after.collect()[0].c == 21
