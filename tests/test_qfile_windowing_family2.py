"""clientpositive `.q` slice, round 8: windowing family tail —
windowing_windowspec2.q (the negative-offset ROWS frame matrix),
windowing_multipartitioning.q (several DIFFERENT partitions in one
select), windowing_udaf.q (aggregates as window functions + named
window), windowing_gby2.q (windows ORDERED BY aggregates of a grouped
query) — reference: ql/src/test/queries/clientpositive/.

The goldens' LIMIT 100 heads are replaced by total ORDER BY on both
sides (the limit is an output-size convenience in the golden, not a
semantic: un-ordered LIMIT is engine-arbitrary). DuckDB windows
default NULLS LAST on ASC, so every window ORDER BY in the oracle
pins NULLS FIRST (the repo's documented oracle convention — Hive and
Spark sort NULLS FIRST)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

ROWS = []
for i in range(200):
    ROWS.append((
        i % 5,                      # t
        (i * 3) % 7,                # si
        i % 11,                     # i
        (i * 13) % 17,              # b
        float(i % 9) / 2,           # f
        float(i) * 1.5,             # d
        bool(i % 2),                # bo
        f"name_{i % 13}",           # s
    ))
SCHEMA = ("t int, si int, i int, b bigint, f double, d double, "
          "bo boolean, s string")
T3 = ([(" 1 ", " 1 ", 1)] * 2 + [(" 1", " 1", 1)] * 2 +
      [("1 ", "1 ", 1)] * 2 + [("1", "1", 1)] * 6 + [("2", "2", 2)] * 3 +
      [("3", "3", 3)] * 3 + [(None, None, None)] * 2)


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_win2")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "w2_over")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(p)
    eng.register_table("w2_over", p)
    con.execute(
        f"CREATE VIEW w2_over AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    p3 = str(root / "w2_t3")
    spark.createDataFrame(
        T3, "key string, value string, c_int int"
    ).coalesce(1).write.parquet(p3)
    eng.register_table("w2_t3", p3)
    con.execute(
        f"CREATE VIEW w2_t3 AS SELECT * FROM read_parquet('{p3}/*.parquet')"
    )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql=None):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql or hive_sql)


def test_q_windowspec2_negative_offset_frames(qenv):
    """windowing_windowspec2.q: ROWS frames that exclude the current
    row — (2 preceding, 1 preceding), (1 following, 2 following),
    (unbounded preceding, 1 preceding/following) — for sum/avg/count;
    empty frames answer NULL (sum/avg) or 0 (count)."""
    eng, con = qenv
    frames = [
        "rows between 2 preceding and 1 preceding",
        "rows between unbounded preceding and 1 preceding",
        "rows between 1 following and 2 following",
        "rows between unbounded preceding and 1 following",
    ]
    for fn, alias in (("sum", "sf"), ("avg", "af"), ("count", "cf")):
        for frame in frames:
            cast = "CAST({} AS BIGINT)" if fn == "count" else "{}"
            expr = cast.format(
                f"{fn}(f) over (partition by t order by f, si {frame})"
            )
            _chk(
                eng, con,
                f"SELECT t, si, f, round({fn}(f) over (partition by t "
                f"order by f, si {frame}), 4) AS {alias} FROM w2_over "
                "ORDER BY t, f, si",
                f"SELECT t, si, f, round({expr}, 4) AS {alias} "
                "FROM w2_over ORDER BY t NULLS FIRST, f NULLS FIRST, "
                "si NULLS FIRST",
            )


def test_q_multipartitioning(qenv):
    """windowing_multipartitioning.q: two window functions with
    DIFFERENT partition columns in one select (two independent
    shuffles merged into one output row set)."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT s, sum(i) over (partition by s) AS si_sum, "
        "round(sum(f) over (partition by si), 4) AS fs FROM w2_over "
        "WHERE s = 'name_1' OR s = 'name_2' ORDER BY s, si_sum, fs",
        "SELECT s, CAST(sum(i) over (partition by s) AS BIGINT) AS "
        "si_sum, round(sum(f) over (partition by si), 4) AS fs FROM "
        "w2_over WHERE s = 'name_1' OR s = 'name_2' "
        "ORDER BY s NULLS FIRST, si_sum, fs",
    )
    _chk(
        eng, con,
        "SELECT s, rank() over (partition by s order by bo, i, si) AS "
        "r1, rank() over (partition by si order by i desc, s desc) AS "
        "r2 FROM w2_over ORDER BY s, r1, r2",
        "SELECT s, CAST(rank() over (partition by s order by bo NULLS "
        "FIRST, i NULLS FIRST, si NULLS FIRST) AS BIGINT) AS r1, "
        "CAST(rank() over (partition by si order by i DESC NULLS "
        "LAST, s DESC NULLS LAST) AS BIGINT) AS r2 FROM w2_over "
        "ORDER BY s NULLS FIRST, r1, r2",
    )


def test_q_windowing_udaf_named_window(qenv):
    """windowing_udaf.q: min/avg as window functions, compound
    partition, and the WINDOW w AS (...) named-window form."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT s, min(i) over (partition by s) AS mn FROM w2_over "
        "ORDER BY s, mn",
        "SELECT s, min(i) over (partition by s) AS mn FROM w2_over "
        "ORDER BY s NULLS FIRST, mn",
    )
    _chk(
        eng, con,
        "SELECT s, round(avg(i) over (partition by t, b order by s), "
        "4) AS av FROM w2_over ORDER BY s, av",
        "SELECT s, round(avg(i) over (partition by t, b order by s "
        "NULLS FIRST), 4) AS av FROM w2_over "
        "ORDER BY s NULLS FIRST, av",
    )
    _chk(
        eng, con,
        "SELECT max(i) over w AS mx FROM w2_over WINDOW w AS "
        "(partition by f) ORDER BY mx",
        "SELECT max(i) over (partition by f) AS mx FROM w2_over "
        "ORDER BY mx NULLS FIRST",
    )


def test_q_windowing_gby2(qenv):
    """windowing_gby2.q: windows whose ORDER BY / PARTITION BY are
    AGGREGATES of the grouped query (rank over sum, avg over min/sum)
    — including the NULL group, ordered NULLS FIRST like Hive."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT rank() over (order by sum(ws.c_int)) AS return_rank "
        "FROM w2_t3 ws GROUP BY ws.key ORDER BY return_rank",
        "SELECT CAST(rank() over (order by sum(c_int) NULLS FIRST) AS "
        "BIGINT) AS return_rank FROM w2_t3 ws GROUP BY ws.key "
        "ORDER BY return_rank",
    )
    _chk(
        eng, con,
        "SELECT round(avg(cast(ws.key as int)) over (partition by "
        "min(ws.value) order by sum(ws.c_int)), 4) AS return_rank "
        "FROM w2_t3 ws GROUP BY ws.key ORDER BY return_rank",
        "SELECT round(avg(cast(ws.key as int)) over (partition by "
        "min(ws.value) order by sum(ws.c_int) NULLS FIRST), 4) AS "
        "return_rank FROM w2_t3 ws GROUP BY ws.key "
        "ORDER BY return_rank NULLS FIRST",
    )
