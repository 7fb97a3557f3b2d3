"""clientpositive decimal family replay: decimal_1_1.q, decimal_3.q,
decimal_5.q, decimal_6.q, decimal_precision.q, decimal_join2.q,
decimal_trailing.q.

Hive decimal semantics pinned here (GenericUDFOPDivide /
HiveDecimalUtils.getPrecisionForType): values that don't fit the
declared precision/scale become NULL (never truncate silently), cast
NARROWING overflows to NULL, the bare `decimal` type is decimal(10,0),
mixed-scale unions widen to the covering type, and arithmetic results
carry the derived precision/scale. Spark's non-ANSI decimal behavior
matches all of these; value checks run against DuckDB with division
results compared as doubles (each engine derives a different result
SCALE for division, the VALUES must agree).
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

D3 = [  # decimal_3 payload shape: mixed signs, dups, NULL
    ("-1.122", 455), ("-1.12", 45), ("-1.12", 45), ("-0.333", 0),
    ("-0.3", 0), ("0", 0), ("0.333", 0), ("1.12", 45), ("1.122", 455),
    ("2", 2), ("2", 2), ("3.14", 3), ("3.14", 3), ("3.14", 4),
    (None, 0),
]
PREC = ["0.0", "0.02", "0.2", "1.1234567890", "-1.1234567890",
        "99999999.9999999999", "-99999999.9999999999", "12345678.1234"]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_dec")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "dec_3")
    spark.createDataFrame(D3, "key string, value int").selectExpr(
        "cast(key as decimal(38,18)) AS key", "value"
    ).coalesce(1).write.parquet(p)
    eng.register_table("dec_3", p)
    con.execute(
        f"CREATE VIEW dec_3 AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    pp = str(root / "dec_prec")
    spark.createDataFrame([(v,) for v in PREC], "dec string").selectExpr(
        "cast(dec as decimal(20,10)) AS dec"
    ).coalesce(1).write.parquet(pp)
    eng.register_table("dec_prec", pp)
    con.execute(
        f"CREATE VIEW dec_prec AS SELECT * FROM read_parquet('{pp}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_decimal_3_order_distinct_group(qenv):
    """decimal_3.q: ORDER/DISTINCT/GROUP over decimal(38,18) keys with
    duplicates and a NULL."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM dec_3"),
        con, "SELECT key, value FROM dec_3",
    )
    assert_matches_oracle(
        eng.sql("SELECT DISTINCT key FROM dec_3"),
        con, "SELECT DISTINCT key FROM dec_3",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, sum(value) AS s FROM dec_3 GROUP BY key"),
        con,
        "SELECT key, CAST(sum(value) AS BIGINT) AS s FROM dec_3 "
        "GROUP BY key",
    )
    # sum over the DECIMAL itself (result scale widens)
    got = {
        (str(r.value), None if r.s is None else float(r.s))
        for r in eng.sql(
            "SELECT value, sum(key) AS s FROM dec_3 GROUP BY value"
        ).collect()
    }
    exp = {
        (str(v), None if s is None else float(s))
        for v, s in con.execute(
            "SELECT value, sum(key) FROM dec_3 GROUP BY value"
        ).fetchall()
    }
    assert got == exp


def test_q_decimal_5_cast_narrowing(qenv):
    """decimal_5.q: cast to bare `decimal` is decimal(10,0); cast to a
    NARROWER decimal(6,3) nulls out values that don't fit (Hive never
    silently truncates the integral part)."""
    eng, _ = qenv
    rows = eng.sql(
        "SELECT cast(key as decimal) AS d10, "
        "cast(key as decimal(6,3)) AS d63, key FROM dec_3"
    ).collect()
    for r in rows:
        if r.key is None:
            assert r.d10 is None and r.d63 is None
            continue
        # decimal(10,0): rounds to integer
        assert r.d10 == round(r.key)
        # decimal(6,3) holds |v| < 1000 at 3 decimals: all D3 fit
        assert r.d63 is not None
    df = eng.sql("SELECT cast(key as decimal) AS d FROM dec_3")
    assert dict(df.dtypes)["d"] == "decimal(10,0)"
    # genuine overflow: 12345678.9 into decimal(6,3) → NULL
    v = eng.sql(
        "SELECT cast(cast('12345678.9' as decimal(20,10)) as "
        "decimal(6,3)) AS d"
    ).collect()[0].d
    assert v is None


def test_q_decimal_6_mixed_scale_union(qenv, spark, tmp_path):
    """decimal_6.q: UNION of decimal(10,5) and decimal(17,4) widens to
    the covering type decimal(18,5)."""
    eng, con = qenv
    p1 = str(tmp_path / "d61")
    p2 = str(tmp_path / "d62")
    spark.sql(
        "SELECT cast(v as decimal(10,5)) AS key, i AS value FROM "
        "VALUES ('1234.5678', 1), ('-12345.123', 2), (NULL, 3) t(v, i)"
    ).coalesce(1).write.parquet(p1)
    spark.sql(
        "SELECT cast(v as decimal(17,4)) AS key, i AS value FROM "
        "VALUES ('1234567890123.1234', 1), ('-1234.5678', 2) t(v, i)"
    ).coalesce(1).write.parquet(p2)
    eng.register_table("dec_6_1", p1)
    eng.register_table("dec_6_2", p2)
    con.execute(
        f"CREATE VIEW dec_6_1 AS SELECT * FROM read_parquet('{p1}/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW dec_6_2 AS SELECT * FROM read_parquet('{p2}/*.parquet')"
    )
    df = eng.sql(
        "SELECT T.key FROM (SELECT key, value from dec_6_1 union all "
        "SELECT key, value from dec_6_2) T order by T.key"
    )
    assert dict(df.dtypes)["key"] == "decimal(18,5)"
    assert_matches_oracle(
        df, con,
        "SELECT CAST(key AS DECIMAL(18,5)) AS key FROM dec_6_1 "
        "UNION ALL SELECT CAST(key AS DECIMAL(18,5)) FROM dec_6_2",
    )


def test_q_decimal_precision_arithmetic(qenv):
    """decimal_precision.q: +/-/*/÷ over decimal(20,10) — values agree
    with the oracle as doubles (division SCALE derivation is
    engine-specific, values must not be)."""
    eng, con = qenv
    got = eng.sql(
        "SELECT dec, dec + 1 AS p1, dec - 1 AS m1, dec * 2 AS t2, "
        "dec / 3 AS d3, dec / 9 AS d9, dec * dec AS sq FROM dec_prec"
    ).collect()
    exp = con.execute(
        "SELECT dec, dec + 1, dec - 1, dec * 2, "
        "CAST(dec AS DOUBLE) / 3, CAST(dec AS DOUBLE) / 9, "
        "CAST(dec AS DOUBLE) * CAST(dec AS DOUBLE) FROM dec_prec "
        "ORDER BY dec"
    ).fetchall()
    got.sort(key=lambda r: r.dec)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert float(g.dec) == pytest.approx(float(e[0]))
        assert float(g.p1) == pytest.approx(float(e[1]))
        assert float(g.m1) == pytest.approx(float(e[2]))
        assert float(g.t2) == pytest.approx(float(e[3]))
        assert float(g.d3) == pytest.approx(e[4], rel=1e-9)
        assert float(g.d9) == pytest.approx(e[5], rel=1e-9)
        assert float(g.sq) == pytest.approx(e[6], rel=1e-9)


def test_q_decimal_join2(qenv):
    """decimal_join2.q: self-join on decimal(38,18) keys."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value "
            "AS v2 FROM dec_3 a JOIN dec_3 b ON (a.key = b.key)"
        ),
        con,
        "SELECT a.key AS k1, a.value AS v1, b.key AS k2, b.value AS "
        "v2 FROM dec_3 a JOIN dec_3 b ON a.key = b.key",
    )


def test_q_decimal_1_1_and_trailing(qenv, spark, tmp_path):
    """decimal_1_1.q + decimal_trailing.q: decimal(1,1) holds only
    |v| < 1 (1.0 overflows to NULL); trailing zeros are preserved at
    the declared scale."""
    eng, _ = qenv
    p = str(tmp_path / "d11")
    spark.sql(
        "SELECT cast(v as decimal(1,1)) AS d FROM VALUES ('0.0'), "
        "('0.5'), ('-0.5'), ('0.9'), ('1.0'), ('-1.0'), (NULL) t(v)"
    ).coalesce(1).write.parquet(p)
    eng.register_table("dec_1_1", p)
    vals = [r.d for r in eng.sql(
        "select d from dec_1_1 order by d desc"
    ).collect()]
    strs = [None if v is None else str(v) for v in vals]
    # 1.0 / -1.0 overflow decimal(1,1) → NULL; NULLs sort last in DESC
    assert strs == ["0.9", "0.5", "0.0", "-0.5", None, None, None]
    row = eng.sql(
        "SELECT cast('0.1' as decimal(10,4)) AS a, "
        "cast('104.0500' as decimal(15,8)) AS b"
    ).collect()[0]
    assert str(row.a) == "0.1000" and str(row.b) == "104.05000000"
