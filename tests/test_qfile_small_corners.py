"""clientpositive `.q` slice, round 6h: small parser/semantics corners
(reference: ql/src/test/queries/clientpositive/parenthesis_star_by.q,
order3.q, limit0.q, literal_decimal.q, literal_double.q, null_cast.q,
cbo_gby_empty.q).

- parenthesis_star_by: CLUSTER/SORT/DISTRIBUTE BY accept a
  PARENTHESIZED column tuple — all four forms must return the same
  multiset as the unparenthesized ones;
- order3: GROUP BY / ORDER BY lists containing a CONSTANT literal
  alongside real keys;
- limit0: LIMIT 0 over plain scans, filters, aggregates, and nested
  limited subqueries — always zero rows, never an error;
- literal_decimal/literal_double: BD-suffixed decimal literals and the
  full signed/exponent double literal surface. Divergence: Hive turns
  an out-of-range decimal literal (1E99BD) into NULL; Spark raises a
  typed DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION parse error — a loud
  error beats Hive's silent NULL, kept as-is;
- null_cast: NULL elements in complex constructors take the element
  type of their siblings (array(null, array()) etc.);
- cbo_gby_empty: a global aggregate always emits exactly one row.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_small")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "sc_src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("sc_src", p)
    con.execute(
        f"CREATE VIEW sc_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def test_q_parenthesis_star_by_forms(qenv):
    """parenthesis_star_by.q: all 8 forms (4 directives × bare/
    parenthesized) return the same multiset."""
    eng, con = qenv
    oracle = "SELECT key, value FROM sc_src"
    for directive in (
        "CLUSTER BY key, value", "CLUSTER BY (key, value)",
        "SORT BY key, value", "SORT BY (key, value)",
        "ORDER BY key ASC, value ASC",
    ):
        assert_matches_oracle(
            eng.sql(f"SELECT key, value FROM sc_src {directive}"),
            con, oracle,
        )
    for directive in (
        "DISTRIBUTE BY key, value", "DISTRIBUTE BY (key, value)",
    ):
        assert_matches_oracle(
            eng.sql(
                "SELECT * FROM (SELECT key, value FROM sc_src "
                f"{directive}) t ORDER BY key, value"
            ),
            con, oracle,
        )


def test_q_order3_constant_in_group_and_order_by(qenv):
    """order3.q: a string literal inside GROUP BY and ORDER BY lists."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "SELECT T1.key AS MYKEY, COUNT(T1.value) AS MYVALUE1, "
            "'AAA' AS C FROM sc_src T1 GROUP BY T1.key, 'AAA' "
            "ORDER BY T1.key, 'AAA' LIMIT 3"
        ),
        con,
        "SELECT key AS MYKEY, CAST(count(value) AS BIGINT) AS MYVALUE1, "
        "'AAA' AS C FROM sc_src GROUP BY key ORDER BY key LIMIT 3",
    )


def test_q_limit0_every_shape(qenv):
    """limit0.q: LIMIT 0 over scan/filter/star/aggregate/nested-limit
    — zero rows each, schema intact."""
    eng, _ = qenv
    for q, ncols in (
        ("select key from sc_src limit 0", 1),
        ("select key from sc_src where key = '23' limit 0", 1),
        ("select * from sc_src where key = '23' limit 0", 2),
        ("select sc_src.key, count(sc_src.value) from sc_src "
         "group by sc_src.key limit 0", 2),
        ("select * from ( select key from sc_src limit 3) sq1 limit 0", 1),
    ):
        df = eng.sql(q)
        assert df.count() == 0 and len(df.columns) == ncols, q


def test_q_literal_decimal_and_double(qenv):
    """literal_decimal.q / literal_double.q: BD decimals (in range) and
    the signed/exponent double literal surface."""
    eng, _ = qenv
    r = eng.sql(
        "SELECT -1BD AS a, 0BD AS b, 1BD AS c, 3.14BD AS d, -3.14BD AS e, "
        "99999999999999999BD AS f, 99999999999999999.9999999999999BD AS g"
    ).collect()[0]
    assert str(r.d) == "3.14" and str(r.f) == "99999999999999999"
    r2 = eng.sql(
        "SELECT 3.14 AS a, -3.14 AS b, 3.14e8 AS c, 3.14e-8 AS d, "
        "-3.14e8 AS e, -3.14e-8 AS f, 3.14e+8 AS g, 3.14E8 AS h, "
        "3.14E-8 AS i"
    ).collect()[0]
    assert float(r2.c) == 3.14e8 and float(r2.i) == 3.14e-8
    assert float(r2.e) == -3.14e8


def test_q_null_cast_complex_constructors(qenv):
    """null_cast.q: NULL coerces to the sibling element type inside
    array constructors of scalars, arrays, maps, and structs."""
    eng, _ = qenv
    r = eng.sql(
        "SELECT ARRAY(NULL, 0) AS a, ARRAY(NULL, ARRAY()) AS b, "
        "ARRAY(NULL, MAP()) AS c, ARRAY(NULL, STRUCT(0)) AS d"
    ).collect()[0]
    assert r.a == [None, 0]
    assert r.b[0] is None and r.b[1] == []
    assert r.c[0] is None and r.c[1] == {}
    assert r.d[0] is None and r.d[1][0] == 0


def test_q_cbo_gby_empty_global_aggregate(qenv):
    """cbo_gby_empty.q head: a global aggregate over a derived literal
    key emits exactly one row even with no GROUP BY."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select unionsrc.key AS key, unionsrc.value AS value FROM "
            "(select 'tst1' as key, count(1) as value from sc_src) unionsrc"
        ),
        con,
        "SELECT 'tst1' AS key, CAST(count(1) AS BIGINT) AS value "
        "FROM sc_src",
    )


def test_q_concat_op_precedence_divergence(qenv):
    """concat_op.q — DOCUMENTED DIVERGENCE: Hive (and standard SQL,
    and DuckDB) give `||` the LOWEST binding among arithmetic
    operators, so `9 + 9 || 9 + 9` is '18' || '18' = '1818'. Spark's
    grammar gives `||` the same precedence as +/- (left-assoc), so the
    same text parses as ((9+9)||9)+9 = 198.0. Parenthesized forms
    agree everywhere; this test pins BOTH facts so a Spark grammar
    change is caught."""
    eng, _ = qenv
    assert eng.sql(
        "select (9 + 9) || (9 + 9) AS x"
    ).collect()[0].x == "1818"
    got = eng.sql("select 9 + 9 || 9 + 9 AS x").collect()[0].x
    assert float(got) == 198.0  # Spark's precedence, not Hive's


def test_q_interval_alt_eq_in_precedence(qenv):
    """interval_alt.q: `false = false IN (true, false)` — Hive and
    Spark both parse comparison and IN at the same precedence level
    left-to-right: (false=false) IN (true,false) = true. (DuckDB
    binds IN tighter and answers false — the engines agree with each
    other and with Hive here.)"""
    eng, _ = qenv
    assert eng.sql(
        "select false=false in (true,false) AS x"
    ).collect()[0].x is True


def test_q_parquet_ppd_decimal_comparisons(qenv, spark):
    """parquet_ppd_decimal.q: comparisons against a DECIMAL column
    across literal spellings. The two formerly-documented divergences
    are FIXED in r9 by typeof-dispatched rewrites (Hive returns true
    for both, and now so does the engine):

    - d = CAST('0.22' AS FLOAT): Hive compares decimal-vs-float AT
      FLOAT (numericTypeList puts DECIMAL below FLOAT), so both sides
      round to 0.22f and match; Spark alone widens both to double and
      misses (_rewrite_float_cast_compares).
    - d IN ('0.22'): Hive folds decimal+string through the numeric
      comparison route; Spark's IN coercion picks STRING and silently
      matches nothing (_rewrite_decimal_in_strings).
    """
    eng, _ = qenv
    spark.sql(
        "SELECT CAST(0.22 AS DECIMAL(5,3)) AS d"
    ).createOrReplaceTempView("sc_nt")
    one = lambda q: eng.sql(q).collect()[0][0]  # noqa: E731
    assert one("select d = 0.22 from sc_nt")
    assert one("select d = '0.22' from sc_nt")
    assert one("select d != 11.22 from sc_nt")
    assert one("select d <= 0.22 from sc_nt")
    assert one("select d between 0 and 1 from sc_nt")
    assert one("select d in (0.22, 44.22) from sc_nt")  # unquoted: fine
    # Hive-parity after the r9 rewrites:
    assert one("select d = cast('0.22' as float) from sc_nt")
    assert one("select d in ('0.22', '44.22') from sc_nt")
    assert not one("select d in ('0.23', '44.22') from sc_nt")
    assert not one("select d not in ('0.22', '44.22') from sc_nt")
    # non-decimal operands keep Spark's plan: string IN stays string
    spark.sql("SELECT '0.22' AS s").createOrReplaceTempView("sc_ns")
    assert one("select s in ('0.22') from sc_ns")
    assert not one("select s in ('0.220') from sc_ns")


def test_q_inputddl5_utf8_hex_literal(qenv):
    """inputddl5.q: Hive's charset-prefixed hex literal — SELECT
    count(1) WHERE name = _UTF-8 0xE982B5E993AE compares against the
    decoded UTF-8 string (邵铮)."""
    eng, con = qenv
    row = eng.sql(
        "SELECT '邵铮' = _UTF-8 0xE982B5E993AE AS eq, "
        "_UTF-8 0xE982B5E993AE AS s"
    ).collect()[0]
    assert row.eq is True and row.s == "邵铮"


def test_q_vector_empty_where_nonbool_filter(qenv, spark, tmp_path):
    """vector_empty_where.q: WHERE <non-boolean column> coerces per
    Hive's UDFToBoolean — strings by length != 0, numerics by != 0;
    NULLs filter out."""
    eng, con = qenv
    p = str(tmp_path / "vew")
    spark.createDataFrame(
        [("abc", 1, 1.5), ("", 0, 0.0), (None, None, None),
         ("x", 7, -2.0)],
        "cstring1 string, cint int, cfloat double",
    ).coalesce(1).write.parquet(p)
    eng.register_table("vew_t", p)
    assert eng.sql(
        "select count(cint) AS n from vew_t where cstring1"
    ).collect()[0].n == 2  # 'abc', 'x' (empty + NULL drop)
    assert eng.sql(
        "select count(cint) AS n from vew_t where cint"
    ).collect()[0].n == 2  # 1, 7 (0 and NULL drop)
    assert eng.sql(
        "select count(cint) AS n from vew_t where cfloat"
    ).collect()[0].n == 2  # 1.5, -2.0


def test_q_explain_analyze_actual_rows(qenv):
    """explainanalyze_2.q shape (HIVE-14362): EXPLAIN ANALYZE runs the
    query and annotates operators with ACTUAL row counts — the scan
    row count and the post-filter aggregate count are both visible."""
    eng, con = qenv
    lines = [r.plan for r in eng.sql(
        "EXPLAIN ANALYZE SELECT key, count(*) FROM sc_src "
        "WHERE key < 5 GROUP BY key"
    ).collect()]
    text = "\n".join(lines)
    assert "AdaptiveSparkPlan" in lines[0]
    assert "(rows: " in text
    # the final aggregate's actual group count is annotated
    n_groups = con.execute(
        "SELECT count(DISTINCT key) FROM sc_src WHERE "
        "CAST(key AS DOUBLE) < 5"
    ).fetchone()[0]
    assert f"(rows: {n_groups})" in text
