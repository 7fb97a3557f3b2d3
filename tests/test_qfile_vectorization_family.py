"""clientpositive `.q` slice, round 8: the vectorization family —
Hive's vectorized-execution goldens are pure-SQL expression batteries
over alltypesorc, so on this engine they are DIALECT tests: Catalyst's
whole-stage codegen IS the vectorized twin (plan-pinned in
test_plan_regression), and what the goldens actually pin is Hive
expression semantics over every primitive type with heavy NULLs.

Reference: ql/src/test/queries/clientpositive/vectorization_0.q,
vectorization_short_regress.q, vectorized_case.q, vector_empty_where.q
(the last already replayed in test_qfile_union22_partsel).

Shapes replayed vs DuckDB over an identical parquet fixture:
- the vectorization_0 aggregate battery: min/max/count/count(*)/sum
  and Hive's POPULATION-default variance family (std/stddev/variance
  == *_pop — rewritten by the engine, oracled to DuckDB's explicit
  _pop forms) over tinyint/bigint/float columns with NULLs;
- the short_regress compound WHERE: a 4-arm OR mixing numeric,
  string, boolean inequalities AND a TIMESTAMP-vs-numeric comparison
  (``ctimestamp2 > -5``) — Hive compares timestamps to numbers as
  SECONDS-as-double (TimestampWritable.getDouble); the engine's
  BINARY_OP_DIFF_TYPES retry casts the timestamp operand;
- expression-over-aggregate projections (nested negations, mixed
  arithmetic over AVG/STDDEV/VAR/COUNT);
- vectorized_case.q: searched CASE and simple CASE over the same
  column in one select.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# alltypesorc-shaped deterministic fixture: every column nullable with
# a different NULL stride, values spanning sign changes and repeats.
_EPOCH = datetime.datetime(1969, 12, 31, 23, 59, 30)
ROWS = []
for i in range(400):
    ROWS.append((
        # -127..127: ±128 excluded so the oracle's ANSI negation can't
        # overflow (Hive/Spark WRAP on -(-128) — pinned in
        # test_alltypes::test_overflow_wraps_not_errors)
        (i % 255) - 127 if i % 7 else None,                    # ctinyint
        (i * 37 % 20000) - 10000 if i % 5 else None,           # csmallint
        (i * 9176 % 100000) - 50000 if i % 11 else None,       # cint
        (i * 1_000_003) - 200_000_000 if i % 13 else None,     # cbigint
        float((i % 71) - 35) / 4 if i % 3 else None,           # cfloat
        float((i * 17 % 1001) - 500) * 2.5 if i % 17 else None,  # cdouble
        f"s{i % 23}" if i % 4 else None,                       # cstring1
        f"t{i % 31}" if i % 6 else None,                       # cstring2
        _EPOCH + datetime.timedelta(seconds=i - 60)
        if i % 9 else None,                                    # ctimestamp1
        _EPOCH + datetime.timedelta(seconds=(i * 3 % 240) - 120)
        if i % 8 else None,                                    # ctimestamp2
        bool(i % 2) if i % 10 else None,                       # cboolean1
        bool((i // 2) % 2) if i % 12 else None,                # cboolean2
    ))
SCHEMA = (
    "ctinyint tinyint, csmallint smallint, cint int, cbigint bigint, "
    "cfloat float, cdouble double, cstring1 string, cstring2 string, "
    "ctimestamp1 timestamp, ctimestamp2 timestamp, "
    "cboolean1 boolean, cboolean2 boolean"
)


@pytest.fixture(scope="module")
def venv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_vec")
    p = str(root / "alltypes_vec")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(2).write.parquet(p)
    eng = Engine(spark=spark)
    eng.register_table("alltypes_vec", p)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW alltypes_vec AS SELECT * FROM "
        f"read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def _chk(venv, spark_sql, duck_sql=None):
    eng, con = venv
    assert_matches_oracle(eng.sql(spark_sql), con, duck_sql or spark_sql)


def test_q_vectorization_0_minmax_battery(venv):
    """vectorization_0.q head: min/max/count/count(*) per type class."""
    for col in ("ctinyint", "cbigint", "cfloat"):
        _chk(
            venv,
            f"SELECT MIN({col}) AS c1, MAX({col}) AS c2, "
            f"COUNT({col}) AS c3, COUNT(*) AS c4 FROM alltypes_vec",
        )


def test_q_vectorization_0_sum(venv):
    """vectorization_0.q: SUM per type class — Hive sums integrals to
    BIGINT (DuckDB's HUGEINT cast down), floats to DOUBLE."""
    _chk(
        venv,
        "SELECT SUM(ctinyint) AS c1 FROM alltypes_vec",
        "SELECT CAST(SUM(ctinyint) AS BIGINT) AS c1 FROM alltypes_vec",
    )
    _chk(
        venv,
        "SELECT SUM(cbigint) AS c1 FROM alltypes_vec",
        "SELECT CAST(SUM(cbigint) AS BIGINT) AS c1 FROM alltypes_vec",
    )
    _chk(venv, "SELECT SUM(cfloat) AS c1 FROM alltypes_vec")


def test_q_vectorization_0_variance_family(venv):
    """vectorization_0.q: Hive's std/stddev/variance are the
    POPULATION aggregates (FunctionRegistry registers stddev →
    GenericUDAFStd, variance → GenericUDAFVariance) — the engine
    rewrites them to stddev_pop/var_pop; DuckDB's bare stddev/variance
    are the SAMPLE forms, so the oracle spells _pop explicitly."""
    for col in ("ctinyint", "cbigint", "cfloat"):
        _chk(
            venv,
            f"SELECT AVG({col}) AS c1, variance({col}) AS c2, "
            f"var_pop({col}) AS c3, var_samp({col}) AS c4, "
            f"std({col}) AS c5, stddev({col}) AS c6, "
            f"stddev_pop({col}) AS c7, stddev_samp({col}) AS c8 "
            "FROM alltypes_vec",
            f"SELECT AVG({col}) AS c1, var_pop({col}) AS c2, "
            f"var_pop({col}) AS c3, var_samp({col}) AS c4, "
            f"stddev_pop({col}) AS c5, stddev_pop({col}) AS c6, "
            f"stddev_pop({col}) AS c7, stddev_samp({col}) AS c8 "
            "FROM alltypes_vec",
        )


_SHORT_REGRESS_WHERE = (
    "WHERE ((762 = cbigint) "
    "OR ((csmallint < cfloat) AND ((ctimestamp2 > -5) "
    "AND (cdouble != cint))) "
    "OR (cstring1 = 's3') "
    "OR ((cbigint <= -1.389) AND ((cstring2 != 't7') "
    "AND ((79.553 != cint) AND (cboolean2 != cboolean1)))))"
)


def test_q_short_regress_filter_with_ts_numeric(venv):
    """vectorization_short_regress.q first battery: the 4-arm OR
    filter with a TIMESTAMP > numeric arm. Hive evaluates
    ``ctimestamp2 > -5`` as seconds-since-epoch-as-double > -5; DuckDB
    oracle spells it epoch(ctimestamp2) > -5."""
    spark_sql = (
        "SELECT COUNT(*) AS n, AVG(cint) AS a1, SUM(cdouble) AS s1, "
        "STDDEV_POP(cint) AS sd, MIN(ctinyint) AS mn, "
        "COUNT(csmallint) AS cs "
        f"FROM alltypes_vec {_SHORT_REGRESS_WHERE}"
    )
    duck_sql = spark_sql.replace(
        "(ctimestamp2 > -5)", "(epoch(ctimestamp2) > -5)"
    )
    _chk(venv, spark_sql, duck_sql)


def test_q_short_regress_expr_over_aggregates(venv):
    """short_regress projection battery: nested negations and mixed
    arithmetic OVER the aggregates (all double math)."""
    spark_sql = (
        "SELECT AVG(cint) AS c1, (AVG(cint) + -3728) AS c2, "
        "(-((AVG(cint) + -3728))) AS c3, "
        "((-((-((AVG(cint) + -3728))))) * (AVG(cint) + -3728)) AS c4, "
        "(-(AVG(cint))) AS c5, "
        "(STDDEV_POP(cint) - (-((-((AVG(cint) + -3728)))))) AS c6, "
        "((-(STDDEV_POP(cint))) / -563) AS c7, "
        "(AVG(cint) / SUM(cdouble)) AS c8, "
        "(MIN(ctinyint) / ((-(STDDEV_POP(cint))) / -563)) AS c9 "
        "FROM alltypes_vec WHERE cint IS NOT NULL"
    )
    _chk(venv, spark_sql)


def test_q_vectorized_case(venv):
    """vectorized_case.q: searched CASE and simple CASE side by side
    under an OR-of-equalities filter."""
    spark_sql = (
        "SELECT csmallint, "
        "CASE WHEN csmallint = 418 THEN 'a' "
        "WHEN csmallint = 12205 THEN 'b' ELSE 'c' END AS c1, "
        "CASE csmallint WHEN 418 THEN 'a' WHEN 12205 THEN 'b' "
        "ELSE 'c' END AS c2 "
        "FROM alltypes_vec "
        "WHERE csmallint % 1000 = 418 OR csmallint % 1000 = 205 "
        "ORDER BY csmallint"
    )
    _chk(venv, spark_sql)


def test_q_ts_numeric_comparison_semantics(venv):
    """The TIMESTAMP-vs-numeric retry in isolation: boundary
    comparisons both directions, value-diffed against epoch()."""
    for op, num in [(">", -5), ("<=", 0), (">=", 30), ("<", -90)]:
        _chk(
            venv,
            "SELECT COUNT(*) AS n FROM alltypes_vec "
            f"WHERE ctimestamp2 {op} {num}",
            "SELECT COUNT(*) AS n FROM alltypes_vec "
            f"WHERE epoch(ctimestamp2) {op} {num}",
        )
    # reversed operand order
    _chk(
        venv,
        "SELECT COUNT(*) AS n FROM alltypes_vec WHERE -5 < ctimestamp2",
        "SELECT COUNT(*) AS n FROM alltypes_vec "
        "WHERE -5 < epoch(ctimestamp2)",
    )


def test_q_vectorization_13_grouped_battery(venv):
    """vectorization_13.q: aggregates + expressions over a 5-column
    GROUP BY (boolean/tinyint/timestamp/float/string keys), a filter
    mixing float/double bounds, boolean-vs-int (Hive coerces the
    literal to boolean — Spark does the same), and two
    TIMESTAMP-vs-numeric arms. Full ORDER BY + LIMIT for determinism."""
    spark_sql = (
        "SELECT cboolean1, ctinyint, ctimestamp1, cfloat, cstring1, "
        "(-(ctinyint)) AS c1, MAX(ctinyint) AS c2, "
        "((-(ctinyint)) + MAX(ctinyint)) AS c3, SUM(cfloat) AS c4, "
        "(SUM(cfloat) * ((-(ctinyint)) + MAX(ctinyint))) AS c5, "
        "(-(SUM(cfloat))) AS c6, (79.553 * cfloat) AS c7, "
        "STDDEV_POP(cfloat) AS c8, STDDEV_POP(ctinyint) AS c10, "
        "(((-(ctinyint)) + MAX(ctinyint)) - 10.175) AS c11, "
        "(-26.28 / (-((-(SUM(cfloat)))))) AS c13, MAX(cfloat) AS c14, "
        "((SUM(cfloat) * ((-(ctinyint)) + MAX(ctinyint))) / ctinyint) "
        "AS c15, MIN(ctinyint) AS c16 "
        "FROM alltypes_vec "
        "WHERE (((cfloat < 3569) AND ((10.175 >= cdouble) "
        "AND (cboolean1 != 1))) OR ((ctimestamp1 > 11) "
        "AND ((ctimestamp2 != 12) AND (ctinyint < 9763215.5639)))) "
        "GROUP BY cboolean1, ctinyint, ctimestamp1, cfloat, cstring1 "
        # Hive and Spark both default ASC to NULLS FIRST; DuckDB
        # defaults NULLS LAST — spell it so the LIMIT subsets agree
        + "ORDER BY "
        + ", ".join(
            f"{k} NULLS FIRST"
            for k in (
                "cboolean1,ctinyint,ctimestamp1,cfloat,cstring1,c1,c2,"
                "c3,c4,c5,c6,c7,c8,c10,c11,c13,c14,c15,c16".split(",")
            )
        )
        + " LIMIT 40"
    )
    duck_sql = (
        spark_sql
        .replace("(ctimestamp1 > 11)", "(epoch(ctimestamp1) > 11)")
        .replace("(ctimestamp2 != 12)", "(epoch(ctimestamp2) != 12)")
        .replace("(cboolean1 != 1)", "(cboolean1 != true)")
        # Hive/Spark promote FLOAT to DOUBLE under a decimal-literal
        # product; DuckDB would multiply at float32
        .replace(
            "(79.553 * cfloat)", "(79.553 * CAST(cfloat AS DOUBLE))"
        )
    )
    eng, con = venv
    assert_matches_oracle(eng.sql(spark_sql), con, duck_sql)


def test_q_short_regress_like_rlike_battery(venv):
    """short_regress second battery: MAX/VAR_POP/STDDEV arithmetic
    (incl. double %) under a filter with LIKE and RLIKE arms."""
    spark_sql = (
        "SELECT MAX(cint) AS c1, (MAX(cint) / -3728) AS c2, "
        "(MAX(cint) * -3728) AS c3, VAR_POP(cbigint) AS c4, "
        "STDDEV_POP(csmallint) AS c5, "
        "(-563 % (MAX(cint) * -3728)) AS c6, "
        "(VAR_POP(cbigint) / STDDEV_POP(csmallint)) AS c7, "
        "MAX(cdouble) AS c8, AVG(ctinyint) AS c9, MIN(cint) AS c10, "
        "(MAX(cdouble) % -26.28) AS c11, MIN(cdouble) AS c12 "
        "FROM alltypes_vec "
        "WHERE (((cbigint <= 197) AND (cint < cbigint)) "
        "OR ((cdouble >= -26.28) AND (csmallint > cdouble)) "
        "OR ((ctinyint > cfloat) AND (cstring1 RLIKE '.*1.*')) "
        "OR ((cfloat > 79.553) AND (cstring2 LIKE 't1%')))"
    )
    # Hive's % is Java's remainder: the sign FOLLOWS THE DIVIDEND
    # (a - b*trunc(a/b)); DuckDB's fmod floors toward the divisor's
    # sign, so the oracle spells the truncation formula explicitly.
    duck_sql = spark_sql.replace(
        "RLIKE '.*1.*'", "SIMILAR TO '.*1.*'"
    ).replace(
        "(-563 % (MAX(cint) * -3728))",
        "(-563 - (MAX(cint) * -3728) * trunc(-563.0 / "
        "(MAX(cint) * -3728)))",
    ).replace(
        "(MAX(cdouble) % -26.28)",
        "(MAX(cdouble) - (-26.28) * trunc(MAX(cdouble) / (-26.28)))",
    )
    eng, con = venv
    assert_matches_oracle(eng.sql(spark_sql), con, duck_sql)


def test_q_boolean_numeric_comparison(venv):
    """vectorization_6.q / vectorization_12.q filters: BOOLEAN
    compared to a numeric — Hive converts both to DOUBLE
    (GenericUDFBaseCompare.java:141-144: true→1.0, false→0.0), so
    ``cboolean1 <= 0`` means "is false". Oracled with explicit casts."""
    for op, num in [("<=", 0), (">", 0), ("<=", 1), (">=", 1)]:
        _chk(
            venv,
            "SELECT COUNT(*) AS n FROM alltypes_vec "
            f"WHERE cboolean1 {op} {num}",
            "SELECT COUNT(*) AS n FROM alltypes_vec "
            f"WHERE CAST(cboolean1 AS INT) {op} {num}",
        )
    # inside a compound filter with other arms (the golden shape)
    _chk(
        venv,
        "SELECT COUNT(*) AS n, MAX(cfloat) AS mx FROM alltypes_vec "
        "WHERE (cboolean2 > 0 AND csmallint < 100) "
        "OR (cboolean1 <= 0 AND ctinyint > 5)",
        "SELECT COUNT(*) AS n, MAX(cfloat) AS mx FROM alltypes_vec "
        "WHERE (CAST(cboolean2 AS INT) > 0 AND csmallint < 100) "
        "OR (CAST(cboolean1 AS INT) <= 0 AND ctinyint > 5)",
    )
