"""clientpositive `.q` slice, round 6i: the SQL-callable mask family
(reference: ql/src/test/queries/clientpositive/udf_mask_first_n.q,
udf_mask_last_n.q, udf_mask_show_first_n.q, udf_mask_show_last_n.q,
udf_mask_hash.q; GenericUDFMaskFirstN ff.,
exec/FunctionRegistry.java:531-536). The engine rewrites the family
onto Spark's native string ``mask`` (engine.py _rewrite_mask_family);
STRING-form golden cells are asserted against Hive's own q.out values.

Hive's NUMERIC overload (mask(123, -1,-1,-1,-1,'5') digit-substitutes
then converts back through the input type) and the DATE overload
(args 7-9 rewrite day/month/year with java.sql.Date field semantics)
are both implemented for statically-typed inputs — golden-pinned
below. mask_hash of a NON-string is NULL in Hive; here it hashes the
stringified value for non-literal args (divergence noted).
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark=spark)


def _one(eng, sql):
    return eng.sql(sql).collect()[0][0]


def test_q_mask_first_n_golden(eng):
    assert _one(eng,
        "select mask_first_n('TestString-123', 4, 'X', 'x', '0', ':')"
    ) == "XxxxString-123"
    # defaults: n=4, X/x/n, other kept
    assert _one(eng, "select mask_first_n('TestString-123')") == (
        "XxxxString-123"
    )
    assert _one(eng, "select mask_first_n('TestString-123', 6)") == (
        "XxxxXxring-123"
    )


def test_q_mask_last_n_golden(eng):
    assert _one(eng,
        "select mask_last_n('TestString-123', 4, 'X', 'x', '0', ':')"
    ) == "TestString:000"
    assert _one(eng, "select mask_last_n('TestString-123')") == (
        "TestString-nnn"
    )


def test_q_mask_show_first_n_golden(eng):
    assert _one(eng,
        "select mask_show_first_n('TestString-123', 4, 'X', 'x', '0', ':')"
    ) == "TestXxxxxx:000"
    assert _one(eng, "select mask_show_first_n('TestString-123')") == (
        "TestXxxxxx-nnn"
    )


def test_q_mask_show_last_n_golden(eng):
    assert _one(eng,
        "select mask_show_last_n('TestString-123', 4, 'X', 'x', '0', ':')"
    ) == "XxxxXxxxxx-123"
    assert _one(eng, "select mask_show_last_n('TestString-123')") == (
        "XxxxXxxxxx-123"
    )


def test_q_mask_hash_golden_md5(eng):
    """udf_mask_hash.q: Hive 2.3 hashes with md5 — the exact golden
    digest."""
    assert _one(eng, "select mask_hash('TestString-123')") == (
        "dd78d68ad1b23bde126812482dd70ac6"
    )


def test_q_mask_family_over_column(eng, spark):
    """The rewrites work over columns, not just literals, and stay
    JVM-side (no UDF in the plan)."""
    spark.createDataFrame(
        [("Alice-99",), ("Bob-1",)], "s string"
    ).createOrReplaceTempView("mk_t")
    got = {r.s: r.m for r in eng.sql(
        "select s, mask_show_first_n(s, 3) AS m from mk_t"
    ).collect()}
    assert got == {"Alice-99": "Alixx-nn", "Bob-1": "Bob-n"}
    plan = eng.sql(
        "select mask_first_n(s) AS m from mk_t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q_mask_numeric_overload_golden(spark):
    """udf_mask.q numeric arm: mask(n, -1,-1,-1,-1, '5') masks every
    DIGIT then converts back to the input type — the golden WRAPS:
    555 as tinyint = 43, 55555 as smallint = -9981 (GenericUDFMask
    transformer + type conversion). String inputs with 6 args ignore
    the numberChar; -1 char args mean the Hive defaults."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    row = eng.sql(
        "select mask(cast(123 as tinyint), -1, -1, -1, -1, '5') a, "
        "mask(cast(12345 as smallint), -1, -1, -1, -1, '5') b, "
        "mask(cast(12345 as int), -1, -1, -1, -1, '5') c, "
        "mask(cast(12345 as bigint), -1, -1, -1, -1, '5') d, "
        "mask(-12345, -1, -1, -1, -1, '7') e, "
        "mask('Test-123', -1, -1, -1, -1, '9') f"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (43, -9981, 55555, 55555)
    assert row.e == -77777
    assert row.f == "Xxxx-nnn"


def test_q_mask_date_overload_golden(spark):
    """udf_mask.q date arm (r10): mask(date, ..., dayValue, monthValue,
    yearValue) — java.sql.Date field semantics: masked year N renders
    as 1900+N, monthValue is 0-based, out-of-range day/month fall back
    to the defaults 1/0, -1 keeps the field. All eight golden cells
    from udf_mask.q.out, byte-exact."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    row = eng.sql(
        "select "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 0, 0, 0) a, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, -1, 0, 0) b, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 1, -1, 0) c, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 1, 0, -1) d, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 1, -1, -1) e, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, -1, 0, -1) f, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, -1, -1, 0) g, "
        "mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, -1, -1, -1) h"
    ).collect()[0]
    assert [str(v) for v in row] == [
        "1900-01-01", "1900-01-20", "1900-04-01", "2016-01-01",
        "2016-04-01", "2016-01-20", "1900-04-20", "2016-04-20",
    ]


def test_q_mask_date_overload_day_rollover_and_column(spark):
    """Lenient-calendar day overflow rolls over (Feb + day 31 → Mar 2
    in a leap year, like GregorianCalendar), and the overload works
    over a date COLUMN, not just literals."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    v = eng.sql(
        "select mask(cast('2016-02-10' as date), "
        "-1,-1,-1,-1,-1, 31, -1, -1) a"
    ).collect()[0].a
    assert str(v) == "2016-03-02"
    spark.createDataFrame(
        [("2016-04-20",), ("1999-12-31",)], "d string"
    ).selectExpr("cast(d as date) as d").createOrReplaceTempView(
        "mask_dates"
    )
    rows = eng.sql(
        "select mask(cast(d as date), -1,-1,-1,-1,-1, 1, 0, -1) as m "
        "from mask_dates order by m"
    ).collect()
    assert [str(r.m) for r in rows] == ["1999-01-01", "2016-01-01"]
