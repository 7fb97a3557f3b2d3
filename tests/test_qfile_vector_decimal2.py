"""vector_decimal_2.q golden replay (reference:
ql/src/test/queries/clientpositive/vector_decimal_2.q + .q.out) — the
decimal cast conversion matrix, pinned to the golden VALUES
(UTC-normalized; the .q.out ran in US/Pacific).

Notable Hive semantics pinned here:
- decimal → integral TRUNCATES toward zero then NARROWS with Java
  wraparound (3404045.5044003 as smallint = -3827);
- decimal → boolean is nonzero-ness;
- timestamp → decimal(30,8) is epoch seconds with the fractional part
  (one documented divergence: Spark timestamps are MICROsecond, so the
  golden's 7th fractional digit flattens to 0);
- decimal literals round HALF_UP when narrowed
  (0.99999999999999999999 as decimal(20,19) = 1.0000000000000000000);
- Y/S/L integer-suffix literals and boolean cast to bare DECIMAL
  (= decimal(10,0)).
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def qeng(spark):
    return Engine(spark=spark)


def _one(qeng, expr):
    return qeng.sql(f"select {expr} AS c").collect()[0].c


CASES_1729 = [
    ("boolean", True),
    ("tinyint", 17),
    ("smallint", 17),
    ("int", 17),
    ("bigint", 17),
    ("float", 17.29),
    ("double", 17.29),
    ("string", "17.29"),
]

CASES_BIG = [
    ("boolean", True),
    ("tinyint", 13),          # (byte) 3404045
    ("smallint", -3827),      # (short) 3404045
    ("int", 3404045),
    ("bigint", 3404045),
    ("double", 3404045.5044003),
    # documented divergence: Hive's HiveDecimal.toString STRIPS
    # trailing zeros ('3404045.5044003'); Spark renders the full
    # declared scale — lossless, value-identical formatting
    ("string", "3404045.504400300"),
]


@pytest.mark.parametrize("ty,expected", CASES_1729)
def test_q_vd2_cast_17_29(qeng, ty, expected):
    got = _one(qeng, f"cast(cast('17.29' as decimal(4,2)) as {ty})")
    if isinstance(expected, float):
        assert got == pytest.approx(expected, rel=1e-6)
    else:
        assert got == expected


@pytest.mark.parametrize("ty,expected", CASES_BIG)
def test_q_vd2_cast_3404045(qeng, ty, expected):
    got = _one(
        qeng,
        f"cast(cast('3404045.5044003' as decimal(18,9)) as {ty})",
    )
    if isinstance(expected, float):
        assert got == pytest.approx(expected, rel=1e-9)
    else:
        assert got == expected


def test_q_vd2_float_narrowing(qeng):
    assert _one(qeng, "cast(3.14 as decimal(4,2))") == Decimal("3.14")
    assert _one(
        qeng, "cast(cast(3.14 as float) as decimal(4,2))"
    ) == Decimal("3.14")


def test_q_vd2_timestamp_to_decimal_seconds(qeng):
    """Golden (Pacific) 1355944339.12345670 → UTC 1355915539...; Spark
    timestamps carry microseconds, so the 7th fractional digit is 0
    (documented divergence from Hive's nanosecond Timestamp)."""
    got = _one(
        qeng,
        "cast(cast('2012-12-19 11:12:19.1234567' as timestamp) "
        "as decimal(30,8))",
    )
    assert got == Decimal("1355915539.12345600")


def test_q_vd2_suffix_literals_and_boolean(qeng):
    for expr in ("cast(true as decimal)", "cast(3Y as decimal)",
                 "cast(3S as decimal)", "cast(cast(3 as int) as decimal)",
                 "cast(3L as decimal)"):
        got = _one(qeng, expr)
        assert got == (Decimal(1) if "true" in expr else Decimal(3)), expr


def test_q_vd2_half_up_narrowing(qeng):
    assert _one(
        qeng, "cast(0.99999999999999999999 as decimal(20,19))"
    ) == Decimal("1.0000000000000000000")
    assert _one(
        qeng, "cast('0.99999999999999999999' as decimal(20,20))"
    ) == Decimal("0.99999999999999999999")
