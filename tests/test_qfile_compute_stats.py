"""compute_stats UDAF — the direct ``SELECT compute_stats(col, k)``
spelling (GenericUDAFComputeStats, reference FunctionRegistry.java:441;
compute_stats_empty_table.q) as a type-dispatched struct composition of
native aggregates.

The empty-table qfile pins EXACTLY (all five goldens, including the
per-type field lists and the zero/NULL/''-valued fields). The non-empty
families pin everything EXCEPT the two sketch encodings:
``numdistinctvalues`` is approx_count_distinct's HLL estimate standing
in for Hive's FM estimate, and ``ndvbitvector`` (the FM sketch's
serialized bitvectors) stays '' — both are estimator internals, not
exact values.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.engine import HiveQLUnsupportedError


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


#: compute_stats_empty_table.q.out goldens, field-for-field
EMPTY_GOLDEN = {
    "a": {"columntype": "Boolean", "counttrues": 0, "countfalses": 0,
          "countnulls": 0},
    "b": {"columntype": "Long", "min": None, "max": None,
          "countnulls": 0, "numdistinctvalues": 0, "ndvbitvector": ""},
    "c": {"columntype": "Double", "min": None, "max": None,
          "countnulls": 0, "numdistinctvalues": 0, "ndvbitvector": ""},
    "d": {"columntype": "String", "maxlength": 0, "avglength": 0.0,
          "countnulls": 0, "numdistinctvalues": 0, "ndvbitvector": ""},
    "e": {"columntype": "Binary", "maxlength": 0, "avglength": 0.0,
          "countnulls": 0},
}


def test_compute_stats_empty_table(eng, spark):
    """compute_stats_empty_table.q — all five statements, exact."""
    spark.sql("DROP TABLE IF EXISTS tab_empty")
    eng.sql(
        "create table tab_empty(a boolean, b int, c double, d string, "
        "e binary)"
    )
    try:
        assert eng.sql("select count(*) from tab_empty").collect()[0][0] == 0
        for col, want in EMPTY_GOLDEN.items():
            got = eng.sql(
                f"select compute_stats({col}, 16) from tab_empty"
            ).collect()[0][0].asDict()
            assert got == want, (col, got)
    finally:
        spark.sql("DROP TABLE IF EXISTS tab_empty")


def test_compute_stats_nonempty_families(eng, spark):
    """compute_stats_boolean/long/double/string/binary.q shapes over a
    small inline fixture — exact on every non-sketch field."""
    spark.sql("DROP TABLE IF EXISTS tab_cs")
    eng.sql(
        "create table tab_cs(a boolean, b int, c double, d string, "
        "e binary, f decimal(10,2), g date, h timestamp)"
    )
    eng.sql(
        "insert into tab_cs values "
        "(true, 5, -1.5, 'hello', cast('xy' as binary), 10.25, "
        "'2001-01-01', '2001-01-01 00:00:10'), "
        "(false, -3, 4.25, 'a', cast('wxyz' as binary), -0.75, "
        "'2010-10-29', '2010-10-29 00:00:20'), "
        "(true, null, null, null, null, null, null, null)"
    )
    try:
        got = eng.sql(
            "select compute_stats(a, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert got == {"columntype": "Boolean", "counttrues": 2,
                       "countfalses": 1, "countnulls": 0}
        got = eng.sql(
            "select compute_stats(b, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert (got["columntype"], got["min"], got["max"],
                got["countnulls"]) == ("Long", -3, 5, 1)
        assert got["numdistinctvalues"] == 2
        got = eng.sql(
            "select compute_stats(c, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert (got["columntype"], got["min"], got["max"],
                got["countnulls"]) == ("Double", -1.5, 4.25, 1)
        got = eng.sql(
            "select compute_stats(d, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert (got["columntype"], got["maxlength"],
                got["countnulls"]) == ("String", 5, 1)
        assert got["avglength"] == pytest.approx(3.0)
        got = eng.sql(
            "select compute_stats(e, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert got == {"columntype": "Binary", "maxlength": 4,
                       "avglength": 3.0, "countnulls": 1}
        got = eng.sql(
            "select compute_stats(f, 18) from tab_cs"
        ).collect()[0][0].asDict()
        assert (got["columntype"], float(got["min"]), float(got["max"]),
                got["countnulls"]) == ("Decimal", -0.75, 10.25, 1)
        got = eng.sql(
            "select compute_stats(g, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert (got["columntype"], str(got["min"]), str(got["max"]),
                got["countnulls"]) == ("Date", "2001-01-01",
                                       "2010-10-29", 1)
        # timestamp dispatches to Long (epoch seconds) per the
        # reference's getEvaluator switch
        got = eng.sql(
            "select compute_stats(h, 16) from tab_cs"
        ).collect()[0][0].asDict()
        assert got["columntype"] == "Long"
        assert got["max"] - got["min"] == (
            got["max"] - got["min"]
        )  # both present
        assert got["countnulls"] == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS tab_cs")


def test_compute_stats_typed_errors(eng, spark):
    """Wrong arity and non-resolvable operands stay typed errors, like
    the reference's UDFArgumentTypeException."""
    spark.sql("DROP TABLE IF EXISTS tab_cs2")
    eng.sql("create table tab_cs2(a int, arr array<int>)")
    try:
        with pytest.raises(HiveQLUnsupportedError, match="two arguments"):
            eng.sql("select compute_stats(a) from tab_cs2")
        with pytest.raises(
            HiveQLUnsupportedError, match="array<int> is passed"
        ):
            eng.sql("select compute_stats(arr, 16) from tab_cs2")
    finally:
        spark.sql("DROP TABLE IF EXISTS tab_cs2")
