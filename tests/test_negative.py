"""Negative-path tests (clientnegative corpus parity, SURVEY §5.1: 802
expected-error .q files) — the engine must fail *cleanly* with typed
analysis/parse errors, not crash or silently mis-execute."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import (
    AnalysisException,
    ParseException,
)

from hive_2_3_2_spark import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def test_syntax_error(eng):
    with pytest.raises(ParseException):
        eng.sql("SELEC * FROM lineitem")


def test_unknown_table(eng):
    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        eng.sql("SELECT * FROM does_not_exist")


def test_unknown_column(eng):
    with pytest.raises(AnalysisException, match="UNRESOLVED_COLUMN"):
        eng.sql("SELECT no_such_col FROM lineitem").collect()


def test_unknown_function(eng):
    with pytest.raises(AnalysisException, match="UNRESOLVED_ROUTINE"):
        eng.sql("SELECT not_a_function(1)").collect()


def test_ambiguous_column(eng):
    with pytest.raises(AnalysisException, match="AMBIGUOUS"):
        eng.sql(
            """SELECT o_orderkey FROM orders a
               JOIN orders b ON a.o_orderkey = b.o_orderkey"""
        ).collect()


def test_group_by_missing_column(eng):
    with pytest.raises(AnalysisException, match="MISSING_AGGREGATION|GROUP"):
        eng.sql(
            "SELECT o_custkey, o_totalprice FROM orders GROUP BY o_custkey"
        ).collect()


def test_union_arity_mismatch(eng):
    with pytest.raises(AnalysisException, match="NUM_COLUMNS_MISMATCH|UNION"):
        eng.sql(
            "SELECT 1 UNION ALL SELECT 1, 2"
        ).collect()


def test_invalid_cast_yields_null_not_error(eng):
    """Hive permissiveness: a *value* that can't cast gives NULL (only
    structural errors raise) — the positive twin of the negative corpus."""
    row = eng.sql("SELECT CAST('not_a_number' AS INT) AS v").collect()[0]
    assert row.v is None


def test_scalar_subquery_multiple_rows_errors(eng):
    """sq_count_check parity (FunctionRegistry.java:253): a scalar
    subquery returning >1 row is a runtime error in both engines."""
    with pytest.raises(Exception, match="SCALAR_SUBQUERY_TOO_MANY_ROWS"):
        eng.sql(
            """SELECT * FROM nation
               WHERE n_nationkey = (SELECT n_nationkey FROM nation)"""
        ).collect()


def test_tablesample_unhashable_key_raises(eng):
    """Non-integral, non-string bucket keys (date/double/...) have no
    Hive hash emulation — must raise typed, not silently mis-sample."""
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    with pytest.raises(HiveQLUnsupportedError, match="bucket-hash"):
        eng.sql(
            "SELECT COUNT(*) AS n FROM orders "
            "TABLESAMPLE(BUCKET 1 OUT OF 4 ON o_orderdate)"
        )


def test_tablesample_string_key_hive_hash_parity(eng):
    """String bucket keys use the ObjectInspectorUtils.hashCode byte fold
    ((hash & MAX_INT) % y). For the fixed TPC-H priority domain the
    bucket-2-of-4 members are exactly {'1-URGENT','2-HIGH'} (hashes
    -1002256291 and 1475233373, both ≡ 1 mod 4 after the sign mask)."""
    got = eng.sql(
        "SELECT DISTINCT o_orderpriority AS p FROM orders "
        "TABLESAMPLE(BUCKET 2 OUT OF 4 ON o_orderpriority) ORDER BY p"
    ).collect()
    assert [r.p for r in got] == ["1-URGENT", "2-HIGH"]


def test_tablesample_survives_where_alias_join(eng):
    """The subquery rewrite must compose with an existing WHERE clause,
    an alias, and a following join (the appended-WHERE rewrite broke all
    three)."""
    n = eng.sql(
        """
        SELECT COUNT(*) AS n
        FROM lineitem TABLESAMPLE(BUCKET 1 OUT OF 4 ON l_orderkey) li
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 0
        """
    ).collect()[0].n
    expected = eng.sql(
        """
        SELECT COUNT(*) AS n FROM lineitem li
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        WHERE pmod(li.l_orderkey, 4) = 0 AND o.o_totalprice > 0
        """
    ).collect()[0].n
    assert n == expected and n > 0


def test_virtual_block_offset_raises_typed(eng):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    with pytest.raises(HiveQLUnsupportedError, match="BLOCK__OFFSET"):
        eng.sql("SELECT BLOCK__OFFSET__INSIDE__FILE FROM lineitem")
