"""SQL-string DML through the Engine front-end (DELETE FROM / UPDATE SET
routed to the staged-rewrite helpers — UpdateDeleteSemanticAnalyzer
parity at the Driver.run entry point)."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError


@pytest.fixture()
def eng_with_copy(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "customer_copy.parquet")
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.parquet(dst)
    eng = Engine(spark=spark)
    eng.register_table("customer_copy", dst)
    return eng


def test_sql_delete_where(eng_with_copy):
    eng = eng_with_copy
    before = eng.table("customer_copy").count()
    victims = eng.table("customer_copy").filter("c_acctbal < 0").count()
    res = eng.sql("DELETE FROM customer_copy WHERE c_acctbal < 0").collect()
    assert res[0].rows_affected == victims
    after = eng.table("customer_copy")
    assert after.count() == before - victims
    assert after.filter("c_acctbal < 0").count() == 0


def test_sql_update_with_commas_and_null_cond(eng_with_copy):
    eng = eng_with_copy
    # NULL condition rows must be untouched; SET exprs contain top-level
    # commas inside function calls
    res = eng.sql(
        "UPDATE customer_copy "
        "SET c_name = concat('x', c_name), c_acctbal = c_acctbal + 1 "
        "WHERE if(c_custkey % 3 = 0, true, "
        "if(c_custkey % 3 = 1, false, cast(null as boolean)))"
    ).collect()
    t = eng.table("customer_copy")
    hit = t.filter("c_custkey % 3 = 0")
    assert res[0].rows_affected == hit.count()
    assert hit.filter("c_name NOT LIKE 'x%'").count() == 0
    # both false and NULL rows untouched
    assert t.filter("c_custkey % 3 != 0 AND c_name LIKE 'x%'").count() == 0


def test_sql_dml_unregistered_table_raises(spark):
    eng = Engine(spark=spark)
    with pytest.raises(HiveQLUnsupportedError, match="register_table"):
        eng.sql("DELETE FROM nosuch WHERE 1=1")


def test_sql_select_still_passes_through(eng_with_copy):
    eng = eng_with_copy
    df = eng.sql("SELECT count(*) AS n FROM customer_copy")
    assert df.collect()[0].n > 0
