"""UDF/UDAF/UDTF extension API + DDL surface tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hive_2_3_2_spark import ddl
from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.functions.udf_api import (
    grouped_agg_udf,
    row_udtf,
    scalar_udf,
    vector_udf,
)


def test_scalar_and_vector_udf(spark):
    scalar_udf(spark, "py_add1", lambda x: x + 1, "bigint")
    vector_udf(spark, "vec_double", lambda s: s * 2.0, "double")
    row = spark.sql(
        "SELECT py_add1(41) AS a, vec_double(CAST(21.0 AS DOUBLE)) AS b"
    ).collect()[0]
    assert row.a == 42
    assert row.b == 42.0


def test_grouped_agg_udaf(spark, sf_dir):
    grouped_agg_udf(
        spark, "py_geomean", lambda s: float((s.map(float) ** 0.5).mean()), "double"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_u")
    rows = spark.sql(
        """SELECT o_orderstatus, py_geomean(o_totalprice) AS g
           FROM orders_u GROUP BY o_orderstatus"""
    ).collect()
    assert len(rows) >= 2
    assert all(r.g > 0 for r in rows)


def test_python_udtf(spark):
    class Expand:
        def eval(self, x: int):
            yield (x, "a")
            yield (x, "b")

    row_udtf(spark, "expand2", Expand, "k int, tag string")
    got = {(r.k, r.tag) for r in spark.sql("SELECT * FROM expand2(7)").collect()}
    assert got == {(7, "a"), (7, "b")}


def test_ctas_describe_analyze_explain(spark, sf_dir, tmp_path):
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    ddl.drop_table(spark, "nation_ctas")
    ddl.ctas(
        spark,
        "nation_ctas",
        "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey < 10",
    )
    assert spark.table("nation_ctas").count() == 10
    tables = {r.tableName for r in ddl.show_tables(spark).collect()}
    assert "nation_ctas" in tables
    desc = {r.col_name for r in ddl.describe(spark, "nation_ctas").collect()}
    assert {"n_nationkey", "n_name"} <= desc
    ddl.analyze_table(spark, "nation_ctas", ["n_nationkey"])
    stats = spark.sql(
        "DESCRIBE TABLE EXTENDED nation_ctas n_nationkey"
    ).collect()
    got = {r.info_name: r.info_value for r in stats}
    assert got.get("distinct_count") == "10"
    plan = ddl.explain(spark, "SELECT COUNT(*) FROM nation_ctas")
    assert "HashAggregate" in plan or "Aggregate" in plan
    ddl.cache_table(spark, "nation_ctas")
    assert spark.catalog.isCached("nation_ctas")
    ddl.uncache_table(spark, "nation_ctas")
    ddl.drop_table(spark, "nation_ctas")


def test_cbo_uses_stats_for_broadcast(spark, sf_dir):
    """After ANALYZE, the small side auto-broadcasts without a hint
    (CommonJoinResolver parity through pure stats)."""
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "nation_s"
    )
    load_table(spark, sf_dir, "customer").write.mode("overwrite").saveAsTable(
        "customer_s"
    )
    ddl.analyze_table(spark, "nation_s")
    ddl.analyze_table(spark, "customer_s")
    joined = spark.table("customer_s").join(
        spark.table("nation_s"), F.col("c_nationkey") == F.col("n_nationkey")
    )
    from hive_2_3_2_spark.plans import assert_broadcast_join

    assert_broadcast_join(joined)
    ddl.drop_table(spark, "nation_s")
    ddl.drop_table(spark, "customer_s")


def test_describe_function_all_dispositions(spark):
    """DESCRIBE FUNCTION [EXTENDED] — DDLTask.describeFunction parity
    (reference: exec/DDLTask.java:3040). Native names show a synopsis
    under the HIVE name; renamed builtins list synonyms; gap names show
    their providing symbol; skip-listed and unknown names emit Hive's
    exact \"does not exist.\" RESULT ROW (rc 0, like the udf_*.q
    goldens); macros and temporary functions report type TEMPORARY."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)

    txt = lambda stmt: [r.function_desc for r in eng.sql(stmt).collect()]

    native = txt("DESCRIBE FUNCTION concat")
    assert any("concat(" in ln for ln in native)

    ext = txt("DESCRIBE FUNCTION EXTENDED ucase")
    assert any("ucase(" in ln for ln in ext)
    assert any(ln.startswith("Synonyms:") and "upper" in ln for ln in ext)
    assert "Function type:BUILTIN" in ext

    renamed = txt("DESC FUNCTION regexp")
    assert any("regexp(" in ln for ln in renamed)
    assert any("rlike" in ln for ln in renamed if ln.startswith("Synonyms"))

    gap = txt("DESCRIBE FUNCTION EXTENDED matchpath")
    assert any("provided by this engine" in ln for ln in gap)
    assert any(ln.startswith("Function class:") for ln in gap)

    assert txt("DESCRIBE FUNCTION reflect2")[0] == (
        "Function 'reflect2' does not exist."
    )
    assert txt("DESCRIBE FUNCTION no_such_fn_xyz") == [
        "Function 'no_such_fn_xyz' does not exist."
    ]

    eng.sql("CREATE TEMPORARY MACRO df_sq(x DOUBLE) x*x")
    macro = txt("DESCRIBE FUNCTION EXTENDED df_sq")
    assert macro[0] == "df_sq(x) - temporary macro"
    assert "Function type:TEMPORARY" in macro

    eng.sql(
        "CREATE TEMPORARY FUNCTION df_hex AS 'builtins.hex'"
    )
    tf = txt("DESCRIBE FUNCTION EXTENDED df_hex")
    assert tf[0] == "There is no documentation for function 'df_hex'"
    assert "Function type:TEMPORARY" in tf
    eng.sql("DROP TEMPORARY FUNCTION df_hex")
