"""ORC format round-trip, Hive multi-insert, and view DDL —
reference-distinctive surfaces (SURVEY §2.2 ORC; SemanticAnalyzer
multi-insert QB handling; CREATE VIEW via DDLSemanticAnalyzer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.plans import explain_str
from hive_2_3_2_spark.sources import read_orc


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is the reference's flagship columnar format
    (ql/.../io/orc/OrcInputFormat.java) — write/read + predicate pushdown."""
    path = str(tmp_path / "orders_orc")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.orc(path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    filtered = back.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    plan = explain_str(filtered)
    assert "PushedFilters" in plan and "o_totalprice" in plan
    n1 = filtered.count()
    n2 = orders.filter(F.col("o_totalprice") > 400000).count()
    assert n1 == n2


def test_hive_multi_insert(spark, sf_dir, tmp_path):
    """Hive multi-insert: one scan fans out into multiple sinks
    (FROM src INSERT ... INSERT ... — SemanticAnalyzer multi-QB plan,
    the MapOperator multi-alias case). Spark SQL supports the statement
    natively."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_mi")
    spark.sql("DROP TABLE IF EXISTS mi_high")
    spark.sql("DROP TABLE IF EXISTS mi_low")
    spark.sql("CREATE TABLE mi_high (k BIGINT, total DOUBLE) USING parquet")
    spark.sql("CREATE TABLE mi_low  (k BIGINT, total DOUBLE) USING parquet")
    spark.sql(
        """
        FROM orders_mi
        INSERT INTO mi_high SELECT o_orderkey, o_totalprice WHERE o_totalprice > 300000
        INSERT INTO mi_low  SELECT o_orderkey, o_totalprice WHERE o_totalprice <= 300000
        """
    )
    n_high = spark.table("mi_high").count()
    n_low = spark.table("mi_low").count()
    assert n_high + n_low == spark.table("orders_mi").count()
    assert spark.table("mi_high").agg(F.min("total")).collect()[0][0] > 300000
    spark.sql("DROP TABLE mi_high")
    spark.sql("DROP TABLE mi_low")


def test_create_and_query_view(spark, sf_dir):
    """CREATE VIEW / query / ALTER VIEW AS / DROP VIEW
    (DDLSemanticAnalyzer view path)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_v0")
    spark.sql("DROP VIEW IF EXISTS rich_customers")
    spark.sql(
        """CREATE TEMPORARY VIEW rich_customers AS
           SELECT c_custkey, c_name FROM cust_v0 WHERE c_acctbal > 9000"""
    )
    n = spark.table("rich_customers").count()
    assert n > 0
    # view composes with further SQL
    n2 = spark.sql(
        "SELECT COUNT(*) AS n FROM rich_customers WHERE c_custkey % 2 = 0"
    ).collect()[0].n
    assert 0 <= n2 <= n
    spark.sql("DROP VIEW rich_customers")


def test_insert_overwrite_table_semantics(spark, sf_dir):
    """INSERT OVERWRITE TABLE replaces content (MoveTask parity)."""
    spark.sql("DROP TABLE IF EXISTS iot_t")
    spark.sql("CREATE TABLE iot_t (k INT) USING parquet")
    spark.sql("INSERT INTO iot_t VALUES (1), (2), (3)")
    spark.sql("INSERT OVERWRITE TABLE iot_t VALUES (9)")
    assert [r.k for r in spark.table("iot_t").collect()] == [9]
    spark.sql("DROP TABLE iot_t")


def test_hive_stored_as_ddl_rewrites(spark, tmp_path):
    """Hive storage-format DDL (STORED AS / ROW FORMAT DELIMITED) runs
    through Engine.sql via rewrite to Spark datasource DDL — without the
    rewrite Spark rejects these outright in a non-Hive catalog
    (reference DDL surface: parse/DDLSemanticAnalyzer.java)."""
    import pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS hq_ctas")
    spark.sql("DROP TABLE IF EXISTS hq_csv")
    eng.sql("CREATE TABLE hq_ctas STORED AS PARQUET AS SELECT 1 AS x, 'a' AS s")
    assert spark.table("hq_ctas").collect()[0].x == 1
    eng.sql(
        "CREATE TABLE hq_csv (x INT, s STRING) ROW FORMAT DELIMITED "
        "FIELDS TERMINATED BY ',' STORED AS TEXTFILE"
    )
    spark.sql("INSERT INTO hq_csv VALUES (7, 'z')")
    assert spark.table("hq_csv").collect()[0].x == 7
    with pytest.raises(HiveQLUnsupportedError, match="RCFile|SequenceFile"):
        eng.sql("CREATE TABLE hq_rc (x INT) STORED AS RCFILE")
    spark.sql("DROP TABLE hq_ctas")
    spark.sql("DROP TABLE hq_csv")
