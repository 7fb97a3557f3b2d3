"""Driver-verifiable entries for the late-r6 continued-session surface
(registered BELOW the frozen r6 window → r7 rotation queue, per the
freeze rule): WINDOW-clause inheritance, string-sort-key RANGE frames,
dynamic-partition catalog INSERT, regex column specifiers, the
MAP/REDUCE transform spelling, and implicit-column bucket TABLESAMPLE.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.suite import query


def _drop_managed(spark: SparkSession, name: str) -> None:
    """DROP + clear the warehouse dir (a stale managed-table directory
    from a killed run would raise LOCATION_ALREADY_EXISTS)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)


@query(
    "window_named_window_inheritance",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
      CAST(SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS s1,
      CAST(SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s2,
      CAST(SUM(p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s3
    FROM part
    ORDER BY p_brand, p_partkey
    """,
)
def window_named_window_inheritance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive WINDOW-clause inheritance (windowing.q tests 32-34;
    PTFTranslator resolves the chain): a definition refining another
    window (``w1 as (w3 rows ...)``), a forward-referencing alias
    (``w2 as w3``), and a use-site frame refinement
    (``over (w3 rows ...)``) — all Spark parse errors, inlined by
    engine.py _rewrite_named_windows on retry. (p_name, p_partkey)
    makes every ROWS frame total, so the running sums are
    deterministic."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(
        """
        select p_brand, p_partkey, p_size,
        sum(p_size) over w1 as s1,
        sum(p_size) over w2 as s2,
        sum(p_size) over (w3 rows between 2 preceding and current row)
          as s3
        from part
        window w1 as (w3 rows between 2 preceding and 2 following),
               w2 as w3,
               w3 as (distribute by p_brand sort by p_name, p_partkey
                      rows between unbounded preceding and current row)
        order by p_brand, p_partkey
        """
    )


@query(
    "window_string_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      CAST(COUNT(l_partkey) OVER (PARTITION BY l_returnflag, l_linestatus)
           AS BIGINT) AS c1,
      SUM(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus)
           AS s1,
      SUM(l_quantity) OVER (PARTITION BY l_returnflag
        ORDER BY l_linestatus
        RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s2
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, c1, s1, s2
    """,
)
def window_string_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded numeric RANGE frames over a STRING sort key
    (cbo_rp_windowing.q line 19): Hive 2.3's StringValueBoundaryScanner
    (ql/.../udf/ptf/ValueBoundaryScanner.java) ignores the amount, so
    the frame degenerates to the peer group — the engine collapses the
    bounds to CURRENT ROW on Spark's frame-type rejection; the oracle
    states the peer-group semantics directly."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(
        """
        select l_orderkey, l_linenumber,
        count(l_partkey) over (partition by l_returnflag
          order by l_linestatus range 1 preceding) as c1,
        sum(l_quantity) over (partition by l_returnflag
          order by l_linestatus
          range between 3 preceding and 2 following) as s1,
        sum(l_quantity) over (partition by l_returnflag
          order by l_linestatus
          range between 1 preceding and unbounded following) as s2
        from lineitem
        order by l_orderkey, l_linenumber, c1, s1, s2
        """
    )


@query(
    "dml_dynamic_partition_insert",
    oracle="""
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal), 2) AS bal
    FROM (
      SELECT c_mktsegment AS seg, c_acctbal FROM customer
      WHERE c_acctbal > 0
      UNION ALL
      SELECT 'NEGATIVE' AS seg, c_acctbal FROM customer
      WHERE c_acctbal <= 0
    ) t
    GROUP BY seg
    ORDER BY seg
    """,
)
def dml_dynamic_partition_insert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic-partition INSERT into a catalog table through the
    FROM-first multi-insert (load_dyn_part1.q shape): one all-dynamic
    branch (``PARTITION (seg)`` — the partition value comes from the
    last select column) and one static branch, one source scan. The
    final-state aggregate equals the oracle computed from the base
    table."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _drop_managed(spark, "dynpart_cust_r6c")
    eng.sql(
        "CREATE TABLE dynpart_cust_r6c (c_custkey BIGINT, "
        "c_acctbal DOUBLE) PARTITIONED BY (seg STRING) STORED AS PARQUET"
    )
    eng.sql(
        """
        FROM customer
        INSERT OVERWRITE TABLE dynpart_cust_r6c PARTITION (seg)
          SELECT c_custkey, c_acctbal, c_mktsegment
          WHERE c_acctbal > 0
        INSERT OVERWRITE TABLE dynpart_cust_r6c PARTITION (seg='NEGATIVE')
          SELECT c_custkey, c_acctbal WHERE c_acctbal <= 0
        """
    )
    return eng.sql(
        "SELECT seg, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal "
        "FROM dynpart_cust_r6c GROUP BY seg ORDER BY seg"
    )


@query(
    "hiveql_regex_columns",
    oracle="""
    SELECT l_orderkey, l_partkey FROM lineitem
    ORDER BY l_orderkey, l_partkey
    """,
)
def hiveql_regex_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex column specifiers (regex_col.q): under
    ``set hive.support.quoted.identifiers=none`` a backticked name is a
    Java regex over the input columns — mapped onto Spark's
    quotedRegexColumnNames; the conf is restored afterward."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("SET hive.support.quoted.identifiers=none")
    try:
        return eng.sql(
            "SELECT `l_(order|part)key` FROM lineitem "
            "ORDER BY l_orderkey, l_partkey"
        )
    finally:
        eng.sql("SET hive.support.quoted.identifiers=column")


@query(
    "stmt_map_transform_spelling",
    oracle="""
    SELECT l_returnflag AS f, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS q
    FROM lineitem GROUP BY l_returnflag ORDER BY f
    """,
)
def stmt_map_transform_spelling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive's MAP spelling of script transform (mapreduce1.q;
    SemanticAnalyzer treats MAP/REDUCE/TRANSFORM identically) — the
    engine normalizes the spelling, the script output is STRING, and
    the aggregate above re-casts."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT f, COUNT(*) AS n, ROUND(SUM(CAST(q AS DOUBLE)), 2) AS q
        FROM (
          MAP l_returnflag, l_quantity USING 'cat' AS (f, q)
          FROM lineitem
        ) t
        GROUP BY f ORDER BY f
        """
    )


@query(
    "tablesample_implicit_bucket",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS s
    FROM orders WHERE o_custkey % 4 = 1
    """,
)
def tablesample_implicit_bucket(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Implicit-column bucket TABLESAMPLE (sample2.q): with no ON
    clause Hive samples the table's CLUSTERED BY column — the engine
    resolves it from the catalog bucket spec (Spark's native clause
    would take a RANDOM row fraction instead). Integral keys hash to
    their value, so BUCKET 2 OUT OF 4 is o_custkey % 4 = 1."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _drop_managed(spark, "orders_bkt_r6c")
    eng.sql(
        "CREATE TABLE orders_bkt_r6c (o_orderkey BIGINT, "
        "o_custkey BIGINT) CLUSTERED BY (o_custkey) INTO 4 BUCKETS "
        "STORED AS PARQUET"
    )
    eng.sql(
        "INSERT INTO orders_bkt_r6c SELECT o_orderkey, o_custkey "
        "FROM orders"
    )
    return eng.sql(
        "SELECT COUNT(*) AS n, SUM(o_orderkey) AS s FROM "
        "orders_bkt_r6c TABLESAMPLE (BUCKET 2 OUT OF 4)"
    )
