"""Driver-verifiable entries for the round-10 surface (registered
inside the r10 window per the freeze rule): schema-resolved
DECIMAL-vs-FLOAT column comparisons (FunctionRegistry.java:836-841
numericTypeList — the common comparison type of decimal and float is
FLOAT), the GenericUDFMask date overload (args 7-9), and the
GenericUDTFCount2 test-jar UDTF through CREATE TEMPORARY FUNCTION +
Hive's SELECT-head invocation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.suite import query


@query(
    "fn_decimal_float_col_compare",
    oracle="""
    SELECT count(*) AS n_match,
           min(l_orderkey) AS min_ok,
           max(l_orderkey) AS max_ok
    FROM (
      SELECT l_orderkey,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS dprice,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS REAL)
               AS fprice
      FROM lineitem
    ) p
    WHERE CAST(dprice AS REAL) = fprice
    """,
)
def fn_decimal_float_col_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """decimal COLUMN = float COLUMN compares AT FLOAT like Hive
    (getCommonClassForComparison walks numericTypeList:
    BYTE<SHORT<INT<LONG<DECIMAL<FLOAT<DOUBLE). Spark compares at
    double and misses every inexact cent fraction; the engine resolves
    both operand schemas and casts the decimal side to float, so ALL
    rows match — which is what the oracle (with its explicit REAL
    cast) counts."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    spark.sql(
        """
        select l_orderkey,
               cast(l_extendedprice as decimal(12,2)) as dprice,
               cast(cast(l_extendedprice as decimal(12,2)) as float)
                 as fprice
        from lineitem
        """
    ).createOrReplaceTempView("decfloat_pairs_r10")
    return eng.sql(
        """
        select count(*) as n_match,
               min(l_orderkey) as min_ok,
               max(l_orderkey) as max_ok
        from decfloat_pairs_r10
        where dprice = fprice
        """
    )


@query(
    "fn_mask_date_fields",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('year', o_orderdate) AS DATE) AS jan1,
           CAST('1900-01-01' AS DATE) AS all_masked,
           CAST(o_orderdate AS DATE) AS kept
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def fn_mask_date_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GenericUDFMask args 7-9 on DATE columns (udf_mask.q's date
    battery): dayValue/monthValue/yearValue with java.sql.Date field
    semantics — masked year N renders 1900+N, months are 0-based,
    -1 keeps the field. (day=1, month=0, year=-1) = Jan 1 of the kept
    year; all-default masking = 1900-01-01; all -1 = identity."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(
        """
        select o_orderkey,
          mask(cast(o_orderdate as date), -1,-1,-1,-1,-1, 1, 0, -1)
            as jan1,
          mask(cast(o_orderdate as date), -1,-1,-1,-1,-1, 0, 0, 0)
            as all_masked,
          mask(cast(o_orderdate as date), -1,-1,-1,-1,-1, -1, -1, -1)
            as kept
        from orders
        where o_orderkey < 200
        order by o_orderkey
        """
    )


@query(
    "op_testjar_udtf_count2",
    oracle="""
    SELECT count(*) AS col1 FROM documents
    UNION ALL
    SELECT count(*) FROM documents
    """,
)
def op_testjar_udtf_count2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GenericUDTFCount2 (contrib/src/java/.../udtf/example/
    GenericUDTFCount2.java) registered through CREATE TEMPORARY
    FUNCTION with the reference's exact AS-string, invoked with Hive's
    SELECT-head UDTF spelling (udtf_nofetchtask.q) — the engine
    rewrites it to Spark's TABLE(...) WITH SINGLE PARTITION form, so
    the count is global and emitted twice."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql(
        "create temporary function udtfCount2 as "
        "'org.apache.hadoop.hive.contrib.udtf.example.GenericUDTFCount2'"
    )
    return eng.sql("select udtfCount2() from documents")
