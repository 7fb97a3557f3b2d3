"""TPC-H-shaped headline queries over the driver's star schema.

These exercise the full scan→filter→join→aggregate→sort pipeline the
reference compiles through SemanticAnalyzer (genTablePlan
parse/SemanticAnalyzer.java:10325, genJoinPlan :8698, genBodyPlan :9756)
and executes with TableScan/Filter/Select/GroupBy/Join/ReduceSink operators
(SURVEY.md §2.1). The whole pipeline is declarative Spark SQL over the
memoized star-schema views: Catalyst plans the shuffles (Exchange =
ReduceSinkOperator, ql/.../exec/ReduceSinkOperator.java:62) and picks join
strategies (broadcast for dims = MapJoinOperator,
ql/.../exec/MapJoinOperator.java:78).

r12 note: these were DataFrame-API chains; each F.* call is a py4j round
trip (~2-8 ms on this host) and plan construction alone cost ~200 ms per
query — a large share of a sub-second benched query. The SQL text parses
JVM-side in one call and produces the same analyzed plan (results verified
identical against the DuckDB oracle; physical plans pinned under
plans/r12/). Broadcast hints make the dimension-side build explicit where
size estimation picked the fact side (q3 broadcast 319k filtered lineitem
rows instead of the 14.5k-row orders⋈customer side at sf0.1).

Scale notes (100 TB): every query below shuffles only on aggregation keys
after pushing filters to the parquet scan; dimension joins broadcast
(region/nation/customer/supplier/part are small relative to fact tables);
the only wide shuffles are fact-side groupBys, which AQE right-sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.catalog import register_star_schema
from hive_2_3_2_spark.suite import query


def _sql(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    register_star_schema(spark, sf_dir)
    return spark.sql(q)


_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 6)                                        AS avg_disc,
       COUNT(1)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 6)                                    AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: scan→filter→hash-agg→sort.

    Catalyst does the partial/final aggregate split automatically
    (= GroupByOperator modes PARTIAL1/FINAL, ql/.../plan/GroupByDesc.java:59).
    """
    return _sql(spark, sf_dir, _Q1)


_Q3 = """
SELECT /*+ BROADCAST(oc) */
       l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM lineitem
JOIN (
  SELECT /*+ BROADCAST(customer) */ o_orderkey, o_orderdate
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15'
) oc ON l_orderkey = oc.o_orderkey
WHERE l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: dim-filter → broadcast join chain → agg → top-K.

    ``customer`` (filtered) broadcasts into ``orders``; the joined
    dimension side broadcasts into ``lineitem`` — explicitly. Without
    the hint Spark's size estimate picked BuildLeft on the FILTERED
    LINEITEM side (319k rows × 3 cols at sf0.1) over the 14.5k-row
    orders⋈customer side (r12 plan audit); the hint pins the
    dimension-side build, which is also the only shape that scales —
    at 100 TB the filtered fact side never fits a broadcast. The final
    orderBy+limit compiles to TakeOrderedAndProject (= ReduceSink
    TopNHash, ql/.../exec/TopNHash.java:45).
    """
    return _sql(spark, sf_dir, _Q3)


_Q5 = """
SELECT /*+ BROADCAST(customer), BROADCAST(supplier), BROADCAST(nation), BROADCAST(region) */
       n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table star join.

    All five dimension joins broadcast (supplier/nation/region/customer are
    tiny next to lineitem at any SF); only the orders↔lineitem equi-join
    can shuffle, and AQE converts it to broadcast when the filtered orders
    side is small. At 100 TB the plan degenerates to exactly one shuffle
    (the groupBy) — same shape Hive reaches only after its bucket-map-join
    optimizers (ql/.../optimizer/ConvertJoinMapJoin.java:78).
    """
    return _sql(spark, sf_dir, _Q5)


_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue: pure scan+filter+global agg — zero shuffle beyond
    the final single-partition reduce. All four predicates push to parquet
    (PushedFilters) — Hive needs its PredicatePushDown rule chain for this
    (ql/.../ppd/PredicatePushDown.java); Catalyst does it natively."""
    return _sql(spark, sf_dir, _Q6)


_Q10 = """
SELECT /*+ BROADCAST(customer), BROADCAST(nation) */
       c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal,
       n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-items report: fact-fact join + dim broadcasts + agg + top-K."""
    return _sql(spark, sf_dir, _Q10)
