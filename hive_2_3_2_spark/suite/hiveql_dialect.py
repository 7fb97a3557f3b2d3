"""HiveQL-dialect queries through the Engine.sql facade.

These run the literal SQL text a Hive 2.3.2 user would bring over —
LATERAL VIEW, DISTRIBUTE BY / SORT BY / CLUSTER BY, GROUPING SETS with
GROUPING__ID-style ids, TABLESAMPLE(BUCKET ...) (rewritten by
engine.rewrite_hiveql), multi-way UNION ALL with mixed subqueries —
proving the SQL entry point (parse/HiveParser.g surface) end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.catalog import register_star_schema
from hive_2_3_2_spark.engine import rewrite_hiveql
from hive_2_3_2_spark.suite import query


def _hql(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    register_star_schema(spark, sf_dir)
    return spark.sql(rewrite_hiveql(q, spark=spark))


@query(
    "hiveql_lateral_view",
    oracle="""
    SELECT doc_id, tok
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
          FROM documents) t
    WHERE doc_id < 20 AND tok LIKE 's%'
    """,
)
def hql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode — verbatim Hive syntax
    (exec/LateralViewJoinOperator.java:76)."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT doc_id, tok
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS tok
        WHERE doc_id < 20 AND tok LIKE 's%'
        """,
    )


@query(
    "hiveql_cluster_by",
    oracle="""
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_suppkey
    """,
)
def hql_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY (HiveParser.g:84-89) — verbatim Hive syntax; the global
    row set is order-insensitively identical to the plain aggregate."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT l_suppkey, COUNT(*) AS n
        FROM lineitem GROUP BY l_suppkey
        CLUSTER BY l_suppkey
        """,
    )


@query(
    "hiveql_distribute_sort_by",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders WHERE o_totalprice > 400000
    """,
)
def hql_distribute_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY ... SORT BY — per-reducer clustering, Hive text."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total
        FROM orders WHERE o_totalprice > 400000
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        """,
    )


@query(
    "hiveql_grouping_sets_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def hql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS + grouping_id() — Hive's GROUPING__ID surface
    (parse/HiveParser.g:79-82; FunctionRegistry.java:350)."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS gid
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """,
    )


@query(
    "hiveql_tablesample_bucket",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem WHERE l_orderkey % 4 = 0
    """,
)
def hql_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 1 OUT OF 4 ON l_orderkey) — Hive text, rewritten
    by engine.rewrite_hiveql to the deterministic modulo predicate
    (genSamplePredicate parity; Hive hash(int)=int so pmod(key,4)=0 is the
    exact bucket-1 row set)."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT COUNT(*) AS n
        FROM lineitem TABLESAMPLE(BUCKET 1 OUT OF 4 ON l_orderkey)
        """,
    )


@query(
    "hiveql_tablesample_bucket_string",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def hql_tablesample_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 2 OUT OF 4 ON o_orderpriority) on a STRING key:
    Hive hashes strings with the signed-UTF-8-byte fold
    (ObjectInspectorUtils.hashCode:673, reproduced by functions/
    hive_hash.py) then (hash & MAX_INT) % 4. For the fixed TPC-H
    priority domain, bucket 2's members are exactly {'1-URGENT'
    (-1002256291), '2-HIGH' (1475233373)} — both ≡ 1 mod 4 — which the
    oracle states literally."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders TABLESAMPLE(BUCKET 2 OUT OF 4 ON o_orderpriority)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
    )


@query(
    "hiveql_union_mixed",
    oracle="""
    SELECT 'big' AS kind, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT 'urgent', CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT n_name, CAST(n_nationkey AS BIGINT) FROM nation WHERE n_nationkey < 3
    """,
)
def hql_union_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch UNION ALL mixing aggregates and scans (UnionOperator
    flattening, optimizer UnionProcessor)."""
    return _hql(
        spark,
        sf_dir,
        """
        SELECT 'big' AS kind, COUNT(*) AS n
        FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT 'urgent', COUNT(*)
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT n_name, CAST(n_nationkey AS BIGINT) FROM nation
        WHERE n_nationkey < 3
        """,
    )


@query(
    "hiveql_case_insensitive_keywords",
    oracle="""
    SELECT o_orderstatus, ROUND(AVG(o_totalprice), 4) AS avg_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def hql_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's case-insensitive keywords/identifiers + backtick quoting."""
    return _hql(
        spark,
        sf_dir,
        """
        select `o_orderstatus`, round(AVG(`o_totalprice`), 4) as avg_total
        from ORDERS group by `o_orderstatus`
        """,
    )
