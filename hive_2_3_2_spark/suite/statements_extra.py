"""Driver-verifiable entries for the round-4 statement surface
(registered BELOW the r4 window → r5 queue): temporary-macro expansion,
SHOW CREATE TABLE, DESCRIBE FORMATTED."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.suite import query
from hive_2_3_2_spark.suite._scratch import _fresh_copy


@query(
    "hiveql_macro_expansion",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net_revenue,
           ROUND(AVG(1.0 / (1.0 + EXP(-l_discount * 10))), 6) AS mean_sig
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def hiveql_macro_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TEMPORARY MACRO through Engine.sql (reference:
    parse/MacroSemanticAnalyzer.java:70): two macros — one composing the
    other inside an aggregate — expand at their call sites before
    parsing; the oracle runs the hand-expanded SQL."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("CREATE TEMPORARY MACRO net(p DOUBLE, d DOUBLE) p * (1 - d)")
    eng.sql(
        "CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + EXP(-x))"
    )
    return eng.sql(
        """
        SELECT l_returnflag,
               ROUND(SUM(net(l_extendedprice, l_discount)), 2)
                 AS net_revenue,
               ROUND(AVG(sigmoid(l_discount * 10)), 6) AS mean_sig
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "ddl_sql_describe_formatted",
    oracle="""
    SELECT * FROM (VALUES
      ('o_orderkey',      'bigint',    0),
      ('o_custkey',       'bigint',    1),
      ('o_orderstatus',   'string',    2),
      ('o_totalprice',    'double',    3),
      ('o_orderdate',     'timestamp', 4),
      ('o_orderpriority', 'string',    5),
      ('# Partition Information', '',  6),
      ('# col_name', 'data_type',      7),
      ('o_orderpriority', 'string',    8),
      ('Table Type', 'EXTERNAL_TABLE', 9),
      ('InputFormat', 'parquet',       10)
    ) AS t(col_name, data_type, ord)
    ORDER BY ord
    """,
)
def ddl_sql_describe_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE FORMATTED through Engine.sql (DDLTask.describeTable +
    MetaDataFormatUtils): data columns, the partition-information
    section, and the detailed-table section. Environment-dependent rows
    (Location, numFiles, totalSize — scratch paths / layout) are
    filtered out so the remainder is a fixed literal oracle; their
    presence is pinned by tests/test_engine_cli.py."""
    path = _fresh_copy(
        spark, sf_dir, "orders", "sql_desc_fmt",
        partition_cols=["o_orderpriority"],
    )
    eng = Engine(spark=spark)
    eng.register_table("orders_desc_fmt", path, ["o_orderpriority"])
    rows = eng.sql("DESCRIBE FORMATTED orders_desc_fmt")
    keep = rows.filter(
        ~F.col("col_name").isin(
            "", "Location", "numFiles", "totalSize",
            "# Detailed Table Information",
        )
    )
    return (
        keep.withColumn("mid", F.monotonically_increasing_id())
        .withColumn("rn", F.row_number().over(Window.orderBy("mid")))
        .select(
            "col_name", "data_type", (F.col("rn") - 1).cast("int").alias("ord")
        )
        .orderBy("ord")
    )


@query(
    "ddl_sql_temp_function",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             AS n_words,
           CASE WHEN doc_len > 0 THEN 'pos' ELSE 'zero' END AS len_sign
    FROM (SELECT doc_id, text, length(text) AS doc_len FROM documents)
    ORDER BY doc_id
    """,
)
def ddl_sql_temp_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TEMPORARY FUNCTION through Engine.sql (reference:
    exec/FunctionTask.java — resolve the AS-string, register under the
    name). The AS-string names an importable Python callable
    (functions/examples.py); the SQL return type derives from its
    annotation. Both registered functions then run inside one SELECT;
    the oracle is the hand-inlined SQL."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql(
        "CREATE TEMPORARY FUNCTION word_cnt AS "
        "'hive_2_3_2_spark.functions.examples.word_count'"
    )
    eng.sql(
        "CREATE TEMPORARY FUNCTION sign_lbl AS "
        "'hive_2_3_2_spark.functions.examples.sign_label'"
    )
    return eng.sql(
        """
        SELECT doc_id,
               word_cnt(text) AS n_words,
               sign_lbl(CAST(length(text) AS DOUBLE)) AS len_sign
        FROM documents
        ORDER BY doc_id
        """
    )


@query(
    "ddl_sql_schema_evolution",
    oracle="""
    SELECT COALESCE(tier, 'legacy') AS tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM (
      SELECT c_acctbal, CAST(NULL AS VARCHAR) AS tier FROM customer
      UNION ALL
      SELECT c_acctbal,
             CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END AS tier
      FROM customer WHERE c_custkey % 10 = 0
    )
    GROUP BY COALESCE(tier, 'legacy')
    ORDER BY tier
    """,
)
def ddl_sql_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMNS through Engine.sql (reference:
    parse/DDLSemanticAnalyzer.java analyzeAlterTableModifyCols —
    metastore-metadata-only): pre-evolution rows read NULL in the new
    column (parquet binds by name), the post-evolution INSERT fills it,
    and the final aggregate groups over the mixed-file-schema table —
    proving the declared-schema overlay governs every read after the
    files diverge."""
    path = _fresh_copy(spark, sf_dir, "customer", "sql_schema_evo")
    eng = Engine(spark=spark)
    eng.register_table("cust_evo", path)
    eng.sql("ALTER TABLE cust_evo ADD COLUMNS (tier STRING)")
    eng.sql(
        "INSERT INTO cust_evo "
        "SELECT c_custkey + 90000000, c_name, c_nationkey, c_acctbal, "
        "c_mktsegment, "
        "CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END "
        "FROM cust_evo WHERE c_custkey % 10 = 0 AND c_custkey < 90000000"
    ).collect()
    return eng.sql(
        """
        SELECT COALESCE(tier, 'legacy') AS tier,
               COUNT(*) AS n,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM cust_evo
        GROUP BY COALESCE(tier, 'legacy')
        ORDER BY tier
        """
    )


@query(
    "ddl_sql_view_stack",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(net), 2) AS revenue
    FROM (
      SELECT l_returnflag,
             l_extendedprice * (1 - l_discount) AS net
      FROM lineitem WHERE l_quantity >= 25
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def ddl_sql_view_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW through Engine.sql (reference:
    parse/SemanticAnalyzer.java createView): a base view with a column
    list over lineitem and a second view stacked on it; the SELECT runs
    against the stack, the oracle against the hand-expanded SQL."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql(
        "CREATE OR REPLACE VIEW v_bulk_items (flag, net) AS "
        "SELECT l_returnflag, l_extendedprice * (1 - l_discount) "
        "FROM lineitem WHERE l_quantity >= 25"
    )
    eng.sql(
        "CREATE OR REPLACE VIEW v_bulk_revenue AS "
        "SELECT flag AS l_returnflag, COUNT(*) AS n, "
        "ROUND(SUM(net), 2) AS revenue "
        "FROM v_bulk_items GROUP BY flag"
    )
    return eng.sql(
        "SELECT l_returnflag, n, revenue FROM v_bulk_revenue "
        "ORDER BY l_returnflag"
    )


@query(
    "ddl_sql_analyze_columns",
    oracle="""
    SELECT * FROM (VALUES
      ('o_custkey',
       CAST(0 AS BIGINT),
       (SELECT CAST(MIN(o_custkey) AS VARCHAR) FROM orders),
       (SELECT CAST(MAX(o_custkey) AS VARCHAR) FROM orders),
       TRUE),
      ('o_orderpriority',
       CAST(0 AS BIGINT),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       TRUE)
    ) AS t(col_name, num_nulls, min, max, ndv_ok)
    ORDER BY col_name
    """,
)
def ddl_sql_analyze_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... FOR COLUMNS through Engine.sql (reference:
    exec/ColumnStatsTask + GenericUDAFComputeStats): one aggregation
    pass computes nulls/NDV/min/max per column. Exact fields (nulls,
    min, max) are value-oracled; the approximate NDV is oracled as an
    invariant boolean (within ±10% of the exact distinct count — HLL++
    at default precision is ~2% RSD, wide margin) — the sketch-entry
    trick, since DuckDB's approx algorithm differs."""
    path = _fresh_copy(spark, sf_dir, "orders", "sql_analyze_cols")
    eng = Engine(spark=spark)
    eng.register_table("orders_acols", path)
    stats = eng.sql(
        "ANALYZE TABLE orders_acols COMPUTE STATISTICS "
        "FOR COLUMNS o_custkey, o_orderpriority"
    )
    exact = eng.table("orders_acols").select(
        F.countDistinct("o_custkey").alias("nd_key"),
        F.countDistinct("o_orderpriority").alias("nd_pri"),
    ).collect()[0]
    bound = {
        "o_custkey": exact.nd_key,
        "o_orderpriority": exact.nd_pri,
    }
    bdf = spark.createDataFrame(
        list(bound.items()), "col_name string, nd_exact long"
    )
    return (
        stats.join(F.broadcast(bdf), "col_name")
        .select(
            "col_name",
            "num_nulls",
            "min",
            "max",
            (
                (F.col("distinct_count")
                 >= (F.col("nd_exact") * 0.9).cast("long"))
                & (F.col("distinct_count")
                   <= (F.col("nd_exact") * 1.1).cast("long") + 1)
            ).alias("ndv_ok"),
        )
        .orderBy("col_name")
    )


@query(
    "ddl_sql_rename_metadata_migration",
    oracle="""
    SELECT COALESCE(chan, 'legacy') AS chan,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM (
      SELECT o_totalprice, CAST(NULL AS VARCHAR) AS chan FROM orders
      UNION ALL
      SELECT o_totalprice, 'web' AS chan FROM orders
      WHERE o_orderkey % 20 = 0
    )
    GROUP BY COALESCE(chan, 'legacy')
    ORDER BY chan
    """,
)
def ddl_sql_rename_metadata_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALTER TABLE RENAME carries the full metastore state (reference:
    exec/DDLTask.java alterTable — the renamed table keeps its cols,
    parameters, and stats): evolve the schema, backfill through INSERT,
    RENAME, then aggregate over the evolved column via the NEW name.
    Pre-r5 the declared-schema overlay stayed under the old key, so the
    evolved column vanished after the rename — the oracle's UNION of
    legacy-NULL and backfilled rows only matches when the overlay
    survived the move."""
    path = _fresh_copy(spark, sf_dir, "orders", "sql_rename_migrate")
    eng = Engine(spark=spark)
    eng.register_table("orders_ren", path)
    eng.sql("ALTER TABLE orders_ren ADD COLUMNS (chan STRING)")
    eng.sql(
        "INSERT INTO orders_ren "
        "SELECT o_orderkey + 90000000, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority, 'web' "
        "FROM orders_ren "
        "WHERE o_orderkey % 20 = 0 AND o_orderkey < 90000000"
    ).collect()
    eng.sql("ALTER TABLE orders_ren RENAME TO orders_ren2")
    return eng.sql(
        """
        SELECT COALESCE(chan, 'legacy') AS chan,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders_ren2
        GROUP BY COALESCE(chan, 'legacy')
        ORDER BY chan
        """
    )


@query(
    "ddl_sql_drop_recreate_latebind_view",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def ddl_sql_drop_recreate_latebind_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive views bind LATE (stored text, expanded at query time —
    parse/SemanticAnalyzer.java createView): a view over a table that is
    DROPPED and re-created must read the NEW table, never its stale
    pre-drop plan. The base table is dropped and re-registered with a
    filtered copy (c_acctbal > 0); the view's aggregate only matches the
    oracle if it re-bound to the recreated data."""
    import os

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.suite._scratch import scratch_root

    path1 = _fresh_copy(spark, sf_dir, "customer", "sql_latebind_v1")
    eng = Engine(spark=spark)
    eng.register_table("cust_lb", path1)
    eng.sql(
        "CREATE OR REPLACE VIEW v_cust_lb AS "
        "SELECT c_mktsegment, COUNT(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal "
        "FROM cust_lb GROUP BY c_mktsegment"
    )
    eng.sql("DROP TABLE cust_lb")
    path2 = os.path.join(
        scratch_root("dml"),
        f"sql_latebind_v2_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    load_table(spark, sf_dir, "customer").filter("c_acctbal > 0").write.mode(
        "overwrite"
    ).parquet(path2)
    eng.register_table("cust_lb", path2)
    return eng.sql("SELECT * FROM v_cust_lb ORDER BY c_mktsegment")


@query(
    "stmt_insert_overwrite_directory",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           NULLIF(MIN(o_orderstatus), 'F') AS status_nf
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def stmt_insert_overwrite_directory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INSERT OVERWRITE DIRECTORY through Engine.sql (reference:
    SemanticAnalyzer's writing-to-path branch; engine.py
    _run_insert_directory): Hive text defaults with an explicit field
    delimiter and ``\\N`` NULL encoding, verified by a full round-trip —
    the directory is written TWICE (the first write with different
    content must vanish: OVERWRITE semantics), then read back as
    delimited text and compared to the DuckDB aggregate computed
    straight from parquet. NULLIF exercises the ``\\N`` path."""
    import os

    from hive_2_3_2_spark.suite._scratch import scratch_root

    dst = os.path.join(
        scratch_root("dml"),
        f"stmt_iod_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql(
        f"INSERT OVERWRITE DIRECTORY '{dst}' "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' "
        "SELECT r_regionkey, r_name FROM region"
    )
    eng.sql(
        f"INSERT OVERWRITE DIRECTORY '{dst}' "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' "
        "SELECT o_orderpriority, COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice), 2) AS total, "
        "NULLIF(MIN(o_orderstatus), 'F') AS status_nf "
        "FROM orders GROUP BY o_orderpriority"
    )
    return (
        spark.read.option("sep", "|")
        .option("nullValue", r"\N")
        .schema(
            "o_orderpriority string, n bigint, total double, "
            "status_nf string"
        )
        .csv(dst)
        .orderBy("o_orderpriority")
    )


@query(
    "stmt_create_temp_table",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer
    WHERE c_mktsegment <> 'BUILDING'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def stmt_create_temp_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TEMPORARY TABLE through Engine.sql (Hive 0.14+
    SemanticAnalyzer isTemporary branch; engine.py
    _run_create_temp_table): session-scoped CTAS seeded with the
    positive-balance half of customer, topped up via INSERT INTO with
    the rest, then thinned with DELETE — temp tables are WRITABLE,
    unlike views. The final aggregate equals the oracle computed from
    the base table with the DELETE predicate folded in."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS tmp_cust_stmt")
    eng.sql(
        "CREATE TEMPORARY TABLE tmp_cust_stmt AS "
        "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer "
        "WHERE c_acctbal > 0"
    )
    eng.sql(
        "INSERT INTO tmp_cust_stmt "
        "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer "
        "WHERE c_acctbal <= 0"
    )
    eng.sql("DELETE FROM tmp_cust_stmt WHERE c_mktsegment = 'BUILDING'")
    return eng.sql(
        "SELECT c_mktsegment, COUNT(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal "
        "FROM tmp_cust_stmt GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


@query(
    "ddl_sql_describe_function",
    oracle="""
    SELECT * FROM (VALUES
      ('matchpath - Hive builtin provided by this engine',            0),
      ('Function class:hive_2_3_2_spark.operators.ptf.match_path (applyInPandas)', 1),
      ('Function type:BUILTIN',                                       2),
      ('Function ''no_such_fn_qx'' does not exist.',                  3),
      ('Function ''reflect2'' does not exist.',                       4),
      ('df_twice(x) - temporary macro',                               5),
      ('Expansion: x + x',                                            6),
      ('Function type:TEMPORARY',                                     7)
    ) AS t(function_desc, ord)
    ORDER BY ord
    """,
)
def ddl_sql_describe_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE FUNCTION [EXTENDED] through Engine.sql (reference:
    exec/DDLTask.java:3040 describeFunction). The oracled slice covers
    the engine-deterministic dispositions: a gap function's synopsis +
    class + type, Hive's exact \"does not exist.\" RESULT row for
    unknown and for skip-listed names (rc 0, like the udf_*.q golden
    openers), and a temporary macro with its expansion. Native-builtin
    synopses (Spark's usage docs) are pytest-pinned instead — their
    text varies by Spark version, which a literal oracle must not."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("CREATE TEMPORARY MACRO df_twice(x DOUBLE) x + x")
    lines: list[str] = []
    for stmt in (
        "DESCRIBE FUNCTION EXTENDED matchpath",
        "DESCRIBE FUNCTION no_such_fn_qx",
        "DESCRIBE FUNCTION reflect2",
        "DESCRIBE FUNCTION EXTENDED df_twice",
    ):
        # metadata-sized collect: DESCRIBE output is a handful of rows
        lines.extend(r.function_desc for r in eng.sql(stmt).collect())
    return spark.createDataFrame(
        list(enumerate(lines)), "ord int, function_desc string"
    ).select("function_desc", "ord")
