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


def test_hive_clause_order_bucketed_partitioned_external(spark, tmp_path):
    """Hive puts COMMENT / PARTITIONED BY / CLUSTERED BY before STORED
    AS (parse/HiveParser.g createTableStatement); Spark wants USING
    right after the column list. The restructure also folds Hive's
    typed partition columns into the column list (name-only PARTITIONED
    BY) and drops EXTERNAL, which Spark rejects with USING."""
    import pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    for t in ("hq_bkt", "hq_part", "hq_ext"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    eng.sql(
        "CREATE TABLE hq_bkt (k INT, v STRING) CLUSTERED BY (k) "
        "SORTED BY (k) INTO 4 BUCKETS STORED AS PARQUET"
    )
    eng.sql("INSERT INTO hq_bkt VALUES (1, 'a'), (2, 'b')")
    desc = "\n".join(map(str, spark.sql("DESCRIBE EXTENDED hq_bkt").collect()))
    assert "Num Buckets" in desc and "4" in desc
    assert eng.sql("SELECT count(*) AS c FROM hq_bkt").collect()[0].c == 2

    eng.sql(
        "CREATE TABLE hq_part (k INT, v STRING) COMMENT 'demo' "
        "PARTITIONED BY (ds STRING) STORED AS PARQUET"
    )
    eng.sql("INSERT INTO hq_part PARTITION (ds='2024-01-01') VALUES (1, 'a')")
    assert [r.partition for r in spark.sql("SHOW PARTITIONS hq_part").collect()] == [
        "ds=2024-01-01"
    ]
    assert spark.table("hq_part").schema.fieldNames() == ["k", "v", "ds"]

    loc = str(tmp_path / "hq_ext")
    eng.sql(
        f"CREATE EXTERNAL TABLE hq_ext (k INT) STORED AS PARQUET "
        f"LOCATION '{loc}'"
    )
    eng.sql("INSERT INTO hq_ext VALUES (7)")
    assert spark.table("hq_ext").collect()[0].k == 7
    import os

    assert any(f.endswith(".parquet") for f in os.listdir(loc))

    with pytest.raises(HiveQLUnsupportedError, match="typed partition"):
        eng.sql(
            "CREATE TABLE hq_bad PARTITIONED BY (ds STRING) "
            "STORED AS PARQUET AS SELECT 1 AS x"
        )
    for t in ("hq_bkt", "hq_part", "hq_ext"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_uniontype_ddl_struct_encoding(spark):
    """uniontype<...> DDL rewrites to the struct-tag encoding (SURVEY
    §1.3, serdeConstants.java:119); create_union/extract_union write and
    read it."""
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.engine import Engine, rewrite_hiveql
    from hive_2_3_2_spark.functions.gaps import create_union, extract_union

    q = (
        "CREATE TABLE hq_union (k INT, "
        "u UNIONTYPE<INT, STRING, ARRAY<STRING>>) STORED AS PARQUET"
    )
    rewritten = rewrite_hiveql(q, spark=spark)
    assert (
        "struct<tag:tinyint,field0:INT,field1:STRING,field2:ARRAY<STRING>>"
        in rewritten
    )
    spark.sql("DROP TABLE IF EXISTS hq_union")
    eng = Engine(spark=spark)
    eng.sql(q)
    dt = dict(spark.table("hq_union").dtypes)["u"]
    assert dt == "struct<tag:tinyint,field0:int,field1:string,field2:array<string>>"
    # write via create_union, read via extract_union
    src = spark.createDataFrame([(1, 0, 7, None), (2, 1, None, "hi")],
                                "k int, tag int, i int, s string")
    src.select(
        "k",
        create_union(F.col("tag"), F.col("i"), F.col("s"),
                     F.array(F.col("s"))).alias("u"),
    ).write.insertInto("hq_union")
    rows = {
        r.k: (r.t0, r.t1)
        for r in spark.table("hq_union").select(
            "k",
            extract_union(F.col("u"), 0).alias("t0"),
            extract_union(F.col("u"), 1).alias("t1"),
        ).collect()
    }
    assert rows[1] == (7, None)
    assert rows[2] == (None, "hi")
    spark.sql("DROP TABLE hq_union")


def test_analyze_for_columns_and_describe_column(spark, tmp_path):
    """ANALYZE ... FOR COLUMNS computes Hive's column statistics in one
    aggregation pass (nulls, approx NDV, min/max, string lengths) and
    DESCRIBE t col serves them back; unanalyzed columns describe with
    empty stats; unknown columns are typed errors."""
    import pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    path = str(tmp_path / "colstats")
    spark.createDataFrame(
        [(1, "aa", 1.5), (2, "bbbb", None), (3, None, 3.5), (4, "aa", 4.5)],
        "k bigint, s string, v double",
    ).write.parquet(path)
    eng = Engine(spark=spark)
    eng.register_table("cs", path)

    out = {r.col_name: r for r in eng.sql(
        "ANALYZE TABLE cs COMPUTE STATISTICS FOR COLUMNS k, s, v"
    ).collect()}
    assert out["k"].num_nulls == 0 and out["k"].distinct_count == 4
    assert out["k"].min == "1" and out["k"].max == "4"
    assert out["s"].num_nulls == 1 and out["s"].distinct_count == 2
    assert out["v"].num_nulls == 1

    d = {r.info_name: r.info_value for r in eng.sql("DESCRIBE cs s").collect()}
    assert d["data_type"] == "string"
    assert d["num_nulls"] == "1" and d["distinct_count"] == "2"
    assert d["avg_col_len"] == str(round((2 + 4 + 2) / 3, 2))
    assert d["max_col_len"] == "4"
    # numeric column carries min/max
    dk = {r.info_name: r.info_value for r in eng.sql("DESC cs k").collect()}
    assert dk["min"] == "1" and dk["max"] == "4"
    # FOR COLUMNS with no list = all columns
    eng.sql("ANALYZE TABLE cs COMPUTE STATISTICS FOR COLUMNS")
    # un-analyzed table/column: empty stats but valid shape
    path2 = str(tmp_path / "colstats2")
    spark.range(3).write.parquet(path2)
    eng.register_table("cs2", path2)
    d2 = {r.info_name: r.info_value for r in eng.sql("DESCRIBE cs2 id").collect()}
    assert d2["data_type"] == "bigint" and d2["num_nulls"] == ""
    with pytest.raises(HiveQLUnsupportedError, match="unknown column"):
        eng.sql("ANALYZE TABLE cs COMPUTE STATISTICS FOR COLUMNS nope")
    with pytest.raises(HiveQLUnsupportedError, match="no column"):
        eng.sql("DESCRIBE cs nope")
    # basic stats path unchanged
    basic = eng.sql("ANALYZE TABLE cs COMPUTE STATISTICS").collect()[0]
    assert basic.num_rows == 4


def test_show_locks_transactions_compactions_empty_typed(spark):
    """SHOW LOCKS / TRANSACTIONS / COMPACTIONS (DDLTask.showLocks/
    showTxns/showCompactions): single-session non-ACID engine — always
    empty, but with the typed columns tooling binds against."""
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    locks = eng.sql("SHOW LOCKS")
    assert locks.count() == 0
    assert locks.columns[:3] == ["lockid", "database", "tab_name"]
    assert eng.sql("SHOW LOCKS some_table EXTENDED").count() == 0
    txns = eng.sql("SHOW TRANSACTIONS")
    assert txns.count() == 0 and "txnid" in txns.columns
    comp = eng.sql("SHOW COMPACTIONS")
    assert comp.count() == 0 and "compactionid" in comp.columns


def test_show_conf_known_and_unknown(spark):
    """SHOW CONF 'name' (DDLTask.showConf): (default, type, description)
    for known knobs — the DEFAULT, not the session override, exactly
    like Hive — and a typed error for unknown names."""
    import pytest as _pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    row = eng.sql("SHOW CONF 'hive.exec.parallel'").collect()[0]
    assert row.default == "false" and row.type == "BOOLEAN"
    eng.sql("SET hive.exec.parallel=true")
    row2 = eng.sql("SHOW CONF 'hive.exec.parallel'").collect()[0]
    assert row2.default == "false"  # default, not the override
    with _pytest.raises(HiveQLUnsupportedError, match="invalid"):
        eng.sql("SHOW CONF 'hive.no.such.property'")


def test_analyze_noscan_file_stats_only(spark, sf_dir, tmp_path):
    """ANALYZE ... COMPUTE STATISTICS NOSCAN (StatsTask noscan flag):
    file-level stats only — numFiles and totalSize, no row count and
    no data scan."""
    import os

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    p = str(tmp_path / "an_ns")
    load_table(spark, sf_dir, "nation").repartition(2).write.parquet(p)
    eng.register_table("an_ns", p)
    row = eng.sql(
        "ANALYZE TABLE an_ns COMPUTE STATISTICS NOSCAN"
    ).collect()[0]
    n_data = len(
        [f for f in os.listdir(p) if not f.startswith(("_", "."))]
    )
    assert row.num_files == n_data > 0
    assert row.total_size_bytes > 0
    assert "num_rows" not in eng.sql(
        "ANALYZE TABLE an_ns COMPUTE STATISTICS NOSCAN"
    ).columns
    full = eng.sql("ANALYZE TABLE an_ns COMPUTE STATISTICS").collect()[0]
    assert full.num_rows == 25


def test_partitioned_view_lifecycle(spark, sf_dir):
    """CREATE VIEW ... PARTITIONED ON (create_view_partitioned.q,
    SemanticAnalyzer validateCreateView): metadata-only partitions —
    declared as a SUFFIX of the output columns, registered/unregistered
    via ALTER VIEW ADD/DROP PARTITION, listed by SHOW PARTITIONS in
    Hive's col=val format. Query results are unaffected."""
    import pytest as _pytest

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("pv_nation")
    eng.sql(
        "CREATE VIEW pv_v PARTITIONED ON (n_regionkey) AS "
        "SELECT n_name, n_regionkey FROM pv_nation"
    )
    # queries unaffected by view partitions
    assert eng.sql("SELECT * FROM pv_v").count() == 25
    eng.sql("ALTER VIEW pv_v ADD PARTITION (n_regionkey='2')")
    eng.sql("ALTER VIEW pv_v ADD PARTITION (n_regionkey='4')")
    got = [r.partition for r in eng.sql("SHOW PARTITIONS pv_v").collect()]
    assert got == ["n_regionkey=2", "n_regionkey=4"]
    with _pytest.raises(HiveQLUnsupportedError, match="already"):
        eng.sql("ALTER VIEW pv_v ADD PARTITION (n_regionkey='2')")
    eng.sql("ALTER VIEW pv_v ADD IF NOT EXISTS PARTITION (n_regionkey='2')")
    eng.sql("ALTER VIEW pv_v DROP PARTITION (n_regionkey='2')")
    assert [r.partition for r in eng.sql(
        "SHOW PARTITIONS pv_v"
    ).collect()] == ["n_regionkey=4"]
    with _pytest.raises(HiveQLUnsupportedError, match="not registered"):
        eng.sql("ALTER VIEW pv_v DROP PARTITION (n_regionkey='9')")
    # partition cols must be a suffix of the output
    with _pytest.raises(HiveQLUnsupportedError, match="LAST columns"):
        eng.sql(
            "CREATE VIEW pv_bad PARTITIONED ON (n_name) AS "
            "SELECT n_name, n_regionkey FROM pv_nation"
        )
    eng.sql("DROP VIEW pv_v")


def test_skewed_by_ddl_advisory(spark, tmp_path):
    """CREATE TABLE ... SKEWED BY (skewjoinopt1.q): plain SKEWED BY is
    ADVISORY metadata in Hive (the compile-time skew-join hint list);
    runtime skew is AQE's job here, so the clause is accepted and
    dropped. STORED AS DIRECTORIES (list bucketing) changes physical
    layout and stays a typed error."""
    import pytest as _pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS skew_t1")
    eng.sql(
        "CREATE TABLE skew_t1(key STRING, val STRING) "
        "SKEWED BY (key) ON (('2')) STORED AS PARQUET"
    )
    eng.sql("INSERT INTO skew_t1 VALUES ('2', 'a'), ('3', 'b')")
    assert eng.sql("SELECT count(*) AS n FROM skew_t1").collect()[0].n == 2
    spark.sql("DROP TABLE skew_t1")
    with _pytest.raises(HiveQLUnsupportedError, match="DIRECTORIES"):
        eng.sql(
            "CREATE TABLE skew_t2(key STRING) "
            "SKEWED BY (key) ON (('2')) STORED AS DIRECTORIES "
            "STORED AS PARQUET"
        )


def test_create_table_long_form_storage_clauses(spark):
    """r10: Hive's long-form CREATE TABLE storage clauses
    (create_escape.q, groupby_nullvalues.q's parquet serde pair,
    fileformat_text.q's TextInputFormat pair) — ROW FORMAT DELIMITED
    maps to a csv datasource with its delimiters as options, known
    serde classes and INPUTFORMAT/OUTPUTFORMAT pairs map to their
    physical format, custom serde classes are typed errors."""
    import pytest as _pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    for t in ("lf_delim", "lf_pq", "lf_text"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        # DELIMITED with a tab separator and escape char, no STORED AS
        eng.sql(
            "CREATE TABLE lf_delim (a STRING, b STRING) ROW FORMAT "
            "DELIMITED FIELDS TERMINATED BY '\\t' ESCAPED BY '\\\\'"
        )
        eng.sql("INSERT INTO lf_delim VALUES ('x\\ty', 'z')")
        assert [tuple(r) for r in
                eng.sql("select * from lf_delim").collect()] \
            == [("x\ty", "z")]
        # serde + INPUTFORMAT/OUTPUTFORMAT class pair = parquet
        eng.sql(
            "CREATE TABLE lf_pq (c1 int, s1 string) ROW FORMAT SERDE "
            "'org.apache.hadoop.hive.ql.io.parquet.serde."
            "ParquetHiveSerDe' STORED AS INPUTFORMAT "
            "'org.apache.hadoop.hive.ql.io.parquet."
            "MapredParquetInputFormat' OUTPUTFORMAT "
            "'org.apache.hadoop.hive.ql.io.parquet."
            "MapredParquetOutputFormat'"
        )
        eng.sql("INSERT INTO lf_pq VALUES (1, 'a')")
        assert spark.sql(
            "select * from lf_pq"
        ).collect()[0].asDict() == {"c1": 1, "s1": "a"}
        # bare INPUTFORMAT/OUTPUTFORMAT text pair = default-delim csv
        eng.sql(
            "CREATE TABLE lf_text (key INT, value STRING) STORED AS "
            "INPUTFORMAT 'org.apache.hadoop.mapred.TextInputFormat' "
            "OUTPUTFORMAT 'org.apache.hadoop.hive.ql.io."
            "HiveIgnoreKeyTextOutputFormat'"
        )
        eng.sql("INSERT INTO lf_text VALUES (7, 'val_7')")
        assert [tuple(r) for r in
                eng.sql("select * from lf_text").collect()] \
            == [(7, "val_7")]
        with _pytest.raises(HiveQLUnsupportedError, match="custom serde"):
            eng.sql(
                "CREATE TABLE lf_bad (a int) ROW FORMAT SERDE "
                "'org.apache.hadoop.hive.serde2.dynamic_type."
                "DynamicSerDe'"
            )
        with _pytest.raises(
            HiveQLUnsupportedError, match="no Spark datasource"
        ):
            eng.sql(
                "CREATE TABLE lf_seq (a int) STORED AS INPUTFORMAT "
                "'org.apache.hadoop.mapred.SequenceFileInputFormat' "
                "OUTPUTFORMAT 'org.apache.hadoop.mapred."
                "SequenceFileOutputFormat'"
            )
    finally:
        for t in ("lf_delim", "lf_pq", "lf_text"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
