"""CLI command-processor parity through Engine.sql / run_script.

The reference CLI dispatches non-SQL commands to dedicated processors
(reference: ql/.../processors/CommandProcessorFactory.java:59 — SET →
SetProcessor.java:91, ADD/LIST/DELETE → *ResourceProcessor, RESET →
ResetProcessor, SOURCE → CliDriver.processFile:436, dfs → DfsProcessor,
``!`` → CliDriver.processCmd shell escape) and substitutes ``${...}``
variables into every command (VariableSubstitution). These tests pin the
same surface on Engine.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError


@pytest.fixture()
def eng(spark):
    e = Engine(spark=spark)
    yield e
    # SET may have touched live Spark conf — restore the pieces these
    # tests change so the shared session is unpolluted.
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
    )


def test_set_get_list_roundtrip(eng):
    eng.sql("SET my.var=hello world")
    row = eng.sql("SET my.var").collect()[0]
    assert (row.name, row.value) == ("my.var", "hello world")
    names = {r.name for r in eng.sql("SET").collect()}
    assert "my.var" in names
    # undefined name → NULL value, not an error (Hive prints 'undefined')
    row = eng.sql("SET not.set.ever").collect()[0]
    assert row.value is None


def test_set_hiveconf_prefix_and_reset(eng):
    eng.sql("SET hiveconf:a.b=1")
    assert eng.sql("SET a.b").collect()[0].value == "1"
    eng.sql("RESET")
    assert eng.sql("SET a.b").collect()[0].value is None


def test_set_spark_conf_forwarded(eng):
    eng.sql("SET spark.sql.shuffle.partitions=7")
    assert eng.spark.conf.get("spark.sql.shuffle.partitions") == "7"
    eng.sql("SET spark.sql.shuffle.partitions=32")


def test_set_auto_convert_join_controls_broadcast(eng, sf_dir):
    eng.register_table("nation_cli", f"{sf_dir}/nation.parquet")
    eng.register_table("region_cli", f"{sf_dir}/region.parquet")
    q = (
        "SELECT n_name, r_name FROM nation_cli JOIN region_cli "
        "ON n_regionkey = r_regionkey"
    )
    eng.sql("SET hive.auto.convert.join=false")
    plan_off = eng.explain(q)
    assert "BroadcastHashJoin" not in plan_off
    eng.sql("SET hive.auto.convert.join=true")
    plan_on = eng.explain(q)
    assert "BroadcastHashJoin" in plan_on


def test_variable_substitution_in_select(eng, sf_dir):
    eng.sql("SET lim=3")
    eng.register_table("nation_sub", f"{sf_dir}/nation.parquet")
    out = eng.sql(
        "SELECT n_name FROM nation_sub ORDER BY n_name LIMIT ${hiveconf:lim}"
    ).collect()
    assert len(out) == 3
    # substitution reaches string literals too (pure text substitution)
    v = eng.sql("SELECT '${lim}' AS v").collect()[0].v
    assert v == "3"


def test_variable_substitution_unbound_and_disabled(eng):
    with pytest.raises(HiveQLUnsupportedError, match="unbound"):
        eng.sql("SELECT '${never.bound}' AS v")
    eng.sql("SET hive.variable.substitute=false")
    v = eng.sql("SELECT '${never.bound}' AS v").collect()[0].v
    assert v == "${never.bound}"
    eng.sql("SET hive.variable.substitute=true")
    with pytest.raises(HiveQLUnsupportedError, match="env"):
        eng.sql("SELECT '${env:NO_SUCH_ENV_VAR_XYZ}' AS v")
    # system: resolves from the emulated JVM/QTestUtil property map;
    # unbound system properties stay typed errors
    v = eng.sql("SELECT '${system:hive.version}' AS v").collect()[0].v
    assert v == "2.3.2"
    with pytest.raises(HiveQLUnsupportedError, match="system"):
        eng.sql("SELECT '${system:no.such.prop.xyz}' AS v")


def test_set_inside_script_binds_later_statements(eng, sf_dir):
    eng.register_table("region_scr", f"{sf_dir}/region.parquet")
    results = eng.run_script(
        """
        SET k=2;
        SELECT r_name FROM region_scr ORDER BY r_name LIMIT ${hiveconf:k};
        """
    )
    assert len(results[-1].collect()) == 2


def test_add_list_delete_file(eng, tmp_path):
    f1 = tmp_path / "script_one.sh"
    f1.write_text("echo hi\n")
    f2 = tmp_path / "extra.txt"
    f2.write_text("x\n")
    eng.sql(f"ADD FILE {f1}")
    eng.sql(f"ADD FILES {f2}")
    listed = [r.resource for r in eng.sql("LIST FILES").collect()]
    assert str(f1) in listed and str(f2) in listed
    eng.sql(f"DELETE FILE {f2}")
    listed = [r.resource for r in eng.sql("LIST FILES").collect()]
    assert str(f2) not in listed
    # jars tracked separately
    eng.sql(f"ADD JAR {f1}")
    assert [r.resource for r in eng.sql("LIST JARS").collect()] == [str(f1)]


def test_add_file_missing_path_typed_error(eng):
    with pytest.raises(HiveQLUnsupportedError, match="does not exist"):
        eng.sql("ADD FILE /no/such/file.bin")
    with pytest.raises(HiveQLUnsupportedError, match="at least one"):
        eng.sql("ADD FILE")


def test_source_runs_nested_script(eng, sf_dir, tmp_path):
    script = tmp_path / "init.sql"
    script.write_text(
        "SET who=world;\nSELECT 'hello ${hiveconf:who}' AS greeting;\n"
    )
    out = eng.sql(f"SOURCE {script}").collect()
    assert out[0].greeting == "hello world"
    with pytest.raises(HiveQLUnsupportedError, match="not found"):
        eng.sql("SOURCE /no/such/script.sql")


def test_dfs_and_shell_escape_typed_errors(eng):
    with pytest.raises(HiveQLUnsupportedError, match="dfs"):
        eng.sql("dfs -ls /tmp")
    with pytest.raises(HiveQLUnsupportedError, match="shell"):
        eng.sql("!ls /tmp")


def test_run_script_variables_param_still_works(eng, sf_dir):
    eng.register_table("region_var", f"{sf_dir}/region.parquet")
    results = eng.run_script(
        "SELECT r_name FROM region_var ORDER BY r_name LIMIT ${hiveconf:n};",
        variables={"n": "1"},
    )
    assert len(results[0].collect()) == 1


def test_delete_from_still_dml_not_resource(eng, spark, sf_dir, tmp_path):
    # DELETE FROM must keep routing to DML, not the DELETE FILE processor
    dst = str(tmp_path / "region_copy.parquet")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(dst)
    eng.register_table("region_del", dst)
    res = eng.sql("DELETE FROM region_del WHERE r_regionkey = 0").collect()
    assert res[0].rows_affected == 1


def test_show_create_table_and_describe(eng, spark, sf_dir, tmp_path):
    # partitioned copy so both the partition section and location show up
    from pyspark.sql import functions as F

    dst = str(tmp_path / "orders_part")
    spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    ).write.partitionBy("o_year").parquet(dst)
    eng.register_table("orders_part", dst, partition_cols=["o_year"])
    ddl = eng.sql("SHOW CREATE TABLE orders_part").collect()[0].createtab_stmt
    assert "CREATE EXTERNAL TABLE `orders_part`" in ddl
    assert "PARTITIONED BY (" in ddl and "`o_year`" in ddl
    assert f"'{dst}'" in ddl and "STORED AS PARQUET" in ddl
    # partition col must NOT be in the data-column block
    assert ddl.index("`o_orderkey`") < ddl.index("PARTITIONED BY")

    plain = eng.sql("DESCRIBE orders_part").collect()
    names = [r.col_name for r in plain]
    assert "o_orderkey" in names and "o_year" in names
    fmt = eng.sql("DESCRIBE FORMATTED orders_part").collect()
    labels = [r.col_name for r in fmt]
    assert "# Partition Information" in labels
    assert "# Detailed Table Information" in labels
    loc = next(r for r in fmt if r.col_name == "Location")
    assert loc.data_type == dst
    nf = next(r for r in fmt if r.col_name == "numFiles")
    assert int(nf.data_type) > 0


def test_show_create_unregistered_falls_through(eng):
    # not registered -> passthrough -> Spark raises its own error
    import pyspark.errors

    with pytest.raises(Exception) as ei:
        eng.sql("SHOW CREATE TABLE never_registered_tbl")
    assert not isinstance(ei.value, HiveQLUnsupportedError)


def test_create_temporary_macro(eng, sf_dir):
    eng.register_table("nation_mac", f"{sf_dir}/nation.parquet")
    eng.sql("CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0/(1.0+EXP(-x))")
    row = eng.sql("SELECT sigmoid(0.0) AS s").collect()[0]
    assert abs(row.s - 0.5) < 1e-12
    # argument expression substituted, not evaluated textually-naively
    row = eng.sql("SELECT sigmoid(1.0 - 1.0) AS s").collect()[0]
    assert abs(row.s - 0.5) < 1e-12
    # macros compose with table columns and other macros
    eng.sql("CREATE TEMPORARY MACRO twice(y DOUBLE) sigmoid(y) * 2")
    out = eng.sql(
        "SELECT n_nationkey, twice(CAST(n_nationkey AS DOUBLE)) AS t "
        "FROM nation_mac ORDER BY n_nationkey LIMIT 1"
    ).collect()[0]
    assert abs(out.t - 1.0) < 1e-12  # sigmoid(0)*2
    # zero-arg macro
    eng.sql("CREATE TEMPORARY MACRO fixed_seed() 42")
    assert eng.sql("SELECT fixed_seed() AS v").collect()[0].v == 42
    # drop removes it -> Spark resolution error, not silent expansion
    eng.sql("DROP TEMPORARY MACRO sigmoid")
    with pytest.raises(Exception):
        eng.sql("SELECT sigmoid(0.0) AS s").collect()


def test_macro_validation_errors(eng):
    with pytest.raises(HiveQLUnsupportedError, match="duplicate formal"):
        eng.sql("CREATE TEMPORARY MACRO bad(x INT, x INT) x + x")
    eng.sql("CREATE TEMPORARY MACRO addone(x INT) x + 1")
    with pytest.raises(HiveQLUnsupportedError, match="expects 1"):
        eng.sql("SELECT addone(1, 2) AS v")
    # self-referential macro -> bounded expansion, typed error
    eng.sql("CREATE TEMPORARY MACRO loopy(x INT) loopy(x)")
    with pytest.raises(HiveQLUnsupportedError, match="depth"):
        eng.sql("SELECT loopy(1) AS v")


def test_sql_async_concurrent_statements(eng, sf_dir):
    """HS2 parity (SQLOperation async pool): concurrent statements run
    on background threads, each future resolving to a materialized
    result; session state (SET) is shared like one HS2 session."""
    eng.register_table("orders_async", f"{sf_dir}/orders.parquet")
    futs = [
        eng.sql_async(
            "SELECT o_orderstatus, count(*) AS n FROM orders_async "
            "GROUP BY o_orderstatus"
        ),
        eng.sql_async("SELECT count(*) AS n FROM orders_async"),
        eng.sql_async("SET async.probe=1"),
    ]
    g = {r.o_orderstatus: r.n for r in futs[0].result(120).collect()}
    total = futs[1].result(120).collect()[0].n
    futs[2].result(120)
    assert sum(g.values()) == total > 0
    assert eng.sql("SET async.probe").collect()[0].value == "1"


def test_create_temporary_function_plain_callable(eng, sf_dir):
    # FunctionTask parity: AS-string resolves to an importable Python
    # callable; SQL type derives from the return annotation.
    eng.sql(
        "CREATE TEMPORARY FUNCTION wc AS "
        "'hive_2_3_2_spark.functions.examples.word_count'"
    )
    eng.register_table("docs_fn", f"{sf_dir}/documents.parquet")
    rows = eng.sql(
        "SELECT doc_id, wc(text) AS n FROM docs_fn ORDER BY doc_id LIMIT 3"
    ).collect()
    assert all(isinstance(r.n, int) for r in rows)
    expected = [
        len(r.text.split())
        for r in eng.sql(
            "SELECT text FROM docs_fn ORDER BY doc_id LIMIT 3"
        ).collect()
    ]
    assert [r.n for r in rows] == expected


def test_create_temporary_function_prebuilt_udf(eng):
    # A prebuilt pandas_udf registers as-is (Arrow fast path).
    eng.sql(
        "CREATE TEMPORARY FUNCTION twice_it AS "
        "'hive_2_3_2_spark.functions.examples.twice'"
    )
    assert (
        eng.sql("SELECT twice_it(CAST(21.0 AS DOUBLE)) AS v").collect()[0].v
        == 42.0
    )


def test_drop_temporary_function(eng):
    eng.sql(
        "CREATE TEMPORARY FUNCTION sgn AS "
        "'hive_2_3_2_spark.functions.examples.sign_label'"
    )
    assert eng.sql("SELECT sgn(-3.5) AS v").collect()[0].v == "neg"
    eng.sql("DROP TEMPORARY FUNCTION sgn")
    assert "sgn" not in eng.functions
    with pytest.raises(Exception):
        eng.sql("SELECT sgn(1.0)").collect()
    # unknown without IF EXISTS → typed; with IF EXISTS → no-op
    with pytest.raises(HiveQLUnsupportedError):
        eng.sql("DROP TEMPORARY FUNCTION never_was")
    eng.sql("DROP TEMPORARY FUNCTION IF EXISTS never_was")


def test_create_function_validation_errors(eng):
    with pytest.raises(HiveQLUnsupportedError, match="TEMPORARY"):
        eng.sql("CREATE FUNCTION f AS 'math.sqrt'")
    with pytest.raises(HiveQLUnsupportedError, match="USING"):
        eng.sql(
            "CREATE TEMPORARY FUNCTION f AS 'math.sqrt' USING JAR 'x.jar'"
        )
    with pytest.raises(HiveQLUnsupportedError, match="unqualified"):
        eng.sql("CREATE TEMPORARY FUNCTION db.f AS 'math.sqrt'")
    with pytest.raises(HiveQLUnsupportedError, match="cannot resolve"):
        eng.sql("CREATE TEMPORARY FUNCTION f AS 'no.such_module.fn'")
    with pytest.raises(HiveQLUnsupportedError, match="non-callable"):
        eng.sql("CREATE TEMPORARY FUNCTION f AS 'math.pi'")


def test_show_functions_lists_temp_functions_and_macros(eng):
    eng.sql(
        "CREATE TEMPORARY FUNCTION wcount2 AS "
        "'hive_2_3_2_spark.functions.examples.word_count'"
    )
    eng.sql("CREATE TEMPORARY MACRO add_onex(x INT) x + 1")
    col = eng.sql("SHOW FUNCTIONS").columns[0]
    names = {r[0] for r in eng.sql("SHOW FUNCTIONS").collect()}
    assert "wcount2" in names  # Spark lists temp UDFs natively
    assert "add_onex" in names  # macros unioned in (FunctionRegistry parity)
    assert "upper" in names  # builtins still present
    filtered = {r[0] for r in eng.sql("SHOW FUNCTIONS LIKE 'add_*'").collect()}
    assert "add_onex" in filtered
    assert "upper" not in filtered
    del col


def test_grouping_id_virtual_column(eng, sf_dir):
    """Legacy GROUPING__ID == Spark grouping_id() (Hive 2.3 big-endian
    bitset, exec/GroupByOperator.java:181 — first grouping column is the
    most significant bit, 1 = aggregated)."""
    eng.register_table("orders_gid", f"{sf_dir}/orders.parquet")
    rows = eng.sql(
        "SELECT o_orderstatus, o_orderpriority, GROUPING__ID AS gid, "
        "count(*) AS n FROM orders_gid "
        "GROUP BY o_orderstatus, o_orderpriority WITH ROLLUP "
        "ORDER BY gid, o_orderstatus, o_orderpriority"
    ).collect()
    gids = {r.gid for r in rows}
    # rollup of 2 columns -> ids 0 (full), 1 (status only), 3 (total)
    assert gids == {0, 1, 3}
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1
    assert total[0].n == sum(r.n for r in rows if r.gid == 0)


def test_show_views_and_describe_function_passthrough(spark, tmp_path):
    """SHOW VIEWS lists Engine-created views (temp views in the session
    catalog); DESCRIBE FUNCTION passes through to Spark's own function
    docs — both CLI surfaces Hive users exercise daily."""
    from hive_2_3_2_spark.engine import Engine

    path = str(tmp_path / "sv_tbl")
    spark.range(3).write.parquet(path)
    eng = Engine(spark=spark)
    eng.register_table("sv_t", path)
    eng.sql("CREATE VIEW sv_view AS SELECT id FROM sv_t")
    views = {r.viewName for r in eng.sql("SHOW VIEWS").collect()}
    assert "sv_view" in views
    desc = eng.sql("DESCRIBE FUNCTION upper").collect()
    assert any("upper" in str(r) for r in desc)
    desc2 = eng.sql("DESC FUNCTION EXTENDED concat").collect()
    assert any("concat" in str(r) for r in desc2)
    eng.sql("DROP VIEW sv_view")


def test_explain_dependency_tables_and_pruned_partitions(spark, tmp_path):
    """EXPLAIN DEPENDENCY (ExplainTask.getJSONDependencies): one JSON
    row naming input tables + input partitions — and the partition list
    reflects PRUNING (a pt-filtered query reports only the scanned
    partition), plus views resolve to their underlying tables."""
    import json

    from hive_2_3_2_spark.engine import Engine

    eng = Engine(spark=spark)
    flat = str(tmp_path / "dep_flat")
    spark.range(4).selectExpr("id AS k").write.parquet(flat)
    part = str(tmp_path / "dep_part")
    spark.range(8).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS pt"
    ).write.partitionBy("pt").parquet(part)
    eng.register_table("dep_flat", flat)
    eng.register_table("dep_part", part, ["pt"])
    out = eng.sql(
        "EXPLAIN DEPENDENCY SELECT count(*) FROM dep_part p "
        "JOIN dep_flat f ON p.k = f.k WHERE p.pt = '1'"
    ).collect()
    dep = json.loads(out[0].explain_dependency)
    assert dep["input_tables"] == ["default@dep_flat", "default@dep_part"]
    assert dep["input_partitions"] == ["default@dep_part@pt=1"]
    # unpruned: both partitions appear
    dep = json.loads(
        eng.sql("EXPLAIN DEPENDENCY SELECT * FROM dep_part")
        .collect()[0].explain_dependency
    )
    assert dep["input_partitions"] == [
        "default@dep_part@pt=0", "default@dep_part@pt=1",
    ]
    # a view reports its underlying table
    eng.sql("CREATE VIEW dep_v AS SELECT k FROM dep_flat")
    dep = json.loads(
        eng.sql("EXPLAIN DEPENDENCY SELECT * FROM dep_v")
        .collect()[0].explain_dependency
    )
    assert dep["input_tables"] == ["default@dep_flat"]
    eng.sql("DROP VIEW dep_v")


def test_show_partitions_partial_spec(spark, tmp_path):
    """SHOW PARTITIONS t PARTITION (p='v') — Hive's partial-spec filter
    (DDLSemanticAnalyzer analyzeShowPartitions): any subset of
    partition columns filters the listing; a non-partition column is a
    typed error."""
    import pytest as _pytest

    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    d = str(tmp_path / "spp")
    spark.range(12).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "CAST(id % 2 AS STRING) AS q"
    ).write.partitionBy("p", "q").parquet(d)
    eng.register_table("spp_t", d, ["p", "q"])
    allp = [r.partition for r in eng.sql("SHOW PARTITIONS spp_t").collect()]
    assert len(allp) == 6
    got = [
        r.partition
        for r in eng.sql("SHOW PARTITIONS spp_t PARTITION (p='1')").collect()
    ]
    assert got == ["p=1/q=0", "p=1/q=1"]
    got = [
        r.partition
        for r in eng.sql(
            "SHOW PARTITIONS spp_t PARTITION (p='2', q='0')"
        ).collect()
    ]
    assert got == ["p=2/q=0"]
    # second partition column alone (suffix spec) works too
    got = [
        r.partition
        for r in eng.sql("SHOW PARTITIONS spp_t PARTITION (q='1')").collect()
    ]
    assert got == ["p=0/q=1", "p=1/q=1", "p=2/q=1"]
    with _pytest.raises(HiveQLUnsupportedError, match="not a partition"):
        eng.sql("SHOW PARTITIONS spp_t PARTITION (k='1')")
