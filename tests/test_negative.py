"""Negative-path tests (clientnegative corpus parity, SURVEY §5.1: 802
expected-error .q files) — the engine must fail *cleanly* with typed
analysis/parse errors, not crash or silently mis-execute."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import (
    AnalysisException,
    ParseException,
)

from hive_2_3_2_spark import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark=spark, sf_dir=sf_dir)


def test_syntax_error(eng):
    with pytest.raises(ParseException):
        eng.sql("SELEC * FROM lineitem")


def test_unknown_table(eng):
    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        eng.sql("SELECT * FROM does_not_exist")


def test_unknown_column(eng):
    with pytest.raises(AnalysisException, match="UNRESOLVED_COLUMN"):
        eng.sql("SELECT no_such_col FROM lineitem").collect()


def test_unknown_function(eng):
    with pytest.raises(AnalysisException, match="UNRESOLVED_ROUTINE"):
        eng.sql("SELECT not_a_function(1)").collect()


def test_ambiguous_column(eng):
    with pytest.raises(AnalysisException, match="AMBIGUOUS"):
        eng.sql(
            """SELECT o_orderkey FROM orders a
               JOIN orders b ON a.o_orderkey = b.o_orderkey"""
        ).collect()


def test_group_by_missing_column(eng):
    with pytest.raises(AnalysisException, match="MISSING_AGGREGATION|GROUP"):
        eng.sql(
            "SELECT o_custkey, o_totalprice FROM orders GROUP BY o_custkey"
        ).collect()


def test_union_arity_mismatch(eng):
    with pytest.raises(AnalysisException, match="NUM_COLUMNS_MISMATCH|UNION"):
        eng.sql(
            "SELECT 1 UNION ALL SELECT 1, 2"
        ).collect()


def test_invalid_cast_yields_null_not_error(eng):
    """Hive permissiveness: a *value* that can't cast gives NULL (only
    structural errors raise) — the positive twin of the negative corpus."""
    row = eng.sql("SELECT CAST('not_a_number' AS INT) AS v").collect()[0]
    assert row.v is None


def test_scalar_subquery_multiple_rows_errors(eng):
    """sq_count_check parity (FunctionRegistry.java:253): a scalar
    subquery returning >1 row is a runtime error in both engines."""
    with pytest.raises(Exception, match="SCALAR_SUBQUERY_TOO_MANY_ROWS"):
        eng.sql(
            """SELECT * FROM nation
               WHERE n_nationkey = (SELECT n_nationkey FROM nation)"""
        ).collect()


def test_tablesample_unhashable_key_raises(eng):
    """Non-integral, non-string bucket keys (date/double/...) have no
    Hive hash emulation — must raise typed, not silently mis-sample."""
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    with pytest.raises(HiveQLUnsupportedError, match="bucket-hash"):
        eng.sql(
            "SELECT COUNT(*) AS n FROM orders "
            "TABLESAMPLE(BUCKET 1 OUT OF 4 ON o_orderdate)"
        )


def test_tablesample_string_key_hive_hash_parity(eng):
    """String bucket keys use the ObjectInspectorUtils.hashCode byte fold
    ((hash & MAX_INT) % y). For the fixed TPC-H priority domain the
    bucket-2-of-4 members are exactly {'1-URGENT','2-HIGH'} (hashes
    -1002256291 and 1475233373, both ≡ 1 mod 4 after the sign mask)."""
    got = eng.sql(
        "SELECT DISTINCT o_orderpriority AS p FROM orders "
        "TABLESAMPLE(BUCKET 2 OUT OF 4 ON o_orderpriority) ORDER BY p"
    ).collect()
    assert [r.p for r in got] == ["1-URGENT", "2-HIGH"]


def test_tablesample_survives_where_alias_join(eng):
    """The subquery rewrite must compose with an existing WHERE clause,
    an alias, and a following join (the appended-WHERE rewrite broke all
    three)."""
    n = eng.sql(
        """
        SELECT COUNT(*) AS n
        FROM lineitem TABLESAMPLE(BUCKET 1 OUT OF 4 ON l_orderkey) li
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 0
        """
    ).collect()[0].n
    expected = eng.sql(
        """
        SELECT COUNT(*) AS n FROM lineitem li
        JOIN orders o ON li.l_orderkey = o.o_orderkey
        WHERE pmod(li.l_orderkey, 4) = 0 AND o.o_totalprice > 0
        """
    ).collect()[0].n
    assert n == expected and n > 0


def test_virtual_block_offset_raises_typed(eng):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    with pytest.raises(HiveQLUnsupportedError, match="BLOCK__OFFSET"):
        eng.sql("SELECT BLOCK__OFFSET__INSIDE__FILE FROM lineitem")


# ---------------------------------------------------------------------------
# clientnegative corpus sweep (SURVEY §5.1). Each case maps a reference
# expected-error file (ql/src/test/queries/clientnegative/<name>.q) onto
# this front-end and asserts the TYPED error — specific exception class
# plus a message fragment, never a bare Exception.
# ---------------------------------------------------------------------------

from hive_2_3_2_spark.engine import HiveQLUnsupportedError  # noqa: E402


@pytest.fixture()
def neg_eng(spark, sf_dir, tmp_path):
    """Engine with one unpartitioned and one partitioned writable table."""
    flat = str(tmp_path / "cust_neg.parquet")
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.parquet(flat)
    part = str(tmp_path / "orders_neg.parquet")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartition("o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .parquet(part)
    )
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.register_table("cust_neg", flat)
    eng.register_table("orders_neg", part, ["o_orderpriority"])
    return eng


_MERGE_HEAD = (
    "MERGE INTO cust_neg t USING neg_src s ON t.c_custkey = s.k "
)

# (id, statement, message fragment) — all raise HiveQLUnsupportedError.
_TYPED_CASES = [
    # merge clause validation (UpdateDeleteSemanticAnalyzer rules)
    (
        "merge_three_matched_clauses",  # grammar: at most 2 WHEN MATCHED
        _MERGE_HEAD
        + "WHEN MATCHED AND s.k > 0 THEN UPDATE SET c_acctbal = 0 "
        "WHEN MATCHED AND s.k > 1 THEN DELETE WHEN MATCHED THEN DELETE",
        "at most 2",
    ),
    (
        "merge_duplicate_update",
        _MERGE_HEAD
        + "WHEN MATCHED AND s.k > 0 THEN UPDATE SET c_acctbal = 0 "
        "WHEN MATCHED THEN UPDATE SET c_acctbal = 1",
        "one WHEN MATCHED UPDATE",
    ),
    (
        "merge_duplicate_delete",
        _MERGE_HEAD
        + "WHEN MATCHED AND s.k > 0 THEN DELETE WHEN MATCHED THEN DELETE",
        "one WHEN MATCHED DELETE",
    ),
    (
        "merge_first_clause_unconditional",
        _MERGE_HEAD
        + "WHEN MATCHED THEN UPDATE SET c_acctbal = 0 "
        "WHEN MATCHED THEN DELETE",
        "FIRST must have",
    ),
    (
        "merge_non_equi_on",  # CrossProductCheck: equi-join merges only
        "MERGE INTO cust_neg t USING neg_src s ON t.c_custkey > s.k "
        "WHEN MATCHED THEN DELETE",
        "equi",
    ),
    (
        "merge_unknown_alias_in_on",
        "MERGE INTO cust_neg t USING neg_src s ON x.c_custkey = s.k "
        "WHEN MATCHED THEN DELETE",
        "unknown alias",
    ),
    (
        "merge_subquery_needs_alias",
        "MERGE INTO cust_neg t USING (SELECT 1 AS k) "
        "ON t.c_custkey = k WHEN MATCHED THEN DELETE",
        "alias",
    ),
    # truncate (truncate_table_failure1.q: spec on non-partitioned;
    # partial spec analog of truncate_table_failure3/4)
    (
        "truncate_spec_on_unpartitioned",
        "TRUNCATE TABLE cust_neg PARTITION (ds='1')",
        "not partitioned",
    ),
    (
        "truncate_whole_partitioned_table",
        "TRUNCATE TABLE orders_neg",
        "PARTITION",
    ),
    (
        "truncate_partial_partition_spec",
        "TRUNCATE TABLE orders_neg PARTITION (nosuchcol='x')",
        "exactly",
    ),
    # alter partition (alter_table_add_partition.q: bad spec;
    # addpart1.q: nonexistent partition column)
    (
        "alter_add_partition_unpartitioned",
        "ALTER TABLE cust_neg ADD PARTITION (ds='1')",
        "not partitioned",
    ),
    (
        "alter_add_partition_wrong_column",
        "ALTER TABLE orders_neg ADD PARTITION (nosuch='1')",
        "exactly",
    ),
    # show partitions (show_partitions1.q analog)
    (
        "show_partitions_unpartitioned",
        "SHOW PARTITIONS cust_neg",
        "not partitioned",
    ),
    # insert (insert_into_with_schema.q: arity; insert_into_with_schema3.q:
    # unknown column; dynamic_partitions_with_whitelist.q analog: bad
    # partition column)
    (
        "insert_arity_mismatch",
        "INSERT INTO cust_neg SELECT 1, 2",
        "supplies",
    ),
    (
        "insert_column_list_unknown_column",
        "INSERT INTO cust_neg (c_custkey, nosuchcol) VALUES (1, 2)",
        "unknown column",
    ),
    (
        "insert_column_list_arity",
        "INSERT INTO cust_neg (c_custkey, c_name) VALUES (1, 'x', 'y')",
        "supplies",
    ),
    (
        "insert_partition_spec_non_partition_col",
        "INSERT INTO orders_neg PARTITION (o_orderkey=1) SELECT 1",
        "non-partition",
    ),
    (
        "insert_partition_spec_on_unpartitioned",
        "INSERT INTO cust_neg PARTITION (ds='1') SELECT 1",
        "non-partition",
    ),
    # load data (load_part_nospec.q; load_wrong_noof_part.q; dynamic spec)
    (
        "load_partitioned_without_spec",
        "LOAD DATA INPATH '/nonexistent/x.parquet' INTO TABLE orders_neg",
        "PARTITION spec",
    ),
    (
        "load_dynamic_partition_spec",
        "LOAD DATA INPATH '/nonexistent/x.parquet' INTO TABLE orders_neg "
        "PARTITION (o_orderpriority)",
        "static values",
    ),
    (
        "load_missing_partition_column",
        "LOAD DATA INPATH '/nonexistent/x.parquet' INTO TABLE orders_neg "
        "PARTITION (nosuch='1')",
        "missing partition column",
    ),
    # export/import (exim_* family)
    (
        "import_not_an_export_dir",
        "IMPORT TABLE imported_neg FROM '/tmp'",
        "export directory",
    ),
    (
        "import_existing_table",
        "IMPORT TABLE cust_neg FROM '/tmp'",
        "export directory|already exists",
    ),
    # virtual columns (parse/VirtualColumn.java)
    (
        "virtual_row_offset",
        "SELECT ROW__OFFSET__INSIDE__BLOCK FROM lineitem",
        "no Spark parquet-scan equivalent",
    ),
]


@pytest.mark.parametrize(
    "stmt,frag",
    [(s, f) for _i, s, f in _TYPED_CASES],
    ids=[i for i, _s, _f in _TYPED_CASES],
)
def test_typed_error_sweep(neg_eng, spark, stmt, frag):
    spark.sql("SELECT 1 AS k").createOrReplaceTempView("neg_src")
    with pytest.raises(HiveQLUnsupportedError, match=frag):
        neg_eng.sql(stmt)


def test_merge_update_partition_column_raises(neg_eng, spark):
    """MERGE may not move rows across partitions (Hive UPDATE rule —
    updating a partition column is delete+insert)."""
    spark.sql("SELECT 1 AS k").createOrReplaceTempView("neg_src")
    with pytest.raises(HiveQLUnsupportedError, match="partition column"):
        neg_eng.sql(
            "MERGE INTO orders_neg t USING neg_src s ON t.o_orderkey = s.k "
            "WHEN MATCHED THEN UPDATE SET o_orderpriority = 'X'"
        )


def test_multi_insert_duplicate_overwrite_sink_raises(neg_eng):
    """duplicate_insert1.q: the same table twice as an OVERWRITE sink —
    the second branch would silently clobber the first."""
    with pytest.raises(HiveQLUnsupportedError, match="OVERWRITE sink"):
        neg_eng.sql(
            "FROM cust_neg "
            "INSERT OVERWRITE cust_neg SELECT * "
            "INSERT OVERWRITE cust_neg SELECT *"
        )


def test_create_table_rcfile_raises_typed(neg_eng, tmp_path):
    """load_wrong_fileformat_rc_seq.q / alter_file_format.q family:
    formats without a Spark datasource equivalent are typed errors in
    CREATE TABLE context."""
    with pytest.raises(HiveQLUnsupportedError, match="STORED AS RCFILE"):
        neg_eng.sql(
            f"CREATE TABLE neg_rc (k INT) STORED AS RCFILE "
            f"LOCATION '{tmp_path}/rc'"
        )


# --- cases where the reference's error surfaces as Spark's own typed
# analysis/parse error through the passthrough (same category coverage,
# different error channel — asserted by errorClass fragment) ---

def test_clusterby_orderby_conflict(eng):
    """clusterbyorderby.q: CLUSTER BY with ORDER BY is a parse error."""
    with pytest.raises(ParseException):
        eng.sql(
            "SELECT * FROM nation CLUSTER BY n_nationkey "
            "ORDER BY n_name"
        )


def test_clusterby_sortby_conflict(eng):
    """clusterbysortby.q: CLUSTER BY with SORT BY is a parse error."""
    with pytest.raises(ParseException):
        eng.sql(
            "SELECT * FROM nation CLUSTER BY n_nationkey SORT BY n_name"
        )


def test_clusterby_distributeby_conflict(eng):
    """clusterbydistributeby.q: CLUSTER BY with DISTRIBUTE BY."""
    with pytest.raises(ParseException):
        eng.sql(
            "SELECT * FROM nation CLUSTER BY n_nationkey "
            "DISTRIBUTE BY n_name"
        )


def test_scalar_subquery_multiple_columns(eng):
    """subquery_scalar_multi_columns.q: scalar subquery with 2 output
    columns."""
    with pytest.raises(AnalysisException):
        eng.sql(
            "SELECT * FROM nation WHERE n_nationkey = "
            "(SELECT n_nationkey, n_regionkey FROM nation LIMIT 1)"
        ).collect()


def test_udtf_in_where_clause(eng):
    """udtf_invalid_place.q: explode outside the select list / lateral
    view position."""
    with pytest.raises(AnalysisException):
        eng.sql(
            "SELECT n_name FROM nation WHERE explode(array(1, 2)) = 1"
        ).collect()


def test_udtf_nested_explode(eng):
    """udtf_explode_not_supported*.q: nested generators."""
    with pytest.raises(AnalysisException):
        eng.sql(
            "SELECT explode(explode(array(array(1, 2)))) FROM nation"
        ).collect()


def test_udtf_alias_arity(eng):
    """select_udtf_alias.q: explode aliased with too many columns."""
    with pytest.raises(AnalysisException):
        eng.sql(
            "SELECT explode(array(1, 2)) AS (a, b) FROM nation"
        ).collect()


def test_lead_without_over(eng):
    """windowing_ll_no_over.q: lead() outside a window spec."""
    with pytest.raises(AnalysisException):
        eng.sql("SELECT lead(n_nationkey, 1) FROM nation").collect()


def test_grouping_without_group_by(eng):
    """groupby_grouping_id1.q: grouping()/grouping_id() without
    GROUP BY ... GROUPING SETS."""
    with pytest.raises(AnalysisException):
        eng.sql("SELECT grouping(n_name) FROM nation").collect()


def test_insert_into_view_fails(eng, spark):
    """insert_view_failure.q: INSERT into a (temp) view — falls through
    to Spark, which rejects writing a view."""
    spark.sql("SELECT 1 AS k").createOrReplaceTempView("neg_view")
    with pytest.raises(AnalysisException):
        eng.sql("INSERT INTO neg_view VALUES (2)")


def test_distinct_star_with_group_by(eng):
    """selectDistinctStarNeg_1.q family: SELECT DISTINCT * with
    aggregation context errors."""
    with pytest.raises(AnalysisException):
        eng.sql(
            "SELECT DISTINCT *, count(*) FROM nation GROUP BY n_nationkey"
        ).collect()


def test_load_data_nonexistent_path(neg_eng):
    """Hive: 'No files matching path' — typed, before any file moves."""
    with pytest.raises(HiveQLUnsupportedError, match="no files matching"):
        neg_eng.sql(
            "LOAD DATA INPATH '/definitely/not/here.parquet' "
            "INTO TABLE cust_neg"
        )


def test_load_data_wrong_file_format(neg_eng, tmp_path):
    """load_wrong_fileformat.q: a non-parquet payload must be rejected
    typed — LOAD moves files without conversion, so accepting it would
    poison the table for every later scan."""
    bad = tmp_path / "kv1.parquet"  # parquet-named but text content
    bad.write_text("1\tvalue1\n2\tvalue2\n")
    with pytest.raises(HiveQLUnsupportedError, match="wrong file format"):
        neg_eng.sql(f"LOAD DATA INPATH '{bad}' INTO TABLE cust_neg")


# --- r5: driver-materialization scale guards --------------------------


def test_run_script_result_cap_typed_error(eng):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    with pytest.raises(
        HiveQLUnsupportedError, match="hive.materialize.max.rows"
    ):
        eng.run_script(
            "SELECT * FROM lineitem",
            variables={"hive.materialize.max.rows": "10"},
        )
    # below the cap: unchanged behavior (materialized frames come back)
    out = eng.run_script(
        "SELECT l_orderkey FROM lineitem LIMIT 5",
        variables={"hive.materialize.max.rows": "10"},
    )
    assert len(out[-1].collect()) == 5
    # escape hatch: eager=False keeps the distributed frame, no cap
    out = eng.run_script(
        "SELECT * FROM lineitem",
        eager=False,
        variables={"hive.materialize.max.rows": "10"},
    )
    assert out[-1].count() > 10
    eng.hiveconf.pop("hive.materialize.max.rows", None)


def test_sql_async_result_cap_typed_error(eng):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    eng.hiveconf["hive.materialize.max.rows"] = "10"
    try:
        fut = eng.sql_async("SELECT * FROM orders")
        with pytest.raises(
            HiveQLUnsupportedError, match="hive.materialize.max.rows"
        ):
            fut.result(timeout=120)
    finally:
        eng.hiveconf.pop("hive.materialize.max.rows", None)


def test_ivf_query_batch_guard(spark, monkeypatch):
    from hive_2_3_2_spark.llm import similarity as S

    monkeypatch.setattr(S, "MAX_QUERY_BATCH", 3)
    queries = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(0, 1, [1.0, 0.0])], "cell int, neighbor_id long, cv array<double>"
    )
    with pytest.raises(ValueError, match="MAX_QUERY_BATCH"):
        S._score_probed_cells(
            corpus, queries, [[0.0, 0.0], [1.0, 1.0]],
            k=2, nprobe=1, id_col="vec_id", vec_col="embedding",
        )


def test_rename_to_existing_table_typed_error(eng, spark, tmp_path):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    for t in ("ren_a", "ren_b"):
        p = str(tmp_path / t)
        spark.range(2).write.parquet(p)
        eng.register_table(t, p)
    with pytest.raises(HiveQLUnsupportedError, match="already exists"):
        eng.sql("ALTER TABLE ren_a RENAME TO ren_b")
    eng.sql("DROP TABLE ren_a")
    eng.sql("DROP TABLE ren_b")


def test_avro_unsupported_spark_type_typed_error(spark):
    from hive_2_3_2_spark.sources.avro_py import avro_schema_from_spark

    df = spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    with pytest.raises(ValueError, match="no Avro mapping"):
        avro_schema_from_spark(df.schema)


def test_avro_read_empty_dir_typed_error(tmp_path, spark):
    from hive_2_3_2_spark.sources.avro_py import read_avro_py

    empty = tmp_path / "no_avro_here"
    empty.mkdir()
    with pytest.raises(Exception, match="no .avro files|PATH_NOT_FOUND"):
        read_avro_py(spark, str(empty))


def test_rename_to_existing_view_typed_error(eng, spark, tmp_path):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    p = str(tmp_path / "ren_c")
    spark.range(2).write.parquet(p)
    eng.register_table("ren_c", p)
    eng.sql("CREATE VIEW ren_v AS SELECT * FROM ren_c")
    with pytest.raises(HiveQLUnsupportedError, match="already exists"):
        eng.sql("ALTER TABLE ren_c RENAME TO ren_v")
    eng.sql("DROP VIEW ren_v")
    eng.sql("DROP TABLE ren_c")


def test_matchpath_invocation_typed_errors(eng, spark):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    spark.createDataFrame(
        [(1, "a", 1.0)], "k int, g string, v double"
    ).createOrReplaceTempView("mp_neg")
    # odd argument count (pattern + unpaired symbol args)
    with pytest.raises(HiveQLUnsupportedError, match="pairs"):
        eng.sql(
            "select * from matchpath(on mp_neg distribute by g sort by k "
            "arg1('A+'), arg2('A'), arg3(v > 0), arg4(v < 1), "
            "arg5('k'))"
        )
    # multi-column distribute by unsupported
    with pytest.raises(HiveQLUnsupportedError, match="single"):
        eng.sql(
            "select * from matchpath(on mp_neg distribute by g, k "
            "sort by k arg1('A+'), arg2('A'), arg3(v > 0), arg4('k'))"
        )
    # unsupported result expression (tpath[1] - only first row exposed)
    with pytest.raises(HiveQLUnsupportedError, match="not supported"):
        eng.sql(
            "select * from matchpath(on mp_neg distribute by g sort by k "
            "arg1('A+'), arg2('A'), arg3(v > 0), "
            "arg4('tpath[1].k as x'))"
        )
    spark.catalog.dropTempView("mp_neg")


def test_protected_fixture_dataset_rejects_mutation(spark, sf_dir):
    """Mutating DML against a table backed by the protected fixture
    root (/root/testdata by default; SPARK_GRAFT_PROTECT to override)
    is a typed error — the fixture files are chmod-read-only but their
    DIRECTORIES are writable, so without this guard an INSERT INTO
    would append a part file and corrupt every later run. Reads and
    metadata statements stay allowed."""
    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark, sf_dir=sf_dir)
    for stmt in (
        "INSERT INTO nation VALUES (99, 'X', 0)",
        "DELETE FROM nation WHERE n_nationkey = 0",
        "UPDATE nation SET n_name = 'x' WHERE n_nationkey = 0",
        "TRUNCATE TABLE nation",
    ):
        with pytest.raises(HiveQLUnsupportedError, match="protected"):
            eng.sql(stmt)
    # reads / metadata remain fine
    assert eng.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25
    assert eng.sql("ANALYZE TABLE nation COMPUTE STATISTICS").count() == 1


def test_alter_clustered_by_typed_error(spark, tmp_path):
    """bucketmapjoin10.q/13.q corner: Hive's ALTER CLUSTERED BY leaves
    old files in the OLD bucket layout — Spark would trust the new
    spec and elide shuffles wrongly, so the engine refuses with the
    migration path (typed, never a silent wrong join)."""
    from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError

    eng = Engine(spark=spark)
    spark.sql("DROP TABLE IF EXISTS neg_bmj")
    eng.sql(
        "CREATE TABLE neg_bmj (key INT) CLUSTERED BY (key) INTO 2 "
        "BUCKETS STORED AS PARQUET"
    )
    try:
        with pytest.raises(HiveQLUnsupportedError, match="bucket"):
            eng.sql("ALTER TABLE neg_bmj CLUSTERED BY (key) INTO 3 BUCKETS")
        with pytest.raises(HiveQLUnsupportedError, match="bucket"):
            eng.sql("ALTER TABLE neg_bmj NOT CLUSTERED")
    finally:
        spark.sql("DROP TABLE neg_bmj")
