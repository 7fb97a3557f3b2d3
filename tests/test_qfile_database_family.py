"""clientpositive database family replay: database.q,
database_properties.q, describe_database.q, show_create_database.q,
database_location.q, ctas_uses_database_location.q, database_drop.q /
drop_database_removes_partition_dirs.q, and cte_mat_1.q's
qualified-table-vs-CTE collision.

Reference semantics: parse/DDLSemanticAnalyzer.java
analyzeCreateDatabase/analyzeDropDatabase/analyzeSwitchDatabase →
exec/DDLTask.java createDatabase/describeDatabase/dropDatabase. Spark
namespaces back the catalog; the engine adds Hive's free-form
DBPROPERTIES (Spark reserves comment/location/owner), the one-row
DESCRIBE DATABASE metastore shape, and default.t resolution for
engine-registered temp-view tables.

Statement side-effects are pytest territory (driver fixtures are
parquet-only); the one SELECT shape (cte_mat_1) is value-checked
against DuckDB.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_db")
    src_path = str(root / "src")
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    spark.createDataFrame(rows, "key string, value string").coalesce(
        2
    ).write.parquet(src_path)
    eng = Engine(spark=spark)
    eng.register_table("src", src_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{src_path}/*.parquet')"
    )
    yield eng, con, str(root)
    spark.sql("USE default")
    for db in ("dbfam_test", "dbfam_props", "dbfam_loc", "dbfam_ctas",
               "dbfam_drop", "dbfam_mydb"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    con.close()


def test_q_database_lifecycle(qenv):
    """database.q: CREATE/CREATE INE/DROP/DROP IE lifecycle, SHOW
    DATABASES + SCHEMAS synonym + glob patterns, and tables created
    under USE db."""
    eng, _, _ = qenv
    eng.sql("DROP DATABASE IF EXISTS dbfam_test CASCADE")

    eng.sql("CREATE DATABASE dbfam_test COMMENT 'Hive test database'")
    dbs = {r[0] for r in eng.sql("SHOW DATABASES").collect()}
    assert "dbfam_test" in dbs and "default" in dbs
    # INE on existing: no-op, comment preserved
    eng.sql("CREATE DATABASE IF NOT EXISTS dbfam_test COMMENT 'other'")
    row = eng.sql("DESCRIBE DATABASE dbfam_test").collect()[0]
    assert row.comment == "Hive test database"
    # SHOW SCHEMAS synonym
    assert "dbfam_test" in {r[0] for r in eng.sql("SHOW SCHEMAS").collect()}
    # glob patterns (Hive DDLTask.showDatabases uses * globbing)
    assert {r[0] for r in eng.sql("SHOW DATABASES LIKE 'dbfam*'").collect()} \
        == {"dbfam_test"}
    assert "default" in {
        r[0] for r in eng.sql("SHOW DATABASES LIKE '*efaul*'").collect()
    }
    # DROP / DROP IF EXISTS both states
    eng.sql("DROP DATABASE dbfam_test")
    assert "dbfam_test" not in {
        r[0] for r in eng.sql("SHOW DATABASES").collect()
    }
    eng.sql("DROP DATABASE IF EXISTS dbfam_test")
    # INE on non-existent creates
    eng.sql("CREATE DATABASE IF NOT EXISTS dbfam_test")

    # tables in a non-default db: USE + unqualified DDL
    eng.sql("USE dbfam_test")
    try:
        eng.sql("CREATE TABLE test_table (col1 STRING) STORED AS PARQUET")
        tabs = {
            r.tableName
            for r in eng.sql("SHOW TABLES").collect()
            if not r.isTemporary
        }
        assert "test_table" in tabs
        cols = [r.col_name for r in eng.sql("DESCRIBE test_table").collect()]
        assert cols[0] == "col1"
        # CREATE LIKE in non-default DB (catalog passthrough path)
        eng.sql("CREATE TABLE test_table_like LIKE test_table")
        tabs = {
            r.tableName
            for r in eng.sql("SHOW TABLES").collect()
            if not r.isTemporary
        }
        assert "test_table_like" in tabs
    finally:
        eng.sql("USE default")
    # qualified access from default
    eng.sql("INSERT INTO dbfam_test.test_table VALUES ('x')")
    assert eng.sql(
        "SELECT count(*) AS n FROM dbfam_test.test_table"
    ).collect()[0].n == 1
    eng.sql("DROP DATABASE dbfam_test CASCADE")


def test_q_database_properties(qenv):
    """database_properties.q: free-form DBPROPERTIES (dotted keys, URL
    values Spark would redact, the reserved key `owner` Spark would
    reject), ALTER merge-not-replace, DESCRIBE EXTENDED parameter map."""
    eng, _, _ = qenv
    eng.sql("DROP DATABASE IF EXISTS dbfam_props CASCADE")
    eng.sql(
        "create database dbfam_props with dbproperties ("
        "  'mapred.jobtracker.url'='http://my.jobtracker.com:53000',"
        "  'hive.warehouse.dir' = '/user/hive/warehouse',"
        "  'owner' = 'hive_user')"
    )
    # non-extended: parameters column EMPTY (DDLTask.describeDatabase
    # only writes params under EXTENDED)
    row = eng.sql("describe database dbfam_props").collect()[0]
    assert row.parameters == ""
    assert list(row.asDict()) == [
        "db_name", "comment", "location", "owner_name", "owner_type",
        "parameters",
    ]
    row = eng.sql("describe database extended dbfam_props").collect()[0]
    assert "mapred.jobtracker.url=http://my.jobtracker.com:53000" \
        in row.parameters
    assert "owner=hive_user" in row.parameters
    # ALTER merges into the parameter map (never replaces)
    eng.sql(
        "alter database dbfam_props set dbproperties ("
        "  'new.property' = 'some new props',"
        "  'hive.warehouse.dir' = 'new/warehouse/dir')"
    )
    row = eng.sql("describe database extended dbfam_props").collect()[0]
    assert "new.property=some new props" in row.parameters
    assert "hive.warehouse.dir=new/warehouse/dir" in row.parameters
    assert "mapred.jobtracker.url=http://my.jobtracker.com:53000" \
        in row.parameters
    # SET OWNER USER lands in the parameter overlay
    eng.sql("alter database dbfam_props set owner user somebody")
    row = eng.sql("describe database extended dbfam_props").collect()[0]
    assert "owner=somebody" in row.parameters
    eng.sql("DROP DATABASE dbfam_props")


def test_q_show_create_database(qenv):
    """show_create_database.q: reconstructed DDL, one line per row."""
    eng, _, _ = qenv
    eng.sql("DROP DATABASE IF EXISTS dbfam_props CASCADE")
    eng.sql(
        "CREATE DATABASE dbfam_props COMMENT 'for show' "
        "WITH DBPROPERTIES ('a'='b')"
    )
    lines = [r[0] for r in eng.sql(
        "SHOW CREATE DATABASE dbfam_props"
    ).collect()]
    assert lines[0] == "CREATE DATABASE `dbfam_props`"
    assert "COMMENT" in lines and "  'for show'" in lines
    assert "LOCATION" in lines
    assert "WITH DBPROPERTIES (" in lines and "  'a'='b'" in lines
    eng.sql("DROP DATABASE dbfam_props")


def test_q_database_location_and_ctas(qenv):
    """database_location.q + ctas_uses_database_location.q: a db
    created with LOCATION places its managed tables (including CTAS
    output) under that directory, and default.src resolves from inside
    another current database."""
    eng, con, root = qenv
    loc = os.path.join(root, "dbfam_loc_dir")
    eng.sql("DROP DATABASE IF EXISTS dbfam_loc CASCADE")
    eng.sql(f"CREATE DATABASE dbfam_loc COMMENT 'database 2' LOCATION '{loc}'")
    row = eng.sql("DESCRIBE DATABASE EXTENDED dbfam_loc").collect()[0]
    assert row.location.endswith("dbfam_loc_dir")
    eng.sql("USE dbfam_loc")
    try:
        # CTAS reading the DEFAULT database's src (an engine temp-view
        # table) while dbfam_loc is current
        eng.sql("CREATE TABLE table_db1 AS SELECT * FROM default.src")
        n = eng.sql("SELECT count(*) AS n FROM table_db1").collect()[0].n
        assert n == con.execute("SELECT count(*) FROM src").fetchone()[0]
        # the CTAS data landed under the DATABASE location, not the
        # global warehouse dir (FileSinkOperator writes under the db
        # locationUri — ctas_uses_database_location.q's whole point)
        assert os.path.isdir(os.path.join(loc, "table_db1"))
        assert any(
            f.endswith(".parquet")
            for f in os.listdir(os.path.join(loc, "table_db1"))
        )
    finally:
        eng.sql("USE default")
    eng.sql("DROP DATABASE dbfam_loc CASCADE")


def test_q_drop_database_cascade(qenv):
    """database_drop.q / drop_database_removes_partition_dirs.q: DROP
    CASCADE drops contained tables and their managed directories; DROP
    RESTRICT (the default) refuses on a non-empty database."""
    eng, _, _ = qenv
    eng.sql("DROP DATABASE IF EXISTS dbfam_drop CASCADE")
    eng.sql("CREATE DATABASE dbfam_drop")
    eng.sql(
        "CREATE TABLE dbfam_drop.t_keep (k STRING, v STRING) "
        "STORED AS PARQUET"
    )
    eng.sql("INSERT INTO dbfam_drop.t_keep VALUES ('a', 'b')")
    tdir = eng.spark.sql(
        "DESCRIBE TABLE EXTENDED dbfam_drop.t_keep"
    ).filter("col_name = 'Location'").collect()[0].data_type
    tdir = tdir.removeprefix("file:")
    assert os.path.isdir(tdir)
    # RESTRICT (Hive's default) refuses a non-empty db
    with pytest.raises(Exception):
        eng.sql("DROP DATABASE dbfam_drop")
    # CASCADE drops tables AND their managed dirs
    eng.sql("DROP DATABASE dbfam_drop CASCADE")
    assert "dbfam_drop" not in {
        r[0] for r in eng.sql("SHOW DATABASES").collect()
    }
    assert not os.path.exists(tdir)


def test_q_cte_mat_1_qualified_table_vs_cte(qenv):
    """cte_mat_1.q: a real table db.q1 joined against a CTE also named
    q1 — the bare name binds to the CTE, the qualified name to the
    catalog table (Hive resolves CTEs before the metastore;
    SemanticAnalyzer.getMetaData)."""
    eng, con, _ = qenv
    eng.sql("DROP DATABASE IF EXISTS dbfam_mydb CASCADE")
    eng.sql("CREATE DATABASE dbfam_mydb")
    eng.sql(
        "CREATE TABLE dbfam_mydb.q1 (colnum int, colstring string) "
        "STORED AS PARQUET"
    )
    eng.sql("INSERT INTO dbfam_mydb.q1 VALUES (5, 'A')")
    got = eng.sql(
        "with q1 as (select * from src where key= '5') "
        "select a.colnum from dbfam_mydb.q1 as a join q1 as b "
        "on a.colnum=b.key"
    ).collect()
    n_five = con.execute(
        "SELECT count(*) FROM src WHERE key = '5'"
    ).fetchone()[0]
    assert [r.colnum for r in got] == [5] * n_five
    eng.sql("DROP DATABASE dbfam_mydb CASCADE")


def test_q_use_invalid_database_errors(qenv):
    """use_database errors: USE of a missing db is an analysis error,
    not a silent no-op."""
    eng, _, _ = qenv
    with pytest.raises(Exception):
        eng.sql("USE dbfam_never_created")
