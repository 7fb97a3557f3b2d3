"""clientpositive ACID golden replay, round 9 (reference:
ql/src/test/queries/clientpositive/update_all_types.q,
update_where_partitioned.q, update_after_multiple_inserts.q,
update_two_cols.q, update/delete_where_no_match.q,
delete_all_non_partitioned.q, delete_where_non_partitioned.q,
delete_whole_partition.q, delete_all_partitioned.q).

The reference runs these over transactional ORC tables through the
ACID delta machinery (ql/io/AcidUtils, UpdateDeleteSemanticAnalyzer
rewrites UPDATE/DELETE into INSERT over ROW__ID). Here UPDATE/DELETE
run through the engine's staged-rewrite emulation
(sources/writers.py update_where/delete_where — stage, then swap only
touched partition dirs), so beyond row values these tests assert
PARTITION STATE: an emptied partition's directory is removed, untouched
partitions keep their files.

The alltypesorc source is synthesized (same convention as the other
qfile slices); goldens' row subsets are re-derived by DuckDB over
identical rows.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

# alltypesorc-like rows: (ti, si, i, bi, f, d, s, b)
ROWS = [
    (
        (i % 120) - 60,
        (i * 7) % 1000,
        (i * 13) % 500 - 250,
        (i * 1009) % 100000,
        float((i % 17)) / 4,
        float(i) * 2.5,
        f"str_{i % 37}",
        bool(i % 3),
    )
    for i in range(100)
]
SCHEMA = (
    "ti int, si int, i int, bi bigint, f double, d double, "
    "s string, b boolean"
)


@pytest.fixture()
def acid_env(spark, tmp_path):
    """One engine + a DuckDB connection with the source rows."""
    eng = Engine(spark=spark)
    con = duckdb.connect()
    body = ", ".join(
        "(" + ", ".join(repr(v) for v in r) + ")" for r in ROWS
    )
    con.execute(
        # CASTs: DuckDB infers DECIMAL for the fractional literals,
        # which would format differently from Spark's doubles
        "CREATE VIEW srcrows AS SELECT ti, si, i, bi, "
        "CAST(f AS DOUBLE) AS f, CAST(d AS DOUBLE) AS d, s, b "
        "FROM (VALUES " + body + ") AS t(ti, si, i, bi, f, d, s, b)"
    )
    yield eng, con, str(tmp_path)
    con.close()


def _mk_table(eng, root, name, partitioned=False):
    spark = eng.spark
    p = os.path.join(root, name)
    df = spark.createDataFrame(ROWS, SCHEMA)
    if partitioned:
        df = df.selectExpr(
            "*", "IF(i % 2 = 0, 'today', 'tomorrow') AS ds"
        )
        df.repartition("ds").write.partitionBy("ds").parquet(p)
        eng.register_table(name, p, ["ds"])
    else:
        df.coalesce(2).write.parquet(p)
        eng.register_table(name, p)
    return p


def test_q_update_all_types_constants_and_expressions(acid_env):
    """update_all_types.q: a constant multi-column SET on one matching
    row, then an EXPRESSION SET (ti = ti*2, si = cast(f as int),
    d = floor(d)) on another — all other rows byte-identical."""
    eng, con, root = acid_env
    _mk_table(eng, root, "acid_uat")
    eng.sql(
        "update acid_uat set ti = 1, si = 2, bi = 4, f = 3.14, "
        "d = 6.28, b = true where s = 'str_5'"
    )
    eng.sql(
        "update acid_uat set ti = ti * 2, si = cast(f as int), "
        "d = floor(d) where s = 'str_7'"
    )
    assert_matches_oracle(
        eng.table("acid_uat"),
        con,
        """
        SELECT ti * (CASE WHEN s='str_7' THEN 2 ELSE 1 END)
                 * (CASE WHEN s='str_5' THEN 0 ELSE 1 END)
               + (CASE WHEN s='str_5' THEN 1 ELSE 0 END) AS ti,
               CASE WHEN s='str_5' THEN 2
                    WHEN s='str_7' THEN CAST(trunc(f) AS INT)
                    ELSE si END AS si,
               i,
               CASE WHEN s='str_5' THEN 4 ELSE bi END AS bi,
               CASE WHEN s='str_5' THEN CAST(3.14 AS DOUBLE) ELSE f END AS f,
               CASE WHEN s='str_5' THEN CAST(6.28 AS DOUBLE)
                    WHEN s='str_7' THEN floor(d)
                    ELSE d END AS d,
               s,
               CASE WHEN s='str_5' THEN true ELSE b END AS b
        FROM srcrows
        """,
    )


def test_q_update_two_cols(acid_env):
    """update_two_cols.q: one SET with two columns."""
    eng, con, root = acid_env
    _mk_table(eng, root, "acid_utc")
    eng.sql(
        "update acid_utc set si = si + 1, f = f * 2 where i > 0"
    )
    assert_matches_oracle(
        eng.table("acid_utc"),
        con,
        "SELECT ti, CASE WHEN i > 0 THEN si + 1 ELSE si END AS si, i, "
        "bi, CASE WHEN i > 0 THEN f * 2 ELSE f END AS f, d, s, b "
        "FROM srcrows",
    )


def test_q_update_where_partitioned_preserves_partitions(acid_env):
    """update_where_partitioned.q: the SET touches matching rows in
    EVERY partition; partition membership (ds) is unchanged and both
    partition dirs survive."""
    eng, con, root = acid_env
    p = _mk_table(eng, root, "acid_uwp", partitioned=True)
    eng.sql("update acid_uwp set s = 'fred' where s = 'str_11'")
    assert_matches_oracle(
        eng.sql("select ti, i, s, ds from acid_uwp"),
        con,
        "SELECT ti, i, CASE WHEN s='str_11' THEN 'fred' ELSE s END AS s, "
        "CASE WHEN i % 2 = 0 THEN 'today' ELSE 'tomorrow' END AS ds "
        "FROM srcrows",
    )
    assert sorted(
        e for e in os.listdir(p) if e.startswith("ds=")
    ) == ["ds=today", "ds=tomorrow"]


def test_q_update_delete_where_no_match(acid_env):
    """update_where_no_match.q + delete_where_no_match.q: a predicate
    matching nothing leaves the table byte-identical (and reports 0
    rows affected)."""
    eng, con, root = acid_env
    _mk_table(eng, root, "acid_nm")
    n1 = eng.sql(
        "update acid_nm set s = 'nobody' where s = 'no such value'"
    ).collect()[0][0]
    n2 = eng.sql(
        "delete from acid_nm where s = 'no such value'"
    ).collect()[0][0]
    assert (int(n1), int(n2)) == (0, 0)
    assert_matches_oracle(
        eng.table("acid_nm"), con, "SELECT * FROM srcrows"
    )


def test_q_delete_all_and_where_non_partitioned(acid_env):
    """delete_all_non_partitioned.q + delete_where_non_partitioned.q:
    full-table delete empties the table; predicate delete keeps the
    complement."""
    eng, con, root = acid_env
    _mk_table(eng, root, "acid_dw")
    eng.sql("delete from acid_dw where i < 0")
    assert_matches_oracle(
        eng.table("acid_dw"), con, "SELECT * FROM srcrows WHERE i >= 0"
    )
    eng.sql("delete from acid_dw")
    assert eng.table("acid_dw").count() == 0


def test_q_delete_whole_partition_removes_directory(acid_env):
    """delete_whole_partition.q: DELETE WHERE ds='today' — the emptied
    partition DIRECTORY is removed outright (Hive drops the partition's
    delta base), the other partition's rows and files untouched."""
    eng, con, root = acid_env
    p = _mk_table(eng, root, "acid_dwhp", partitioned=True)
    before_files = set(os.listdir(os.path.join(p, "ds=tomorrow")))
    eng.sql("delete from acid_dwhp where ds = 'today'")
    assert_matches_oracle(
        eng.sql("select ti, i, s, ds from acid_dwhp"),
        con,
        "SELECT ti, i, s, 'tomorrow' AS ds FROM srcrows WHERE i % 2 <> 0",
    )
    entries = [e for e in os.listdir(p) if e.startswith("ds=")]
    assert entries == ["ds=tomorrow"]
    # untouched partition: same physical files (no rewrite happened)
    assert set(os.listdir(os.path.join(p, "ds=tomorrow"))) == before_files


def test_q_delete_all_partitioned(acid_env):
    """delete_all_partitioned.q: an unfiltered DELETE over a
    partitioned table empties every partition."""
    eng, con, root = acid_env
    p = _mk_table(eng, root, "acid_dap", partitioned=True)
    eng.sql("delete from acid_dap")
    assert eng.table("acid_dap").count() == 0
    assert [e for e in os.listdir(p) if e.startswith("ds=")] == []


def test_q_update_after_multiple_inserts(acid_env):
    """update_after_multiple_inserts.q: two INSERT INTO ... VALUES
    batches accumulate, then UPDATE touches one row across both
    batches' data."""
    eng, con, root = acid_env
    p = os.path.join(root, "acid_uami")
    eng.spark.createDataFrame(
        [], "i int, de double, vc string"
    ).write.parquet(p)
    eng.register_table("acid_uami", p)
    eng.sql(
        "insert into table acid_uami values "
        "(1, 109.23, 'mary had a little lamb'), "
        "(6553, 923.19, 'its fleece was white as snow')"
    )
    eng.sql(
        "insert into table acid_uami values "
        "(10, 119.23, 'and everywhere that mary went'), "
        "(65530, 823.19, 'the lamb was sure to go')"
    )
    eng.sql("update acid_uami set de = 3.14 where de = 109.23 or de = 119.23")
    assert_matches_oracle(
        eng.table("acid_uami"),
        con,
        """
        SELECT * FROM (VALUES
          (1, 3.14, 'mary had a little lamb'),
          (6553, 923.19, 'its fleece was white as snow'),
          (10, 3.14, 'and everywhere that mary went'),
          (65530, 823.19, 'the lamb was sure to go'))
        AS t(i, de, vc)
        """,
    )
