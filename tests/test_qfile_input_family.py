"""clientpositive `.q` slice, round 6h: the input* golden family's
distinct shapes (reference: ql/src/test/queries/clientpositive/
input12.q, input20.q, input24.q, input26.q, input41.q, input49.q).
The 87-file family is mostly basic SELECT/INSERT forms already covered
elsewhere; these are the shapes with semantics of their own:

- input12: ONE scan multi-inserted into three sinks where the third
  sink is a static PARTITION of a partitioned table — the mixed
  plain/partitioned fan-out;
- input20/input33: the MAP and REDUCE keyword variants of TRANSFORM
  (SemanticAnalyzer treats MAP/REDUCE/TRANSFORM identically; Spark's
  script transform accepts all three spellings) with DISTRIBUTE BY /
  SORT BY between the script and the sink;
- input24: a partition ADDed but EMPTY — a partition-pruned count must
  return 0, not fail on the missing files;
- input26: UNION ALL of an ORDER BY ... LIMIT subquery and a subquery
  over a partition that does not exist (empty side of a union);
- input41: INSERT from a UNION of aggregates where one branch scans a
  nonexistent partition (count over empty = one 0 row);
- input49: IN predicates with typed literals against every primitive
  column type at once.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_input")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "in_src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p)
    eng.register_table("in_src", p)
    con.execute(
        f"CREATE VIEW in_src AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    p_part = str(root / "in_srcpart")
    prows = [
        (k, v, ds, hr)
        for ds in ("2008-04-08", "2008-04-09")
        for hr in ("11", "12")
        for k, v in SRC
    ]
    spark.createDataFrame(
        prows, "key string, value string, ds string, hr string"
    ).repartition("ds", "hr").write.partitionBy("ds", "hr").parquet(p_part)
    eng.register_table("in_srcpart", p_part, ["ds", "hr"])
    body = ", ".join(f"('{k}', '{v}', '{ds}', '{hr}')" for k, v, ds, hr in prows)
    con.execute(
        "CREATE VIEW in_srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )
    yield eng, con, str(root)
    con.close()


def _mkpart(eng, root, name, ddl, partition_cols):
    """Empty partitioned target: seed a dummy partition for the schema
    file, register, drop the seed (an all-empty partitioned parquet
    write leaves no schema-bearing file)."""
    p = f"{root}/{name}"
    df = eng.spark.createDataFrame([], ddl)
    seed = eng.spark.createDataFrame(
        [tuple("__seed__" if f.name in partition_cols else None
               for f in df.schema.fields)],
        df.schema,
    )
    seed.write.partitionBy(*partition_cols).mode("overwrite").parquet(p)
    eng.register_table(name, p, partition_cols)
    spec = ", ".join(f"{c}='__seed__'" for c in partition_cols)
    eng.sql(f"ALTER TABLE {name} DROP PARTITION ({spec})")


def test_q_input12_mixed_plain_and_partitioned_sinks(qenv):
    """input12.q: three sinks off one scan — two plain, one a static
    PARTITION(ds, hr) of a partitioned table."""
    eng, con, root = qenv
    for name, ddl in (("in_dest1", "key int, value string"),
                      ("in_dest2", "key int, value string")):
        eng.spark.createDataFrame([], ddl).write.mode("overwrite").parquet(
            f"{root}/{name}"
        )
        eng.register_table(name, f"{root}/{name}")
    _mkpart(eng, root, "in_dest3", "key int, ds string, hr string",
            ["ds", "hr"])
    eng.sql(
        "FROM in_src "
        "INSERT OVERWRITE TABLE in_dest1 SELECT in_src.* "
        "WHERE in_src.key < 20 "
        "INSERT OVERWRITE TABLE in_dest2 SELECT in_src.key, in_src.value "
        "WHERE in_src.key >= 20 and in_src.key < 40 "
        "INSERT OVERWRITE TABLE in_dest3 "
        "PARTITION(ds='2008-04-08', hr='12') SELECT in_src.key "
        "WHERE in_src.key >= 40"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM in_dest1"),
        con,
        "SELECT CAST(key AS INT) AS key, value FROM in_src "
        "WHERE TRY_CAST(key AS DOUBLE) < 20",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM in_dest2"),
        con,
        "SELECT CAST(key AS INT) AS key, value FROM in_src "
        "WHERE TRY_CAST(key AS DOUBLE) >= 20 "
        "AND TRY_CAST(key AS DOUBLE) < 40",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, ds, hr FROM in_dest3"),
        con,
        "SELECT CAST(key AS INT) AS key, '2008-04-08' AS ds, '12' AS hr "
        "FROM in_src WHERE TRY_CAST(key AS DOUBLE) >= 40",
    )


def test_q_input20_map_keyword_script(qenv):
    """input20.q shape: the MAP keyword variant of TRANSFORM with
    DISTRIBUTE BY / SORT BY between script and sink."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "FROM ( FROM in_src MAP in_src.key, in_src.value USING 'cat' "
            "AS (tkey, tvalue) DISTRIBUTE BY tkey SORT BY tkey, tvalue "
            ") tmap SELECT tmap.tkey, tmap.tvalue WHERE tmap.tkey < 20"
        ),
        con,
        "SELECT key AS tkey, value AS tvalue FROM in_src "
        "WHERE TRY_CAST(key AS DOUBLE) < 20",
    )


def test_q_input33_reduce_keyword_script(qenv):
    """input33.q shape family: the REDUCE spelling is also accepted and
    behaves identically to TRANSFORM."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "FROM ( FROM in_src REDUCE in_src.key, in_src.value "
            "USING 'cat' AS (tkey, tvalue) ) tred "
            "SELECT tred.tkey WHERE tred.tkey < 10"
        ),
        con,
        "SELECT key AS tkey FROM in_src WHERE TRY_CAST(key AS DOUBLE) < 10",
    )


def test_q_input24_count_over_added_empty_partition(qenv, tmp_path):
    """input24.q: ALTER TABLE ADD PARTITION then count with the
    partition predicate — 0 rows, no missing-file failure."""
    eng, con, root = qenv
    _mkpart(eng, root, "in_tst24", "a int, b int, d string", ["d"])
    eng.sql("ALTER TABLE in_tst24 ADD PARTITION (d='2009-01-01')")
    got = eng.sql(
        "select count(1) AS cnt from in_tst24 x where x.d='2009-01-01'"
    ).collect()
    assert [r.cnt for r in got] == [0]


def test_q_input26_union_with_nonexistent_partition(qenv):
    """input26.q: ORDER BY ... LIMIT subquery UNION ALL a subquery over
    a partition that doesn't exist — the empty branch contributes
    nothing and the limit branch is preserved exactly."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql(
            "select subq.key AS key, subq.value AS value, "
            "subq.ds AS ds, subq.hr AS hr from ( "
            "select * from (select * from in_srcpart a "
            "where a.ds = '2008-04-08' and a.hr = '11' "
            "order by a.key, a.value limit 5) pa "
            "union all "
            "select * from (select * from in_srcpart b "
            "where b.ds = '2008-04-08' and b.hr = '14' limit 5) pb "
            ") subq"
        ),
        con,
        "SELECT key, value, ds, hr FROM "
        "(SELECT * FROM in_srcpart WHERE ds = '2008-04-08' AND hr = '11' "
        "ORDER BY key, value LIMIT 5) pa",
    )


def test_q_input41_insert_union_counts_empty_branch(qenv):
    """input41.q: INSERT from a union of counts where one branch scans
    a nonexistent partition (contributes a 0 row)."""
    eng, con, root = qenv
    eng.spark.createDataFrame([], "cnt int").write.mode("overwrite").parquet(
        f"{root}/in_dest_sp"
    )
    eng.register_table("in_dest_sp", f"{root}/in_dest_sp")
    eng.sql(
        "insert overwrite table in_dest_sp "
        "select * from "
        "  (select count(1) as cnt from in_src "
        "    union all "
        "   select count(1) as cnt from in_srcpart where ds = '2009-08-09' "
        "  ) x"
    )
    assert_matches_oracle(
        eng.sql("SELECT cnt FROM in_dest_sp"),
        con,
        "SELECT CAST(count(1) AS INT) AS cnt FROM in_src "
        "UNION ALL SELECT 0 AS cnt",
    )


def test_q_input49_typed_in_predicates(qenv, spark):
    """input49.q: IN with typed literals against boolean, double,
    float, int, bigint, string, and tinyint columns at once."""
    eng, _, root = qenv
    spark.createDataFrame(
        [(False, 29098519.0, 1410.0, 996, 40408519555, "test_string", 12)],
        "b boolean, d double, f float, i int, l bigint, s string, t tinyint",
    ).write.mode("overwrite").parquet(f"{root}/in_intable")
    eng.register_table("in_intable", f"{root}/in_intable")
    rows = eng.sql(
        "select * from in_intable where d in (29098519.0) "
        "and f in (1410.0) and i in (996) and l in (40408519555) "
        "and s in ('test_string') and t in (12)"
    ).collect()
    assert len(rows) == 1 and rows[0].s == "test_string"
