"""clientpositive `.q` slice, round 6: the bucket/SMB mapjoin family
(smb_mapjoin_1.q-5.q, bucketmapjoin1.q) and the ON-clause null-semantics
goldens (join_nulls.q, join_filters.q, join_nullsafe.q) — historically
the most bug-dense join family in Hive (reference:
ql/src/test/queries/clientpositive/smb_mapjoin_1.q ff.).

Method: the smb_bucket_1/2/3 fixture contents are reproduced from the
golden outputs (smbbucket_*.rc is RCFile; the `.q.out` full-outer-join
blocks enumerate every row), written as REAL bucketed+sorted tables via
write_bucketed_table, and each golden's statement shapes replay through
Engine.sql diffed order-insensitively against DuckDB. `SELECT *` in the
goldens becomes an explicit aliased projection (duplicate column names
break any order-insensitive diff); `<=>` translates to DuckDB's
IS NOT DISTINCT FROM. Hive's SMB machinery itself (hints + bucket
configs) maps to Catalyst's bucketed SMJ: matched bucket counts join
exchange-free (pinned in tests/test_plan_regression.py:221); the
MISMATCHED-bucket-count cases here pin that correctness survives when
Spark must shuffle one side — the golden family's own point.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.sources.writers import write_bucketed_table

from tests.conftest import assert_matches_oracle

# smb_bucket_* contents recovered from smb_mapjoin_1/2.q.out golden rows
B1 = [(1, "val_1"), (3, "val_3"), (4, "val_4"), (5, "val_5"), (10, "val_10")]
B2 = [(20, "val_20"), (23, "val_23"), (25, "val_25"), (30, "val_30")]
B3 = [(4, "val_4"), (10, "val_10"), (17, "val_17"), (19, "val_19"),
      (20, "val_20"), (23, "val_23")]
# data/files/in1.txt, in3.txt, in8.txt (\x01-delimited, blank = NULL)
IN1 = [(None, 35), (48, None), (100, 100)]
IN3 = [(12, 35), (None, 40), (48, None), (100, 100)]
IN8 = [(None, None), (None, 10), (10, None), (None, 35), (48, None),
       (100, 100)]
# smb_input = in4.txt + in5.txt, first two fields (LazySimpleSerDe drops
# the extra columns of a 4-field line against a 2-column table)
SMB_INPUT = [
    (None, 35), (10, 1000), (100, 100), (12, None), (10, 100), (10, 100),
    (12, 100),
    (5, 10005), (15, 10015), (20, 10020), (25, 10025), (30, 10030),
    (35, 10035), (40, 10040), (40, 10040), (50, 10050), (50, 10050),
    (50, 10050), (60, 10040), (60, 10040), (70, 10040), (70, 10040),
    (80, 10040), (80, 10040), (None, 10050), (None, None),
]


def _values_view(con, name: str, rows, cols: str) -> None:
    body = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM (VALUES {body}) AS t({cols})")


@pytest.fixture(scope="module")
def qenv(spark):
    eng = Engine(spark=spark)
    # real bucketed+sorted tables — Catalyst sees the bucket spec
    for name, rows, nb in (
        ("qbj_smb1", B1, 1), ("qbj_smb2", B2, 1), ("qbj_smb3", B3, 1),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed_table(
            spark.createDataFrame(rows, "key int, value string"),
            name, ["key"], nb, sort_cols=["key"],
        )
    # join_nullsafe.q tail: smb_input1 bucketed by key, smb_input2 by
    # value — DIFFERENT bucket columns, so a key=value join always
    # shuffles one side; correctness must hold anyway
    smb_df = [(k, v) for k, v in SMB_INPUT]
    spark.sql("DROP TABLE IF EXISTS qbj_smbin1")
    spark.sql("DROP TABLE IF EXISTS qbj_smbin2")
    write_bucketed_table(
        spark.createDataFrame(smb_df, "key int, value int"),
        "qbj_smbin1", ["key"], 2, sort_cols=["key"],
    )
    write_bucketed_table(
        spark.createDataFrame(smb_df, "key int, value int"),
        "qbj_smbin2", ["value"], 2, sort_cols=["value"],
    )
    for name, rows in (("myinput1", IN1), ("myinput3", IN3), ("myinput8", IN8)):
        spark.createDataFrame(
            rows, "key int, value int"
        ).createOrReplaceTempView(name)
    con = duckdb.connect()
    for name, rows, cols in (
        ("qbj_smb1", B1, "key, value"), ("qbj_smb2", B2, "key, value"),
        ("qbj_smb3", B3, "key, value"),
        ("qbj_smbin1", SMB_INPUT, "key, value"),
        ("qbj_smbin2", SMB_INPUT, "key, value"),
        ("myinput1", IN1, "key, value"), ("myinput3", IN3, "key, value"),
        ("myinput8", IN8, "key, value"),
    ):
        _values_view(con, name, rows, cols)
    yield eng, con
    con.close()
    for name in ("qbj_smb1", "qbj_smb2", "qbj_smb3", "qbj_smbin1",
                 "qbj_smbin2"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _chk(eng, con, hive_sql: str, duck_sql: str | None = None) -> None:
    duck = duck_sql or hive_sql
    duck = duck.replace("<=>", " IS NOT DISTINCT FROM ")
    assert_matches_oracle(eng.sql(hive_sql), con, duck)


_AB = ("a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv")
_ABC = _AB + ", c.key AS ck, c.value AS cv"


def test_q_smb_mapjoin_1_join_types_disjoint(qenv):
    """smb_mapjoin_1.q: all four join types between two 1-bucket sorted
    tables with DISJOINT key sets — inner empty, left/right null-extend
    every row, full is the disjoint union. Both mapjoin-hint directions
    in the golden collapse to the same SMJ here."""
    eng, con = qenv
    for jt in ("join", "left outer join", "right outer join",
               "full outer join"):
        _chk(eng, con,
             f"select {_AB} from qbj_smb1 a {jt} qbj_smb2 b on a.key = b.key")


def test_q_smb_mapjoin_2_join_types_partial_overlap(qenv):
    """smb_mapjoin_2.q: smb_bucket_1 vs smb_bucket_3 share keys {4,10};
    outer sides null-extend exactly the non-overlap."""
    eng, con = qenv
    for jt in ("join", "left outer join", "right outer join",
               "full outer join"):
        _chk(eng, con,
             f"select {_AB} from qbj_smb1 a {jt} qbj_smb3 b on a.key = b.key")


def test_q_smb_mapjoin_3_join_types_overlap_23(qenv):
    """smb_mapjoin_3.q: smb_bucket_2 vs smb_bucket_3 share {20,23}."""
    eng, con = qenv
    for jt in ("join", "left outer join", "right outer join",
               "full outer join"):
        _chk(eng, con,
             f"select {_AB} from qbj_smb2 a {jt} qbj_smb3 b on a.key = b.key")


def test_q_smb_mapjoin_4_three_way_mixed_outer(qenv):
    """smb_mapjoin_4.q: three-table chains a⋈b on a.key=b.key then
    (b.key=c.key) with every second-join type. The left-outer first join
    makes b.key NULL for unmatched a rows; the second join's ON
    b.key=c.key then never matches those — the classic ON-vs-NULL
    corner this family pins."""
    eng, con = qenv
    for j1 in ("join", "left outer join"):
        for j2 in ("join", "left outer join", "right outer join",
                   "full outer join"):
            _chk(
                eng, con,
                f"select {_ABC} from qbj_smb1 a {j1} qbj_smb2 b "
                f"on a.key = b.key {j2} qbj_smb3 c on b.key = c.key",
            )


def test_q_smb_mapjoin_5_three_way_right_full_first(qenv):
    """smb_mapjoin_5.q: same chains with right/full as the FIRST join —
    a-side NULLs flow into the second join's key."""
    eng, con = qenv
    for j1 in ("right outer join", "full outer join"):
        for j2 in ("join", "left outer join", "full outer join"):
            _chk(
                eng, con,
                f"select {_ABC} from qbj_smb1 a {j1} qbj_smb2 b "
                f"on a.key = b.key {j2} qbj_smb3 c on b.key = c.key",
            )


def test_q_bucketmapjoin_mismatched_bucket_counts(spark, qenv):
    """bucketmapjoin1.q-5.q core: tables bucketed on the same key but
    with DIFFERENT bucket counts (2 vs 4 here, like srcbucket_mapjoin's
    2 vs srcbucket_mapjoin_part's 4). Hive's bucket mapjoin handles
    count divisibility specially; Spark re-shuffles the mismatched side
    — either way the answer must equal the unbucketed oracle join."""
    eng, con = qenv
    rows = [(i % 37, f"val_{i % 37}") for i in range(200)]
    spark.sql("DROP TABLE IF EXISTS qbj_mm2")
    spark.sql("DROP TABLE IF EXISTS qbj_mm4")
    write_bucketed_table(
        spark.createDataFrame(rows[:120], "key int, value string"),
        "qbj_mm2", ["key"], 2, sort_cols=["key"],
    )
    write_bucketed_table(
        spark.createDataFrame(rows[80:], "key int, value string"),
        "qbj_mm4", ["key"], 4, sort_cols=["key"],
    )
    _values_view(con, "qbj_mm2", rows[:120], "key, value")
    _values_view(con, "qbj_mm4", rows[80:], "key, value")
    try:
        _chk(
            eng, con,
            "select a.key AS k, a.value AS av, b.value AS bv "
            "from qbj_mm2 a join qbj_mm4 b on a.key = b.key "
            "where a.key < 20",
        )
        _chk(
            eng, con,
            "select a.key AS k, count(*) AS n from qbj_mm2 a "
            "left outer join qbj_mm4 b on a.key = b.key "
            "group by a.key",
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS qbj_mm2")
        spark.sql("DROP TABLE IF EXISTS qbj_mm4")
        con.execute("DROP VIEW qbj_mm2")
        con.execute("DROP VIEW qbj_mm4")


def test_q_join_nulls_equi_battery(qenv):
    """join_nulls.q: NULL keys never equi-match (not even NULL=NULL) but
    outer joins still null-extend the row — every (join type × key
    pairing) over in1.txt's {(NULL,35),(48,NULL),(100,100)}."""
    eng, con = qenv
    for jt in ("join", "left outer join", "right outer join",
               "full outer join"):
        for cond in ("a.key = b.value", "a.key = b.key",
                     "a.value = b.value",
                     "a.value = b.value and a.key = b.key"):
            _chk(eng, con,
                 f"select {_AB} from myinput1 a {jt} myinput1 b on {cond}")


def test_q_join_nulls_cross_shapes(qenv):
    """join_nulls.q head: JOIN with NO condition — a 3x3 cartesian;
    outer variants with ON TRUE behave identically (no null extension
    when both sides are non-empty)."""
    eng, con = qenv
    _chk(eng, con,
         f"select {_AB} from myinput1 a join myinput1 b",
         f"select {_AB} from myinput1 a cross join myinput1 b")
    for jt in ("left outer join", "right outer join"):
        _chk(eng, con,
             f"select {_AB} from myinput1 a {jt} myinput1 b on true",
             f"select {_AB} from myinput1 a {jt} myinput1 b on true")


def test_q_join_nulls_three_way_chains(qenv):
    """join_nulls.q tail: LOJ-then-ROJ and ROJ-then-LOJ chains on value
    — the b-side NULLs from the first outer join flow into the second
    join's condition."""
    eng, con = qenv
    _chk(
        eng, con,
        f"select {_ABC} from myinput1 a left outer join myinput1 b "
        "on (a.value = b.value) right outer join myinput1 c "
        "on (b.value = c.value)",
    )
    _chk(
        eng, con,
        f"select {_ABC} from myinput1 a right outer join myinput1 b "
        "on (a.value = b.value) left outer join myinput1 c "
        "on (b.value = c.value)",
    )


_F_A = "a.key > 40 AND a.value > 50 AND a.key = a.value"
_F_B = "b.key > 40 AND b.value > 50 AND b.key = b.value"


def test_q_join_filters_on_clause_battery(qenv):
    """join_filters.q: single-side predicates in the ON clause bind
    BEFORE null-extension — for outer joins they disqualify matches but
    never drop preserved-side rows. Pure-filter ON (no equi key) plus
    each key pairing, all four join types, over in3.txt."""
    eng, con = qenv
    for jt in ("join", "left outer join", "right outer join",
               "full outer join"):
        _chk(eng, con,
             f"select {_AB} from myinput3 a {jt} myinput3 b "
             f"on {_F_A} AND {_F_B}")
        for key in ("a.key = b.value", "a.key = b.key",
                    "a.value = b.value"):
            _chk(eng, con,
                 f"select {_AB} from myinput3 a {jt} myinput3 b "
                 f"on {key} AND {_F_A} AND {_F_B}")


def test_q_join_filters_three_way_chains(qenv):
    """join_filters.q tail: filtered LOJ-then-ROJ chains — the second
    join's ON references b columns that may already be NULL."""
    eng, con = qenv
    f_c = "c.key > 40 AND c.value > 50 AND c.key = c.value"
    _chk(
        eng, con,
        f"select {_ABC} from myinput3 a left outer join myinput3 b "
        f"on (a.value = b.value AND {_F_A} AND {_F_B}) "
        f"right outer join myinput3 c "
        f"on (b.value = c.value AND {f_c} AND {_F_B})",
    )
    _chk(
        eng, con,
        f"select {_ABC} from myinput3 a right outer join myinput3 b "
        f"on (a.value = b.value AND {_F_A} AND {_F_B}) "
        f"left outer join myinput3 c "
        f"on (b.key = c.key AND {f_c} AND {_F_B})",
    )


def test_q_join_nullsafe_merging(qenv):
    """join_nullsafe.q head: `<=>` matches NULL with NULL; mixed
    nullsafe/plain multi-key joins and the 3-way merge shapes over
    in8.txt (which has NULLs on BOTH columns)."""
    eng, con = qenv
    _chk(eng, con,
         f"select {_AB} from myinput8 a join myinput8 b on a.key<=>b.value")
    _chk(eng, con,
         f"select {_ABC} from myinput8 a join myinput8 b "
         "on a.key<=>b.value join myinput8 c on a.key=c.key")
    _chk(eng, con,
         f"select {_ABC} from myinput8 a join myinput8 b "
         "on a.key<=>b.value join myinput8 c on a.key<=>c.key")
    _chk(eng, con,
         f"select {_ABC} from myinput8 a join myinput8 b "
         "on a.key<=>b.value AND a.value=b.key join myinput8 c "
         "on a.key<=>c.key AND a.value=c.value")
    _chk(eng, con,
         f"select {_ABC} from myinput8 a join myinput8 b "
         "on a.key<=>b.value AND a.value<=>b.key join myinput8 c "
         "on a.key<=>c.key AND a.value<=>c.value")


def test_q_join_nullsafe_outer_and_transitive(qenv):
    """join_nullsafe.q: nullsafe under outer joins, and the HIVE-3315
    transitive-predicate case (a.key<=>b.value AND a.key IS NULL must
    keep the NULL<=>NULL matches)."""
    eng, con = qenv
    for jt in ("left outer join", "right outer join", "full outer join"):
        _chk(eng, con,
             f"select {_AB} from myinput8 a {jt} myinput8 b "
             "on a.key<=>b.value")
    _chk(eng, con,
         f"select {_AB} from myinput8 a join myinput8 b "
         "on a.key<=>b.value AND a.key is NULL")


def test_q_join_nullsafe_smb_buckets(qenv):
    """join_nullsafe.q tail: the same nullsafe semantics over REAL
    bucketed tables — smb_input1 bucketed by key, smb_input2 by value;
    the key<=>value join crosses bucket layouts (Hive's SMB machinery
    vs a forced exchange here; answers must agree with the oracle)."""
    eng, con = qenv
    _chk(eng, con,
         f"select {_AB} from qbj_smbin1 a join qbj_smbin1 b "
         "on a.key <=> b.key")
    _chk(eng, con,
         f"select {_AB} from qbj_smbin1 a join qbj_smbin1 b "
         "on a.key <=> b.key AND a.value <=> b.value")
    _chk(eng, con,
         f"select {_AB} from qbj_smbin1 a right outer join qbj_smbin1 b "
         "on a.key <=> b.key")
    _chk(eng, con,
         f"select {_AB} from qbj_smbin1 a join qbj_smbin2 b "
         "on a.key <=> b.value")
    _chk(eng, con,
         f"select {_AB} from qbj_smbin1 a left outer join qbj_smbin2 b "
         "on a.key <=> b.value")
    _chk(eng, con,
         f"select {_AB} from qbj_smbin2 a join qbj_smbin2 b "
         "on a.value <=> b.value")
    _chk(eng, con,
         f"select {_AB} from qbj_smbin2 a left outer join qbj_smbin2 b "
         "on a.value <=> b.value")


def test_q_auto_sortmerge_join_divisible_bucket_counts(spark, tmp_path_factory):
    """auto_sortmerge_join_1.q family: Hive's SMB join handles
    DIVISIBLE bucket counts exchange-free (a 2-bucket table joins a
    4-bucket table by reading two buckets per task). Spark parity via
    coalesceBucketsInJoin (on in ENGINE_CONFS): values match and the
    join plans ZERO Exchange operators with broadcast off — at scale
    this removes both shuffles from every mixed-bucket-count join."""
    import os
    import shutil

    eng = Engine(spark=spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t, n in (("asmb_t2", 2), ("asmb_t4", 4)):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY "
            f"(key) SORTED BY (key) INTO {n} BUCKETS STORED AS PARQUET"
        )
        eng.sql(
            f"INSERT INTO {t} SELECT CAST(id AS INT), CAST(id AS STRING) "
            "FROM range(1000)"
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = eng.sql(
            "SELECT a.key AS k, a.value AS v, b.value AS w FROM "
            "asmb_t2 a JOIN asmb_t4 b ON a.key = b.key"
        )
        assert df.count() == 1000
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("asmb_t2", "asmb_t4"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_bucketmapjoin2_partitioned_mismatched_buckets(spark):
    """bucketmapjoin2/3.q: PARTITIONED bucketed tables with MISMATCHED
    bucket counts (4 vs 2) joined across partitions — Hive's bucket
    map join walks divisible buckets; correctness must survive however
    Spark plans it (bucket coalescing applies per the session conf)."""
    import os
    import shutil

    import duckdb

    eng = Engine(spark=spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t, n in (("bmj_p4", 4), ("bmj_p2", 2)):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) "
            "PARTITIONED BY (ds STRING) "
            f"CLUSTERED BY (key) INTO {n} BUCKETS STORED AS PARQUET"
        )
        for ds in ("2008-04-08", "2008-04-09"):
            eng.sql(
                f"INSERT INTO {t} PARTITION (ds='{ds}') "
                "SELECT CAST(id % 120 AS INT), CAST(id AS STRING) "
                "FROM range(300)"
            )
    got = eng.sql(
        "SELECT a.key AS k, COUNT(*) AS cnt FROM bmj_p4 a JOIN bmj_p2 b "
        "ON a.key = b.key WHERE a.ds = '2008-04-08' AND b.ds = "
        "'2008-04-09' GROUP BY a.key ORDER BY k"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW r AS SELECT CAST(range % 120 AS INT) AS key, "
        "CAST(range AS VARCHAR) AS value FROM range(300)"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT a.key AS k, CAST(COUNT(*) AS BIGINT) AS cnt FROM r a "
        "JOIN r b ON a.key = b.key GROUP BY a.key ORDER BY k",
    )
    con.close()
    for t in ("bmj_p4", "bmj_p2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_q_smb_mapjoin7_empty_bigtable_outer(spark):
    """smb_mapjoin_7.q: outer SMB join where the big table is EMPTY —
    every small-table row survives with NULLs (empty-bucket handling,
    historically a Hive SMB crash corner)."""
    import os
    import shutil

    eng = Engine(spark=spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("smb7_empty", "smb7_full"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        eng.sql(
            f"CREATE TABLE {t} (key INT, value STRING) CLUSTERED BY "
            "(key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET"
        )
    eng.sql(
        "INSERT INTO smb7_full SELECT CAST(id AS INT), "
        "CAST(id AS STRING) FROM range(20)"
    )
    rows = eng.sql(
        "SELECT a.key AS k1, b.key AS k2 FROM smb7_empty a "
        "RIGHT OUTER JOIN smb7_full b ON a.key = b.key ORDER BY k2"
    ).collect()
    assert len(rows) == 20
    assert all(r.k1 is None for r in rows)
    rows = eng.sql(
        "SELECT a.key AS k1, b.key AS k2 FROM smb7_empty a "
        "FULL OUTER JOIN smb7_full b ON a.key = b.key ORDER BY k2"
    ).collect()
    assert len(rows) == 20 and all(r.k1 is None for r in rows)
    for t in ("smb7_empty", "smb7_full"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
