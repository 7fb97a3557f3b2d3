"""clientpositive `.q` slice, round 6c: louter_join_ppr.q /
router_join_ppr.q — partition pruning under OUTER joins (reference:
ql/src/test/queries/clientpositive/louter_join_ppr.q). The four golden
shapes per direction:

1. partition predicate in the ON clause on the NULL-PRODUCING side —
   prunes that side's scan, preserved rows survive;
2. partition predicate in the ON clause on the PRESERVED side — Hive
   semantics: the predicate only disqualifies MATCHES (rows keep
   flowing null-extended), so it must NOT prune the preserved scan
   into dropping rows;
3. partition predicate in the WHERE clause on the null-producing side —
   binds after null-extension, effectively inner;
4. the Hive FROM-first form (FROM a JOIN b SELECT ... WHERE) itself.

Each shape is value-diffed against DuckDB AND, where pruning is
semantically safe, the physical plan is pinned to show the partition
filter reached the scan (PartitionFilters — partition pruning is the
whole point of the golden)."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.plans.explain import explain_str

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_ppr")
    eng = Engine(spark=spark)
    p_src = str(root / "src")
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        2
    ).write.parquet(p_src)
    eng.register_table("src", p_src)
    # srcpart: the same rows under ds x hr partitions (QTestUtil's
    # standard 2008-04-08/09 x 11/12 layout)
    p_part = str(root / "srcpart")
    rows = [
        (k, v, ds, hr)
        for ds in ("2008-04-08", "2008-04-09")
        for hr in ("11", "12")
        for k, v in SRC
    ]
    spark.createDataFrame(
        rows, "key string, value string, ds string, hr string"
    ).repartition("ds", "hr").write.partitionBy("ds", "hr").parquet(p_part)
    eng.register_table("srcpart", p_part, ["ds", "hr"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{p_src}/*.parquet')"
    )
    body = ", ".join(
        f"('{k}', '{v}', '{ds}', '{hr}')" for k, v, ds, hr in rows
    )
    con.execute(
        "CREATE VIEW srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )
    yield eng, con
    con.close()


_PROJ = "a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv"
_RANGE = (
    "CAST(a.key AS DOUBLE) > 10 AND CAST(a.key AS DOUBLE) < 20 "
    "AND CAST(b.key AS DOUBLE) > 15 AND CAST(b.key AS DOUBLE) < 25"
)


def test_q_louter_ppr_on_clause_null_side(qenv):
    """Shape 1: LOJ with b.ds='2008-04-08' in the ON clause — the
    null-producing side's scan must carry the partition filter, and
    values must match the oracle that applies ds inside the join
    condition."""
    eng, con = qenv
    got = eng.sql(
        f"""
        FROM src a LEFT OUTER JOIN srcpart b
          ON (a.key = b.key AND b.ds = '2008-04-08')
        SELECT {_PROJ}
        WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25
        """
    )
    assert_matches_oracle(
        got, con,
        f"SELECT {_PROJ} FROM src a LEFT OUTER JOIN srcpart b "
        "ON a.key = b.key AND b.ds = '2008-04-08' "
        f"WHERE {_RANGE}",
    )
    plan = explain_str(got)
    assert "PartitionFilters" in plan and "2008-04-08" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "partition filter did not reach the srcpart scan"


def test_q_louter_ppr_on_clause_preserved_side(qenv):
    """Shape 2: srcpart is the PRESERVED side and a.ds='2008-04-08'
    sits in the ON clause — Hive keeps EVERY srcpart row (all four
    partitions), null-extending where ds != 2008-04-08 or keys
    mismatch. The predicate must NOT prune the preserved scan."""
    eng, con = qenv
    got = eng.sql(
        """
        FROM srcpart a LEFT OUTER JOIN src b
          ON (a.key = b.key AND a.ds = '2008-04-08')
        SELECT a.key AS ak, a.value AS av, a.ds AS ads,
               b.key AS bk, b.value AS bv
        WHERE a.key = 17
        """
    )
    assert_matches_oracle(
        got, con,
        "SELECT a.key AS ak, a.value AS av, a.ds AS ads, "
        "b.key AS bk, b.value AS bv "
        "FROM srcpart a LEFT OUTER JOIN src b "
        "ON a.key = b.key AND a.ds = '2008-04-08' "
        "WHERE CAST(a.key AS DOUBLE) = 17",
    )
    # both ds values present: preserved side was NOT pruned
    ds_vals = {str(r.ads) for r in got.collect()}
    assert ds_vals == {"2008-04-08", "2008-04-09"}, ds_vals


def test_q_louter_ppr_where_clause(qenv):
    """Shape 3: the partition predicate in WHERE on the null-producing
    side binds AFTER null-extension (drops the null-extended rows, so
    it behaves as an inner join) AND must prune the srcpart scan."""
    eng, con = qenv
    got = eng.sql(
        f"""
        FROM src a LEFT OUTER JOIN srcpart b ON (a.key = b.key)
        SELECT {_PROJ}
        WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25
          AND b.ds = '2008-04-08'
        """
    )
    assert_matches_oracle(
        got, con,
        f"SELECT {_PROJ} FROM src a LEFT OUTER JOIN srcpart b "
        "ON a.key = b.key "
        f"WHERE {_RANGE} AND b.ds = '2008-04-08'",
    )
    plan = explain_str(got)
    assert "PartitionFilters" in plan and "2008-04-08" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_q_router_ppr_mirror(qenv):
    """router_join_ppr.q: the RIGHT OUTER mirror of shapes 1 and 3 —
    src RIGHT OUTER JOIN srcpart with the partition predicate in ON
    (srcpart preserved: no row loss) and in WHERE (prunes)."""
    eng, con = qenv
    got_on = eng.sql(
        """
        FROM src a RIGHT OUTER JOIN srcpart b
          ON (a.key = b.key AND b.ds = '2008-04-08')
        SELECT b.key AS bk, b.ds AS bds, a.key AS ak
        WHERE b.key = 17
        """
    )
    assert_matches_oracle(
        got_on, con,
        "SELECT b.key AS bk, b.ds AS bds, a.key AS ak "
        "FROM src a RIGHT OUTER JOIN srcpart b "
        "ON a.key = b.key AND b.ds = '2008-04-08' "
        "WHERE CAST(b.key AS DOUBLE) = 17",
    )
    assert {str(r.bds) for r in got_on.collect()} == {
        "2008-04-08", "2008-04-09"
    }
    got_where = eng.sql(
        f"""
        FROM src a RIGHT OUTER JOIN srcpart b ON (a.key = b.key)
        SELECT {_PROJ}
        WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25
          AND b.ds = '2008-04-08' AND b.hr = '11'
        """
    )
    assert_matches_oracle(
        got_where, con,
        f"SELECT {_PROJ} FROM src a RIGHT OUTER JOIN srcpart b "
        f"ON a.key = b.key WHERE {_RANGE} "
        "AND b.ds = '2008-04-08' AND b.hr = '11'",
    )
    plan = explain_str(got_where)
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "2008-04-08" in pf and "11" in pf


def test_q_transform_ppr_nested_from_first(qenv):
    """transform_ppr1.q: TRANSFORM ... USING 'cat' inside a nested
    FROM-first subquery with CLUSTER BY, the outer WHERE carrying both
    a data predicate (tkey < 100, string→double coercion on the
    transformed column) and the partition predicate (ds =
    '2008-04-08') — the ScriptOperator's output must still prune and
    filter correctly."""
    eng, con = qenv
    got = eng.sql(
        """
        FROM (
          FROM srcpart src
          SELECT TRANSFORM(src.ds, src.key, src.value)
                 USING 'cat' AS (ds, tkey, tvalue)
          CLUSTER BY tkey
        ) tmap
        SELECT tmap.tkey, tmap.tvalue
        WHERE tmap.tkey < 100 AND tmap.ds = '2008-04-08'
        """
    )
    assert_matches_oracle(
        got, con,
        "SELECT key AS tkey, value AS tvalue FROM srcpart "
        "WHERE CAST(key AS DOUBLE) < 100 AND ds = '2008-04-08'",
    )
