"""clientpositive `.q` slice, round 6h: the mapjoin_* hint golden
family beyond mapjoin1 (reference: ql/src/test/queries/clientpositive/
mapjoin_distinct.q, mapjoin_filter_on_outerjoin.q, mapjoin_mapjoin.q,
mapjoin_subquery.q, join_reorder2.q).

The family's contract: /*+ MAPJOIN(t) */ and /*+ STREAMTABLE(t) */ are
physical hints (Hive's MapJoinProcessor / the streamed-table pick) and
must never change answers. Spark maps MAPJOIN to its own broadcast
hint and ignores unknown hints with a warning, so each shape is
value-diffed against an unhinted DuckDB oracle:

- mapjoin_distinct: FROM-first + hint + SELECT DISTINCT, with and
  without ORDER BY/LIMIT on top;
- mapjoin_filter_on_outerjoin: hinting BOTH sides of a RIGHT OUTER
  whose ON carries contradictory one-sided filters, chained into an
  inner join (Hive's golden pins that the hint cannot break the
  null-extension semantics);
- mapjoin_mapjoin: two chained joins on different keys (value then
  key) with a residual range filter, plus the count-by-partition
  variant;
- join_reorder2: STREAMTABLE hint on a 4-way chain.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
SRC1 = (
    [(str(k), f"val_{k}") for k in (66, 98, 128, 146, 150, 213, 224, 238)]
    + [("", f"val_{k}") for k in (165, 193, 265, 27)]
    + [("", "")] * 3
    + [(str(k), f"val_{k}") for k in (273, 278, 311, 369, 401, 406, 4, 8, 2, 5)]
)


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_mapjoin")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    for name, rows in (("mj_src", SRC), ("mj_src1", SRC1)):
        p = str(root / name)
        spark.createDataFrame(rows, "key string, value string").coalesce(
            2
        ).write.parquet(p)
        eng.register_table(name, p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{p}/*.parquet')"
        )
    p_part = str(root / "mj_srcpart")
    prows = [
        (k, v, ds, hr)
        for ds in ("2008-04-08", "2008-04-09")
        for hr in ("11", "12")
        for k, v in SRC
    ]
    spark.createDataFrame(
        prows, "key string, value string, ds string, hr string"
    ).repartition("ds", "hr").write.partitionBy("ds", "hr").parquet(p_part)
    eng.register_table("mj_srcpart", p_part, ["ds", "hr"])
    body = ", ".join(f"('{k}', '{v}', '{ds}', '{hr}')" for k, v, ds, hr in prows)
    con.execute(
        "CREATE VIEW mj_srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )
    yield eng, con
    con.close()


def test_q_mapjoin_distinct_from_first(qenv):
    """mapjoin_distinct.q: FROM-first join of two partition slices,
    hint + SELECT DISTINCT; then the ORDER BY/LIMIT variant."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "FROM mj_srcpart c JOIN mj_srcpart d "
            "ON ( c.key=d.key AND c.ds='2008-04-08' AND d.ds='2008-04-08') "
            "SELECT /*+ MAPJOIN(d) */ DISTINCT c.value"
        ),
        con,
        "SELECT DISTINCT c.value AS value FROM mj_srcpart c "
        "JOIN mj_srcpart d ON c.key = d.key "
        "AND c.ds = '2008-04-08' AND d.ds = '2008-04-08'",
    )
    assert_matches_oracle(
        eng.sql(
            "FROM mj_srcpart c JOIN mj_srcpart d "
            "ON ( c.key=d.key AND c.ds='2008-04-08' AND d.ds='2008-04-08') "
            "SELECT /*+ MAPJOIN(d) */ DISTINCT c.value as value "
            "order by value limit 10"
        ),
        con,
        "SELECT DISTINCT c.value AS value FROM mj_srcpart c "
        "JOIN mj_srcpart d ON c.key = d.key "
        "AND c.ds = '2008-04-08' AND d.ds = '2008-04-08' "
        "ORDER BY value LIMIT 10",
    )


def test_q_mapjoin_filter_on_outerjoin(qenv):
    """mapjoin_filter_on_outerjoin.q: hinted and unhinted runs of a
    RIGHT OUTER with contradictory ON filters chained into an inner
    join must agree with the oracle AND each other."""
    eng, con = qenv
    oracle = (
        "SELECT src1.key AS k1, src1.value AS v1, "
        "src2.key AS k2, src3.key AS k3 "
        "FROM mj_src1 src1 RIGHT OUTER JOIN mj_src1 src2 "
        "ON src1.key = src2.key "
        "AND TRY_CAST(src1.key AS DOUBLE) < 10 "
        "AND TRY_CAST(src2.key AS DOUBLE) > 10 "
        "JOIN mj_src src3 ON src2.key = src3.key "
        "AND TRY_CAST(src3.key AS DOUBLE) < 300"
    )
    for hint in ("", "/*+ mapjoin(src1, src2) */ "):
        assert_matches_oracle(
            eng.sql(
                f"SELECT {hint}src1.key AS k1, src1.value AS v1, "
                "src2.key AS k2, src3.key AS k3 FROM mj_src1 src1 "
                "RIGHT OUTER JOIN mj_src1 src2 "
                "ON (src1.key = src2.key AND src1.key < 10 "
                "AND src2.key > 10) "
                "JOIN mj_src src3 "
                "ON (src2.key = src3.key AND src3.key < 300)"
            ),
            con, oracle,
        )


def test_q_mapjoin_mapjoin_chained_keys(qenv):
    """mapjoin_mapjoin.q: chained joins on value then key with a
    residual range filter; then count(*) grouped by partition col."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            "select mj_srcpart.key AS key from mj_srcpart "
            "join mj_src on (mj_srcpart.value=mj_src.value) "
            "join mj_src1 on (mj_srcpart.key=mj_src1.key) "
            "where mj_srcpart.value > 'val_450'"
        ),
        con,
        "SELECT p.key AS key FROM mj_srcpart p "
        "JOIN mj_src s ON p.value = s.value "
        "JOIN mj_src1 s1 ON p.key = s1.key WHERE p.value > 'val_450'",
    )
    assert_matches_oracle(
        eng.sql(
            "select count(*) AS cnt from mj_srcpart "
            "join mj_src on (mj_srcpart.value=mj_src.value) "
            "join mj_src src1 on (mj_srcpart.key=src1.key) group by ds"
        ),
        con,
        "SELECT CAST(count(*) AS BIGINT) AS cnt FROM mj_srcpart p "
        "JOIN mj_src s ON p.value = s.value "
        "JOIN mj_src src1 ON p.key = src1.key GROUP BY ds",
    )


def test_q_join_reorder2_streamtable_hint(qenv):
    """join_reorder2.q: the STREAMTABLE hint parses (Spark warns and
    ignores unknown hints) and the 4-way chain answers match."""
    eng, con = qenv
    oracle = (
        "SELECT a.key AS ak, b.key AS bk, c.key AS ck, d.key AS dk "
        "FROM mj_src1 a JOIN mj_src1 b ON a.key = b.key "
        "JOIN mj_src1 c ON b.key = c.key "
        "JOIN mj_src1 d ON c.key = d.key"
    )
    for hint in ("", "/*+ STREAMTABLE(a) */ "):
        assert_matches_oracle(
            eng.sql(
                f"SELECT {hint}a.key AS ak, b.key AS bk, "
                "c.key AS ck, d.key AS dk "
                "FROM mj_src1 a JOIN mj_src1 b ON a.key = b.key "
                "JOIN mj_src1 c ON b.key = c.key "
                "JOIN mj_src1 d ON c.key = d.key"
            ),
            con, oracle,
        )
