"""join_cond_pushdown_1.q–4.q + join_cond_pushdown_unqual1.q–5.q
replay. The family is EXPLAIN-only in the reference — it pins WHERE
Hive's JoinCondPushdown places each predicate (single-table conditions
sink to the table scan, join conditions to their join level). Here the
same statements are value-checked against DuckDB (CROSS JOIN + WHERE
is the semantics-neutral oracle spelling) and the single-table
constant condition is plan-pinned as a pushed scan filter — Spark's
Catalyst does the identical placement via PushPredicateThroughJoin.

Hive syntax corners exercised: JOIN chains where an early join has NO
ON clause (its conditions arrive in a LATER on), expression join keys
mixing columns of two tables, and (unqual variants) UNQUALIFIED
column names resolving across tables because each table's column
names are globally unique.

Uses a one-row-per-p_name slice of the TPC-H part fixture
(see the qenv comment).
"""

from __future__ import annotations

import os

import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import SF_DIR, assert_matches_oracle

_COLS = ("p1.p_partkey AS k1, p2.p_partkey AS k2, p3.p_partkey AS k3, "
         "p1.p_name AS n1")


@pytest.fixture(scope="module")
def qenv(spark, oracle, tmp_path_factory):
    eng = Engine(spark=spark)
    # the synthetic part fixture has ~31 rows per p_name (64 distinct
    # over 2000) — a 4-way name equi-join over the full table is a
    # ~60M-row blowup in ANY engine, so the family replays over a
    # one-row-per-name slice: the subject is ON-clause PLACEMENT, which
    # duplication only obscures
    root = tmp_path_factory.mktemp("qfiles_jcp")
    p = str(root / "part")
    spark.read.parquet(os.path.join(SF_DIR, "part.parquet")) \
        .groupBy("p_name").agg(
            {"p_partkey": "min", "p_size": "min", "p_brand": "min"}
        ).selectExpr(
            "`min(p_partkey)` AS p_partkey", "p_name",
            "`min(p_brand)` AS p_brand", "`min(p_size)` AS p_size",
        ).coalesce(1).write.parquet(p)
    eng.register_table("part", p)
    oracle.execute(
        "CREATE OR REPLACE VIEW jcp_part AS SELECT * FROM "
        f"read_parquet('{p}/*.parquet')"
    )
    # unqual fixtures: same payload, per-table column prefixes
    df = spark.read.parquet(p)
    for n in (2, 3):
        renamed = df.selectExpr(
            *[f"{c} AS p{n}_{c[2:]}" for c in df.columns]
        )
        renamed.createOrReplaceTempView(f"part{n}")
        cols = ", ".join(
            f"{c} AS p{n}_{c[2:]}" for c in df.columns
        )
        oracle.execute(
            f"CREATE OR REPLACE VIEW part{n} AS SELECT {cols} "
            "FROM jcp_part"
        )
    yield eng, oracle


def test_q_jcp1_all_conditions_on_last_join(qenv):
    """join_cond_pushdown_1.q: `p1 join p2 join p3 on c12 and c23` —
    the p1⋈p2 join has no ON of its own; both conditions arrive in the
    final ON and Hive pushes c12 down a level."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            f"select {_COLS} from part p1 join part p2 join part p3 "
            "on p1.p_name = p2.p_name and p2.p_name = p3.p_name"
        ),
        con,
        f"SELECT {_COLS} FROM jcp_part p1, jcp_part p2, jcp_part p3 "
        "WHERE p1.p_name = p2.p_name AND p2.p_name = p3.p_name",
    )


def test_q_jcp2_four_way_deferred(qenv):
    """join_cond_pushdown_2.q: four tables, ON clauses only after the
    3rd and 4th — conditions reference tables from every level."""
    eng, con = qenv
    cols = _COLS + ", p4.p_partkey AS k4"
    assert_matches_oracle(
        eng.sql(
            f"select {cols} from part p1 join part p2 join part p3 on "
            "p1.p_name = p2.p_name join part p4 on p2.p_name = "
            "p3.p_name and p1.p_name = p4.p_name"
        ),
        con,
        f"SELECT {cols} FROM jcp_part p1, jcp_part p2, jcp_part p3, jcp_part p4 "
        "WHERE p1.p_name = p2.p_name AND p2.p_name = p3.p_name "
        "AND p1.p_name = p4.p_name",
    )


def test_q_jcp3_expression_and_constant_keys(qenv):
    """join_cond_pushdown_1.q stmts 3-4: an expression mixing two
    tables' columns as the join condition, and a single-table constant
    condition (p2.p_partkey = 1) that must prune, not join."""
    eng, con = qenv
    assert_matches_oracle(
        eng.sql(
            f"select {_COLS} from part p1 join part p2 join part p3 on "
            "p2.p_partkey + p1.p_partkey = p1.p_partkey and "
            "p3.p_name = p2.p_name"
        ),
        con,
        f"SELECT {_COLS} FROM jcp_part p1, jcp_part p2, jcp_part p3 "
        "WHERE p2.p_partkey + p1.p_partkey = p1.p_partkey "
        "AND p3.p_name = p2.p_name",
    )
    got = eng.sql(
        f"select {_COLS} from part p1 join part p2 join part p3 on "
        "p2.p_partkey = 1 and p3.p_name = p2.p_name"
    )
    assert_matches_oracle(
        got, con,
        f"SELECT {_COLS} FROM jcp_part p1, jcp_part p2, jcp_part p3 "
        "WHERE p2.p_partkey = 1 AND p3.p_name = p2.p_name",
    )
    # the constant condition reaches p2's SCAN as a pushed filter —
    # Hive's single-table-condition pushdown = Catalyst's
    # PushPredicateThroughJoin + data-source pushdown
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(p_partkey), EqualTo(p_partkey,1)]" \
        in plan or "EqualTo(p_partkey,1)" in plan


def test_q_jcp_unqual_unique_names(qenv):
    """join_cond_pushdown_unqual1.q: column names unique per table
    resolve UNQUALIFIED across the join, including mixed-table
    expressions."""
    eng, con = qenv
    cols = ("p1.p_partkey AS k1, p2_partkey AS k2, p3_partkey AS k3")
    assert_matches_oracle(
        eng.sql(
            f"select {cols} from part p1 join part2 p2 join part3 p3 "
            "on p1.p_name = p2_name and p2_name = p3_name"
        ),
        con,
        f"SELECT {cols} FROM jcp_part p1, part2 p2, part3 p3 "
        "WHERE p1.p_name = p2_name AND p2_name = p3_name",
    )
    assert_matches_oracle(
        eng.sql(
            f"select {cols} from part p1 join part2 p2 join part3 p3 "
            "on p2_partkey + p1.p_partkey = p1.p_partkey and "
            "p3_name = p2_name"
        ),
        con,
        f"SELECT {cols} FROM jcp_part p1, part2 p2, part3 p3 "
        "WHERE p2_partkey + p1.p_partkey = p1.p_partkey "
        "AND p3_name = p2_name",
    )
