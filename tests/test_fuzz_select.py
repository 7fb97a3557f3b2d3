"""Randomized SELECT differential testing (a seeded mini-sqlsmith):
generate random-but-valid queries over lineitem/orders from a small
grammar — projections with arithmetic, nested AND/OR predicates,
IN/LIKE/BETWEEN/NULL checks, aggregation with HAVING, ORDER BY+LIMIT,
and joins — run each through Engine.sql AND DuckDB, and compare
canonically. Complements the curated suites the way the reference's
breadth of `.q` files complements its unit tests: the generator reaches
predicate/projection combinations nobody hand-writes.

Determinism rules baked into the grammar (suite conventions):
- LIMIT only under an ORDER BY ending in the unique (l_orderkey,
  l_linenumber) pair — ties would otherwise make the prefix
  engine-dependent;
- double aggregation restricted to exact-in-double columns
  (l_quantity is integral-valued) or MIN/MAX; COUNT cast to BIGINT in
  the oracle (DuckDB INT128);
- no bare int/int division (Hive yields double, DuckDB decimal).
"""

from __future__ import annotations

import random

import pytest

from hive_2_3_2_spark.engine import Engine
from tests.conftest import assert_matches_oracle

NUM_COLS = ["l_quantity", "l_linenumber", "l_orderkey", "l_partkey"]
STR_COLS = ["l_returnflag", "l_linestatus"]


def _pred(rng: random.Random, depth: int = 0) -> str:
    roll = rng.random()
    if depth < 2 and roll < 0.3:
        op = rng.choice(["AND", "OR"])
        return f"({_pred(rng, depth + 1)} {op} {_pred(rng, depth + 1)})"
    kind = rng.choice(["cmp", "in", "between", "like", "null"])
    if kind == "cmp":
        c = rng.choice(NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{c} {op} {rng.randint(0, 40)}"
    if kind == "in":
        c = rng.choice(STR_COLS)
        vals = rng.sample(["'A'", "'N'", "'R'", "'O'", "'F'"], rng.randint(1, 3))
        neg = "NOT " if rng.random() < 0.3 else ""
        return f"{c} {neg}IN ({', '.join(vals)})"
    if kind == "between":
        lo = rng.randint(0, 20)
        return f"l_quantity BETWEEN {lo} AND {lo + rng.randint(1, 20)}"
    if kind == "like":
        pat = rng.choice(["'A%'", "'%F'", "'_'", "'%'"])
        return f"{rng.choice(STR_COLS)} LIKE {pat}"
    c = rng.choice(NUM_COLS + STR_COLS)
    return f"{c} IS {rng.choice(['NOT NULL', 'NULL'])}"


def _gen_query(rng: random.Random) -> str:
    grouped = rng.random() < 0.5
    where = f" WHERE {_pred(rng)}" if rng.random() < 0.8 else ""
    if grouped:
        keys = rng.sample(STR_COLS, rng.randint(1, 2))
        aggs = rng.sample(
            [
                "CAST(COUNT(*) AS BIGINT) AS n",
                "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd",
                "SUM(l_quantity) AS sq",
                "MIN(l_extendedprice) AS mn",
                "MAX(l_extendedprice) AS mx",
                "MIN(l_returnflag) AS ms",
                "SUM(l_linenumber * 2 + 1) AS sl",
            ],
            rng.randint(1, 3),
        )
        having = ""
        if rng.random() < 0.4:
            having = f" HAVING COUNT(*) > {rng.randint(0, 100)}"
        return (
            f"SELECT {', '.join(keys + aggs)} FROM lineitem{where} "
            f"GROUP BY {', '.join(keys)}{having}"
        )
    projs = rng.sample(
        [
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_quantity + 1 AS q1",
            "l_quantity * l_linenumber AS qq",
            "l_returnflag",
            "lower(l_linestatus) AS um",
            "concat(l_returnflag, '-', l_linestatus) AS rs",
            "CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS sz",
            "coalesce(nullif(l_returnflag, 'N'), 'X') AS nf",
        ],
        rng.randint(2, 4),
    )
    q = f"SELECT {', '.join(projs)} FROM lineitem{where}"
    if rng.random() < 0.5:
        q += (
            f" ORDER BY {rng.choice(NUM_COLS)}, l_orderkey, l_linenumber"
            f" LIMIT {rng.randint(1, 200)}"
        )
    return q


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606])
def test_fuzz_selects_match_duckdb(spark, sf_dir, oracle, seed):
    rng = random.Random(seed)
    eng = Engine(spark=spark, sf_dir=sf_dir)
    for i in range(12):
        q = _gen_query(rng)
        try:
            assert_matches_oracle(eng.sql(q), oracle, q)
        except AssertionError as exc:
            raise AssertionError(f"seed {seed} query {i}: {q}\n{exc}") from exc


def test_fuzz_join_shapes_match_duckdb(spark, sf_dir, oracle):
    """Joined variant: random join type + filters over
    lineitem ⋈ orders (equi-key), aggregated to keep results small."""
    rng = random.Random(77)
    eng = Engine(spark=spark, sf_dir=sf_dir)
    for i in range(8):
        how = rng.choice(["JOIN", "LEFT JOIN", "INNER JOIN"])
        lw = _pred(rng)
        ow = rng.choice(
            [
                "o_orderpriority LIKE '1%'",
                "o_totalprice > 50000",
                "o_orderstatus = 'F'",
                "o_custkey % 3 = 0",
            ]
        )
        q = (
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(l_quantity) AS sq "
            f"FROM lineitem {how} orders ON l_orderkey = o_orderkey "
            f"WHERE ({lw}) AND ({ow}) "
            "GROUP BY l_returnflag"
        )
        try:
            assert_matches_oracle(eng.sql(q), oracle, q)
        except AssertionError as exc:
            raise AssertionError(f"join query {i}: {q}\n{exc}") from exc


def test_fuzz_window_shapes_match_duckdb(spark, sf_dir, oracle):
    """Window-function variant: random rank/row_number/aggregate
    windows over random partition keys. Determinism rule: the synthetic
    lineitem has DUPLICATE (l_orderkey, l_linenumber) pairs, so frames
    and offsets order by (l_orderkey, l_linenumber, l_quantity) — with
    the lag/sum argument in the sort key, ties produce identical output
    multisets on both engines; rank may tie (same rank both engines)."""
    rng = random.Random(909)
    eng = Engine(spark=spark, sf_dir=sf_dir)
    for i in range(10):
        part = rng.choice(STR_COLS)
        order_tail = "l_orderkey, l_linenumber, l_quantity"
        fn = rng.choice(
            [
                f"CAST(rank() OVER (PARTITION BY {part} "
                f"ORDER BY l_quantity) AS BIGINT)",
                f"CAST(row_number() OVER (PARTITION BY {part} "
                f"ORDER BY {order_tail}) AS BIGINT)",
                f"SUM(l_quantity) OVER (PARTITION BY {part} "
                f"ORDER BY {order_tail} ROWS BETWEEN UNBOUNDED PRECEDING "
                "AND CURRENT ROW)",
                f"MIN(l_quantity) OVER (PARTITION BY {part})",
                f"lag(l_quantity, 1) OVER (PARTITION BY {part} "
                f"ORDER BY {order_tail})",
                f"lead(l_linenumber, 2) OVER (PARTITION BY {part} "
                f"ORDER BY {order_tail})",
            ]
        )
        q = (
            f"SELECT l_orderkey, l_linenumber, {fn} AS w "
            f"FROM lineitem WHERE {_pred(rng)}"
        )
        try:
            assert_matches_oracle(eng.sql(q), oracle, q)
        except AssertionError as exc:
            raise AssertionError(f"window query {i}: {q}\n{exc}") from exc


def test_fuzz_setops_and_subqueries_match_duckdb(spark, sf_dir, oracle):
    """Set-operation and subquery variant: random
    UNION/INTERSECT/EXCEPT [ALL|DISTINCT] between filtered projections,
    and random IN / EXISTS membership probes against orders."""
    rng = random.Random(1313)
    eng = Engine(spark=spark, sf_dir=sf_dir)
    for i in range(8):
        op = rng.choice(
            ["UNION ALL", "UNION", "INTERSECT", "EXCEPT",
             "INTERSECT ALL", "EXCEPT ALL"]
        )
        q = (
            f"SELECT l_returnflag, l_linenumber FROM lineitem "
            f"WHERE {_pred(rng)} "
            f"{op} "
            f"SELECT l_returnflag, l_linenumber FROM lineitem "
            f"WHERE {_pred(rng)}"
        )
        try:
            assert_matches_oracle(eng.sql(q), oracle, q)
        except AssertionError as exc:
            raise AssertionError(f"setop query {i}: {q}\n{exc}") from exc
    for i in range(6):
        neg = rng.random() < 0.4
        kind = rng.choice(["in", "exists"])
        ow = rng.choice(
            ["o_orderpriority LIKE '1%'", "o_orderstatus = 'F'",
             "o_totalprice > 100000"]
        )
        if kind == "in":
            sub = f"SELECT o_orderkey FROM orders WHERE {ow}"
            cond = f"l_orderkey {'NOT ' if neg else ''}IN ({sub})"
        else:
            sub = (
                f"SELECT 1 FROM orders WHERE o_orderkey = l_orderkey "
                f"AND {ow}"
            )
            cond = f"{'NOT ' if neg else ''}EXISTS ({sub})"
        q = (
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM lineitem WHERE ({_pred(rng)}) AND {cond} "
            "GROUP BY l_returnflag"
        )
        try:
            assert_matches_oracle(eng.sql(q), oracle, q)
        except AssertionError as exc:
            raise AssertionError(f"subquery query {i}: {q}\n{exc}") from exc
