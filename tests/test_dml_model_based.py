"""Model-based randomized DML testing: a seeded generator produces
random INSERT / UPDATE / DELETE statement sequences; each statement runs
through Engine.sql against a parquet table AND is mirrored against an
in-memory DuckDB table holding the same rows; the full table state must
match after EVERY statement.

This is the stateful complement to the per-statement oracle entries
(suite/dml_sql.py): single statements are verified there, but rewrite
bugs that only surface after a particular SEQUENCE (e.g. a DELETE after
an INSERT that changed file layout, an UPDATE over rows a MERGE
produced) need a state-machine walk. The reference's analogue is the
acid_*/dml `.q` scripts that chain statements over one table.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

COLS = "k BIGINT, grp STRING, val DOUBLE"


def _mk_statement(rng: random.Random, next_key: list[int]) -> str:
    kind = rng.choice(["insert", "insert", "update", "update", "delete"])
    grp = rng.choice(["a", "b", "c"])
    if kind == "insert":
        # explicit column list: Hive positional mapping puts partition
        # columns LAST, DuckDB uses declared order — the named form is
        # unambiguous and identical in both engines
        n = rng.randint(1, 3)
        rows = []
        for _ in range(n):
            rows.append(
                f"({next_key[0]}, '{rng.choice(['a', 'b', 'c'])}', "
                f"{rng.randint(-50, 50)}.5)"
            )
            next_key[0] += 1
        return f"INSERT INTO t (k, grp, val) VALUES {', '.join(rows)}"
    if kind == "update":
        op = rng.choice(
            [
                f"val = val + {rng.randint(1, 9)}",
                f"val = -val, grp = '{grp}'",
                "grp = upper(grp)",
            ]
        )
        cond = rng.choice(
            [
                f"grp = '{grp}'",
                f"k % {rng.randint(2, 5)} = 0",
                f"val > {rng.randint(-20, 20)}",
            ]
        )
        return f"UPDATE t SET {op} WHERE {cond}"
    cond = rng.choice(
        [
            f"grp = '{grp}' AND val < {rng.randint(-10, 30)}",
            f"k % {rng.randint(3, 7)} = 1",
            "val IS NULL",
        ]
    )
    return f"DELETE FROM t WHERE {cond}"


def _state(con) -> list[tuple]:
    return sorted(
        con.execute("SELECT k, grp, ROUND(val, 3) FROM t").fetchall()
    )


def _spark_state(eng) -> list[tuple]:
    return sorted(
        (r.k, r.grp, round(r.val, 3) if r.val is not None else None)
        for r in eng.sql("SELECT k, grp, val FROM t").collect()
    )


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_dml_sequences_match_duckdb_state(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"dml_model_{seed}")
    base = [(i, ["a", "b", "c"][i % 3], float(i) - 7.5) for i in range(30)]
    spark.createDataFrame(base, COLS).coalesce(2).write.parquet(path)
    eng = Engine(spark=spark)
    eng.register_table("t", path)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({COLS.replace('STRING', 'VARCHAR')})")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", base)

    next_key = [1000]
    for step in range(12):
        stmt = _mk_statement(rng, next_key)
        n_spark = eng.sql(stmt).collect()[0].rows_affected
        con.execute(stmt)
        assert _spark_state(eng) == _state(con), f"seed {seed} step {step}: {stmt}"
        # affected counts: DELETE/UPDATE counts must match DuckDB's
        if stmt.startswith("INSERT"):
            assert n_spark == stmt.count("(") - 1  # minus the column list
    con.close()


@pytest.mark.parametrize("seed", [7])
def test_random_dml_on_partitioned_table(spark, tmp_path, seed):
    """Same walk over a PARTITIONED table — exercises the
    touched-partition discovery + pruned-rewrite machinery under
    sequences (static PartitionFilters literals, partition dir swaps)."""
    rng = random.Random(seed)
    path = str(tmp_path / "dml_model_part")
    base = [(i, ["a", "b", "c"][i % 3], float(i) - 7.5) for i in range(30)]
    spark.createDataFrame(base, COLS).repartition("grp").write.partitionBy(
        "grp"
    ).parquet(path)
    eng = Engine(spark=spark)
    eng.register_table("t", path, ["grp"])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, grp VARCHAR, val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", base)

    next_key = [1000]
    steps = 0
    while steps < 10:
        stmt = _mk_statement(rng, next_key)
        # partition columns may not be UPDATEd (Hive rule) — skip only
        # when grp is ASSIGNED in the SET list, not when the WHERE
        # clause merely filters on it (partition-filtered UPDATEs are
        # exactly the pruning path this walk must exercise)
        set_part = stmt.split(" WHERE ")[0]
        if stmt.startswith("UPDATE") and (
            "grp =" in set_part.split("SET", 1)[-1]
            or "upper(grp)" in set_part
        ):
            continue
        steps += 1
        eng.sql(stmt)
        con.execute(stmt)
        assert _spark_state(eng) == _state(con), f"step {steps}: {stmt}"
    con.close()
