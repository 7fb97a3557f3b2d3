"""Differential test: every suite query vs its DuckDB oracle.

This is an in-repo mirror of the driver's t2 correctness gate — if this
file is green, CORRECTNESS_r{N}.json should be too.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.suite import load_all
from tests.conftest import assert_matches_oracle

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, oracle, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema is not None
