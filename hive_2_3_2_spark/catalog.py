"""Catalog: register parquet directories as queryable tables.

Mirrors the reference metastore's table model (Thrift ``struct Table`` /
``Partition`` / ``StorageDescriptor``, reference:
metastore/if/hive_metastore.thrift:277-311) with Spark's own catalog:
a table is a path + format + schema; partitions are directory keys that
Spark discovers and prunes natively (PruneFileSourcePartitions = Hive's
PartitionPruner, ql/.../optimizer/ppr/PartitionPruner.java:74).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's synthetic star schema (TESTDATA.md).
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``sf_dir`` as a DataFrame."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_star_schema(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    """Register every star-schema table as a temp view; returns the DFs.

    Temp views keep the scan lazy: Catalyst still sees the parquet source,
    so predicate pushdown / column pruning / partition pruning all apply
    (verify with ``df.explain`` — PushedFilters/ReadSchema lines).
    """
    dfs: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
