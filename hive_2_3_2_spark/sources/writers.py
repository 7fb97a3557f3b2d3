"""Writers — FileSinkOperator's surface on Spark writes.

Reference: FileSinkOperator (ql/.../exec/FileSinkOperator.java:91) handles
dynamic partitions, bucketing, compression; MoveTask finalizes INSERT
OVERWRITE; MERGE/UPDATE/DELETE compile through
parse/UpdateDeleteSemanticAnalyzer.java:62-86 onto ACID deltas.

Spark-first: df.write.partitionBy/bucketBy; dynamic partition overwrite
(session conf partitionOverwriteMode=dynamic = Hive's INSERT OVERWRITE
semantics of replacing only touched partitions); MERGE emulated as
join + dynamic partition overwrite (documented non-atomic across
partitions — plain parquet has no transaction log; see SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    sort_within: list[str] | None = None,
) -> None:
    """Dynamic-partition write (FileSinkOperator DP path). At 100 TB,
    repartition by the partition cols first so each task writes few files
    (= Hive's SortedDynPartitionOptimizer, optimizer/Optimizer.java:128 —
    avoids the classic one-file-per-task-per-partition explosion)."""
    out = df.repartition(*partition_cols)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.partitionBy(*partition_cols).format(fmt).mode(mode).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed (+sorted) table — StorageDescriptor bucketCols/sortCols
    parity (metastore/if/hive_metastore.thrift:285-286). Spark SMJ then
    joins two same-bucketed tables with NO shuffle (SMB join,
    exec/SMBMapJoinOperator.java:60)."""
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format(fmt).mode(mode).saveAsTable(table)


def insert_overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """INSERT OVERWRITE with dynamic partitioning: replaces ONLY the
    partitions present in ``df`` (session conf
    spark.sql.sources.partitionOverwriteMode=dynamic), leaving others
    intact — exact Hive semantics (nonstrict dynamic partition mode)."""
    (
        df.repartition(*partition_cols)
        .write.partitionBy(*partition_cols)
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
    delete_condition: Column | None = None,
) -> None:
    """MERGE INTO emulation: upsert ``updates`` into the parquet table at
    ``target_path`` (WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
    INSERT, optional WHEN MATCHED AND cond THEN DELETE).

    Reference: parse/UpdateDeleteSemanticAnalyzer.java:86 rewrites MERGE
    onto ACID base+delta files with background compaction
    (ql/.../txn/compactor/). Plain parquet has no delta log, so the
    emulation rewrites affected data: full-outer join target↔updates on
    the keys, prefer the update side, then atomically-per-partition
    rewrite (dynamic overwrite writes only partitions containing matches
    when ``partition_cols`` is set — the non-atomicity across partitions
    is inherent and documented; ACID parity needs a table format with a
    log, e.g. Delta/Iceberg, out of scope per SURVEY §7.4).
    """
    target = spark.read.parquet(target_path)
    cols = target.columns
    t = target.alias("t")
    u = updates.alias("u")
    cond = [F.col(f"t.{k}") == F.col(f"u.{k}") for k in key_cols]
    joined = t.join(u, cond, "full_outer")
    merged = joined.select(
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )
    if delete_condition is not None:
        merged = merged.filter(~delete_condition | F.col(key_cols[0]).isNull())
    # Rewrite. For partitioned targets + dynamic overwrite, only partitions
    # present in `merged` are replaced; since merged contains all rows the
    # whole table rewrites — restrict first when updates touch few
    # partitions:
    if partition_cols:
        touched = updates.select(*partition_cols).distinct()
        merged = merged.join(F.broadcast(touched), partition_cols, "left_semi")
        out = merged.repartition(*partition_cols).write.partitionBy(
            *partition_cols
        )
    else:
        out = merged.write
    # Stage to a temp subdir then swap would give single-dir atomicity;
    # Spark's overwrite commits via the Hadoop committer (temp + rename),
    # which is what Hive's MoveTask does too (exec/MoveTask.java).
    merged.cache()
    merged.count()  # materialize before overwriting the input path
    out.mode("overwrite").parquet(target_path)
    merged.unpersist()
