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

import os

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


def _staging_dir(target_path: str) -> str:
    """Deterministic-per-call staging sibling of the target directory."""
    import uuid

    return f"{target_path.rstrip('/')}__staging_{uuid.uuid4().hex[:12]}"


def _swap_dirs(target_path: str, staging: str) -> None:
    """Replace target dir with staging dir via rename — the MoveTask
    pattern (reference exec/MoveTask.java: write to scratch, fs.rename
    into place). Local-FS implementation; on HDFS/object stores the same
    two renames go through the Hadoop FileSystem API."""
    import shutil

    old = f"{target_path.rstrip('/')}__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(target_path, old)
    os.rename(staging, target_path)
    shutil.rmtree(old)


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
    the keys, matched rows take the update side's columns WHOLLY (a NULL
    update column overwrites, matching Hive UPDATE SET c = NULL — not
    per-column coalesce), and ``delete_condition`` applies to MATCHED
    rows only (Hive WHEN MATCHED AND cond THEN DELETE never touches
    unmatched target rows). The condition is evaluated over the merged
    row values (update-side values for matched rows).

    Durability: the merged result is STAGED to a sibling directory and
    only then moved/copied over the target — never cache-then-overwrite
    the path being read. Spark's cache is not durable (eviction or
    executor loss triggers recomputation, which would re-read the
    truncated target mid-overwrite = silent data loss; at 100 TB the
    merged table cannot be fully cached, so eviction is the normal
    case). Unpartitioned targets swap directories (one write, two
    renames — MoveTask parity); partitioned targets stage only the
    touched partitions, then swap those partition directories into
    place (non-atomicity across partitions is inherent to log-less
    parquet, see SURVEY §7.4).
    """
    target = spark.read.parquet(target_path)
    cols = target.columns
    t = target.alias("t")
    u = updates.alias("u")
    cond = [F.col(f"t.{k}") == F.col(f"u.{k}") for k in key_cols]
    joined = t.join(u, cond, "full_outer")
    has_update = F.col(f"u.{key_cols[0]}").isNotNull()
    matched = has_update & F.col(f"t.{key_cols[0]}").isNotNull()
    merged = joined.select(
        *[
            F.when(has_update, F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ],
        matched.alias("__matched"),
    )
    if delete_condition is not None:
        merged = merged.filter(
            ~(F.col("__matched") & delete_condition)
        )
    merged = merged.drop("__matched")

    if partition_cols:
        # Only partitions containing updated keys need rewriting.
        touched = updates.select(*partition_cols).distinct()
        merged = merged.join(F.broadcast(touched), partition_cols, "left_semi")
        _staged_rewrite(spark, target_path, merged, partition_cols, touched)
    else:
        _staged_rewrite(spark, target_path, merged, None, None)


def _partition_rel_dir(partition_cols: list[str], values) -> str:
    """Relative partition directory for one partition-value tuple, using
    Hive's layout (col=value/...; NULL → __HIVE_DEFAULT_PARTITION__)."""
    parts = []
    for c, v in zip(partition_cols, values):
        sv = "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)
        parts.append(f"{c}={sv}")
    return os.path.join(*parts)


def _staged_rewrite(
    spark,
    target_path: str,
    df: DataFrame,
    partition_cols: list[str] | None,
    touched: DataFrame | None,
) -> None:
    """Durably rewrite the table at ``target_path`` with ``df`` (whose
    lineage reads target_path): stage to a sibling dir first, so the
    source is never truncated while still being read — never
    cache-then-overwrite (Spark's cache is not durable; eviction or
    executor loss during the overwrite would recompute from the
    truncated source = silent data loss, and at 100 TB the staged data
    can't be fully cached anyway).

    Unpartitioned: whole-directory swap (one write + two renames — the
    MoveTask pattern, reference exec/MoveTask.java). Partitioned: swap
    only the TOUCHED partition directories — a touched partition whose
    staged result is empty (all rows deleted) is removed outright,
    which dynamic partition overwrite cannot express (no staged files →
    nothing to overwrite the stale dir with). ``touched`` must list the
    distinct partition tuples being rewritten (small: metadata-sized
    collect, not data)."""
    import shutil

    staging = _staging_dir(target_path)
    if partition_cols:
        (
            df.repartition(*partition_cols)
            .write.partitionBy(*partition_cols)
            .mode("overwrite")
            .parquet(staging)
        )
        rels = {
            _partition_rel_dir(partition_cols, tuple(r))
            for r in touched.collect()
        }
        for rel in sorted(rels):
            tgt_dir = os.path.join(target_path, rel)
            stg_dir = os.path.join(staging, rel)
            shutil.rmtree(tgt_dir, ignore_errors=True)
            if os.path.isdir(stg_dir):
                os.makedirs(os.path.dirname(tgt_dir), exist_ok=True)
                os.rename(stg_dir, tgt_dir)
        shutil.rmtree(staging)
    else:
        df.write.mode("overwrite").parquet(staging)
        _swap_dirs(target_path, staging)


def delete_where(
    spark,
    target_path: str,
    condition: Column,
    partition_cols: list[str] | None = None,
) -> None:
    """Standalone ``DELETE FROM t WHERE cond`` over a parquet table.

    Reference: parse/UpdateDeleteSemanticAnalyzer.java:80 compiles DELETE
    to an insert of surviving ROW__IDs into ACID delete deltas; log-less
    parquet instead rewrites survivors via the staged-rewrite machinery.
    Rows where the condition is NULL survive (Hive/SQL WHERE semantics:
    only condition=TRUE deletes). Partitioned targets rewrite ONLY the
    partitions that actually contain deleted rows — at 100 TB a DELETE
    touching one day of data rewrites one partition, not the table.
    """
    target = spark.read.parquet(target_path)
    survivors = target.filter(~F.coalesce(condition, F.lit(False)))
    if partition_cols:
        touched = (
            target.filter(F.coalesce(condition, F.lit(False)))
            .select(*partition_cols)
            .distinct()
        )
        survivors = survivors.join(
            F.broadcast(touched), partition_cols, "left_semi"
        )
        _staged_rewrite(spark, target_path, survivors, partition_cols, touched)
    else:
        _staged_rewrite(spark, target_path, survivors, None, None)


def update_where(
    spark,
    target_path: str,
    set_exprs: dict[str, Column],
    condition: Column,
    partition_cols: list[str] | None = None,
) -> None:
    """Standalone ``UPDATE t SET c = expr, ... WHERE cond``.

    Reference: parse/UpdateDeleteSemanticAnalyzer.java:62 — UPDATE
    compiles to a rewrite of matched rows; partition columns may not be
    updated (same restriction as Hive: moving a row between partitions
    is a delete+insert, not an update). Rows where the condition is NULL
    are untouched. Partitioned targets rewrite only partitions
    containing matched rows.
    """
    if partition_cols:
        bad = sorted(set(set_exprs) & set(partition_cols))
        if bad:
            raise ValueError(
                f"cannot UPDATE partition column(s) {bad}: Hive forbids it "
                "(UpdateDeleteSemanticAnalyzer); use delete + insert instead"
            )
    target = spark.read.parquet(target_path)
    hit = F.coalesce(condition, F.lit(False))
    updated = target.select(
        *[
            F.when(hit, set_exprs[c]).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in target.columns
        ]
    )
    if partition_cols:
        touched = target.filter(hit).select(*partition_cols).distinct()
        updated = updated.join(
            F.broadcast(touched), partition_cols, "left_semi"
        )
        _staged_rewrite(spark, target_path, updated, partition_cols, touched)
    else:
        _staged_rewrite(spark, target_path, updated, None, None)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 16,
    bits: int = 8,
    quantile: bool = False,
) -> None:
    """Z-order-clustered parquet write: multi-column data layout so
    range/point predicates on ANY of ``zorder_cols`` skip most files via
    parquet min/max footer stats.

    The reference's layout tool is single-key sorted tables
    (StorageDescriptor sortCols + SortedDynPartitionOptimizer,
    optimizer/Optimizer.java:128), which skips on one column only. For a
    100 TB lakehouse table queried on several columns, interleaving the
    columns' bucket bits (Morton/Z curve) bounds every column's value
    range within each file — a contiguous z-range of fraction p spans
    ~p^(1/k) of each of the k dimensions, so each file's min/max covers a
    narrow slice of every z-ordered column and the scan planner skips
    files for predicates on any of them.

    Plan shape: per-column uniform bucketing (width_bucket over the
    min/max collected as one tiny driver scalar row), a pure-JVM bitwise
    fold building the z-value (codegen-friendly shiftleft/and — no UDF),
    repartitionByRange(n_files) on z (one range-sampling pass + one
    shuffle), sortWithinPartitions, write.

    ``quantile=True`` switches bucketing to approxQuantile cut points
    (Greenwald-Khanna sketch — one extra pass, cut arrays of 2^bits-1
    doubles on the driver): buckets then hold ~equal ROW counts, so a
    heavy-tailed column still spreads across all bucket codes instead of
    collapsing into bucket 0 and losing its interleave bits. The bucket
    lookup is a rank-against-literal-array fold (HOF over ≤255 literals —
    interpreted, but this is a one-time write-side cost). Uniform
    (default) costs one agg and is right for roughly-uniform columns.
    """
    k = len(zorder_cols)
    nb = 2**bits
    buckets: dict[str, Column] = {}
    if quantile:
        probs = [i / nb for i in range(1, nb)]
        for c in zorder_cols:
            cuts = (
                df.select(F.col(c).cast("double").alias(c))
                .stat.approxQuantile(c, probs, 0.01)
            )
            arr = F.array(*[F.lit(float(x)) for x in cuts])

            def _le(col_name):  # closure factory (HOF default-arg gotcha)
                return lambda x: x <= F.col(col_name).cast("double")

            buckets[c] = F.size(F.filter(arr, _le(c))).cast("long")
    else:
        aggs = []
        for c in zorder_cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        for c in zorder_cols:
            lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
            if hi is None or lo is None or hi <= lo:
                buckets[c] = F.lit(0).cast("long")
            else:
                b = (
                    F.width_bucket(
                        F.col(c).cast("double"), F.lit(lo), F.lit(hi), nb
                    )
                    - 1
                )
                buckets[c] = (
                    F.least(F.greatest(b, F.lit(0)), F.lit(nb - 1))
                    .cast("long")
                )

    z = F.lit(0)
    for j, c in enumerate(zorder_cols):
        b = buckets[c]
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j
            )

    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
