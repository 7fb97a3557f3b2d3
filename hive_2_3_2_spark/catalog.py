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

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# Runtime-settable confs the engine's semantics depend on. The driver (or
# any embedding application) may hand us a vanilla SparkSession — without
# these, events.parquet (TIMESTAMP NANOS) fails to read, ANSI mode breaks
# Hive-permissive casts, and a non-UTC session timezone shifts timestamps.
_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # SimpleDateFormat datetime semantics (Hive parity) — session-wide so
    # results are independent of statement order (see session.ENGINE_CONFS).
    "spark.sql.legacy.timeParserPolicy": "LEGACY",
}


#: applicationIds whose session confs are already verified — each
#: ``spark.conf.get`` is a py4j round trip (~2 ms on this host), and
#: load_table calls this on every table of every query. Engine
#: construction and any SET touching one of the required keys force a
#: re-check (``force=True`` / ``invalidate_engine_confs``), so the memo
#: only skips the steady-state no-op verification.
_CONFS_APPLIED: set[str] = set()


def invalidate_engine_confs(spark: SparkSession) -> None:
    """Drop the confs-verified memo for this session — called when a
    required conf may have been changed out from under us (Engine SET
    of a spark.* key)."""
    _CONFS_APPLIED.discard(spark.sparkContext.applicationId)


def ensure_engine_confs(spark: SparkSession, force: bool = False) -> None:
    """Apply the engine's runtime-settable session confs idempotently.

    Called from every load path so the suite behaves identically under
    an externally-created SparkSession (driver contract) and our own
    session factory (which also sets the static confs)."""
    app_id = spark.sparkContext.applicationId
    if not force and app_id in _CONFS_APPLIED:
        return
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # static-only conf in this build — session factory covers it
    _CONFS_APPLIED.add(app_id)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) in ``path``.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the reader surfaces them as
    int64 nanos, and we normalize back to (microsecond) timestamps below.
    """
    try:
        schema = _pq.read_schema(path)
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


#: (applicationId, abs sf_dir, table) → DataFrame. The sf fixtures are
#: IMMUTABLE (TESTDATA.md: driver-generated, read-only), so the listed
#: FileIndex and inferred schema never go stale — memoizing skips a
#: py4j read + schema-inference round-trip per table per Engine
#: construction (~0.1 s each; suite entries build Engines constantly).
#: Mutable paths (DML scratch dirs) go through register_table, never
#: through this cache.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``sf_dir`` as a DataFrame.

    Every timestamp column is normalized to (microsecond) TimestampType,
    whatever the parquet physical type:

    - TIMESTAMP(NANOS) surfaces as int64 nanos (``nanosAsLong`` conf) and
      is converted with integer ``DIV`` — float division would silently
      lose precision (epoch nanos ~1.7e18 exceed double's 53-bit mantissa);
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ
      and is cast to TimestampType (identical instants: the session
      timezone is pinned to UTC above).

    One type for every fixture means downstream expressions (epoch casts,
    unix_timestamp arithmetic) can't diverge by scale factor — mirrors the
    reference's single TIMESTAMP type (serdeConstants.java:103).
    """
    ensure_engine_confs(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_cols(path):
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000"))
        )
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    _DF_CACHE[key] = df
    return df


#: (applicationId, abs sf_dir, tables) → registered view map. Each
#: ``createOrReplaceTempView`` is a py4j round trip; suite queries call
#: register_star_schema once per construction, so re-registering the
#: same immutable-fixture views cost ~10 round trips per query. The
#: memo is only valid while the views still point at this sf_dir — any
#: register_star_schema call for a DIFFERENT sf_dir on the same session
#: re-registers (and re-owns) the view names.
_VIEWS_REGISTERED: dict[str, tuple[str, tuple[str, ...]]] = {}


def note_view_override(spark: SparkSession, name: str) -> None:
    """Invalidate the star-schema view memo when ``name`` shadows (or
    drops) one of the star view names — the next register_star_schema
    call re-registers all views instead of trusting the memo. Called
    from the Engine's temp-view registration/drop paths."""
    if name in STAR_TABLES:
        _VIEWS_REGISTERED.pop(spark.sparkContext.applicationId, None)


def register_star_schema(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    """Register every star-schema table as a temp view; returns the DFs.

    Temp views keep the scan lazy: Catalyst still sees the parquet source,
    so predicate pushdown / column pruning / partition pruning all apply
    (verify with ``df.explain`` — PushedFilters/ReadSchema lines).
    """
    app_id = spark.sparkContext.applicationId
    sf_abs = os.path.abspath(sf_dir)
    fresh = _VIEWS_REGISTERED.get(app_id) != (sf_abs, tables)
    dfs: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        if fresh:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    if fresh:
        _VIEWS_REGISTERED[app_id] = (sf_abs, tables)
    return dfs
