"""Join strategy helpers (SURVEY §2.4).

Catalyst + AQE already reproduce Hive's join arsenal (broadcast
conversion = ConvertJoinMapJoin.java:78, skew splitting =
SkewJoinHandler.java:74, SMB = SMBMapJoinOperator.java:60 via bucketed
tables). These helpers cover the two cases where an explicit nudge still
wins at 100 TB: forced broadcast when stats are missing, and pre-salted
joins for producer-side skew that AQE's post-shuffle splitting can't fix
(a single hot key landing in one map output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    big: DataFrame, small: DataFrame, on: Column | list[str], how: str = "inner"
) -> DataFrame:
    """Map-join with explicit broadcast hint (MapJoinOperator.java:78
    parity). Use when the small side is under executor memory but stats
    are missing so the auto-threshold doesn't fire."""
    return big.join(F.broadcast(small), on, how)


def salted_skew_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    ``salt_buckets`` sub-keys and explode the right side to match.

    Equivalent of Hive's compile-time skew plan
    (optimizer/SkewJoinOptimizer.java:78): left rows get a random salt in
    [0, B); right rows are replicated B times. The shuffle key becomes
    (key, salt) — a hot key now spreads over B reducers. Cost: B× the
    right side, so keep the *smaller* relation on the right.

    Prefer AQE skew handling (on by default in our session) — use this
    only when one key dominates a single upstream task's output.

    Only ``inner`` and ``left`` are salt-safe: the right side is
    replicated B times, so right/full outer would emit every unmatched
    right row B times, and semi/anti flip per-salt instead of per-key.
    Other join types raise rather than silently multiply rows.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_skew_join supports how='inner'/'left' only, got {how!r}: "
            "the right side is replicated per salt bucket, which duplicates "
            "unmatched right rows under right/full outer and breaks "
            "semi/anti semantics. Use AQE skew-join handling for those."
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(
        salted_right,
        [key, "__salt"],
        how,
    )
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for every left row, the values from the latest right
    row with right.ts <= left.ts on the same key (timeseries
    point-in-time lookup — e.g. "the last click before each view", "the
    prevailing price at each trade").

    Spark has no ASOF JOIN operator; the naive range join explodes
    (every left row matches all earlier right rows, then a max-filter).
    This is the scalable formulation: UNION both sides tagged, one
    shuffle on (key), one ordered window pass carrying the right-side
    values forward with last(ignorenulls) — O(n log n) per key group,
    no intermediate blow-up, same shape at any scale. Ties
    (right.ts == left.ts) take the right row (sorted before the left row
    at equal ts).

    Returns left's columns plus ``right_cols`` (null when no right row
    precedes).
    """
    from pyspark.sql import Window

    l_tagged = left.withColumn("_is_left", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = right.select(
        key_col, ts_col, *right_cols
    ).withColumn("_is_left", F.lit(0))
    for c in left.columns:
        if c not in (key_col, ts_col):
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    u = l_tagged.select(*l_tagged.columns).unionByName(
        r_tagged.select(*l_tagged.columns)
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in left.columns],
        "_is_left",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .drop("_is_left", *right_cols)
        .select(
            *left.columns,
            *[F.col(f"_asof_{c}").alias(c) for c in right_cols],
        )
    )


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    band_width: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Range (interval) join without a cross product: each point joins
    every interval containing it (``start <= point <= end``), optionally
    also matching on equi ``keys``.

    Spark plans a plain inequality join as BroadcastNestedLoopJoin (or
    a cartesian) — O(n*m) and a guaranteed scale-killer. The banded
    formulation is the standard fix: pick a ``band_width`` comparable to
    the typical interval length, map each point to band
    ``floor(point/band_width)``, replicate each interval onto every band
    it overlaps (sequence + explode — short intervals land on 1-2
    bands), then EQUI-join on (keys..., band) and apply the range
    predicate as a residual filter. Shuffle is keyed on (keys, band) —
    co-partitioned, skew-safe if bands are sized sensibly, and the
    intervals side only inflates by ceil(len/band_width)+1.

    ``point_col``/``start_col``/``end_col`` must be numeric (cast
    timestamps to double epoch seconds first). Inner join only: outer
    variants would resurrect matchless rows per-band (wrong
    multiplicity) — use a left-semi/anti wrapper instead.
    """
    if band_width <= 0:
        raise ValueError("band_width must be positive")
    keys = keys or []
    p = points.withColumn(
        "_band", F.floor(F.col(point_col) / band_width).cast("long")
    )
    i = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / band_width).cast("long"),
                F.floor(F.col(end_col) / band_width).cast("long"),
            )
        ),
    )
    joined = p.join(i, [*keys, "_band"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_band")
