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
    """
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
