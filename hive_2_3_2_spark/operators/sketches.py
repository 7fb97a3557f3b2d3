"""Count-min frequency sketch as DataFrame aggregations.

A mergeable frequency sketch for heavy-hitter estimation over corpus
token streams — the classic Cormode-Muthukrishnan structure, built
entirely with portable arithmetic:

- the sketch IS a DataFrame of (r, b, c) counters (depth × width rows,
  ≤ a few thousand), produced by ONE explode + ONE groupBy over the
  item stream — map-side combine collapses each partition to at most
  depth×width partial rows, so the shuffle is O(depth × width ×
  partitions) regardless of stream size;
- merging sketches from different corpus shards/days is a unionByName +
  re-groupBy sum (counters are additive), which is what makes this the
  right shape for incremental 100 TB token accounting;
- hashing is md5-prefix based (row-seeded), NOT xxhash/murmur — md5 is
  identical in every engine, so a DuckDB oracle can rebuild the exact
  sketch and the suite hash-checks estimates, not just bounds.

Estimates: point query = min over rows of the item's counter — always
an over-estimate (CMS guarantee: estimate ≥ exact; ≤ exact + εN with
probability 1-δ for ε = e/width, δ = e^-depth).

Reference parity note: Hive 2.3 exposes no frequency sketch (its
NumDistinctValueEstimator is an NDV-only FM sketch,
serde2/.../NumDistinctValueEstimator.java); this extends the engine's
sketch family (approx percentile/NDV/HLL rollup) with the frequency
axis a training-data pipeline needs for vocabulary/heavy-hitter stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, row: int, width: int) -> Column:
    """Row-seeded hash bucket: first 8 md5 hex chars → int, mod width.
    Portable across engines (DuckDB: ('0x' || substr(md5(...), 1, 8))
    ::BIGINT % width gives the identical value)."""
    h = F.md5(F.concat(F.lit(f"{row}:"), item))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias("b")


def count_min_build(
    items: DataFrame,
    item_col: str = "item",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: (r, b, c) counter table from an item stream
    (optionally pre-aggregated with a weight column — identical result,
    cheaper input). One explode (map-side, depth rows per item) + one
    groupBy; the counter table is tiny and additive."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.col(item_col), r, width),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
        w.alias("w"),
    )
    return (
        pairs.select("rb.r", "rb.b", "w")
        .groupBy("r", "b")
        .agg(F.sum("w").alias("c"))
    )


def count_min_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("c").alias("c"))


def count_min_probe(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe item: estimate = min over
    rows of that item's counter (0 if a bucket is absent — possible only
    when nothing hashed there). The sketch (≤ depth×width rows) is
    broadcast; the probe side streams — probing is corpus-scan-free."""
    pr = probes.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.col(item_col), r, width),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, "rb.r", "rb.b")
    return (
        pr.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("estimate"))
    )
