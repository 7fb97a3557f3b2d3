"""Deterministic sampling / splitting for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across runs and
engines; training pipelines need *content-addressed* sampling — the same
doc lands in the same split on every engine, every run, every re-shard.
These operators key every decision on a hash of a stable id:

- ``hash_split``: train/eval split by md5-prefix threshold. Adding data
  never moves an existing doc between splits (per-doc decision, no
  global ordering).
- ``stratified_take``: exactly-k-per-group sample, ordered by hash —
  deterministic, uniform within group, no RNG.

Scale: both are embarrassingly parallel — md5 + compare/row_number are
JVM-side; the only shuffle is stratified_take's partitionBy(group), and
that one is bounded by WindowGroupLimit pushdown (rank filter prunes to
k per group before the full sort materializes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_key(col: Column) -> Column:
    """16-bit hex bucket key: first 4 hex chars of md5 of the value's
    string form. Stable across engines (md5 is md5) — unlike
    xxhash64/hash whose seeds are Spark-specific."""
    return F.substring(F.md5(col.cast("string")), 1, 4)


def hash_bucket(col: Column) -> Column:
    """Integer bucket in [0, 65536): the md5 16-bit prefix as a number.

    Numeric (not lexical) comparison against ``round(rate * 65536)`` is
    correct for every rate INCLUDING 1.0 — the hex-string compare used
    previously broke at rate >= 1.0 because its threshold '10000' is 5
    chars and lexically keeps only hashes starting with '0' (~6%)."""
    return F.conv(hash_key(col), 16, 10).cast("int")


def _threshold(rate: float) -> int:
    """Integer keep-threshold: bucket < threshold survives. rate >= 1.0
    yields 65536 (> max bucket 65535) = keep everything; <= 0 keeps none."""
    return max(0, min(65536, round(rate * 65536)))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' or 'eval' by deterministic hash threshold.

    P(train) = round(train_frac * 65536) / 65536 (≈ train_frac to 2e-5);
    train_frac >= 1.0 puts every row in 'train'.
    """
    return df.withColumn(
        split_col,
        F.when(
            hash_bucket(F.col(id_col)) < F.lit(_threshold(train_frac)),
            F.lit("train"),
        ).otherwise(F.lit("eval")),
    )


def stratified_take(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by hash order —
    a deterministic stratified sample (md5 collisions on distinct ids
    are impossible in practice, so the order is total)."""
    w = Window.partitionBy(group_col).orderBy(hash_key(F.col(id_col)), id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def canonical_host(url: Column) -> Column:
    """Canonical host of a URL: lowercase, scheme and leading ``www.``
    stripped, cut at the first ``/ : ? #`` (port/path/query dropped).

    One JVM regexp_extract — deliberately NOT ``parse_url`` (which is
    also in the function registry for Hive parity) so engines without a
    URL parser reproduce it byte-for-byte from the same regex; rows that
    aren't URL-shaped yield ''."""
    return F.regexp_extract(
        F.lower(url), r"^(?:[a-z][a-z0-9+.-]*://)?(?:www\.)?([^/:?#]+)", 1
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    k: int = 1000,
    host_col: str = "host",
) -> DataFrame:
    """Cap the corpus at ``k`` documents per canonical host — the
    anti-boilerplate / anti-monoculture quota every web-scale corpus
    applies (a single forum mirror must not become 5% of the training
    set). Survivors are chosen by content-addressed hash order, so the
    kept set is reproducible and stable under corpus growth except where
    a genuinely new doc hashes into the top k.

    Scale: one shuffle on host; the rank filter compiles to
    WindowGroupLimit, so each partition retains at most k rows per host
    before the full sort would materialize. Host skew (the whole point
    is that some hosts are huge) is bounded by the same pushdown — a
    10M-page host never holds more than k rows past its first scan.
    """
    out = df.withColumn(host_col, canonical_host(F.col(url_col)))
    w = Window.partitionBy(host_col).orderBy(
        hash_key(F.col(id_col)), id_col
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-source subsampling at configured rates — the training-mix
    reweighting step ("keep 30% of crawl, 100% of books"), deterministic
    via the same md5-threshold trick as hash_split: a doc survives iff
    its hash bucket falls under its source's rate. Upsampling (>1.0) is
    out of scope here (that's repetition at batch-assembly time, not a
    filter).

    Scale: a scan-local filter — no shuffle, no RNG, reproducible across
    engines/runs, stable under corpus growth (per-doc decision).

    Rates >= 1.0 (including the default_rate=1.0 default) keep every row
    of that source: the integer threshold 65536 exceeds every bucket.
    """
    expr = F.lit(_threshold(default_rate))
    for src, rate in rates.items():
        expr = F.when(
            F.col(source_col) == src, F.lit(_threshold(rate))
        ).otherwise(expr)
    return df.filter(hash_bucket(F.col(id_col)) < expr)


def shuffle_and_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 0,
    shard_col: str = "shard",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` contiguous shards —
    the training-output ordering step: examples must be well-mixed
    (neighbors in the corpus must not be neighbors in the batch stream),
    yet every re-run / every engine must produce byte-identical shards.

    Key = md5(seed:id) defines one global pseudo-random permutation;
    shard = the key's high bits (floor(bucket·n/65536)), so each shard
    is a contiguous SEGMENT of that permutation — reading shards 0..n-1
    in order replays the full global shuffle, and changing ``seed``
    gives an independent permutation (epoch reshuffle) without touching
    the data.

    Scale: one hash-partitioned shuffle on the shard id + an in-
    partition sort — never a global sort. Shard sizes are ±√ balanced
    (md5 is uniform) regardless of input skew, because the key ignores
    every data column except the id. Rows within a shard keep their
    relative order when the corpus grows (per-doc key, no global rank).
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    bucket = F.conv(F.substring(key, 1, 4), 16, 10).cast("int")
    shard = F.floor(bucket * n_shards / F.lit(65536)).cast("int")
    return (
        df.withColumn(key_col, key)
        .withColumn(shard_col, shard)
        .repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, key_col, id_col)
    )


def interleave_by_weight(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic proportional interleave: a global ordering in which
    each source appears at a rate proportional to its weight (the batch-
    assembly ordering of a training mix — "2 parts src0 to 1 part src1").

    Each row's position is rank_within_source / weight, where the
    within-source rank is hash-ordered (deterministic); sorting by
    position yields the interleaved stream. Weight 2.0 → rows land at
    0.5, 1.0, 1.5… (twice as dense as weight 1.0). At scale the sort is
    a range partition (sortWithinPartitions after repartitionByRange) —
    no single-node bottleneck.
    """
    w = Window.partitionBy(source_col).orderBy(hash_key(F.col(id_col)), id_col)
    weight_expr = F.lit(float(default_weight))
    for src, wt in weights.items():
        weight_expr = F.when(
            F.col(source_col) == src, F.lit(float(wt))
        ).otherwise(weight_expr)
    return (
        df.withColumn("src_rank", F.row_number().over(w))
        .withColumn(
            "interleave_pos", F.round(F.col("src_rank") / weight_expr, 6)
        )
        .orderBy("interleave_pos", id_col)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis exponential race): each row gets priority -ln(u)/w where u
    is a content-hash uniform in (0, 1] — the k smallest priorities are
    exactly a weighted sample without replacement, and because u comes
    from md5(seed:id), not an RNG, the draw is reproducible across runs,
    engines, and partitionings (same reason hash_split is). Rows with
    non-positive weight are excluded.

    Scale: priority is map-side arithmetic; the top-k is a
    TakeOrderedAndProject (per-partition heaps, no full sort/shuffle).
    Changing `seed` redraws; changing k only extends/truncates the
    prefix of the same permutation — nested samples for free."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    pri = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("priority", pri)
        .orderBy(F.asc("priority"), F.asc(id_col))
        .limit(k)
    )


def group_hash_split(
    df: DataFrame,
    group_key: Column,
    train_frac: float = 0.8,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free train/eval split: the hash threshold is applied to a
    GROUP key (duplicate-cluster fingerprint, domain, author...) instead
    of the row id, so every member of a group lands in the SAME split —
    near-duplicates of a training document can never leak into eval.
    The group key is computed per row (a column expression — no join
    when the key derives from row content, e.g. a content fingerprint);
    pair with connected-components cluster ids via a join for
    transitive-near-dup grouping."""
    return df.withColumn(
        split_col,
        F.when(
            hash_bucket(group_key) < F.lit(_threshold(train_frac)),
            F.lit("train"),
        ).otherwise(F.lit("eval")),
    )
