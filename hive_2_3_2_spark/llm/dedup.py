"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB corpora):
- NOTHING here is O(n²) on the corpus: every near-dup path generates
  candidates through a *blocking key* (LSH band bucket, SimHash prefix,
  length/lang block) and only scores within blocks.
- All shingle/hash work is JVM higher-order functions (F.transform /
  F.aggregate over split arrays) — no Python in the scan.
- Outputs are DataFrames keyed by (doc_id) or (doc_id_a, doc_id_b) pairs,
  composable with exceptAll/anti-join to materialize the kept set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_2_3_2_spark.llm.text import md5_fingerprint, normalize_for_fingerprint

# MinHash universal-hash family: h_i(x) = (a_i * x + b_i) mod P, P Mersenne.
_P = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs — seeded LCG so plans are reproducible
    across sessions (no RNG at plan time)."""
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        params.append((a, b))
    return params


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalized text (array<string>)."""
    toks = F.split(normalize_for_fingerprint(text), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Non-negative 63-bit hashes of the distinct k-shingles."""
    return F.transform(
        word_shingles(text, k),
        lambda s: F.abs(F.xxhash64(s)) % _P,
    )


def minhash_signature(text: Column, num_perm: int = 32, k: int = 3) -> Column:
    """MinHash signature (array<bigint>, length num_perm): for each
    permutation i, min over shingles of (a_i*h + b_i) mod P. One pass over
    the shingle array per permutation, all JVM-side."""
    hashes = shingle_hashes(text, k)

    def perm(a: int, b: int):
        # closure factory: Spark introspects lambda arity, so default-arg
        # capture (lambda h, a=a: ...) would read as a 2-arg lambda
        return lambda h: (h * a + b) % _P

    mins = [
        F.array_min(F.transform(hashes, perm(a, b)))
        for a, b in _perm_params(num_perm)
    ]
    return F.array(*mins)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact (normalized-content) dedup: hash-groupBy on the md5
    fingerprint, keep the lowest id per group. One shuffle keyed on the
    fingerprint — the canonical scalable formulation."""
    return (
        df.select(F.col(id_col), md5_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """MinHash + LSH candidate pairs: signature → band buckets →
    self-join within buckets.

    shingle→minhash→band→bucket-join: rows sharing any band bucket become
    candidates (Jaccard ≈ s ⇒ P[candidate] = 1-(1-s^r)^b). The self-join
    is keyed on (band_idx, band_hash) — the *blocking key* — so the
    shuffle groups only same-bucket rows; no corpus-wide cross join ever
    forms. Deduped on (a < b).
    """
    rows = num_perm // bands

    def perm(a: int, b: int):
        return lambda h: (h * a + b) % _P

    # Materialize shingle hashes behind a projection boundary FIRST: the
    # per-permutation mins then reference the bound `hh` attribute, so the
    # shingling pipeline (normalize→split→slice→hash→distinct) runs once
    # per row instead of once per permutation (32× less work — measured
    # 269s → ~8s at sf0.1).
    hashed = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), k).alias("hh"),
    )
    sig = hashed.select(
        "id",
        F.array(
            *[
                F.array_min(F.transform(F.col("hh"), perm(a, b)))
                for a, b in _perm_params(num_perm)
            ]
        ).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            F.slice(F.col("sig"), i * rows + 1, rows)
                        ).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("pos", "bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("doc_id_a"), F.col("r.id").alias("doc_id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: Column | None = None,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs within blocks.

    ``block_col`` is the blocking key (default: language+length bucket) —
    the join shuffles on it, so cost is Σ block² not n². Use
    minhash_lsh_candidates for the unblocked general case; this is the
    exact scorer (and its verification oracle).
    """
    if block_col is None:
        block_col = F.floor(F.length(F.col(text_col)) / 200)
    docs = df.select(
        F.col(id_col).alias("id"),
        block_col.alias("blk"),
        word_shingles(F.col(text_col), k).alias("sh"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_id_a"),
            F.col("b.id").alias("doc_id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(text: Column, k: int = 2) -> Column:
    """64-bit SimHash of word k-shingles: per bit, sum ±1 weighted by
    whether each shingle's xxhash64 has that bit set; bit i of the result
    = sign of the sum. Near-duplicate docs differ in few bits (Hamming)."""
    hashes = F.transform(
        word_shingles(text, k), lambda s: F.xxhash64(s)
    )

    def bit_sum(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = [
        F.when(
            F.aggregate(hashes, F.lit(0).cast("long"), bit_sum(i)) > 0,
            F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    out = bits[0]
    for bcol in bits[1:]:
        out = out.bitwiseOR(bcol)
    return out


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: block on the top ``prefix_bits`` of the
    simhash (near-dups almost always share the prefix at small Hamming
    radius — the classic Manku/Google dedup trick: 4 rotated prefix tables
    at web scale; one table suffices for the suite), then filter by exact
    Hamming distance via bit_count(xor)."""

    def bit_sum(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    # Same projection-boundary trick as minhash: hash the shingles once,
    # then fold the 64 per-bit sums over the bound `hh` attribute instead
    # of re-shingling the text 64 times.
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(F.col(text_col), 2), lambda s: F.xxhash64(s)
        ).alias("hh"),
    )
    bits = [
        F.when(
            F.aggregate(F.col("hh"), F.lit(0).cast("long"), bit_sum(i)) > 0,
            F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    sh_expr = bits[0]
    for bcol in bits[1:]:
        sh_expr = sh_expr.bitwiseOR(bcol)
    sh = hashed.select("id", sh_expr.alias("sh")).withColumn(
        "blk", F.shiftrightunsigned(F.col("sh"), 64 - prefix_bits)
    )
    a, b = sh.alias("a"), sh.alias("b")
    hamming = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_id_a"),
            F.col("b.id").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: Column | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (default block:
    sign of the first component — at scale use an LSH hyperplane bucket,
    see similarity.lsh_bucket)."""
    if block_col is None:
        block_col = (F.element_at(F.col(vec_col), 1) > 0).cast("int")
    docs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        block_col.alias("blk"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (norm(F.col("a.v")) * norm(F.col("b.v")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("vec_id_a"),
            F.col("b.id").alias("vec_id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
