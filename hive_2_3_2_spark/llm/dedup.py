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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hive_2_3_2_spark.functions.gaps import ngram_windows
from hive_2_3_2_spark.llm.text import md5_fingerprint, normalize_for_fingerprint

# MinHash universal-hash family: h_i(x) = (a_i * x + b_i) mod P, P Mersenne.
_P = (1 << 61) - 1


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of CPU-heavy per-row work.

    A small corpus arrives as one parquet split → one task → one core; the
    shingling/signature projections are compute-bound, so spread them over
    the cluster first. At 100 TB the scan already has thousands of splits
    and this repartition is a cheap no-op guard (cost: shuffling raw text
    once, far below the per-row compute it parallelizes)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df


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


def _ngram_windows_sql(toks_sql: str, n: int, partial_tail: bool = False) -> str:
    """SQL-text twin of functions/gaps.ngram_windows — parses to the same
    Catalyst tree (zip_with over n shifted slices; parity-pinned in
    tests/test_optimization_r12.py). Exists because building the Column
    version costs dozens of py4j round trips (~2 ms each on this host)
    per query construction; the SQL text parses JVM-side in one call."""
    if partial_tail:
        m = f"(greatest(size({toks_sql}) - {n}, 0) + 1)"
    else:
        m = f"greatest(size({toks_sql}) - {n - 1}, 0)"
    g = f"slice({toks_sql}, 1, {m})"
    for j in range(1, n):
        g = (
            f"zip_with({g}, slice({toks_sql}, {1 + j}, {m}), "
            f"(a, b) -> concat_ws(' ', a, b))"
        )
    if partial_tail:
        g = f"CASE WHEN size({toks_sql}) = 0 THEN array('') ELSE {g} END"
    return g


def _normalize_sql(text_sql: str) -> str:
    """SQL-text twin of text.normalize_for_fingerprint."""
    return f"trim(regexp_replace(lower({text_sql}), '[^a-z0-9]+', ' '))"


def _word_shingles_sql(text_sql: str, k: int = 3) -> str:
    """SQL-text twin of word_shingles (same expression, one py4j call)."""
    toks = f"split({_normalize_sql(text_sql)}, ' ')"
    return f"array_distinct({_ngram_windows_sql(toks, k, partial_tail=True)})"


def _hashes_of_shingles_sql(sh_sql: str) -> str:
    """SQL-text twin of hashes_of_shingles."""
    return f"transform({sh_sql}, s -> abs(xxhash64(s)) % {_P})"


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalized text (array<string>).
    partial_tail: a doc shorter than k words yields its one truncated
    shingle (linear zip_with construction — see ngram_windows)."""
    toks = F.split(normalize_for_fingerprint(text), " ")
    return F.array_distinct(ngram_windows(toks, k, partial_tail=True))


def hashes_of_shingles(sh: Column) -> Column:
    """Non-negative 63-bit hashes of an existing shingle array — lets a
    pipeline shingle ONCE and derive both the minhash input and the
    exact-verification sets from the same (persisted) projection."""
    return F.transform(sh, lambda s: F.abs(F.xxhash64(s)) % _P)


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Non-negative 63-bit hashes of the distinct k-shingles."""
    return hashes_of_shingles(word_shingles(text, k))


def _minhash_mins_sql(num_perm: int, hh_sql: str = "hh") -> str:
    """JVM-expression MinHash fold over a precomputed hash-array column:
    ``array(num_perm × array_min(transform(hh, h -> ...)))``.

    Bit-identical to ``_minhash_fold_udf``'s numpy uint64 arithmetic:
    ``h*a + b`` wraps mod 2^64 identically in Java long bits; the
    unsigned ``% P`` is recovered from the signed value with
    ``pmod(v, P) + 8·[v < 0]`` (2^64 mod P = 8 for P = 2^61-1) — parity
    is pinned over the real corpus in tests/test_optimization_r12.py.

    Why this replaced the pandas-UDF fold on the query path (r12,
    guide §4.1 "always prefer built-ins"): the Arrow boundary costs
    ~0.3-0.5 s of per-task worker/transfer overhead per stage at sf0.1
    (32 tasks), while the per-doc cost of the interpreted transform is
    the same as numpy's at 20× corpus (measured: banded materialization
    0.59 s Arrow vs 0.31 s JVM at sf0.1; 6.6 s vs 6.0 s at 20×). The
    earlier 3.1 s "pure-Column fold" measurement that motivated the UDF
    was an artifact of re-deriving the shingle hashes inside all
    num_perm branches — folding over a dedicated ``hh`` column keeps the
    shingling single-pass. IMPORTANT: callers must put ``hh`` in its own
    projection; Catalyst's CollapseProject keeps it single-evaluation
    because it is referenced num_perm times (non-cheap, multi-ref)."""
    mins = ", ".join(
        f"array_min(transform({hh_sql}, h -> pmod(pmod(h * {a}L + {b}L, "
        f"{_P}L) + IF(h * {a}L + {b}L < 0, 8L, 0L), {_P}L)))"
        for a, b in _perm_params(num_perm)
    )
    return f"array({mins})"


def _minhash_fold_udf(num_perm: int):
    """Arrow-vectorized MinHash fold: per row, min over shingle hashes of
    (a_i*h + b_i) mod P for each permutation i. uint64 wrap-around
    multiply (same family as the Column version; deterministic).

    Kept as the parity reference for ``_minhash_mins_sql`` (and for any
    embedder who wants the numpy fold); the query paths use the JVM
    expression since r12."""
    params = _perm_params(num_perm)
    A = np.array([a for a, _ in params], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in params], dtype=np.uint64)[:, None]
    P = np.uint64(_P)

    @pandas_udf("array<bigint>")
    def fold(hh: pd.Series) -> pd.Series:
        # Whole-batch vectorization (guide §4.2): flatten every row's
        # hash array into ONE (num_perm, Σ|row|) permutation pass +
        # a segmented min (minimum.reduceat) instead of a Python loop
        # issuing ~|batch| tiny numpy ops. Arithmetic is element-wise
        # identical to the per-row form (uint64 wrap multiply, % P,
        # min per row), so signatures are bit-identical.
        n = len(hh)
        if n == 0:
            return pd.Series([], dtype=object)
        rows = [
            None if r is None or len(r) == 0 else np.asarray(r, dtype=np.uint64)
            for r in hh
        ]
        out = np.full((n, num_perm), _P, dtype=np.int64)
        valid = [i for i, r in enumerate(rows) if r is not None]
        if valid:
            flat = np.concatenate([rows[i] for i in valid])[None, :]
            lens = np.array([len(rows[i]) for i in valid])
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            with np.errstate(over="ignore"):
                vals = (A * flat + B) % P  # (num_perm, Σ|row|)
            mins = np.minimum.reduceat(vals, starts, axis=1)  # (num_perm, v)
            out[valid] = mins.T.astype(np.int64)
        return pd.Series(list(out))

    return fold


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


def _banded_inline_sql(num_perm: int, bands: int) -> str:
    """SQL text for the LSH band projection: ``inline`` over one struct
    per band, each bh = Murmur3 hash of that band's signature slice.
    Same (band, bh) rows as the prior posexplode-of-structs Column build
    (the unused ``pos`` output is simply never generated); one py4j call
    instead of ~10 per band."""
    rows = num_perm // bands
    structs = ", ".join(
        f"named_struct('band', {i}, 'bh', hash(slice(sig, {i * rows + 1}, {rows})))"
        for i in range(bands)
    )
    return f"inline(array({structs}))"


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
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH candidate pairs: signature → band buckets →
    self-join within buckets.

    shingle→minhash→band→bucket-join: rows sharing any band bucket become
    candidates (Jaccard ≈ s ⇒ P[candidate] = 1-(1-s^r)^b). The self-join
    is keyed on (band_idx, band_hash) — the *blocking key* — so the
    shuffle groups only same-bucket rows; no corpus-wide cross join ever
    forms. Deduped on (a < b).

    ``shingles`` (optional): a precomputed/persisted ``(id, sh)`` frame —
    callers that also need the shingle sets (exact verification) shingle
    the corpus ONCE and share the projection instead of re-splitting the
    text here.
    """
    rows = num_perm // bands

    # Shingle+hash JVM-side (codegen-friendly string work) into a
    # dedicated ``hh`` projection, then the num_perm permutation-mins as
    # one JVM expression over it (r12 — see _minhash_mins_sql for the
    # measurements; this removed the plan's last ArrowEvalPython node).
    if shingles is not None:
        hashed = shingles.selectExpr(
            "id", _hashes_of_shingles_sql("sh") + " AS hh"
        )
    else:
        hashed = _spread(df).selectExpr(
            f"{id_col} AS id",
            _hashes_of_shingles_sql(_word_shingles_sql(text_col, k)) + " AS hh",
        )
    sig = hashed.selectExpr("id", _minhash_mins_sql(num_perm) + " AS sig")
    banded = sig.selectExpr("id", _banded_inline_sql(num_perm, bands))
    # Materialize the banded signatures before the self-join: both join
    # sides read the cached (id, band, bh) rows — 3 longs per row — instead
    # of re-running the 32-permutation projection per side (the projection
    # is too large for whole-stage codegen and dominates otherwise; at
    # corpus scale you'd persist the signature table to storage anyway and
    # reuse it across dedup runs). Measured 13.3s → ~4s at sf0.1.
    banded = banded.persist()
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            F.expr("l.band = r.band AND l.bh = r.bh AND l.id < r.id"),
        )
        .selectExpr("l.id AS doc_id_a", "r.id AS doc_id_b")
        .distinct()
    )


def _banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    k: int,
) -> DataFrame:
    """(id, band, bh, sh) rows: LSH band bucket keys plus the distinct
    shingle set, computed in one pass (shared by the store writer and
    the incremental probe side)."""
    sh_sql = _word_shingles_sql(text_col, k)
    base = _spread(df).selectExpr(
        f"{id_col} AS id",
        _hashes_of_shingles_sql(sh_sql) + " AS hh",
        sh_sql + " AS sh",
    )
    sig = base.selectExpr("id", "sh", _minhash_mins_sql(num_perm) + " AS sig")
    return sig.selectExpr(
        "id", _banded_inline_sql(num_perm, bands), "sh"
    ).select("id", "band", "bh", "sh")


def write_signature_store(
    df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
    mode: str = "overwrite",
) -> None:
    """Persist the reusable dedup index of a corpus: ``bands/`` holds the
    (id, band, bh) LSH bucket keys partitioned by band; ``shingles/``
    holds the distinct word-k-shingle set per doc.

    This is what makes dedup INCREMENTAL: the historical corpus is never
    re-shingled — each day's batch probes these tables and appends its
    survivors (``mode='append'``). The shingle table is the expensive
    half (≈ normalized text size); it buys *exact* verification of
    candidate pairs. A signature-only store (drop ``shingles/``, verify
    by signature agreement) trades that exactness for ~100× less
    storage — at 100 TB keep shingles only while exactness is a
    requirement, e.g. during dedup-policy audits.
    """
    # localCheckpoint, not persist: in the append path the input df's
    # lineage READS this very store (survivors = batch anti-join
    # store-matches), so after the first write mutates bands/ any cache
    # miss would recompute against the mutated store — a doc would match
    # its own just-appended signature and silently vanish from the
    # second write. Eager checkpoint materializes from the PRE-append
    # store state and severs the lineage, making both writes safe and
    # idempotent relative to it.
    banded = _banded_signatures(
        df, text_col, id_col, num_perm, bands, k
    ).localCheckpoint(eager=True)
    banded.select("id", "band", "bh").write.mode(mode).partitionBy(
        "band"
    ).parquet(f"{store_path}/bands")
    banded.filter(F.col("band") == 0).select("id", "sh").write.mode(
        mode
    ).parquet(f"{store_path}/shingles")


def incremental_near_dups(
    spark,
    new_df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Near-duplicate matches of a NEW batch against a persisted
    signature store plus the batch's own earlier docs — the
    daily-ingestion dedup path (new crawl vs historical corpus) that
    avoids ever re-processing the corpus itself.

    Returns (new_id, match_id, jaccard, match_side): ``store`` rows pair
    a new doc with a historical doc; ``batch`` rows pair it with a
    smaller-id doc of the same batch (the dedup policy: the EARLIER doc
    wins, so a new doc is a duplicate if it matches history or a batch
    predecessor).

    Shape: the batch is shingled/signed once (persisted); candidates
    come from two equi-joins on (band, bh) — new×store and new×new —
    so nothing is ever all-pairs, and the store side streams from its
    band-partitioned parquet without recomputation. Candidates are then
    exact-verified on shingle sets. Store shuffle volume is bounded by
    bucket collisions, not store size.
    """
    new_banded = _banded_signatures(
        new_df, text_col, id_col, num_perm, bands, k
    ).persist()
    new_bands = new_banded.select("id", "band", "bh")
    new_sh = new_banded.filter(F.col("band") == 0).select("id", "sh")
    old_bands = spark.read.parquet(f"{store_path}/bands")
    old_sh = spark.read.parquet(f"{store_path}/shingles")

    store_cand = (
        new_bands.alias("n")
        .join(
            old_bands.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.bh") == F.col("o.bh")),
        )
        .select(
            F.col("n.id").alias("new_id"), F.col("o.id").alias("match_id")
        )
        .distinct()
        .withColumn("match_side", F.lit("store"))
    )
    batch_cand = (
        new_bands.alias("a")
        .join(
            new_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("new_id"), F.col("b.id").alias("match_id")
        )
        .distinct()
        .withColumn("match_side", F.lit("batch"))
    )
    match_sh = old_sh.unionByName(new_sh)
    return (
        store_cand.unionByName(batch_cand)
        .join(
            new_sh.select(
                F.col("id").alias("new_id"), F.col("sh").alias("n_sh")
            ),
            "new_id",
        )
        .join(
            match_sh.select(
                F.col("id").alias("match_id"), F.col("sh").alias("m_sh")
            ),
            "match_id",
        )
        # |A∪B| arithmetically from distinct-by-construction shingle
        # arrays — identical integers, one hash-set pass per pair instead
        # of two; the intermediate projection keeps the intersect
        # single-evaluated (CollapseProject does not inline an expensive
        # expression referenced twice). Same rewrite as
        # minhash_verified_near_dups (r12).
        .selectExpr(
            "new_id",
            "match_id",
            "match_side",
            "size(array_intersect(n_sh, m_sh)) AS __inter",
            "size(n_sh) + size(m_sh) AS __tot",
        )
        .selectExpr(
            "new_id",
            "match_id",
            "match_side",
            "round(__inter / (__tot - __inter), 6) AS jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_dedup(
    spark,
    new_df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
    update_store: bool = False,
) -> DataFrame:
    """Survivors of the incremental dedup policy: new docs that match
    neither the store nor a smaller-id batch peer at ≥ threshold.
    ``update_store=True`` appends the survivors' signatures/shingles to
    the store so the next batch dedups against them too."""
    matches = incremental_near_dups(
        spark, new_df, store_path, text_col, id_col, threshold,
        num_perm, bands, k,
    )
    dup_ids = matches.select(
        F.col("new_id").alias(id_col)
    ).distinct()
    survivors = new_df.join(dup_ids, id_col, "left_anti")
    if update_store:
        write_signature_store(
            survivors, store_path, text_col, id_col, num_perm, bands, k,
            mode="append",
        )
    return survivors


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: Column | None = None,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs within blocks, computed
    from an inverted shingle index — never a pairwise set operation.

    The naive form self-joins blocks and runs array_intersect /
    array_union per pair: Σ block² set operations over ~50-element
    string arrays. Instead the (distinct) shingles explode to an
    inverted index joined with itself on (block, shingle): each common
    shingle contributes one (a, b) row, so ``groupBy(a, b).count()`` IS
    |a∩b| exactly, and |a∪b| = |a|+|b|-|a∩b| from two broadcast size
    lookups. Everything is a keyed equi-join + hash aggregate — pure
    JVM, no per-pair array scans. Measured 11.9s → 2.9s at sf0.1,
    identical output.

    Scale: cost is Σ_shingle (docs-per-shingle choose 2) within blocks —
    bounded by the blocking key; pathological stop-shingles would need a
    document-frequency cap or the MinHash path (minhash_lsh_candidates),
    which remains the general unblocked tool. For high thresholds a
    PPJoin prefix filter (index only the |sh|-⌈t·|sh|⌉+1 rarest
    shingles) would shrink the index further; at the low thresholds this
    exact scorer serves (0.1-0.5) the prefix is nearly the whole set,
    so the straight inverted index wins.
    """
    blk_sql = (
        f"floor(length({text_col}) / 200)" if block_col is None else None
    )
    base = _spread(df)
    if blk_sql is not None:
        docs = base.selectExpr(
            f"{id_col} AS id",
            blk_sql + " AS blk",
            _word_shingles_sql(text_col, k) + " AS sh",
        )
    else:
        docs = base.select(
            F.col(id_col).alias("id"),
            block_col.alias("blk"),
            word_shingles(F.col(text_col), k).alias("sh"),
        )
    docs = docs.persist()  # shingle once; index and size lookup reuse it
    ex = docs.selectExpr("id", "blk", "explode(sh) AS g")
    # MERGE hint on the index self-join (r13): Catalyst estimates the
    # exploded index at its cached CHILD's size (Generate fanout is
    # invisible to stats — ~50 shingles/doc here), so it auto-broadcast
    # a 344 MiB / 2.6M-row relation at sf1 (43× past the 32 MB
    # threshold): ~3.2 s of driver collect+build+ship per run, and the
    # same misestimate at borderline corpus sizes would OOM the driver.
    # Sort-merge shuffles the compact (id, blk, g) rows instead and
    # spills gracefully at any scale; measured interleaved at sf1:
    # 12.59 s → 10.63 s medians, identical 248,924 output pairs
    # (SHUFFLE_HASH measured equal at 10.84 s — MERGE kept for its
    # no-OOM posture on a skewed build side).
    inter_counts = (
        ex.alias("pa")
        .join(
            ex.hint("MERGE").alias("pb"),
            F.expr("pa.blk = pb.blk AND pa.g = pb.g AND pa.id < pb.id"),
        )
        .groupBy(
            F.col("pa.id").alias("doc_id_a"), F.col("pb.id").alias("doc_id_b")
        )
        .agg(F.expr("count(1) AS inter"))
    )
    sizes = docs.selectExpr("id", "size(sh) AS sz")
    return (
        inter_counts.join(
            F.broadcast(sizes.selectExpr("id AS doc_id_a", "sz AS sz_a")),
            "doc_id_a",
        )
        .join(
            F.broadcast(sizes.selectExpr("id AS doc_id_b", "sz AS sz_b")),
            "doc_id_b",
        )
        .selectExpr(
            "doc_id_a",
            "doc_id_b",
            "round(inter / (sz_a + sz_b - inter), 6) AS jaccard",
        )
        .filter(f"jaccard >= {threshold}")
    )


def minhash_verified_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """The full production near-dup pipeline: LSH candidate generation
    followed by exact-Jaccard verification of ONLY the candidate pairs.

    Candidate generation never forms all-pairs (banded bucket join);
    verification joins each candidate pair back to the two shingle sets —
    O(candidates), not O(Σblock²). Output is deterministic AND
    oracle-checkable: for thresholds where banded-LSH recall is 1.0
    (candidate probability 1-(1-s^r)^b ≈ 1 for s ≥ 0.5 at r=4, b=8),
    the result equals the brute-force pairs-over-threshold set that
    DuckDB can compute — a hashable end-to-end check of the whole
    shingle→minhash→band→verify pipeline.
    """
    sh = _spread(df).selectExpr(
        f"{id_col} AS id",
        _word_shingles_sql(text_col, k) + " AS sh",
    ).persist()  # shingle ONCE: feeds the signatures and both pair sides
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_perm, bands, k, shingles=sh
    )
    return (
        cands.join(
            sh.selectExpr("id AS doc_id_a", "sh AS a_sh").alias("a_t"),
            "doc_id_a",
        )
        .join(
            sh.selectExpr("id AS doc_id_b", "sh AS b_sh").alias("b_t"),
            "doc_id_b",
        )
        .selectExpr(
            "doc_id_a",
            "doc_id_b",
            # |A∪B| computed arithmetically: the shingle arrays are
            # array_distinct by construction (word_shingles), so
            # size(union) ≡ size(a)+size(b)-size(intersect) EXACTLY —
            # same integers, same division — and the array_union pass
            # (a second per-pair hash-set build over ~|a|+|b| strings)
            # disappears from the verify stage (r12, guide §1.2 "per-task
            # work": verify stage was 11.1s task-time of which the two
            # set ops dominate; measured e2e 1.085 -> ~0.95s at sf0.1).
            "size(array_intersect(a_sh, b_sh)) AS __inter",
            "size(a_sh) + size(b_sh) AS __tot",
        )
        .selectExpr(
            "doc_id_a",
            "doc_id_b",
            "round(__inter / (__tot - __inter), 6) AS jaccard",
        )
        .filter(f"jaccard >= {threshold}")
    )


def _simhash_sql(hh_sql: str = "hh") -> str:
    """JVM-expression SimHash fold over a precomputed hash-array column:
    bit i of the result is set iff the majority of shingle hashes have
    bit i set (sign of Σ±1 > 0 ⟺ 2·count_i > n — same integers as the
    numpy fold, so fingerprints are bit-identical; parity pinned over
    the real corpus in tests/test_optimization_r13.py). Bit 63 lands as
    the sign bit via shiftleft(1L, 63) = Long.MIN, matching numpy's
    uint64→int64 view. Empty arrays give 0 (no majority anywhere) and a
    NULL array coalesces to 0, both exactly as the UDF's zero-fill.

    Same rationale as _minhash_mins_sql (r12, guide §4.1): the Arrow
    boundary costs a fixed ~0.3-0.5 s of per-stage worker/transfer
    overhead while the interpreted per-element arithmetic is equivalent
    to numpy's — and this removes the dedup family's last
    ArrowEvalPython node. Callers must keep ``hh`` in its own projection
    (multi-ref non-cheap alias: CollapseProject keeps the shingling
    single-pass)."""
    n = f"size({hh_sql})"
    bits = " | ".join(
        f"shiftleft(IF(2 * aggregate({hh_sql}, 0L, "
        f"(acc, h) -> acc + (shiftright(h, {i}) & 1)) > {n}, 1L, 0L), {i})"
        for i in range(64)
    )
    return f"coalesce(({bits}), 0L)"


def _simhash_fold_udf():
    """Arrow-vectorized SimHash fold: per row, bit i of the output is the
    sign of Σ over shingle hashes of (bit_i(h) ? +1 : -1).

    Kept as the parity reference for ``_simhash_sql`` (r13); the query
    path uses the JVM expression."""
    shifts = np.arange(64, dtype=np.uint64)[None, :]

    @pandas_udf("long")
    def fold(hh: pd.Series) -> pd.Series:
        # Whole-batch form (guide §4.2), same shape as the minhash fold:
        # flatten to ONE (Σ|row|, 64) ±1 bit matrix + a segmented sum
        # (add.reduceat) instead of per-row numpy calls. Bit math is
        # element-wise identical, so fingerprints are unchanged.
        n = len(hh)
        out = np.zeros(n, dtype=np.uint64)
        rows = [
            None if r is None or len(r) == 0 else np.asarray(r, dtype=np.uint64)
            for r in hh
        ]
        valid = [i for i, r in enumerate(rows) if r is not None]
        if valid:
            flat = np.concatenate([rows[i] for i in valid])[:, None]
            lens = np.array([len(rows[i]) for i in valid])
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            bits = ((flat >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1
            sums = np.add.reduceat(bits, starts, axis=0)  # (v, 64)
            packed = np.packbits(
                (sums > 0)[:, ::-1], axis=1, bitorder="big"
            ).view(">u8")[:, 0]
            out[valid] = packed
        return pd.Series(out.astype(np.int64))

    return fold


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

    # Shingle-hash JVM-side into a dedicated ``hh`` projection, then the
    # 64 per-bit majority sums as one JVM expression over it (r13 — see
    # _simhash_sql; this removed the dedup family's last ArrowEvalPython
    # node, same pattern as the r12 MinHash fold).
    hashed = _spread(df).selectExpr(
        f"{id_col} AS id",
        f"transform({_word_shingles_sql(text_col, 2)}, s -> xxhash64(s)) AS hh",
    )
    sh = hashed.selectExpr("id", _simhash_sql("hh") + " AS sh").withColumn(
        "blk", F.shiftrightunsigned(F.col("sh"), 64 - prefix_bits)
    )
    # materialize once for both join sides (see minhash_lsh_candidates)
    sh = sh.persist()
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


_ADAPTIVE_BLOCK_TARGET = 2048


def _adaptive_sign_bits(n_rows: int, dim: int | None = None) -> int:
    """k ≈ log2(n / target-block-size), clamped to [1, min(16, dim)]:
    keeps the expected per-block row count (and therefore the
    O(n²/2^k) pair count per block) roughly constant as the corpus
    grows. 2048-row blocks keep the within-block self-join comfortably
    sub-second per block while leaving enough rows for near-dup pairs
    to co-occur. The ``dim`` clamp (shortest vector in the corpus)
    stops k from indexing past the vector length — element_at beyond
    the end is NULL, and a NULL block key would silently drop the row
    from every candidate pair."""
    import math

    hi = 16 if dim is None else max(1, min(16, dim))
    if n_rows <= _ADAPTIVE_BLOCK_TARGET:
        return 1
    return max(
        1, min(hi, math.ceil(math.log2(n_rows / _ADAPTIVE_BLOCK_TARGET)))
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: Column | None = None,
    threshold: float = 0.95,
    n_sign_bits: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Default block: the sign pattern of the first ``n_sign_bits``
    components (axis-aligned sign-LSH). The within-block self-join is
    O(n²/2^k) for k bits, so k is the scale dial: 1 bit halves the
    pairs, 3 bits cut them 8x, and k should grow ~log2(n) to keep
    per-block density constant as the corpus grows (the r6 sf1 sweep
    measured a FIXED 1-bit default at 84x wall for 10x rows — exactly
    the quadratic). Since r7, ``n_sign_bits=None`` (the default)
    derives k from a corpus count (one cheap count job:
    ~log2(n/2048), clamped to [1, 16]) so a naive caller can no longer
    hit the cliff silently; pass an explicit k to pin the blocking
    (the suite entry uses 3 for oracle determinism). Like any
    single-table sign-LSH, a pair differing in any blocked component's
    sign is missed; that blocking IS the declared operator semantics
    (mirrored in the oracle), and recall-critical dedup should OR
    several blockings (see decontaminate_embeddings's multi-table
    bucketer) or use minhash banding."""
    if block_col is None:
        adaptive = n_sign_bits is None
        if adaptive:
            # one job for both dials: corpus size (drives k) and the
            # SHORTEST vector (caps k — indexing past the end would
            # NULL the block key and drop the row from every pair)
            n_rows, min_dim = df.agg(
                F.count(F.lit(1)), F.min(F.size(F.col(vec_col)))
            ).first()
            n_sign_bits = _adaptive_sign_bits(n_rows, min_dim)
        bits = [
            (F.element_at(F.col(vec_col), i + 1) > 0).cast("int")
            * F.lit(1 << i)
            for i in range(n_sign_bits)
        ]
        if adaptive:
            # NULL components among the first k dims must not zero a
            # row's recall either — fold them to sign 0. The explicit-k
            # path keeps the raw bits: that blocking is the declared
            # (and oracle-mirrored) operator semantics.
            bits = [F.coalesce(b, F.lit(0)) for b in bits]
        block_col = sum(bits[1:], bits[0])
    # Precompute each row's norm BEFORE the self-join: the per-pair cosine
    # then needs one 64-dim fold (the dot) instead of three — identical
    # floating-point result (norm(a)*norm(b) is the same per-row value
    # either way), 3× less interpreted-HOF work on the quadratic stage.
    # _spread guards the single-split small-corpus case (one parquet file
    # = one core for the whole pair scoring otherwise).
    docs = _spread(df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        block_col.alias("blk"),
    )).withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)),
    ).persist()
    a, b = docs.alias("a"), docs.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
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


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph →
    (node, component) with component = min node id reachable.

    This is the step that turns pairwise near-dup hits into dedup
    *clusters* (keep min-id per component, drop the rest) — the reference
    exposes only pairwise semijoin-style dedup; at corpus scale the
    transitive closure is what you actually need.

    Algorithm: distributed min-label propagation (Pregel-style, the same
    fixpoint GraphX `connectedComponents` computes): every node starts
    labeled with itself; each round every node takes the min label among
    itself and its neighbors; stop when no label changed. Rounds =
    graph diameter; near-dup graphs are unions of small cliques/paths, so
    this converges in a handful of rounds. Each round is one shuffle join
    on node id — at 100 TB the edge list is hash-partitioned on `u` and
    the join co-locates with the label table's partitioning, so rounds
    reuse the exchange. `localCheckpoint` truncates the logical plan every
    round: without it the lineage doubles per iteration and Catalyst
    re-optimization time explodes by round ~15.
    """
    # Persist the directed edge list first: the undirected union reads it
    # twice, and upstream edge generation (e.g. Jaccard pair scoring) is
    # the most expensive stage of the whole clustering. localCheckpoint
    # then truncates the (possibly huge) upstream plan before iteration.
    directed = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).persist()
    und = (
        directed.unionByName(
            directed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    directed.unpersist()
    labels = (
        und.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    from pyspark.sql import Observation

    for _ in range(max_iter):
        nbr = und.join(labels, und["v"] == labels["node"]).select(
            und["u"].alias("node"), F.col("comp")
        )
        # Fuse the convergence check into the SAME job that materializes
        # the round (df.observe rides the localCheckpoint action) — one
        # job per round instead of a checkpoint job + a diff-count job.
        obs = Observation()
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .join(labels.withColumnRenamed("comp", "old"), "node")
            .observe(
                obs,
                F.sum(
                    (F.col("comp") != F.col("old")).cast("long")
                ).alias("changed"),
            )
            .select("node", "comp")
            .localCheckpoint()
        )
        labels = new
        if obs.get["changed"] == 0:
            break
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dup clustering: exact n-gram Jaccard pairs →
    connected components → (doc_id, component)."""
    pairs = jaccard_pairs(df, threshold=threshold, text_col=text_col, id_col=id_col)
    cc = connected_components(pairs, src=f"{id_col}_a", dst=f"{id_col}_b")
    return cc.select(
        F.col("node").cast("long").alias(id_col),
        F.col("component").cast("long").alias("component"),
    ).orderBy(id_col)


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    dim: int = 64,
    threshold: float = 0.9,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup-style semantic pruning over an embedding column.

    The SemDeDup recipe (Abbas et al. 2023): cluster the embedding
    space, then inside each cluster drop all but one of every group of
    semantically near-identical items. Deterministic formulation here:
    the "cluster" is a sign-LSH bucket (seeded hyperplanes — reproducible
    across engines, unlike k-means on floats), and within a bucket a
    vector is dropped iff a LOWER-id neighbor sits at cosine >=
    ``threshold`` (keep-first policy — one pass, no iteration, total
    order ⇒ unique answer).

    Returns every input row as (id, bucket, kept) — callers filter
    kept for the pruned corpus; keeping the flag makes the drop set
    auditable (and hash-checkable by the suite oracle).

    Scale shape: bucketing is map-side (n_planes JVM dot-products per
    row against literal planes; switch to the Arrow matmul in
    similarity._lsh_buckets_udf beyond ~8 planes); the only shuffle is
    the bucket-keyed self-join, Σ(bucket²) not n² pairs; norms are
    precomputed before the join (one fold per pair, not three). More
    planes ⇒ smaller buckets ⇒ cheaper join but more misses at cluster
    boundaries — the knob SemDeDup's cluster count also trades on.
    """
    from hive_2_3_2_spark.llm import similarity as S

    planes = S.hyperplanes(dim, n_planes, seed)
    docs = (
        _spread(
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
        )
        .withColumn("bucket", S.lsh_bucket(F.col("v"), planes))
        .withColumn(
            "nrm",
            F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)),
        )
        .persist()
    )
    a, b = docs.alias("a"), docs.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6)
    dropped = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .filter(cos >= threshold)
        .select(F.col("a.id").alias("id"))
        .distinct()
        .withColumn("dead", F.lit(True))
    )
    return docs.join(dropped, "id", "left").select(
        "id",
        "bucket",
        F.coalesce(~F.col("dead"), F.lit(True)).alias("kept"),
    )
