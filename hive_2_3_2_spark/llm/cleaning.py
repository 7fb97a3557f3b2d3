"""Text cleaning / filtering operators for training-data pipelines.

The filters a large-scale pretraining corpus actually runs (C4,
Gopher/MassiveText rules, benchmark decontamination), expressed as
JVM-side Column work — every operator here is a scan-local projection or
a broadcast join; nothing shuffles on data size except the final
aggregation a caller chooses.

- ``scrub_pii``: regex redaction (emails, phone numbers, IPv4) — chained
  regexp_replace, codegen-friendly, no Python.
- ``quality_flags``: Gopher-style document heuristics (word count
  bounds, mean word length, symbol-to-word ratio).
- ``dup_line_fraction`` / ``top_ngram_share``: the MassiveText
  repetition filters (duplicate-line fraction; most-frequent-n-gram
  share via linear explode+groupBy, NOT the quadratic per-row form).
- ``decontaminate``: drop documents sharing any word n-gram with a
  benchmark set (the train/test overlap scrub) — exploded-ngram
  broadcast semi-join, so the corpus is scanned once and never
  self-joined.
- ``build_bloom_filter`` / ``bloom_might_contain`` /
  ``decontaminate_bloom``: DataFrame-built Bloom filter (bit_or word
  fold) probed as a constant-folded literal-array expression — the
  blocklist path for when the contamination set outgrows a broadcast.

Scale notes: scrub/flags/ratios are per-row expressions (100 TB = a map
pass fused into whatever scan already runs). Decontamination joins on
the n-gram string; the benchmark side (thousands of n-grams) broadcasts,
and the corpus side explodes lazily INSIDE the join stage — the
exploded form is never materialized to a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_2_3_2_spark.functions.gaps import ngram_windows

# Deliberately simple, deterministic patterns (production would plug in
# a richer library; the *shape* — chained JVM regex, no UDF — is the
# point). Kept ASCII-safe so DuckDB oracles reproduce them byte-for-byte.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails, phone numbers and IPv4 addresses with typed
    placeholder tokens — the standard pre-tokenization PII pass."""
    out = F.regexp_replace(text, _EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, _PHONE, "<PHONE>")
    return F.regexp_replace(out, _IPV4, "<IP>")


def quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
) -> Column:
    """Gopher-style quality rule struct: per-document booleans + the
    underlying measurements (word count, mean word length, hash/ellipsis
    symbol-to-word ratio). Callers filter on ``.overall`` or inspect the
    individual rules — keeping the measurements in the output makes the
    filter auditable (why was this doc dropped?)."""
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / n_words,
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(text) - F.length(F.regexp_replace(text, r"[#…]", ""))
    ) + 2 * (
        (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    ).cast("long")
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(
        F.lit(0.0)
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    ok_symbols = symbol_ratio <= max_symbol_ratio
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_symbols.alias("ok_symbol_ratio"),
        (ok_words & ok_mean & ok_symbols).alias("overall"),
    )


def dup_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that duplicate an earlier line (the
    MassiveText duplicate-line filter) — linear per-row array work."""
    lines = F.filter(F.split(text, "\n"), lambda ln: F.length(ln) > 0)
    n_lines = F.size(lines)
    return F.round(
        F.when(
            n_lines > 0,
            (n_lines - F.size(F.array_distinct(lines))) / n_lines,
        ).otherwise(F.lit(0.0)),
        4,
    )


def top_ngram_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Share of a document's n-grams taken by its most frequent n-gram
    (the MassiveText repetition filter; high ⇒ boilerplate/spam).

    Deliberately a DataFrame op, not a per-row Column: the obvious
    array-only formulation (count each distinct gram by filtering the
    gram array) is O(distinct × total) PER ROW — quadratic in document
    length, a silent cluster-killer on long documents. Exploding to
    (doc, gram) rows and counting via two map-side-combined groupBys is
    linear and shuffles only (doc, gram, count) tuples.

    Returns (id_col, n_grams, top_share); documents shorter than ``n``
    tokens get n_grams = 0, top_share = 0.0.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = df.select(
        F.col(id_col), F.explode_outer(ngram_windows(toks, n)).alias("g")
    )
    counts = exploded.groupBy(id_col, "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_grams"),
            F.max(F.when(F.col("g").isNotNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("top_c"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(
                F.when(
                    F.col("n_grams") > 0, F.col("top_c") / F.col("n_grams")
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("top_share"),
        )
    )


def build_bloom_filter(
    values: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> dict:
    """Build a Bloom filter over a column as a plain dict
    ``{"words": list[int], "num_bits": m, "num_hashes": k}`` — the
    filter the engine can't give us directly (``bloom_filter_agg`` /
    ``might_contain`` exist inside Spark's runtime-filter rewrite but are
    not SQL-resolvable; cf. Hive's own bloom support in
    ``ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDAFBloomFilter.java``
    and ``storage-api``'s ``BloomKFilter``).

    Shape: k probe positions per value (``xxhash64(seed, v)`` — k
    independent seeds, the standard k-hash construction), exploded to
    (word_idx, bit mask) rows, folded with one map-side-combined
    ``bit_or`` groupBy. The shuffle carries at most ``num_bits/32``
    distinct words REGARDLESS of input size — a 100 TB blocklist scan
    reduces to a ≤256 KiB (default m=2^20) driver-side constant. Memory
    on the driver is the dense word array, never the values.

    Representation: the filter ships as ONE BINARY blob (4 big-endian
    bytes per 32-bit word). A 2^20-bit filter as an array literal would
    be a 16k-element list whose py4j element-wise transfer alone costs
    ~10s of driver time per ``F.lit`` (measured) and whose 16k-child
    expression slows every analysis pass; a hex-string literal transfers
    fast but character-indexed ``substring`` walks code points — O(pos)
    per row on a 256 KiB string (measured 18s/M rows). The binary blob
    is a single transfer, a single scalar Literal node, and byte-indexed
    O(1) slicing.
    """
    n_words = (num_bits + 31) // 32
    c = F.col(col).cast("string")
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), c), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    set_words = (
        values.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 32).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 32).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in set_words:
        words[r["w"]] = r["word"]
    blob = b"".join(w.to_bytes(4, "big") for w in words)
    return {"blob": blob, "num_bits": num_bits, "num_hashes": num_hashes}


def bloom_might_contain(bloom: dict, col: Column) -> Column:
    """Membership probe against a ``build_bloom_filter`` result — false
    positives possible, false negatives impossible.

    The filter enters the plan as ONE scalar binary Literal; each of the
    k probes slices its 32-bit word with byte-indexed ``substring``
    (O(1) on BinaryType) and decodes it via ``hex`` + ``conv(_,16,10)``.
    No higher-order functions, no Python: the probe is a scan-local
    codegen expression, so filtering 100 TB against a million-entry
    blocklist never shuffles a non-matching row.
    """
    m, k = bloom["num_bits"], bloom["num_hashes"]
    blob = F.lit(bytearray(bloom["blob"]))
    c = col.cast("string")
    out = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), c), F.lit(m))
        word = F.conv(
            F.hex(F.substring(blob, (pos / 32).cast("int") * 4 + 1, 4)),
            16,
            10,
        ).cast("long")
        bit = F.call_function(
            "shiftright", word, (pos % 32).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        out = out & (bit == 1)
    return out


def decontaminate_bloom(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """``decontaminate`` with a Bloom prefilter on the corpus side —
    byte-identical results (no false negatives ⇒ every truly
    contaminated n-gram survives the prefilter; false positives are
    removed by the exact join that follows).

    Why it exists: the plain path joins EVERY exploded corpus n-gram
    against the benchmark set. Fine while the benchmark side broadcasts;
    once the blocklist outgrows the broadcast threshold (URL blocklists,
    cross-run dedup fingerprints — billions of entries) that join
    becomes a full shuffle of the exploded corpus (~10× the corpus in
    bytes). The Bloom probe is a codegen filter BETWEEN the explode and
    the join, so only grams that might match — benchmark-sized, not
    corpus-sized — reach the join at all. Filter size is m bits however
    large the blocklist row count grows.
    """

    def grams(col: Column) -> Column:
        return ngram_windows(F.split(F.trim(F.lower(col)), r"\s+"), n)

    # Materialize the benchmark grams once: they feed BOTH the bloom
    # build (a collect) and the exact confirm join. Without the persist
    # the final plan re-explodes the benchmark side AND constraint
    # propagation infers the (huge-literal) bloom probe onto that
    # re-scan too — measured 23s → 8s at sf0.1.
    bench_grams = (
        benchmark.select(F.explode(grams(F.col(bench_text_col))).alias("g"))
        .distinct()
        .persist()
    )
    bloom = build_bloom_filter(bench_grams, "g", num_bits, num_hashes)
    candidate_grams = df.select(
        F.col(id_col), F.explode(grams(F.col(text_col))).alias("g")
    ).filter(bloom_might_contain(bloom, F.col("g")))
    contaminated = (
        candidate_grams.join(F.broadcast(bench_grams), "g")
        .select(id_col)
        .distinct()
    )
    return df.join(contaminated, id_col, "left_anti")


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Drop documents that share any word ``n``-gram with the benchmark
    set — the train/test contamination scrub every serious pretraining
    run performs.

    Shape: benchmark n-grams (small: eval sets are thousands of docs)
    are distinct'd and BROADCAST; the corpus explodes its n-grams only
    inside the anti-join stage (one scan, no self-join, no corpus-side
    shuffle of exploded rows). Word n-grams of length 8 make accidental
    collisions essentially impossible, so exact string equality is the
    right join key — no hashing step to tune.
    """

    def grams(col: Column) -> Column:
        return ngram_windows(F.split(F.trim(F.lower(col)), r"\s+"), n)

    bench_grams = (
        benchmark.select(F.explode(grams(F.col(bench_text_col))).alias("g"))
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col), F.explode(grams(F.col(text_col))).alias("g")
    )
    contaminated = doc_grams.join(F.broadcast(bench_grams), "g").select(
        id_col
    ).distinct()
    return df.join(contaminated, id_col, "left_anti")


def remove_repeated_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n\n",
    min_repeat: int = 2,
) -> DataFrame:
    """Corpus-level repeated-segment removal (the RefinedWeb / CCNet
    "line dedup" pass): split every document into segments on ``delim``,
    count each distinct segment's corpus frequency, and drop EVERY
    occurrence of segments appearing >= ``min_repeat`` times — these are
    boilerplate (nav bars, cookie banners, license headers), not
    content. Remaining segments are stitched back in original order.

    Returns (doc_id, text_clean, n_segments, n_dropped); documents whose
    segments were all boilerplate survive with text_clean = ''.

    Scale shape (100 TB): two data-sized shuffles — the frequency count
    keyed on the segment fingerprint (map-side partial agg, so the wire
    carries (md5, count) not text) and the per-document reassembly keyed
    on doc_id. The repeated-segment set itself is corpus boilerplate
    (small); AQE turns the anti-join into a broadcast once its build
    side proves tiny. No Python anywhere — split/fingerprint/stitch are
    codegen'd Column expressions.

    Reference parity: the reference ships no sub-document dedup; this is
    a training-pipeline extension (SURVEY §6 scope) built on the same
    fingerprint normalization as exact_dedup (llm/text.py
    md5_fingerprint).
    """
    import re as _re

    from hive_2_3_2_spark.llm.text import normalize_for_fingerprint

    segs = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(delim), -1)
        ).alias("idx", "seg"),
    ).withColumn("seg_fp", F.md5(normalize_for_fingerprint(F.col("seg"))))
    repeated = (
        segs.groupBy("seg_fp")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_repeat)
        .select("seg_fp")
    )
    kept = segs.join(repeated, "seg_fp", "left_anti")
    stitched = kept.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        totals.join(stitched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.col("n_segments"),
            (F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_dropped"
            ),
        )
    )


def decontaminate_embeddings(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 5,
    n_tables: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    return_removed: bool = False,
    method: str = "exact",
) -> DataFrame:
    """Embedding-level benchmark decontamination: drop corpus vectors
    whose cosine similarity to ANY eval-set vector reaches ``threshold``
    (SemDeDup-style semantic train/test overlap scrub — the n-gram
    ``decontaminate`` misses paraphrased contamination; this catches it).

    Candidate generation is multi-table sign-LSH with 1-bit multiprobe
    (the similarity module's bucketer: one Arrow matmul per batch for
    ALL tables); the small eval side broadcasts, so the corpus is
    scanned once and joined on (table, bucket) — never all-pairs. Exact
    cosine then verifies every candidate, so nothing below threshold is
    ever dropped; recall is governed by the (n_tables, n_planes)
    amplification (default 16x5+multiprobe: collision prob ≈0.39/table
    at cosine 0.4 ⇒ miss ≈0.02%/pair). Deterministic (fixed seeded
    hyperplanes).

    Scale: at 100 TB the corpus side stays one projection pass; the
    exploded (table, bucket) form lives inside the broadcast-join stage
    only. ``return_removed=True`` returns the contamination report
    (corpus id, n_eval_hits, max_cosine) instead of the kept corpus.

    ``method="exact"`` (the default) skips LSH entirely: the unit-
    normalized eval matrix broadcasts once and every Arrow batch of
    corpus vectors scores against it with one chunked numpy matmul —
    zero shuffles, zero joins, exact recall by construction. The r6
    sf1 sweep showed why this is the default: at these parameters the
    LSH candidate factor is n_tables*(n_planes+1)/2^n_planes = 3 —
    MORE pairs than brute force — because a 0.4 cosine threshold needs
    loose hashes for full recall. LSH (``method="lsh"``) remains the
    right path only when the eval set is too large to broadcast
    (> MAX_QUERY_BATCH) AND the threshold is high enough (≳0.8) for
    tight hashes to actually prune.
    """
    if method == "exact":
        return _decontaminate_exact(
            corpus, eval_df, threshold, vec_col, id_col, return_removed
        )
    from hive_2_3_2_spark.llm.similarity import (
        _lsh_buckets_udf,
        _dot,
        _norm,
        hyperplanes,
    )

    tables = [
        hyperplanes(dim, n_planes, seed=2000 + 11 * t)
        for t in range(n_tables)
    ]
    bucketer = _lsh_buckets_udf(tables)

    # Pre-normalize each side ONCE (per vector, not per candidate pair):
    # verification then needs a single dot per pair instead of a dot plus
    # two norm folds — 3× less array work on the candidate set.
    def unit(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
            .withColumn("_n", _norm(F.col("_v")))
            .select(
                out_id,
                F.transform(
                    "_v", lambda x: x / F.col("_n")
                ).alias(out_vec),
            )
        )

    c = (
        unit(corpus, "corpus_id", "cv")
        .withColumn("bkts", bucketer(F.col("cv")))
        .select(
            "corpus_id", "cv", F.posexplode("bkts").alias("tbl", "bkt")
        )
    )
    q = (
        unit(eval_df, "eval_id", "qv")
        .withColumn("bkts", bucketer(F.col("qv")))
        .select("eval_id", "qv", F.posexplode("bkts").alias("tbl", "bkt0"))
    )
    probes = F.array(
        F.col("bkt0"),
        *[F.col("bkt0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    q_probed = q.select("eval_id", "qv", "tbl", F.explode(probes).alias("bkt"))
    hits = (
        c.join(F.broadcast(q_probed), ["tbl", "bkt"])
        .select("corpus_id", "eval_id", "cv", "qv")
        .dropDuplicates(["corpus_id", "eval_id"])
        # both sides unit vectors -> cosine is one dot
        .withColumn("cosine", _dot(F.col("cv"), F.col("qv")))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )
    removed = hits.groupBy("corpus_id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        F.round(F.max("cosine"), 6).alias("max_cosine"),
    )
    if return_removed:
        return removed.select(
            F.col("corpus_id").alias(id_col), "n_eval_hits", "max_cosine"
        )
    return corpus.join(
        removed.select(F.col("corpus_id").alias(id_col)), id_col, "left_anti"
    )


def _decontaminate_exact(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    return_removed: bool,
) -> DataFrame:
    """Exact decontamination: broadcast eval matrix + per-batch matmul.

    One corpus scan, no join, no shuffle before the (tiny) report. The
    eval side is collected driver-side and unit-normalized once — the
    same bounded-batch contract as the IVF query path, enforced with
    the same MAX_QUERY_BATCH guard (a benchmark/eval set is fixed-size
    in a real pipeline; it does not grow with the corpus). Chunking the
    eval columns (8192 at a time) bounds each batch's score block to
    ~batch_rows x 8192 doubles regardless of eval size."""
    import numpy as np
    import pandas as pd

    from hive_2_3_2_spark.llm.dedup import _spread
    from hive_2_3_2_spark.llm.similarity import MAX_QUERY_BATCH

    ev_rows = (
        eval_df.select(F.col(vec_col).cast("array<double>"))
        .limit(MAX_QUERY_BATCH + 1)
        .collect()
    )
    if len(ev_rows) > MAX_QUERY_BATCH:
        raise ValueError(
            f"decontaminate eval set exceeds MAX_QUERY_BATCH="
            f"{MAX_QUERY_BATCH}: the exact path broadcasts the eval "
            "matrix — split the eval set, or use method='lsh' with a "
            "high threshold"
        )
    E = np.stack([np.asarray(r[0], dtype=np.float64) for r in ev_rows])
    en = np.linalg.norm(E, axis=1)
    en[en == 0] = 1.0
    E = E / en[:, None]
    bc = corpus.sparkSession.sparkContext.broadcast(E)
    thr = float(threshold)
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, n_eval_hits bigint, max_cosine double"
    )

    def score(batches):
        Ev = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            vn = np.linalg.norm(V, axis=1)
            vn[vn == 0] = 1.0
            V = V / vn[:, None]
            n_hits = np.zeros(len(V), dtype=np.int64)
            max_cos = np.full(len(V), -np.inf)
            for c0 in range(0, Ev.shape[0], 8192):
                S = V @ Ev[c0:c0 + 8192].T
                n_hits += (S >= thr).sum(axis=1)
                max_cos = np.maximum(max_cos, S.max(axis=1))
            mask = n_hits > 0
            if mask.any():
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy()[mask],
                        "n_eval_hits": n_hits[mask],
                        "max_cosine": np.round(max_cos[mask], 6),
                    }
                )

    removed = _spread(
        corpus.select(id_col, F.col(vec_col).alias("_v"))
    ).mapInPandas(score, schema=out_schema)
    if return_removed:
        return removed
    return corpus.join(removed.select(id_col), id_col, "left_anti")


def normalize_text(text: Column) -> Column:
    """Standard corpus text normalization: Unicode NFC composition,
    control-character strip (except \\t\\n), and whitespace collapse.

    NFC runs as an Arrow-batched pandas UDF (`unicodedata.normalize` —
    the JVM side has no ICU normalizer exposed in Spark SQL); the strip
    and collapse stay JVM-side regexp_replace so only the NFC pass
    crosses the Arrow boundary. At 100 TB this is a fused map pass over
    whatever scan already runs; the UDF is per-batch vectorized string
    work with no state.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize("NFC", v)
            if v is not None
            else None
        )

    out = nfc(text)
    out = F.regexp_replace(out, r"[\x00-\x08\x0b-\x1f\x7f]", "")
    out = F.regexp_replace(out, r"[ \t]+", " ")
    return F.trim(out)
