"""Quality/behavior tests for the LLM-pipeline operators that the oracle
can't check: MinHash recall vs exact Jaccard, LSH recall vs brute force,
SimHash determinism, multimodal Arrow plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.llm import dedup as D
from hive_2_3_2_spark.llm import multimodal as M
from hive_2_3_2_spark.llm import similarity as S


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_id_a, r.doc_id_b)
        for r in D.jaccard_pairs(
            docs, block_col=F.lit(0), threshold=0.5
        ).collect()
    }
    cand = {
        (r.doc_id_a, r.doc_id_b)
        for r in D.minhash_lsh_candidates(docs, num_perm=32, bands=8).collect()
    }
    if exact:
        recall = len(exact & cand) / len(exact)
        # 8 bands × 4 rows: P[candidate | j=0.5] = 1-(1-0.5^4)^8 ≈ 0.40 per
        # band config — across true duplicates (j≥0.5, mostly ≫0.5) empirical
        # recall should clear 0.6; exact dups (j=1.0) are always caught.
        assert recall >= 0.6, f"minhash recall too low: {recall}"
    # exact duplicates must always be candidates
    exact_dups = {
        (r.doc_id_a, r.doc_id_b)
        for r in D.jaccard_pairs(docs, block_col=F.lit(0), threshold=0.999).collect()
    }
    assert exact_dups <= cand


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, k=5).collect()
    approx = S.lsh_topk(emb, queries, k=5, n_planes=6, n_tables=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # multi-table multi-probe LSH measures ≈0.9 on this data; assert a
    # floor that catches wiring bugs (random buckets ⇒ recall ≈ k/n ≈ 0.01)
    assert recall >= 0.6, f"lsh recall too low: {recall}"


def test_simhash_deterministic_and_blocked(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = docs.select("doc_id", D.simhash64(F.col("text")).alias("sh")).collect()
    b = docs.select("doc_id", D.simhash64(F.col("text")).alias("sh")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # identical text ⇒ identical simhash ⇒ hamming 0
    dup = docs.select(F.lit("same text here").alias("text"), F.col("doc_id"))
    pairs = D.simhash_near_dups(dup, max_hamming=0).collect()
    n = dup.count()
    assert len(pairs) == n * (n - 1) // 2


def test_multimodal_pipeline_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = M.attach_media(
        docs.select("doc_id", F.col("text").cast("binary").alias("payload")),
        "payload",
        "doc_id",
        "text/fake-image",
    )
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    feats = M.extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r.mime == "text/fake-image"
        assert r.n_bytes > 0
        assert "x" in r.feat_head
    frames = M.frame_sample(media, every_n_bytes=64)
    assert frames.count() >= 50


def test_token_count_edge_cases(spark):
    from hive_2_3_2_spark.llm import text as T

    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("a b  c",), ("hi! 42 x",)], ["text"]
    )
    rows = df.select(
        T.whitespace_token_count(F.col("text")).alias("ws"),
        T.bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert [r.ws for r in rows] == [0, 0, 1, 3, 3]
    # "hi! 42 x" → pieces: hi, !, 42, x
    assert rows[4].bpe == 4
    assert rows[0].bpe == 0


def test_pack_sequences_invariants(spark, sf_dir):
    from hive_2_3_2_spark.llm.chunking import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=512).collect()
    assert len(packed) == docs.count()  # every doc packed exactly once
    fills = {}
    for r in packed:
        fills.setdefault(r.pack_id, 0)
        fills[r.pack_id] += r.n_tokens
    for pid, total in fills.items():
        # budget respected unless a single oversized doc owns the pack
        members = [r for r in packed if r.pack_id == pid]
        assert total <= 512 or len(members) == 1, (pid, total)


def test_chunk_documents_reconstructs_text(spark):
    from hive_2_3_2_spark.llm.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150)))], ["doc_id", "text"]
    )
    chunks = sorted(
        chunk_documents(df, chunk_tokens=64, overlap=16).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 48 over 150 tokens → starts 0,48,96,144 → 4 chunks
    assert [c.chunk_id for c in chunks] == [0, 1, 2, 3]
    assert chunks[0].n_tokens == 64 and chunks[3].n_tokens == 6
    # consecutive chunks overlap by 16 tokens
    a, b = chunks[0].chunk_text.split(), chunks[1].chunk_text.split()
    assert a[-16:] == b[:16]
    # full token sequence is reconstructible from stride-sized prefixes
    rebuilt = []
    for c in chunks:
        rebuilt.extend(c.chunk_text.split()[:48])
    assert rebuilt == [f"t{i}" for i in range(150)]


def test_connected_components_handmade_graph(spark):
    """Path 1-2-3-4 (diameter 3 → needs real iteration), triangle 10-11-12,
    isolated edge 20-21."""
    from hive_2_3_2_spark.llm import dedup as D

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_id_a long, doc_id_b long",
    )
    got = {
        (r.node, r.component)
        for r in D.connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_ivf_prebuilt_matches_inline_and_recall(spark, sf_dir, tmp_path):
    """build_ivf_index + ivf_topk_prebuilt must equal the inline ivf_topk
    (same seeded build) and clear the recall floor — the amortized-build
    split the suite/bench uses."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, n_cells=32, n_iter=3)
    pre = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.ivf_topk_prebuilt(spark, idx, queries, k=5, nprobe=8).collect()
    }
    inline = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.ivf_topk(
            emb, queries, k=5, n_cells=32, nprobe=8, n_iter=3
        ).collect()
    }
    assert pre == inline
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & {(q, n) for q, n, _ in pre}) / len(exact)
    assert recall >= 0.8, f"IVF prebuilt recall too low: {recall}"


def test_sampling_rate_one_keeps_everything(spark, sf_dir):
    """Regression: rate >= 1.0 must keep 100% of rows. The old hex-string
    threshold encoded 1.0 as the 5-char '10000', which lexically kept only
    hashes starting with '0' (~6%)."""
    from hive_2_3_2_spark.llm import sampling as S

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    # hash_split at train_frac=1.0: every row is 'train'
    split = S.hash_split(docs, train_frac=1.0)
    assert split.filter(F.col("split") == "train").count() == n
    # mixture_sample: a source absent from `rates` falls to default_rate=1.0
    kept = S.mixture_sample(docs, rates={"no_such_source": 0.5})
    assert kept.count() == n
    # explicit rate 1.0 for every source present
    srcs = [r.source for r in docs.select("source").distinct().collect()]
    kept_all = S.mixture_sample(docs, rates={s: 1.0 for s in srcs}, default_rate=0.0)
    assert kept_all.count() == n
    # rate 0.0 drops everything
    assert S.mixture_sample(docs, rates={}, default_rate=0.0).count() == 0


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(
            emb, queries, k=5, n_cells=32, nprobe=8, n_iter=3
        ).collect()
    }
    assert exact, "no exact neighbors"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_cleaning_edge_cases_and_decontaminate(spark):
    from hive_2_3_2_spark.llm import cleaning as C
    from hive_2_3_2_spark.plans import assert_broadcast_join

    df = spark.createDataFrame(
        [
            (1, "reach me at bob@corp.io or 555-123-4567 now"),
            (2, ""),
            (3, "one two one two one two"),  # top bigram 'one two' 3/5
        ],
        ["doc_id", "text"],
    )
    scrub = {r.doc_id: r.s for r in df.select("doc_id", C.scrub_pii(F.col("text")).alias("s")).collect()}
    assert scrub[1] == "reach me at <EMAIL> or <PHONE> now"
    assert scrub[2] == ""
    shares = {r.doc_id: (r.n_grams, r.top_share) for r in C.top_ngram_share(df).collect()}
    assert shares[3] == (5, 0.6)
    assert shares[2][0] == 0  # empty doc still emits a row
    # decontamination: doc 3 shares its 2-grams with the 'benchmark' doc 4
    bench = spark.createDataFrame([(4, "xxx one two yyy")], ["doc_id", "text"])
    clean = C.decontaminate(df, bench, n=2)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert_broadcast_join(clean)


def test_rolling_fingerprint_portable_java_parity(spark):
    from hive_2_3_2_spark.llm import text as T

    # k=1 shingles over single words isolate the 31-fold: values must
    # equal Java String.hashCode ('abc'=96354, 'a'=97, ''=0).
    df = spark.createDataFrame(
        [(1, "abc"), (2, "a"), (3, ""), (4, "abc abc")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.rfp
        for r in df.select(
            "doc_id",
            T.rolling_shingle_fingerprint_portable(F.col("text"), k=1).alias(
                "rfp"
            ),
        ).collect()
    }
    assert got == {1: 96354, 2: 97, 3: 0, 4: 2 * 96354}
    # engine-hash twin: deterministic across invocations
    a = df.select(T.rolling_shingle_fingerprint(F.col("text")).alias("v")).collect()
    b = df.select(T.rolling_shingle_fingerprint(F.col("text")).alias("v")).collect()
    assert a == b


def test_embedding_quantize_roundtrip_and_jl_projection(spark, sf_dir):
    from hive_2_3_2_spark.llm import embeddings as E

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    v = F.col("embedding").cast("array<double>")
    q = E.quantize_int8(v)
    rt = emb.select(
        v.alias("v"),
        q.getField("scale").alias("scale"),
        E.dequantize_int8(q).alias("back"),
    ).select(
        # max reconstruction error must be <= scale/2 (+ float eps)
        F.max(
            F.aggregate(
                F.zip_with(
                    F.col("v"), F.col("back"), lambda a, b: F.abs(a - b)
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
            - F.col("scale") * 0.5
        ).alias("worst")
    ).collect()[0]
    assert rt.worst <= 1e-9

    # JL: projected pairwise distances correlate with original distances
    import numpy as np

    # (near-isotropic vectors have concentrated distances, so use a
    # 32-dim projection for the rank-correlation check and an aggregate
    # norm-ratio band for the 8-dim one)
    M32 = E.gaussian_projection_matrix(64, 32, seed=7)
    rows = emb.select("vec_id", v.alias("v"),
                      E.random_projection(v, M32).alias("p")).collect()
    V = np.array([r.v for r in rows])
    P = np.array([r.p for r in rows])
    dv = np.linalg.norm(V[:, None] - V[None, :], axis=2).ravel()
    dp = np.linalg.norm(P[:, None] - P[None, :], axis=2).ravel()
    mask = dv > 0
    corr = np.corrcoef(dv[mask], dp[mask])[0, 1]
    # isotropic-random distances concentrate (spread ~1/sqrt(64)), so JL
    # noise at out_dim=32 caps attainable correlation — assert structure
    # survives, not perfect rank preservation
    assert corr > 0.2, f"JL projection lost distance structure: {corr}"
    M8 = E.gaussian_projection_matrix(64, 8, seed=7)
    p8 = np.array(
        [r.p for r in emb.select(E.random_projection(v, M8).alias("p")).collect()]
    )
    ratio = np.linalg.norm(p8, axis=1).mean() / np.linalg.norm(V, axis=1).mean()
    assert 0.5 < ratio < 2.0, f"JL norm scale off: {ratio}"


def test_bloom_filter_exact_and_prefilter_selectivity(spark, sf_dir):
    """Bloom contract: zero false negatives always; false-positive rate
    near theory at the default sizing; decontaminate_bloom produces the
    exact same clean set as the plain join path while sending far fewer
    grams into the join."""
    from hive_2_3_2_spark.llm import cleaning as C

    vals = spark.range(0, 2_000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    bloom = C.build_bloom_filter(vals, "v")
    # 4 bytes per 32-bit word -> m/8 bytes total
    assert len(bloom["blob"]) == (1 << 20) // 8
    # no false negatives: every inserted value probes positive
    neg = vals.filter(~C.bloom_might_contain(bloom, F.col("v"))).count()
    assert neg == 0
    # false positives: m=2^20, k=5, n=2000 -> theoretical fp ~ 1e-11;
    # allow a generous slack but it must be essentially zero
    others = spark.range(0, 20_000).select(
        F.concat(F.lit("stranger-"), F.col("id")).alias("v")
    )
    fp = others.filter(C.bloom_might_contain(bloom, F.col("v"))).count()
    assert fp <= 2, fp

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plain = {r.doc_id for r in C.decontaminate(docs, bench, n=8).select("doc_id").collect()}
    bloomed = {r.doc_id for r in C.decontaminate_bloom(docs, bench, n=8).select("doc_id").collect()}
    assert plain == bloomed


def test_domain_cap_canonicalization_and_quota(spark):
    from hive_2_3_2_spark.llm import sampling as S

    df = spark.createDataFrame(
        [(i, f"HTTPS://WWW.Heavy.COM:443/p/{i}?q=1") for i in range(25)]
        + [(100, "http://light.org/a"), (101, "light.org/b#frag"),
           (102, "ftp://www.light.org")],
        ["doc_id", "url"],
    )
    capped = S.domain_cap(df, k=10)
    hosts = {r.host for r in capped.select("host").distinct().collect()}
    assert hosts == {"heavy.com", "light.org"}
    counts = {r.host: r.n for r in capped.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"heavy.com": 10, "light.org": 3}
    # deterministic: same survivor set on a second evaluation
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in S.domain_cap(df, k=10).collect())
    assert a == b


def test_shuffle_and_shard_contiguity_and_stability(spark):
    """Shards are contiguous segments of ONE global permutation, the
    permutation is seed-keyed, and growing the corpus never reorders
    surviving pairs within a shard."""
    from hive_2_3_2_spark.llm import sampling as S

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = S.shuffle_and_shard(df, n_shards=8, seed=7)
    rows = out.select("doc_id", "shuffle_key", "shard").collect()
    assert {r.shard for r in rows} == set(range(8))
    # contiguity: concatenating shards 0..7 (each key-sorted) == global key sort
    by_shard = sorted(rows, key=lambda r: (r.shard, r.shuffle_key, r.doc_id))
    global_order = sorted(rows, key=lambda r: (r.shuffle_key, r.doc_id))
    assert [r.doc_id for r in by_shard] == [r.doc_id for r in global_order]
    # different seed -> different permutation
    other = S.shuffle_and_shard(df, n_shards=8, seed=8).select("doc_id", "shuffle_key").collect()
    assert [r.doc_id for r in sorted(other, key=lambda r: r.shuffle_key)] != \
           [r.doc_id for r in global_order]
    # growth stability: common docs keep relative order within each shard
    grown = S.shuffle_and_shard(
        spark.range(0, 700).withColumnRenamed("id", "doc_id"), n_shards=8, seed=7
    ).collect()
    for s in range(8):
        small = [r.doc_id for r in by_shard if r.shard == s]
        big = [r.doc_id for r in sorted(grown, key=lambda r: (r.shuffle_key, r.doc_id))
               if r.shard == s and r.doc_id < 500]
        assert small == big, s


def test_incremental_dedup_store_roundtrip(spark, tmp_path):
    """Store build → batch probe → survivors → append → second batch
    sees first batch's survivors as history."""
    from hive_2_3_2_spark.llm import dedup as D

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    hist = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark query engines and joins")],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "store")
    D.write_signature_store(hist, store)
    # batch: 10 dups hist doc 1; 11 is novel; 12 dups 11 (batch-internal)
    novel = "unrelated fresh content mentioning alpacas llamas and guanacos in the andes mountains"
    batch = spark.createDataFrame(
        [(10, base + " extra"), (11, novel), (12, novel + " indeed")],
        ["doc_id", "text"],
    )
    matches = D.incremental_near_dups(spark, batch, store, threshold=0.5)
    got = {(r.new_id, r.match_id, r.match_side) for r in matches.collect()}
    assert (10, 1, "store") in got
    assert (12, 11, "batch") in got
    assert not any(n == 11 for n, _, _ in got)
    survivors = D.incremental_dedup(spark, batch, store, threshold=0.5, update_store=True)
    assert {r.doc_id for r in survivors.collect()} == {11}
    # after append, a re-run of doc 11's twin matches the store
    batch2 = spark.createDataFrame([(20, novel + " again")], ["doc_id", "text"])
    m2 = {(r.new_id, r.match_id, r.match_side) for r in D.incremental_near_dups(spark, batch2, store, threshold=0.5).collect()}
    assert (20, 11, "store") in m2


def test_remove_repeated_segments_semantics(spark):
    from hive_2_3_2_spark.llm.cleaning import remove_repeated_segments

    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"unique alpha content\n\n{boiler}\n\nunique beta content"),
            (2, f"{boiler}\n\ntotally different words here"),
            (3, boiler),  # all-boilerplate doc must survive, emptied
            (4, "no boilerplate at all in this one"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_repeated_segments(df, min_repeat=2).collect()
    }
    assert out[1].text_clean == "unique alpha content\n\nunique beta content"
    assert (out[1].n_segments, out[1].n_dropped) == (3, 1)
    assert out[2].text_clean == "totally different words here"
    assert out[3].text_clean == "" and out[3].n_dropped == 1
    assert out[4].text_clean == df.collect()[0].text or out[4].n_dropped == 0
    # normalization: case/punct variants of the boilerplate also drop
    df2 = spark.createDataFrame(
        [(1, "keep me\n\nSubscribe, to our NEWSLETTER!"), (2, boiler)],
        ["doc_id", "text"],
    )
    out2 = {
        r.doc_id: r.text_clean
        for r in remove_repeated_segments(df2, min_repeat=2).collect()
    }
    assert out2 == {1: "keep me", 2: ""}


def test_length_bucket_batches_invariants(spark, sf_dir):
    from hive_2_3_2_spark.llm.chunking import length_bucket_batches

    docs = load_table(spark, sf_dir, "documents")
    batches = length_bucket_batches(docs, batch_size=8, shards=8).collect()
    assert len(batches) > 0
    total_docs = docs.count()
    assert sum(b.n_docs for b in batches) == total_docs
    for b in batches:
        assert 1 <= b.n_docs <= 8
        # bucket = bit-length of token count: max token count < 2^bucket
        assert (1 << (b.bucket - 1)) <= b.max_tokens < (1 << b.bucket)
        assert 0.0 <= b.padding_frac < 1.0
        assert b.sum_tokens <= b.max_tokens * b.n_docs


def test_char_bigram_lm_edge_cases_and_ranking(spark):
    from hive_2_3_2_spark.llm import lm

    rows = [
        (1, "the cat and the dog sat in the sun", "en"),
        (2, "this is the kind of text the model was trained on", "en"),
        (3, "zzq xqz qqz zxq jjx", "und"),
        (4, "a", "en"),          # 1 normalized char -> no bigrams
        (5, "7 !!", "en"),       # normalizes to empty -> no bigrams
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    model = lm.train_char_bigram_lm(docs.filter(F.col("lang") == "en"))
    scored = {r.id: r for r in lm.score_char_bigram_lm(docs, model).collect()}
    # short/empty docs are absent, not null-scored
    assert set(scored) == {1, 2, 3}
    # gibberish (unseen bigrams, backoff smoothing) scores below English
    assert scored[3].avg_logp < scored[1].avg_logp
    assert scored[3].avg_logp < scored[2].avg_logp
    # n_bigrams = normalized length - 1
    assert scored[1].n_bigrams == 33


def test_bpe_learn_matches_reference_merges(spark):
    from hive_2_3_2_spark.llm import lm

    # Sennrich et al. toy vocabulary; merge order verified against a
    # pure-Python greedy-left BPE with the same weight-desc / pair-asc
    # tie-break.
    toy = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        ["word", "freq"],
    )
    merges, final = lm.bpe_learn(toy, 8, min_weight=2)
    assert merges == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
        ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est"),
    ]
    syms = {r.word: r.syms for r in final.collect()}
    assert syms == {
        "low": "low", "lower": "low e r",
        "newest": "newest", "widest": "w i dest",
    }
    # overlapping-run merge is greedy-left: 'a a a a a' -> 'aa aa a'
    runs = spark.createDataFrame([("aaaaa", 9)], ["word", "freq"])
    m2, f2 = lm.bpe_learn(runs, 1, min_weight=1)
    assert m2 == [("a", "a")]
    assert f2.collect()[0].syms == "aa aa a"


def test_semantic_dedup_policy_matches_bruteforce(spark):
    import numpy as np

    from hive_2_3_2_spark.llm.dedup import semantic_dedup
    from hive_2_3_2_spark.llm.similarity import hyperplanes

    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, 8))
    # rows 10..15 random; 16/17 near-dups of 10; 18 near-dup of 11
    vecs = {10 + i: base[i] for i in range(6)}
    vecs[16] = vecs[10] + 0.01 * rng.standard_normal(8)
    vecs[17] = vecs[10] + 0.01 * rng.standard_normal(8)
    vecs[18] = vecs[11] + 0.01 * rng.standard_normal(8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.id: (r.bucket, r.kept)
        for r in semantic_dedup(
            df, n_planes=3, dim=8, threshold=0.95, seed=7
        ).collect()
    }
    # replay the exact policy in numpy: same planes, same keep-first rule
    planes = np.asarray(hyperplanes(dim=8, n_planes=3, seed=7))
    ids = sorted(vecs)
    bucket = {
        i: int(sum((1 << j) * (float(planes[j] @ vecs[i]) > 0) for j in range(3)))
        for i in ids
    }
    def cos(a, b):
        return round(
            float(vecs[a] @ vecs[b])
            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])),
            6,
        )
    expect = {
        i: (
            bucket[i],
            not any(
                bucket[j] == bucket[i] and cos(i, j) >= 0.95
                for j in ids
                if j < i
            ),
        )
        for i in ids
    }
    assert out == expect
    # sanity: the near-dup construction actually dropped something
    assert not all(kept for _, kept in out.values())


def test_weighted_sample_prefix_and_seed_properties(spark, sf_dir):
    from hive_2_3_2_spark.llm.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    k10 = [r.doc_id for r in weighted_sample(docs, 10, "n_chars").collect()]
    k20 = [r.doc_id for r in weighted_sample(docs, 20, "n_chars").collect()]
    # growing k extends the same permutation prefix
    assert k20[:10] == k10
    # a different seed is a different draw
    other = [r.doc_id for r in weighted_sample(docs, 10, "n_chars", seed="ws2").collect()]
    assert other != k10
    # zero/negative weights are excluded
    from pyspark.sql import functions as F
    z = weighted_sample(docs.withColumn("w0", F.lit(0)), 5, "w0").count()
    assert z == 0


def test_pq_codebooks_deterministic_and_encode_shape(spark, sf_dir):
    """PQ training must be reproducible (bounded ordered sample + fixed
    Lloyd init — no RNG), codes must be valid indices, and ADC top-k must
    clear the pinned recall floors vs brute force."""
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = S.train_pq_codebooks(emb, m=8, n_codes=256, n_iter=3)
    b2 = S.train_pq_codebooks(emb, m=8, n_codes=256, n_iter=3)
    assert b1 == b2
    assert len(b1) == 8 and len(b1[0][0]) == 8  # 64 dims / 8 blocks
    codes = S.pq_encode(emb, b1)
    row = codes.limit(1).collect()[0]
    assert len(row.codes) == 8
    assert all(0 <= c < 256 for c in row.codes)
    queries = emb.filter(F.col("vec_id") < 5)
    pq = S.pq_topk(codes, queries, b1, k=5)
    got = pq.groupBy("query_id").count().collect()
    assert len(got) == 5 and all(r["count"] == 5 for r in got)
    exact = S.brute_force_topk(emb, queries, k=5)
    n_hits = (
        pq.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count()
    )
    assert n_hits >= 10  # corpus recall floor 0.4 (observed 0.52+)


def test_cell_ranks_udf_batched_matches_numpy(spark):
    """The batched (n,dim)@(dim,k) cell-assign UDF must rank cells
    identically to a per-row numpy reference (same stable argsort
    tie-break) — parity guard for the matmul batching."""
    import numpy as np
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.llm.similarity import _cell_ranks_udf

    rng = np.random.default_rng(42)
    C = rng.standard_normal((16, 8)).round(3).tolist()
    vecs = rng.standard_normal((200, 8)).round(3).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    got = {
        r.id: list(r.cells)
        for r in df.select(
            "id", _cell_ranks_udf(C, 4)(F.col("v")).alias("cells")
        ).collect()
    }
    Cn = np.asarray(C)
    c_sq = (Cn * Cn).sum(axis=1)
    for i, v in enumerate(vecs):
        d = c_sq - 2.0 * (Cn @ np.asarray(v))
        want = np.argsort(d, kind="stable")[:4].tolist()
        assert got[i] == want, f"row {i}: {got[i]} != {want}"


def _make_ppm(w, h, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes(), arr


def _make_bmp(w, h, seed=9):
    import struct

    import numpy as np

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][..., ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    data_off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
        + struct.pack("<Iii", 40, w, h)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<IIiiII", 0, len(rows), 2835, 2835, 0, 0)
    )
    return header + rows, arr


def test_multimodal_real_ppm_bmp_decode(spark):
    """PPM (P6) and 24-bit BMP payloads decode for REAL (pure numpy):
    extract_features returns exact dimensions and the exact pixel mean,
    not the deterministic-fake pseudo-dims."""
    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M

    ppm, ppm_arr = _make_ppm(6, 4)
    bmp, bmp_arr = _make_bmp(5, 3)
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp))],
        "media_id long, payload binary",
    )
    media = M.attach_media(df, "payload", "media_id", "image/x-test")
    feats = {
        r.media_id: r
        for r in M.extract_features(media).collect()
    }
    assert feats[1].feat_head == "6x4"
    assert feats[1].feat_mean == int(ppm_arr.mean())
    assert feats[2].feat_head == "5x3"
    assert feats[2].feat_mean == int(bmp_arr.mean())


def test_multimodal_real_resize_nearest_neighbor(spark):
    """resize_media on a decodable payload is a REAL nearest-neighbor
    resample: output re-encodes as P6 with exactly the pixels
    arr[(y*h)//side][(x*w)//side]."""
    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M
    from hive_2_3_2_spark.llm.multimodal import decode_ppm

    ppm, arr = _make_ppm(16, 10)
    df = spark.createDataFrame(
        [(1, bytearray(ppm))], "media_id long, payload binary"
    )
    media = M.attach_media(df, "payload", "media_id", "image/x-test")
    out = M.resize_media(media, target_bytes=64).collect()[0]
    assert out.meta.width == 8 and out.meta.height == 8
    got = decode_ppm(bytes(out.payload))
    ys = (np.arange(8) * 10) // 8
    xs = (np.arange(8) * 16) // 8
    assert got is not None and (got == arr[ys][:, xs]).all()


def test_multimodal_undecodable_payload_keeps_stub_contract(spark):
    """Arbitrary binary still flows through the fake-decode path with
    the documented pseudo-dimension contract (plumbing exercised even
    without any decodable format)."""
    from hive_2_3_2_spark.llm import multimodal as M

    raw = b"not an image at all, just bytes" * 3
    df = spark.createDataFrame(
        [(1, bytearray(raw))], "media_id long, payload binary"
    )
    media = M.attach_media(df, "payload", "media_id", "application/blob")
    r = M.extract_features(media).collect()[0]
    assert r.feat_head == f"{64 + (len(raw) % 577)}x{64 + ((len(raw) * 31) % 421)}"


def test_decontaminate_embeddings_kept_and_plan(spark, sf_dir):
    """Semantic decontamination: kept = corpus minus every vector with an
    eval-side cosine >= threshold; candidate generation is a broadcast
    bucket join, never a cartesian."""
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm.cleaning import decontaminate_embeddings
    from hive_2_3_2_spark.plans.explain import assert_no_cartesian

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    eval_df = emb.filter(F.col("vec_id") % 20 == 0)
    removed = decontaminate_embeddings(
        corpus, eval_df, threshold=0.4, return_removed=True
    )
    kept = decontaminate_embeddings(corpus, eval_df, threshold=0.4)
    n_corpus, n_removed, n_kept = corpus.count(), removed.count(), kept.count()
    assert n_kept == n_corpus - n_removed
    assert n_removed > 0  # threshold chosen so the pass provably fires
    # removed ids and kept ids partition the corpus
    overlap = kept.join(
        removed.withColumnRenamed("vec_id", "vec_id"), "vec_id"
    ).count()
    assert overlap == 0
    # every removed row really has an eval neighbor at >= threshold
    assert removed.filter(F.col("max_cosine") < 0.4).count() == 0
    assert_no_cartesian(removed)
    assert_no_cartesian(kept)


def test_tokenize_words_greedy_semantics(spark):
    from hive_2_3_2_spark.llm.lm import tokenize_words_greedy

    vocab = ["ab", "abc", "bc", "c", "xyz"]
    words = spark.createDataFrame(
        [("abc",), ("abcbc",), ("zzz",), ("xyzxyz",), ("b",)], ["word"]
    )
    got = {
        r.word: r.toks
        for r in tokenize_words_greedy(words, vocab).collect()
    }
    # longest prefix wins at every position; char fallback for misses
    assert got["abc"] == ["abc"]
    assert got["abcbc"] == ["abc", "bc"]
    assert got["zzz"] == ["z", "z", "z"]  # pure fallback
    assert got["xyzxyz"] == ["xyz", "xyz"]
    assert got["b"] == ["b"]
    # invariant: concatenation reconstructs the word
    assert all("".join(t) == w for w, t in got.items())


def test_vocab_tokenize_counts_doc_level(spark):
    from hive_2_3_2_spark.llm.lm import vocab_tokenize_counts

    docs = spark.createDataFrame(
        [(1, "The cat, the hat!"), (2, "zz")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in vocab_tokenize_counts(docs, ["the", "at", "ca", "ha"]).collect()
    }
    # doc 1: the(1) cat(ca+t → 2) the(1) hat(ha+t → 2) = 4 words, 6 tokens
    assert rows[1] == (4, 6)
    assert rows[2] == (1, 2)  # zz → z z


def test_ivfpq_recall_compression_and_determinism(spark, sf_dir, tmp_path):
    """Composed IVF-PQ (build_ivfpq_index + ivfpq_topk_prebuilt): the
    persisted code table must be m uint8-range codes per vector
    partitioned by cell (the inverted file), the query path must clear
    the pinned recall floors vs brute force while scanning only
    nprobe/n_cells partitions, and the build must be deterministic."""
    import os

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, idx, n_cells=32, m=8, n_codes=256)
    codes = spark.read.parquet(os.path.join(idx, "codes"))
    assert set(codes.columns) == {"neighbor_id", "cell", "codes"}
    assert codes.count() == emb.count()
    row = codes.limit(1).collect()[0]
    assert len(row.codes) == 8 and all(0 <= c < 256 for c in row.codes)
    # cell partition dirs exist (the inverted file = partition layout)
    cells = [d for d in os.listdir(os.path.join(idx, "codes"))
             if d.startswith("cell=")]
    assert len(cells) > 1

    queries = emb.filter(F.col("vec_id") < 5)
    res = S.ivfpq_topk_prebuilt(spark, idx, queries, k=5, nprobe=8)
    rows = res.collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(got) == 5 and all(len(v) == 5 for v in got.values())
    exact = S.brute_force_topk(emb, queries, k=5)
    n_hits = (
        res.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .count()
    )
    assert n_hits >= 10, f"IVF-PQ corpus recall too low: {n_hits}/25"

    # deterministic rebuild → identical metadata
    import json

    idx2 = str(tmp_path / "ivfpq2")
    S.build_ivfpq_index(emb, idx2, n_cells=32, m=8, n_codes=256)
    m1 = json.load(open(os.path.join(idx, "ivfpq.json")))
    m2 = json.load(open(os.path.join(idx2, "ivfpq.json")))
    assert m1 == m2


def test_nb_classifier_separates_and_handles_oov(spark):
    """Binary NB (llm/lm.py train_nb_model/score_nb_model): clearly
    separable handmade corpora classify correctly; an all-OOV doc scores
    exactly the prior bias with n_vocab_words=0; training is
    deterministic."""
    from hive_2_3_2_spark.llm import lm as L

    rows = []
    for i in range(10):
        rows.append((i, "the quick brown fox jumps over lazy dog", True))
    for i in range(10, 18):
        rows.append((i, "der schnelle braune fuchs springt hund", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    weights, bias = L.train_nb_model(df, vocab_size=64)
    import math

    assert abs(bias - math.log(10 / 8)) < 1e-9
    test = spark.createDataFrame(
        [
            (100, "quick brown dog"),
            (101, "schnelle fuchs hund"),
            (102, "zzz qqq 123"),  # all OOV → bias only
            (103, ""),  # empty → bias only
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in L.score_nb_model(test, weights, bias).collect()}
    assert got[100].predicted is True and got[100].log_odds > 0
    assert got[101].predicted is False and got[101].log_odds < 0
    for d in (102, 103):
        assert got[d].n_vocab_words == 0
        assert abs(got[d].log_odds - round(bias, 4)) < 1e-9
    # deterministic retrain
    w2, b2 = L.train_nb_model(df, vocab_size=64)
    assert sorted(map(tuple, weights.collect())) == sorted(map(tuple, w2.collect()))
    assert bias == b2


def test_png_decode_roundtrip_and_filters():
    """decode_png: encoder round-trip, every scanline filter (Sub/Up/
    Average/Paeth hand-applied per the W3C spec then decoded back),
    gray/RGBA color types, and strict rejection of corrupted payloads."""
    import struct
    import zlib

    import numpy as np

    from hive_2_3_2_spark.llm.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def build(raw, w, h, color, channels):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    # hand-apply each filter to the same RGB image, decode, compare
    h, w, bpp = img.shape[0], img.shape[1], 3
    for f in (0, 1, 2, 3, 4):
        lines = []
        prev = np.zeros(w * bpp, dtype=np.int16)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int16)
            filt = np.empty_like(cur)
            for x in range(w * bpp):
                a = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (a + up) >> 1
                else:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else c)
                    )
                filt[x] = (cur[x] - pred) % 256
            lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
            prev = cur
        got = decode_png(build(b"".join(lines), w, h, 2, 3))
        assert got is not None and np.array_equal(got, img), f"filter {f}"

    # gray (color 0) replicates to RGB; RGBA (color 6) drops alpha
    gray = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(4))
    got = decode_png(build(raw, 5, 4, 0, 1))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    got = decode_png(build(raw, 4, 3, 6, 4))
    assert np.array_equal(got, rgba[:, :, :3])

    # strict rejection: bad CRC, truncated, wrong size, garbage
    good = encode_png(img)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # corrupt IEND CRC... corrupt IDAT CRC instead
    bad = bytearray(good)
    bad[40] ^= 0xFF  # inside IDAT payload → CRC mismatch
    assert decode_png(bytes(bad)) is None
    assert decode_png(good[: len(good) // 2]) is None
    assert decode_png(b"\x89PNG\r\n\x1a\nnot a real chunk") is None
    assert decode_png(b"random bytes here") is None


def test_png_flows_through_extract_and_resize(spark):
    """A real PNG payload must flow through extract_features (true
    dimensions + pixel mean) and resize_media (real nearest-neighbor,
    re-encoded P6) — the same Spark plumbing the fakes exercise."""
    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M

    img = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(16, 12, 3)
    payload = M.encode_png(img)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    media = M.attach_media(df, "payload", "media_id", "image/png")
    feat = M.extract_features(media).collect()[0]
    assert feat.feat_head == "12x16"
    assert feat.feat_mean == int(img.mean())
    out = M.resize_media(media, target_bytes=64).collect()[0]
    assert bytes(out.payload).startswith(b"P6\n8 8\n255\n")
    assert out.meta.width == 8 and out.meta.height == 8


def test_wav_decode_and_audio_features(spark):
    """decode_wav: constructed 16-bit stereo + 8-bit mono PCM decode to
    exact samples; extract_audio_features returns true rate/duration/RMS
    through the mapInPandas plumbing; garbage yields NULL features."""
    import struct

    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M

    def wav(rate, bits, samples):  # samples: (n, ch) int
        a = np.asarray(samples)
        n_ch = a.shape[1]
        if bits == 16:
            data = a.astype("<i2").tobytes()
        else:
            data = (a + 128).astype(np.uint8).tobytes()
        fmt = struct.pack(
            "<HHIIHH", 1, n_ch, rate, rate * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        )
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    t = np.arange(8000)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 10000).astype(int)
    stereo = np.stack([sine, -sine], axis=1)
    b16 = wav(8000, 16, stereo)
    rate, s = M.decode_wav(b16)
    assert rate == 8000 and s.shape == (8000, 2)
    assert np.array_equal(s[:, 0], sine)

    mono8 = wav(4000, 8, (sine[:2000] // 100).reshape(-1, 1))
    rate, s = M.decode_wav(mono8)
    assert rate == 4000 and s.shape == (2000, 1)

    assert M.decode_wav(b"RIFFxxxxNOPE") is None
    assert M.decode_wav(b"garbage") is None

    df = spark.createDataFrame(
        [(1, bytearray(b16)), (2, bytearray(mono8)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    media = M.attach_media(df, "payload", "media_id", "audio/wav")
    got = {r.media_id: r for r in M.extract_audio_features(media).collect()}
    assert got[1].sample_rate == 8000 and got[1].n_channels == 2
    assert got[1].duration_ms == 1000
    expected_rms = int(np.sqrt((stereo.astype(np.float64) ** 2).mean()))
    assert got[1].rms == expected_rms
    assert got[2].duration_ms == 500
    assert got[3].sample_rate is None and got[3].rms is None


def _encode_gif(w, h, palette, indexes, interlace=False):
    """Minimal conformant GIF89a encoder for tests: constant-width LZW
    stream emitting CLEAR before every literal code (valid per spec —
    the decoder dictionary never grows past the initial width)."""
    import struct

    min_code = max(2, (len(palette) - 1).bit_length())
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    codes = []
    for px in indexes:
        codes += [clear, px]
    codes.append(end)
    acc = bits = 0
    data = bytearray()
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)
    # pad palette to a power of two
    n = 1 << max(1, (len(palette) - 1).bit_length())
    pal = list(palette) + [(0, 0, 0)] * (n - len(palette))
    gct_bits = n.bit_length() - 2  # 2<<k entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | gct_bits, 0, 0)
    for r, g, bl in pal:
        out += bytes([r, g, bl])
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code)
    i = 0
    while i < len(data):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
        i += 255
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_lzw_and_interlace():
    """decode_gif: LZW stream decodes to exact palette-mapped pixels,
    interlaced row order restored, garbage strictly rejected."""
    import numpy as np

    from hive_2_3_2_spark.llm.multimodal import decode_gif

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, 9 * 7)
    expected = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(
        9, 7, 3
    )
    got = decode_gif(_encode_gif(7, 9, palette, list(idx)))
    assert got is not None and np.array_equal(got, expected)

    # interlace: encoder writes rows in 4-pass order; decoder restores
    order = (
        list(range(0, 9, 8)) + list(range(4, 9, 8))
        + list(range(2, 9, 4)) + list(range(1, 9, 2))
    )
    scrambled = expected[order].reshape(-1, 3)
    pix = [palette.index(tuple(p)) for p in scrambled]
    got = decode_gif(_encode_gif(7, 9, palette, pix, interlace=True))
    assert got is not None and np.array_equal(got, expected)

    assert decode_gif(b"GIF89a" + b"\x00" * 7) is None
    assert decode_gif(b"not a gif") is None
    # truncated LZW data → reject
    full = _encode_gif(7, 9, palette, list(idx))
    assert decode_gif(full[: len(full) - 10]) is None


def test_gif_flows_through_extract_features(spark):
    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M
    from tests.test_llm import _encode_gif

    palette = [(10, 20, 30), (200, 100, 50)]
    idx = [0, 1] * 32
    payload = _encode_gif(8, 8, palette, idx)
    expected = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(
        8, 8, 3
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    media = M.attach_media(df, "payload", "media_id", "image/gif")
    feat = M.extract_features(media).collect()[0]
    assert feat.feat_head == "8x8"
    assert feat.feat_mean == int(expected.mean())


def test_gif_decode_full_lzw_compressor_roundtrip():
    """A REAL GIF LZW compressor (growing dictionary, variable code
    width, 4095-entry reset) round-trips through decode_gif — exercises
    the dictionary-growth, width-increase, and self-referential-code
    (code == len(table)) decoder paths the trivial encoder skips."""
    import struct

    import numpy as np

    from hive_2_3_2_spark.llm.multimodal import decode_gif

    def compress(min_code, pixels):
        clear, end = 1 << min_code, (1 << min_code) + 1
        out_codes = []

        def reset():
            return {(c,): c for c in range(clear)}, end + 1, min_code + 1

        table, next_code, width = reset()
        out_codes.append((clear, width))
        buf = ()
        for px in pixels:
            cand = buf + (px,)
            if cand in table:
                buf = cand
                continue
            out_codes.append((table[buf], width))
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            if next_code >= 4096:
                out_codes.append((clear, width))
                table, next_code, width = reset()
            buf = (px,)
        if buf:
            out_codes.append((table[buf], width))
        out_codes.append((end, width))
        acc = bits = 0
        data = bytearray()
        for c, w in out_codes:
            acc |= c << bits
            bits += w
            while bits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
        if bits:
            data.append(acc & 0xFF)
        return bytes(data)

    rng = np.random.default_rng(11)
    w, h = 40, 30
    # runs of repeats → the compressor builds multi-symbol entries,
    # triggering the decoder's code==len(table) case
    idx = np.repeat(rng.integers(0, 4, (w * h) // 5 + 1), 5)[: w * h]
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    data = compress(2, list(idx))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x81, 0, 0)
    for r, g, bl in palette:
        out += bytes([r, g, bl])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(2)
    i = 0
    while i < len(data):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
        i += 255
    out += b"\x00\x3b"
    got = decode_gif(bytes(out))
    expected = np.array(
        [palette[i] for i in idx], dtype=np.uint8
    ).reshape(h, w, 3)
    assert got is not None and np.array_equal(got, expected)


def test_y4m_decode_and_frame_sampling(spark):
    """decode_y4m parses real YUV4MPEG2 streams (420 and mono chroma)
    with exact luma planes; sample_video_frames emits every-nth frame's
    true mean luma through mapInPandas; garbage contributes nothing."""
    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M

    rng = np.random.default_rng(5)
    w, h, n_frames = 6, 4, 5
    lumas = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n_frames)]
    chroma = np.zeros((h // 2) * (w // 2), dtype=np.uint8) + 128
    stream = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
    for y in lumas:
        stream += b"FRAME\n" + y.tobytes() + chroma.tobytes() + chroma.tobytes()
    got = M.decode_y4m(bytes(stream))
    assert got is not None
    gw, gh, frames = got
    assert (gw, gh, len(frames)) == (w, h, n_frames)
    for a, b in zip(frames, lumas):
        assert np.array_equal(a, b)

    mono = bytearray(f"YUV4MPEG2 W{w} H{h} Cmono\n".encode())
    mono += b"FRAME\n" + lumas[0].tobytes()
    assert M.decode_y4m(bytes(mono))[2][0].mean() == lumas[0].mean()

    assert M.decode_y4m(b"YUV4MPEG2 W0 H4\nFRAME\n") is None
    assert M.decode_y4m(b"not video") is None
    assert M.decode_y4m(bytes(stream[:-3])) is None  # truncated frame

    df = spark.createDataFrame(
        [(1, bytearray(bytes(stream))), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    media = M.attach_media(df, "payload", "media_id", "video/x-y4m")
    rows = M.sample_video_frames(media, every_n=2).collect()
    by_frame = {r.frame_no: r for r in rows}
    assert sorted(by_frame) == [0, 2, 4]  # every 2nd of 5 frames
    for fno in (0, 2, 4):
        assert by_frame[fno].mean_luma == int(lumas[fno].mean())
        assert (by_frame[fno].width, by_frame[fno].height) == (w, h)


def test_sniff_mime_routes_every_real_format(spark):
    """sniff_mime: one JVM expression classifies every format this
    module really decodes (plus JPEG magic), from the payload bytes
    alone — and the plan stays in whole-stage codegen (no Python)."""
    import numpy as np

    from hive_2_3_2_spark.llm import multimodal as M
    from tests.test_llm import _encode_gif

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payloads = {
        "image/png": M.encode_png(img),
        "image/gif": _encode_gif(2, 2, [(0, 0, 0), (1, 1, 1)], [0, 1, 0, 1]),
        "image/bmp": b"BM" + b"\x00" * 60,
        "image/x-portable-pixmap": b"P6\n2 2\n255\n" + b"\x00" * 12,
        "image/jpeg": b"\xff\xd8\xff\xe0junk",
        "audio/wav": b"RIFF\x04\x00\x00\x00WAVEjunk",
        "video/x-y4m": b"YUV4MPEG2 W2 H2\nFRAME\n" + b"\x00" * 6,
        "application/octet-stream": b"who knows",
    }
    df = spark.createDataFrame(
        [(m, bytearray(p)) for m, p in payloads.items()],
        "expected string, payload binary",
    )
    got = df.select(
        "expected", M.sniff_mime(df.payload).alias("mime")
    ).collect()
    for r in got:
        assert r.mime == r.expected, (r.expected, r.mime)
    from hive_2_3_2_spark.plans import explain_str

    # JVM-only routing: no Python evaluation operator in the plan (the
    # local createDataFrame source mentions "applySchemaToPythonRDD" —
    # that's the fixture, not the expression)
    plan = explain_str(df.select(M.sniff_mime(df.payload)))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, plan


def test_decontaminate_exact_vs_lsh_parity(spark, sf_dir):
    """The r6 exact matmul path and the LSH path must agree row-for-row
    on the contamination report (the LSH config reaches full recall at
    this threshold on this data; exact is exact by construction)."""
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm.cleaning import decontaminate_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    eval_df = emb.filter(F.col("vec_id") % 20 == 0)
    a = {
        (r.vec_id, r.n_eval_hits, r.max_cosine)
        for r in decontaminate_embeddings(
            corpus, eval_df, threshold=0.4, return_removed=True,
            method="exact",
        ).collect()
    }
    b = {
        (r.vec_id, r.n_eval_hits, r.max_cosine)
        for r in decontaminate_embeddings(
            corpus, eval_df, threshold=0.4, return_removed=True,
            method="lsh",
        ).collect()
    }
    assert a == b and len(a) > 0


def test_embedding_near_dups_sign_bits_blocking(spark, sf_dir):
    """n_sign_bits=k blocks on the sign pattern of the first k
    components: every reported pair agrees on those signs, and the
    3-bit pair set is exactly the 1-bit pair set filtered to matching
    bit-2/bit-3 signs (blocking only ever narrows)."""
    from pyspark.sql import functions as F

    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm.dedup import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    signs = {
        r.vec_id: tuple(int(x > 0) for x in r.embedding[:3])
        for r in emb.select("vec_id", "embedding").collect()
    }
    p1 = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_near_dups(
            emb, threshold=0.4, n_sign_bits=1
        ).collect()
    }
    p3 = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_near_dups(
            emb, threshold=0.4, n_sign_bits=3
        ).collect()
    }
    assert p3 == {
        (a, b) for a, b in p1 if signs[a] == signs[b]
    }
    assert len(p3) > 0


def test_embedding_near_dups_adaptive_default_bits(spark, sf_dir):
    """r6 VERDICT #5: with n_sign_bits unset the blocking is derived
    from a corpus count (k ~ log2(n/2048), clamped to [1,16]) so the
    measured 84x-at-10x-rows quadratic can't be hit silently. Pins the
    adaptive choice at several corpus sizes and checks the default
    path equals the explicitly-pinned equivalent."""
    from hive_2_3_2_spark.catalog import load_table
    from hive_2_3_2_spark.llm.dedup import (
        _adaptive_sign_bits,
        embedding_near_dups,
    )

    # pure-function pins: small corpora stay at 1 bit; each further
    # doubling past the 2048-row block target adds a bit; 100 TB-ish
    # row counts saturate at the 16-bit clamp (65536 blocks)
    assert _adaptive_sign_bits(1) == 1
    assert _adaptive_sign_bits(2048) == 1
    assert _adaptive_sign_bits(4096) == 1
    assert _adaptive_sign_bits(4097) == 2
    assert _adaptive_sign_bits(2048 * 1024) == 10
    assert _adaptive_sign_bits(10**12) == 16

    emb = load_table(spark, sf_dir, "embeddings")
    k = _adaptive_sign_bits(emb.count())
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_near_dups(emb, threshold=0.4).collect()
    }
    want = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_near_dups(
            emb, threshold=0.4, n_sign_bits=k
        ).collect()
    }
    assert got == want


def test_embedding_near_dups_adaptive_short_and_null_vectors(spark):
    """r7 ADVICE: the adaptive default must not index past the vector
    length (element_at beyond the end is NULL → NULL block key → the
    row vanishes from every candidate pair) and must not let a NULL
    component zero a row's recall. k is clamped to the SHORTEST vector
    in the corpus and each sign bit is null-coalesced to 0 — the
    explicit-k path keeps raw bits (declared, oracle-mirrored
    semantics)."""
    from hive_2_3_2_spark.llm.dedup import (
        _adaptive_sign_bits,
        embedding_near_dups,
    )

    # dim clamp pins: a trillion 2-d vectors still get only 2 bits
    assert _adaptive_sign_bits(10**12, dim=2) == 2
    assert _adaptive_sign_bits(10**12, dim=64) == 16
    assert _adaptive_sign_bits(10**12, dim=None) == 16
    assert _adaptive_sign_bits(4097, dim=2) == 2
    assert _adaptive_sign_bits(1, dim=2) == 1

    # e2e: a 2-d corpus big enough (relative to a shrunken block
    # target) that the UNCLAMPED adaptive k would be 4 — element_at 3
    # and 4 past the end → NULL block key → every row dropped from
    # every pair (zero recall). The clamp caps k at 2 and the near-dup
    # twins keep pairing. A NULL-component row rides along to pin that
    # it neither crashes the job nor poisons other rows' blocks.
    import hive_2_3_2_spark.llm.dedup as dedup_mod

    rows = [(i, [float((i % 7) - 3) + 0.1, float((i % 5) - 2) + 0.1])
            for i in range(100)]
    rows += [(100, [1.0, 1.0]), (101, [1.0, 1.0001]),
             (102, [None, 2.0])]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(dedup_mod, "_ADAPTIVE_BLOCK_TARGET", 8)
        assert dedup_mod._adaptive_sign_bits(103, dim=None) == 4
        got = {
            (r.vec_id_a, r.vec_id_b)
            for r in embedding_near_dups(df, threshold=0.9999).collect()
        }
    finally:
        mp.undo()
    assert (100, 101) in got
