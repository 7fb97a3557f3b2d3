"""Parity pins for the r12 optimization round's SQL-text expression twins.

The round rewrote hot construction paths (dedup's shingle/minhash/band
pipeline) from py4j Column building to SQL text that parses JVM-side in
one call.  These tests pin that each SQL twin evaluates to exactly the
same values as the Column builder it replaces, over the real documents
fixture, so a future edit to either side cannot silently diverge them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.functions.gaps import ngram_windows
from hive_2_3_2_spark.llm import dedup as D


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _assert_same_rows(a, b):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_word_shingles_sql_twin(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    col = docs.select("doc_id", D.word_shingles(F.col("text")).alias("sh"))
    sql = docs.selectExpr("doc_id", D._word_shingles_sql("text") + " AS sh")
    _assert_same_rows(col, sql)


def test_hashes_of_shingles_sql_twin(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    col = docs.select(
        "doc_id", D.shingle_hashes(F.col("text")).alias("hh")
    )
    sql = docs.selectExpr(
        "doc_id",
        D._hashes_of_shingles_sql(D._word_shingles_sql("text")) + " AS hh",
    )
    _assert_same_rows(col, sql)


def test_ngram_windows_sql_twin(spark, sf_dir):
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id", "split(lower(text), ' ') AS toks"
    )
    for n in (2, 3):
        for partial_tail in (False, True):
            col = docs.select(
                "doc_id",
                ngram_windows(
                    F.col("toks"), n, partial_tail=partial_tail
                ).alias("g"),
            )
            sql = docs.selectExpr(
                "doc_id",
                D._ngram_windows_sql("toks", n, partial_tail=partial_tail)
                + " AS g",
            )
            _assert_same_rows(col, sql)


def test_banded_inline_sql_twin(spark, sf_dir):
    """The inline(named_struct...) band projection yields the same
    (id, band, bh) rows as the original posexplode-of-structs build."""
    num_perm, bands = 32, 8
    rows = num_perm // bands
    docs = _docs(spark, sf_dir)
    sig = docs.select(
        F.col("doc_id").alias("id"),
        D.minhash_signature(F.col("text"), num_perm).alias("sig"),
    )
    old = sig.select(
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
    new = sig.selectExpr("id", D._banded_inline_sql(num_perm, bands))
    _assert_same_rows(old, new)


def test_minhash_mins_sql_matches_arrow_fold(spark, sf_dir):
    """The JVM-expression MinHash fold (pmod unsigned-mod emulation,
    2^64 % P == 8 correction for wrapped-negative products) is
    bit-identical to the numpy uint64 Arrow fold it replaced on the
    query path (r12)."""
    docs = _docs(spark, sf_dir)
    base = docs.selectExpr(
        "doc_id AS id",
        D._hashes_of_shingles_sql(D._word_shingles_sql("text", 3)) + " AS hh",
    )
    arrow = base.select("id", D._minhash_fold_udf(32)(F.col("hh")).alias("sig"))
    jvm = base.selectExpr("id", D._minhash_mins_sql(32) + " AS sig")
    _assert_same_rows(arrow, jvm)


def test_cosine_sql_twin(spark, sf_dir):
    from hive_2_3_2_spark.llm import similarity as S

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "cast(embedding as array<double>) AS v"
    )
    pairs = emb.alias("a").join(
        emb.alias("b"), F.expr("a.vec_id < b.vec_id AND b.vec_id < 20")
    )
    col = pairs.select(
        F.round(S.cosine(F.col("a.v"), F.col("b.v")), 6).alias("c")
    )
    sql = pairs.selectExpr(f"round({S._cosine_sql('a.v', 'b.v')}, 6) AS c")
    _assert_same_rows(col, sql)


def test_recall_booleans_window_matches_crossjoin(spark, sf_dir):
    """_recall_booleans' corpus total as sum(hits) OVER () (one pass over
    per_query) == the agg + broadcast-crossJoin form it replaced (which
    planned the approx/exact subtree twice) — same rows, same types."""
    from hive_2_3_2_spark.llm import similarity as S
    from hive_2_3_2_spark.suite.llm_similarity import _recall_booleans

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = S.lsh_topk(emb, queries, k=5, n_planes=5, n_tables=20)
    exact = S.brute_force_topk(emb, queries, k=5)
    floor = 15

    new = _recall_booleans(queries, approx, exact, floor)

    hits = (
        approx.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.expr("count(1) AS hits"))
    )
    per_query = (
        queries.selectExpr("vec_id AS query_id")
        .join(hits, "query_id", "left")
        .selectExpr("query_id", "coalesce(hits, 0) AS hits")
    )
    total = per_query.agg(F.expr("sum(hits) AS total_hits"))
    old = (
        per_query.crossJoin(F.broadcast(total))
        .selectExpr(
            "query_id",
            "hits >= 1 AS recall_ok",
            f"total_hits >= {floor} AS corpus_recall_ok",
        )
        .orderBy("query_id")
    )
    assert new.schema == old.schema
    _assert_same_rows(old, new)


def test_probe_cell_ranks_matches_udf(spark, sf_dir):
    """Driver-side probe ranks (the literal map path) == the Arrow UDF's
    ranks for the real embeddings fixture."""
    from hive_2_3_2_spark.llm import similarity as S

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "cast(embedding as array<double>) AS v"
    )
    centroids = S.kmeans_centroids(
        emb, n_cells=8, n_iter=2, vec_col="v", id_col="vec_id"
    )
    rows = emb.orderBy("vec_id").limit(64).collect()
    udf_rows = (
        emb.filter(F.col("vec_id") < 64)
        .select(
            "vec_id", S._cell_ranks_udf(centroids, 3)(F.col("v")).alias("r")
        )
        .collect()
    )
    udf_map = {r.vec_id: list(r.r) for r in udf_rows}
    driver = S._probe_cell_ranks([r.v for r in rows], centroids, 3)
    for r, d in zip(rows, driver):
        assert udf_map[r.vec_id] == d
