"""Corpus language modeling: char-bigram LM quality scoring and BPE
vocabulary induction.

Two training-data-pipeline stages the reference engine has no analogue
for, expressed Spark-first:

- **Char-bigram LM scoring** (the CCNet/KenLM "perplexity filter" step,
  shrunk to a character bigram model so it is exactly reproducible in
  SQL): train add-one-smoothed conditional bigram log-probs from a
  reference slice of the corpus (one explode + groupBy — a single
  shuffle over (bigram) keys, model ≤ 27² rows), then score every
  document by mean log-prob under that model (explode + per-doc partial
  aggregation + two *broadcast* joins against the tiny model). At 100 TB
  the scoring pass is parquet-scan-bound: the explode is map-side, the
  (doc_id, bigram) aggregation has map-side combine (≤729 distinct
  bigrams per doc), and the model never shuffles.

- **BPE vocabulary induction** (byte-pair-encoding merge learning over
  the corpus word-frequency table): the classic Sennrich et al. loop —
  count adjacent symbol pairs weighted by word frequency, merge the
  most frequent pair, repeat. Distributed shape: the corpus is collapsed
  ONCE to a (word, freq) table (the only corpus-sized shuffle); every
  merge iteration then runs on that table (distinct words ≪ corpus
  size — ~10⁷–10⁸ rows at 100 TB, one small groupBy job per merge), and
  only the single best pair ever reaches the driver. Lineage is
  truncated with localCheckpoint every few merges so the plan does not
  grow with the merge count.

All arithmetic is integer counts until the final ln(), so results are
engine-portable (DuckDB oracles replay them exactly; float sums are
rounded to 4dp per the suite convention).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Model alphabet after normalization: a-z plus the word separator space.
ALPHABET_SIZE = 27


def normalize_chars(text: Column) -> Column:
    """Lowercase and collapse every non-letter run to a single space —
    the 27-symbol alphabet (a-z + space) the bigram model is over."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z]+", " "))


def doc_char_bigrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bg, tf): per-document character-bigram term frequencies over
    the normalized text. Documents with fewer than 2 normalized chars
    yield no rows. Pure JVM (codegen): substring enumeration via a
    guarded sequence — Spark's sequence(1, 0) is the *descending* [1, 0],
    not [], so short docs need the explicit empty-array branch.

    Shape note: the position array is exploded BEFORE the substring is
    taken, with the normalized string materialized by the projection
    under the Generate. Taking bigrams inside a ``transform`` lambda
    instead would re-evaluate the regexp normalization once per element
    (Catalyst inlines the captured expression into the lambda) — O(len²)
    regex work per document, measured 18s → 3s for this table at sf0.1."""
    norm = df.select(
        F.col(id_col).alias("id"), normalize_chars(F.col(text_col)).alias("s")
    )
    n = F.length(F.col("s"))
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        norm.select("id", "s", F.explode(idx).alias("i"))
        .select("id", F.col("s").substr(F.col("i"), F.lit(2)).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def train_char_bigram_lm(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Train the conditional char-bigram model: returns
    (bigram_counts[bg, c], prefix_counts[p, ctot]). Smoothed log-prob of
    bigram xy is ln((c(xy)+1) / (c(x·)+ALPHABET_SIZE)) — add-one over
    the 27-symbol alphabet, so unseen bigrams and unseen prefixes are
    both well-defined. Both outputs are ≤ 27² rows: broadcast them."""
    bg = doc_char_bigrams(corpus, id_col=id_col, text_col=text_col)
    bg_counts = bg.groupBy("bg").agg(F.sum("tf").alias("c"))
    prefix_counts = (
        bg_counts.withColumn("p", F.substring("bg", 1, 1))
        .groupBy("p")
        .agg(F.sum("c").alias("ctot"))
    )
    return bg_counts, prefix_counts


def score_char_bigram_lm(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_logp): mean smoothed log-prob of each doc's
    bigrams under the trained model — the LM quality signal (higher =
    more like the training slice; gibberish and wrong-language text
    score low). Docs without bigrams are absent from the result.

    Plan shape: explode → per-doc partial agg → two broadcast joins
    (≤729-row model tables) → per-doc final agg. avg_logp rounded to 4dp
    (ln() is float; everything upstream is integer-exact)."""
    bg_counts, prefix_counts = model
    tf = doc_char_bigrams(docs, id_col=id_col, text_col=text_col)
    joined = (
        tf.join(F.broadcast(bg_counts), "bg", "left")
        .withColumn("p", F.substring("bg", 1, 1))
        .join(F.broadcast(prefix_counts), "p", "left")
    )
    logp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1).cast("double"))
        / (F.coalesce(F.col("ctot"), F.lit(0)) + F.lit(ALPHABET_SIZE).cast("double"))
    )
    return joined.groupBy("id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.round(F.sum(F.col("tf") * logp) / F.sum("tf"), 4).alias("avg_logp"),
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): corpus word-frequency table over normalized text —
    the single corpus-sized aggregation every BPE iteration then reuses."""
    words = F.split(normalize_chars(F.col(text_col)), " ")
    return (
        df.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def symbolize(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Add the working `syms` column: the word as space-joined single
    characters — BPE's initial symbol sequence."""
    chars = F.split(F.col(word_col), "")
    return words.withColumn("syms", F.array_join(chars, " "))


def adjacent_pair_counts(
    words: DataFrame, syms_col: str = "syms", freq_col: str = "freq"
) -> DataFrame:
    """(pair, weight): adjacent-symbol pair counts over the symbolized
    word table, weighted by word frequency — every occurrence position
    counts (as in reference BPE), so 'aaaa' contributes 3 to ('a','a').
    One explode + one groupBy over the words table (not the corpus).
    Positions are exploded before element_at so the split() array is
    materialized once per word, not once per element (see
    doc_char_bigrams shape note)."""
    t = words.select(
        F.split(F.col(syms_col), " ").alias("t"), F.col(freq_col).alias("freq")
    )
    n = F.size(F.col("t"))
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        t.select("t", "freq", F.explode(idx).alias("i"))
        .select(
            F.concat_ws(
                " ",
                F.element_at(F.col("t"), F.col("i") + 1),
                F.element_at(F.col("t"), F.col("i") + 2),
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("weight"))
    )


def _merge_pattern(a: str, b: str) -> str:
    """Regex that matches the symbol pair `a b` at symbol boundaries of a
    space-joined symbol string. Lookarounds (not consumed) keep
    left-to-right non-overlapping replacement correct for runs: 'a a a'
    with pair (a,a) merges to 'aa a', the greedy-left order reference
    BPE uses."""
    return f"(?<=^|\\s){re.escape(a)}\\s{re.escape(b)}(?=\\s|$)"


def bpe_learn(
    words: DataFrame, n_merges: int, min_weight: int = 2
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges from a (word, freq) table. Returns
    (merges, final symbolized words). Each iteration: one small groupBy
    job over the words table; exactly ONE row (the argmax pair, with a
    deterministic weight-desc / pair-asc tie-break) reaches the driver.
    Stops early when no pair reaches `min_weight`. The merge itself is a
    single JVM regexp_replace; lineage is checkpoint-truncated every 8
    merges so the plan stays O(1) in merge count."""
    df = symbolize(words)
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        best = (
            adjacent_pair_counts(df)
            .orderBy(F.desc("weight"), F.asc("pair"))
            .first()
        )
        if best is None or best["weight"] < min_weight:
            break
        a, b = best["pair"].split(" ", 1)
        merges.append((a, b))
        df = df.withColumn(
            "syms", F.regexp_replace("syms", _merge_pattern(a, b), a + b)
        )
        if step % 8 == 7:
            df = df.localCheckpoint(eager=True)
    return merges, df


def tokenize_words_greedy(
    words: DataFrame, vocab: list[str], word_col: str = "word"
) -> DataFrame:
    """Add ``toks`` (array<string>): greedy longest-prefix subword
    tokenization of each word against a fixed vocabulary — the
    WordPiece/BPE-vocab *apply* step (the inference-side complement of
    ``bpe_learn``). At each position the longest vocabulary entry that
    prefixes the remainder is taken; if none matches, the single
    character is emitted (char fallback, so every word tokenizes and
    concat(toks) == word always holds).

    Scale design: callers pass the DISTINCT word table (words ≪ corpus);
    the vocabulary is a driver-side list captured by the Arrow UDF
    closure (broadcast with the task, bounded — vocabularies are 10⁴-10⁵
    entries), and each word is encoded exactly once. Per-batch cost is a
    pure-Python scan bounded by max-token-length; re-joining tokens to
    the corpus is the caller's (keyed, combinable) join.
    """
    import pandas as pd

    vset = frozenset(vocab)
    max_len = max((len(v) for v in vocab), default=1)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's hint inference would choke on 'pd.Series'
    @F.pandas_udf("array<string>")
    def _tok(col):
        out = []
        for w in col:
            if w is None:
                out.append(None)
                continue
            toks: list[str] = []
            i, n = 0, len(w)
            while i < n:
                for ln in range(min(max_len, n - i), 0, -1):
                    if w[i : i + ln] in vset:
                        toks.append(w[i : i + ln])
                        i += ln
                        break
                else:
                    toks.append(w[i])
                    i += 1
            out.append(toks)
        return pd.Series(out)

    return words.withColumn("toks", _tok(F.col(word_col)))


def vocab_tokenize_counts(
    df: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_tokens): per-document token accounting under
    greedy vocabulary tokenization of the normalized text.

    Plan: corpus → (id, word, cnt) word counts (one map-side-combined
    shuffle); DISTINCT words encode once through
    ``tokenize_words_greedy`` (the expensive Python step runs on the
    vocabulary-sized table, never the corpus); per-word token counts
    join back on the word key and aggregate per document. At 100 TB the
    Python UDF touches ~10⁷ distinct words while the corpus-sized jobs
    stay pure JVM."""
    words = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(normalize_chars(F.col(text_col)), " ")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    encoded = tokenize_words_greedy(
        words.select("word").distinct(), vocab
    ).select("word", F.size("toks").alias("n_toks"))
    return (
        words.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_toks")).cast("long").alias(
                "n_tokens"
            ),
        )
    )


def word_bigram_pmi(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """(w1, w2, c12, pmi): adjacent word-pair collocation scores —
    pointwise mutual information ln(p(w1,w2) / (p(w1) p(w2))) with
    p(w) = c(w)/N_tokens and p(w1,w2) = c12/N_pairs.

    Plan: one explode per doc for unigrams and one for adjacent pairs
    (both map-side), a groupBy each, then two keyed joins of the pair
    table against the unigram table (both shuffles keyed on a word —
    Catalyst broadcasts the 1-row totals). Counts stay integral; the
    single ln() happens per output row, so results are engine-portable.
    """
    t = df.select(F.split(normalize_chars(F.col(text_col)), " ").alias("t"))
    n = F.size(F.col("t"))
    uni = (
        t.select(F.explode(F.col("t")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    # explode positions first: element_at then reads the materialized
    # token array instead of re-splitting per element (see
    # doc_char_bigrams shape note)
    c12 = (
        t.select("t", F.explode(idx).alias("i"))
        .select(
            F.element_at(F.col("t"), F.col("i") + 1).alias("w1"),
            F.element_at(F.col("t"), F.col("i") + 2).alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    n_pair = c12.agg(F.sum("c12").alias("n_pair"))
    return (
        c12.filter(F.col("c12") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") / F.col("n_pair"))
                    / ((F.col("c1") / F.col("n_tok")) * (F.col("c2") / F.col("n_tok")))
                ),
                4,
            ).alias("pmi"),
        )
    )


# --- Multinomial Naive Bayes text classifier ------------------------------
# The quality/domain-filter role a fastText linear classifier plays in
# training-data pipelines (e.g. the GPT-3/CCNet quality filters), in a
# closed form that is deterministic and exactly replayable in SQL: no
# gradient iterations, integer counts until the final ln. The model is
# vocab_size rows — broadcast-join territory at any corpus scale; scoring
# is one explode + one broadcast join + one per-doc aggregate.


def train_nb_model(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 2048,
) -> tuple[DataFrame, float]:
    """Train a binary multinomial NB over normalized words: returns
    (weights, bias) where weights is (word, w) with
    w = ln P(word|pos) - ln P(word|neg) (add-one smoothing over the
    capped vocabulary) and bias = ln(n_pos/n_neg). ``label_col`` must be
    boolean. The vocabulary is the vocab_size most frequent words with a
    deterministic (count DESC, word ASC) tie-break; class totals count
    vocabulary words only, so the smoothed distribution sums to one over
    exactly the model's support. Only 2×2 class counts reach the driver;
    the weights stay a DataFrame (broadcast at score time)."""
    words = (
        labeled.select(
            F.col(label_col).alias("y"),
            F.explode(F.split(normalize_chars(F.col(text_col)), " ")).alias(
                "word"
            ),
        )
        .filter(F.col("word") != "")
    )
    by_class = words.groupBy("word").agg(
        F.sum(F.col("y").cast("long")).alias("c_pos"),
        F.sum((~F.col("y")).cast("long")).alias("c_neg"),
    )
    vocab = by_class.orderBy(
        F.desc(F.col("c_pos") + F.col("c_neg")), F.asc("word")
    ).limit(vocab_size)
    totals = vocab.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    if not totals.v:
        raise ValueError(
            "train_nb_model: the training slice yields an empty "
            "vocabulary (no alphabetic words after normalization)"
        )
    weights = vocab.select(
        "word",
        (
            F.log(
                (F.col("c_pos") + F.lit(1).cast("double"))
                / F.lit(float(totals.t_pos + totals.v))
            )
            - F.log(
                (F.col("c_neg") + F.lit(1).cast("double"))
                / F.lit(float(totals.t_neg + totals.v))
            )
        ).alias("w"),
    )
    priors = labeled.agg(
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.sum((~F.col(label_col)).cast("long")).alias("n_neg"),
    ).collect()[0]
    if not priors.n_pos or not priors.n_neg:
        raise ValueError(
            "train_nb_model: binary NB needs BOTH classes in the "
            f"training slice (got {priors.n_pos or 0} positive / "
            f"{priors.n_neg or 0} negative)"
        )
    import math

    bias = math.log(priors.n_pos / priors.n_neg)
    return weights, bias


def score_nb_model(
    docs: DataFrame,
    weights: DataFrame,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_vocab_words, log_odds, predicted) for every input doc:
    log_odds = bias + Σ tf(word)·w(word) over vocabulary words
    (out-of-vocabulary words carry no evidence in smoothed NB — they are
    skipped, not errored). Docs with zero vocabulary words score the
    bias alone. One explode + broadcast join + per-doc agg; log_odds
    rounded to 4dp (suite convention — everything upstream of the
    trained ln weights is integer-exact)."""
    tf = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_chars(F.col(text_col)), " ")).alias(
                "word"
            ),
        )
        .filter(F.col("word") != "")
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    evidence = (
        tf.join(F.broadcast(weights), "word")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_vocab_words"),
            F.sum(F.col("tf") * F.col("w")).alias("ev"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(evidence, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_vocab_words", F.lit(0)).alias("n_vocab_words"),
            F.round(
                F.coalesce("ev", F.lit(0.0)) + F.lit(bias), 4
            ).alias("log_odds"),
            (
                (F.coalesce("ev", F.lit(0.0)) + F.lit(bias)) > 0
            ).alias("predicted"),
        )
    )
