"""Suite queries for the operators/ + functions/ package surface:
TRANSFORM scripts, ngrams, masking, salted skew join, MatchPath."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_3_2_spark.catalog import load_table
from hive_2_3_2_spark.functions import mask, mask_hash, mask_show_first_n, ngrams
from hive_2_3_2_spark.operators import match_path, salted_skew_join, transform_script
from hive_2_3_2_spark.suite import query


@query(
    "op_transform_script",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS k,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey < 100
    """,
)
def op_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM ... USING 'cat' (ScriptOperator parity,
    ql/.../exec/ScriptOperator.java:66): rows piped tab-delimited through
    an external process; outputs are strings (default SerDe)."""
    load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 100
    ).createOrReplaceTempView("orders_small")
    return transform_script(
        spark, "orders_small", ["o_orderkey", "o_orderpriority"], "cat", ["k", "prio"]
    )


@query(
    "op_ngrams_top20",
    oracle=r"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT UNNEST(list_transform(
        range(greatest(len(t) - 1, 1)),
        i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')
      )) AS ngram
      FROM toks
    )
    SELECT ngram, CAST(COUNT(*) AS DOUBLE) AS estfrequency
    FROM grams GROUP BY ngram
    ORDER BY estfrequency DESC, ngram
    LIMIT 20
    """,
)
def op_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngrams UDAF (GenericUDAFnGrams parity) — top-20 bigrams over
    documents (functions/gaps.py ngrams; exact counts, better than the
    reference's heap estimator)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )
    return ngrams(docs, F.col("toks"), 2, 20)


@query(
    "op_masking_family",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked,
           md5(c_name) AS hashed,
           concat(substr(c_name, 1, 4),
             regexp_replace(regexp_replace(regexp_replace(substr(c_name, 5),
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'))
             AS partial
    FROM customer WHERE c_custkey < 100
    """,
)
def op_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masking functions (GenericUDFMask* family,
    FunctionRegistry.java:531-536) via functions/gaps.py wrappers."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        mask(F.col("c_name")).alias("masked"),
        mask_hash(F.col("c_name")).alias("hashed"),
        mask_show_first_n(F.col("c_name"), 4).alias("partial"),
    )


@query(
    "op_salted_skew_join",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def op_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted skew join (operators/joins.py salted_skew_join =
    compile-time SkewJoinOptimizer parity) — result identical to the
    plain join, shuffle keys spread over 8 salt buckets."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_skew_join(li, orders, "k", salt_buckets=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "op_match_path_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn
      FROM events
    ),
    v AS (
      SELECT user_id, ts, rn,
             rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM e WHERE event_type = 'view'
    ),
    runs AS (
      SELECT user_id, grp, MIN(rn) AS start_rn, MAX(rn) AS end_rn,
             MIN(ts) AS start_ts
      FROM v GROUP BY user_id, grp
    )
    SELECT r.user_id AS user_id, r.start_ts AS ts,
           CAST(r.start_rn AS BIGINT) AS match_start,
           CAST(r.end_rn + 1 AS BIGINT) AS match_end,
           CAST(r.end_rn + 2 - r.start_rn AS BIGINT) AS match_len
    FROM runs r
    JOIN e p ON p.user_id = r.user_id AND p.rn = r.end_rn + 1
            AND p.event_type = 'purchase'
    ORDER BY r.user_id, ts
    """,
)
def op_match_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath PTF (udf/ptf/MatchPath.java parity via applyInPandas):
    find purchase-after-views patterns per user in the events stream.
    The general PTF is a row-sequence regex (not SQL-expressible), but
    THIS pattern (V+P, leftmost non-overlapping ⇒ every maximal view-run
    immediately followed by a purchase) has an exact gaps-and-islands
    oracle, giving the applyInPandas path a hash-checked row. Greedy/
    non-overlap semantics for richer patterns pinned in
    tests/test_operators.py."""
    ev = load_table(spark, sf_dir, "events")
    return match_path(
        ev,
        "user_id",
        "ts",
        {
            "V": lambda p: p["event_type"] == "view",
            "P": lambda p: p["event_type"] == "purchase",
        },
        pattern="V+P",
        result_cols=["user_id", "ts"],
    )


@query(
    "op_asof_join_last_click",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id AS view_id, NULL AS click_id, 1 AS is_left
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, NULL, event_id, 0
      FROM events WHERE event_type = 'click'
    ),
    w AS (
      SELECT user_id, ts, view_id, is_left,
             LAST_VALUE(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS click_id
      FROM u
    )
    SELECT CAST(view_id AS BIGINT) AS view_id,
           CAST(click_id AS BIGINT) AS click_id
    FROM w WHERE is_left = 1
    ORDER BY view_id
    """,
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py asof_join): for every 'view' event
    the latest 'click' by the same user at-or-before it. The union+window
    formulation — one key shuffle, one ordered pass, no range-join
    blow-up (the naive formulation is O(views × prior clicks) before its
    max-filter; this is O(n log n) per user at any scale)."""
    from hive_2_3_2_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return (
        asof_join(views, clicks, "user_id", "ts", ["click_id"])
        .select("view_id", "click_id")
        .orderBy("view_id")
    )


@query(
    "op_banded_range_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch(ts) AS sec FROM events
    )
    SELECT er.event_id AS error_event_id,
           p.event_id AS event_id,
           ROUND(p.sec - er.sec, 6) AS seconds_apart
    FROM e er JOIN e p ON er.user_id = p.user_id
    WHERE er.event_type = 'error' AND p.event_type <> 'error'
      AND p.sec BETWEEN er.sec - 1800 AND er.sec + 1800
    ORDER BY error_event_id, event_id
    """,
)
def banded_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (operators/joins.py banded_range_join): every
    non-error event within ±30min of an error by the same user. The naive
    inequality join is a per-user cross product (BroadcastNestedLoop at
    Spark's mercy); the banded form replicates each ±30min interval onto
    its 1h bands and EQUI-joins on (user_id, band) + residual filter —
    shuffle keyed, no blow-up, the interval side inflates ≤2×."""
    from hive_2_3_2_spark.operators.joins import banded_range_join

    ev = load_table(spark, sf_dir, "events")
    # cast via TIMESTAMP first: TIMESTAMP_NTZ → DOUBLE is rejected by
    # Spark 4, so this stays valid even on a non-normalized column
    sec = F.col("ts").cast("timestamp").cast("double")
    pts = ev.filter("event_type <> 'error'").select(
        "user_id", F.col("event_id").alias("event_id"), sec.alias("pt")
    )
    ivs = ev.filter("event_type = 'error'").select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        (sec - 1800).alias("s"),
        (sec + 1800).alias("e"),
    )
    j = banded_range_join(pts, ivs, "pt", "s", "e", 3600.0, keys=["user_id"])
    return j.select(
        "error_event_id",
        "event_id",
        F.round(F.col("pt") - (F.col("s") + 1800), 6).alias("seconds_apart"),
    ).orderBy("error_event_id", "event_id")
