"""Driver-verifiable entries for the round-5 dialect surface:
null-sensitive GREATEST/LEAST, the MatchPath SQL invocation, and
Hive's unordered ranking windows. Registered below the window in
module order; suite.__init__._WINDOW places them inside the r5
verification sample (freeze rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.engine import Engine
from hive_2_3_2_spark.suite import query


@query(
    "hiveql_greatest_least_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN nd IS NULL OR l_tax IS NULL OR half IS NULL
                THEN NULL
                ELSE greatest(nd, l_tax, half) END AS g,
           CASE WHEN nd IS NULL OR l_tax IS NULL THEN NULL
                ELSE least(nd, l_tax) END AS l
    FROM (
      SELECT l_orderkey, l_linenumber, l_tax,
             nullif(l_discount, 0.0) AS nd,
             l_discount / 2 AS half
      FROM lineitem WHERE l_orderkey < 200
    )
    ORDER BY l_orderkey, l_linenumber, g NULLS FIRST, l NULLS FIRST
    """,
)
def hiveql_greatest_least_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's GREATEST/LEAST return NULL when ANY argument is NULL
    (GenericUDFGreatest after HIVE-12082; udf_greatest.q golden) —
    Spark and DuckDB both skip nulls, so the Engine rewrites the calls
    and the oracle hand-expands the null guard. nullif(l_discount, 0)
    manufactures genuine NULL arguments from the fixture."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT l_orderkey, l_linenumber,
               greatest(nullif(l_discount, 0.0), l_tax,
                        l_discount / 2) AS g,
               least(nullif(l_discount, 0.0), l_tax) AS l
        FROM lineitem WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber, g NULLS FIRST, l NULLS FIRST
        """
    )


@query(
    "op_matchpath_sql_invocation",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             (value > 75) AS hi,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    islands AS (
      SELECT user_id, event_id, ts, rn,
             rn - row_number() OVER (PARTITION BY user_id, hi
                                     ORDER BY rn) AS grp
      FROM ordered WHERE hi
    ),
    sized AS (
      SELECT user_id, event_id, ts,
             CAST(COUNT(*) OVER (PARTITION BY user_id, grp) AS BIGINT)
               AS island_len,
             CAST(row_number() OVER (PARTITION BY user_id, grp
                                     ORDER BY rn) AS BIGINT) AS idx
      FROM islands
    )
    SELECT user_id, event_id, island_len - idx + 1 AS sz
    FROM sized WHERE island_len - idx + 1 >= 2
    ORDER BY user_id, event_id
    """,
)
def op_matchpath_sql_invocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath through its SQL invocation syntax (ptf_matchpath.q,
    udf/ptf/MatchPath.java): HIGH.HIGH+ runs of value>75 events per
    user, Hive's anchored-at-every-row semantics — every suffix of a
    streak of length L emits its own path (sz = L, L-1, ..., 2). The
    oracle derives the same suffix sizes with gaps-and-islands window
    SQL (run-length minus position within the island)."""
    from hive_2_3_2_spark.catalog import load_table

    eng = Engine(spark=spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "mp_events"
    )
    out = eng.sql(
        """
        select user_id, event_id, sz
        from matchpath(on mp_events
                distribute by user_id
                sort by ts, event_id
              arg1('HIGH.HIGH+'),
              arg2('HIGH'), arg3(value > 75),
              arg4('user_id, event_id, size(tpath) as sz'))
        order by user_id, event_id
        """
    )
    spark.catalog.dropTempView("mp_events")
    return out


@query(
    "window_unordered_ranking",
    oracle="""
    SELECT CAST(row_number() OVER () AS BIGINT) AS rn
    FROM part WHERE p_size = 1
    """,
)
def window_unordered_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive permits ranking functions over an UNORDERED window
    (windowing_navfn.q line 1: row_number() over() — arbitrary
    numbering); Spark requires ORDER BY, so the engine supplies an
    arbitrary-but-valid one. Both engines' arbitrary numberings are
    the SAME SET 1..N, which is exactly what the order-insensitive
    canonical compare checks."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(
        "select row_number() over () AS rn from part where p_size = 1"
    )
