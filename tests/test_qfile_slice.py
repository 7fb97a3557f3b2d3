"""A curated slice of the reference's clientpositive `.q` corpus,
replayed through Engine.sql against a DuckDB golden oracle.

This is SURVEY §5.4 item 2 made concrete: the reference drives 2,511
`.q` files through a real CliDriver over the standard `src` fixture
(key STRING, value STRING = 'val_<key>'; QTestUtil.createSources runs
data/scripts/q_test_init.sql:7) and diffs sorted stdout against golden
files. Here each test replays ONE representative `.q` file's statement
shapes (cited per test) on a deterministic src twin, through the same
Engine.sql entry the CLI uses, and diffs order-insensitively against
DuckDB — with Hive's type-coercion semantics (string arithmetic →
double, permissive casts) hand-expanded in the oracle SQL exactly as
the engine must evaluate them.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    """The reference's standard fixture: `src` (500 rows, duplicated
    STRING keys 0..82, value = 'val_<key>') as a path-backed table in an
    Engine plus the identical relation in DuckDB."""
    root = tmp_path_factory.mktemp("qfiles")
    src_path = str(root / "src")
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    spark.createDataFrame(rows, "key string, value string").coalesce(
        2
    ).write.parquet(src_path)
    eng = Engine(spark=spark)
    eng.register_table("src", src_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{src_path}/*.parquet')"
    )
    yield eng, con, str(root)
    con.close()


def test_q_join2_three_way_expression_join(qenv):
    """join2.q (clientpositive/join2.q): 3-way self-join where the third
    join key is the SUM of the first two STRING keys — Hive coerces
    string arithmetic to double (GenericUDFOPPlus), so the oracle
    hand-expands the double casts."""
    eng, con, root = qenv
    eng.spark.sql("DROP TABLE IF EXISTS dest_j2")
    # external LOCATION under the per-run tmp root: a managed table's
    # warehouse dir would outlive the in-memory catalog across sessions
    # and fail the next CREATE with LOCATION_ALREADY_EXISTS
    eng.sql(
        "CREATE TABLE IF NOT EXISTS dest_j2 (key INT, value STRING) "
        f"STORED AS TEXTFILE LOCATION '{root}/dest_j2'"
    )
    eng.sql(
        "INSERT OVERWRITE TABLE dest_j2 "
        "SELECT src1.key, src3.value "
        "FROM src src1 JOIN src src2 ON (src1.key = src2.key) "
        "JOIN src src3 ON (src1.key + src2.key = src3.key)"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM dest_j2"),
        con,
        """
        SELECT CAST(s1.key AS INT) AS key, s3.value AS value
        FROM src s1 JOIN src s2 ON s1.key = s2.key
        JOIN src s3
          ON CAST(s1.key AS DOUBLE) + CAST(s2.key AS DOUBLE)
             = CAST(s3.key AS DOUBLE)
        """,
    )


def test_q_groupby2_distinct_and_concat_sum(qenv):
    """groupby2.q: group by substr(key,1,1) with count(DISTINCT
    substr(value,5)) and concat(prefix, sum(substr(value,5))) — string
    sums are double in Hive, and double→string concat keeps the .0."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT substr(src.key,1,1) AS key, "
        "count(DISTINCT substr(src.value,5)) AS c1, "
        "concat(substr(src.key,1,1), sum(substr(src.value,5))) AS c2 "
        "FROM src GROUP BY substr(src.key,1,1)"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT substr(key,1,1) AS key,
               CAST(count(DISTINCT substr(value,5)) AS BIGINT) AS c1,
               substr(key,1,1) ||
                 CAST(SUM(CAST(substr(value,5) AS DOUBLE)) AS VARCHAR) AS c2
        FROM src GROUP BY substr(key,1,1)
        """,
    )


def test_q_having_aggregate_predicates(qenv):
    """having.q: HAVING over an aliased count, over the group key, and
    over an aggregate not in the select list."""
    eng, con, _ = qenv
    assert_matches_oracle(
        eng.sql("SELECT count(value) AS c FROM src GROUP BY key HAVING c > 3"),
        con,
        "SELECT CAST(count(value) AS BIGINT) AS c FROM src "
        "GROUP BY key HAVING count(value) > 3",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT key, max(value) AS c FROM src GROUP BY key "
            "HAVING key != 30"
        ),
        con,
        "SELECT key, max(value) AS c FROM src GROUP BY key "
        "HAVING CAST(key AS DOUBLE) != 30",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT key FROM src WHERE key > 30 GROUP BY key "
            "HAVING max(value) > 'val_55'"
        ),
        con,
        "SELECT key FROM src WHERE CAST(key AS DOUBLE) > 30 GROUP BY key "
        "HAVING max(value) > 'val_55'",
    )


def test_q_union3_mixed_limit_branches(qenv):
    """union3.q: four UNION ALL branches over LIMIT-1 subqueries with a
    CLUSTER BY inside the union — the Mux/Demux shared-shuffle shape."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT * FROM (
          SELECT 1 AS id FROM (SELECT * FROM src LIMIT 1) s1
          UNION ALL
          SELECT 2 AS id FROM (SELECT * FROM src LIMIT 1) s1
          UNION ALL
          SELECT 3 AS id FROM (SELECT * FROM src LIMIT 1) s2
          UNION ALL
          SELECT 4 AS id FROM (SELECT * FROM src LIMIT 1) s2
          CLUSTER BY id
        ) a
        """
    )
    assert_matches_oracle(
        got, con, "SELECT UNNEST([1, 2, 3, 4]) AS id"
    )


def test_q_groupby_grouping_sets(qenv):
    """groupby_grouping_sets1.q: GROUPING SETS over (prefix, suffix)
    with the () grand total."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT substr(key,1,1) AS a, substr(value,5,1) AS b, "
        "count(*) AS c FROM src "
        "GROUP BY substr(key,1,1), substr(value,5,1) "
        "GROUPING SETS ((substr(key,1,1)), (substr(key,1,1), "
        "substr(value,5,1)), ())"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT substr(key,1,1) AS a, substr(value,5,1) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM src
        GROUP BY GROUPING SETS ((substr(key,1,1)),
                                (substr(key,1,1), substr(value,5,1)), ())
        """,
    )


def test_q_semijoin_and_subquery_in(qenv):
    """semijoin.q + subquery_in.q: LEFT SEMI JOIN and the equivalent
    IN-subquery rewrite (SemanticAnalyzer.java:3354 turns IN into
    LEFT SEMI) must agree with each other and the oracle."""
    eng, con, _ = qenv
    semi = eng.sql(
        "SELECT a.key, a.value FROM src a LEFT SEMI JOIN "
        "(SELECT key FROM src WHERE key < 10) b ON (a.key = b.key)"
    )
    in_sub = eng.sql(
        "SELECT key, value FROM src WHERE key IN "
        "(SELECT key FROM src WHERE key < 10)"
    )
    oracle = (
        "SELECT key, value FROM src WHERE key IN "
        "(SELECT key FROM src WHERE CAST(key AS DOUBLE) < 10)"
    )
    assert_matches_oracle(semi, con, oracle)
    assert_matches_oracle(in_sub, con, oracle)


def test_q_windowing_over_partition(qenv):
    """windowing.q family: rank + running sum over a partition, default
    RANGE frame semantics for the sum (WindowingSpec.java:222)."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT key, value, "
        "rank() OVER (PARTITION BY substr(key,1,1) ORDER BY key) AS r, "
        "sum(1) OVER (PARTITION BY substr(key,1,1) ORDER BY key) AS s "
        "FROM src WHERE key < 20"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key, value,
               CAST(rank() OVER (PARTITION BY substr(key,1,1)
                                 ORDER BY key) AS BIGINT) AS r,
               CAST(sum(1) OVER (PARTITION BY substr(key,1,1) ORDER BY key
                                 RANGE UNBOUNDED PRECEDING) AS BIGINT) AS s
        FROM src WHERE CAST(key AS DOUBLE) < 20
        """,
    )


def test_q_lateral_view_explode(qenv):
    """lateral_view.q: LATERAL VIEW explode over a built array, with the
    source row multiplied per element."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT key, v FROM src "
        "LATERAL VIEW explode(array(1, 2, 3)) t AS v WHERE key < 3"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key, CAST(UNNEST([1,2,3]) AS INT) AS v
        FROM src WHERE CAST(key AS DOUBLE) < 3
        """,
    )


def test_q_multi_insert_from_src(qenv):
    """multi_insert.q (FROM src INSERT OVERWRITE t1 ... INSERT OVERWRITE
    t2 ...): one source scan feeding two sinks with disjoint filters."""
    eng, con, root = qenv
    spark = eng.spark
    for t in ("mi_low", "mi_high"):
        spark.createDataFrame([], "key string, value string").write.mode(
            "overwrite"
        ).parquet(f"{root}/{t}")
        eng.register_table(t, f"{root}/{t}")
    eng.sql(
        "FROM src "
        "INSERT OVERWRITE TABLE mi_low SELECT key, value WHERE key < 10 "
        "INSERT OVERWRITE TABLE mi_high SELECT key, value WHERE key >= 75"
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM mi_low"),
        con,
        "SELECT key, value FROM src WHERE CAST(key AS DOUBLE) < 10",
    )
    assert_matches_oracle(
        eng.sql("SELECT key, value FROM mi_high"),
        con,
        "SELECT key, value FROM src WHERE CAST(key AS DOUBLE) >= 75",
    )


def test_q_order_limit_subquery(qenv):
    """order2.q: ORDER BY inside a LIMIT subquery then an outer
    projection — the TopNHash / LimitPushdown shape."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT sub.key, sub.value FROM "
        "(SELECT DISTINCT key, value FROM src ORDER BY key LIMIT 5) sub"
    )
    assert_matches_oracle(
        got,
        con,
        "SELECT key, value FROM "
        "(SELECT DISTINCT key, value FROM src ORDER BY key LIMIT 5) s",
    )


def test_q_mapjoin_hint_passthrough(qenv):
    """mapjoin1.q: the /*+ MAPJOIN(x) */ hint form parses and the result
    matches the plain join (Spark honors its own broadcast hints; Hive's
    hint syntax must at minimum not break the statement)."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT /*+ MAPJOIN(b) */ a.key, count(*) AS c "
        "FROM src a JOIN (SELECT DISTINCT key FROM src WHERE key < 5) b "
        "ON a.key = b.key GROUP BY a.key"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT a.key, CAST(count(*) AS BIGINT) AS c
        FROM src a
        JOIN (SELECT DISTINCT key FROM src
              WHERE CAST(key AS DOUBLE) < 5) b
          ON a.key = b.key
        GROUP BY a.key
        """,
    )


def test_q_cast_string_arithmetic_semantics(qenv):
    """udf arithmetic family (udf_divide.q etc. semantics): int/int
    division yields DOUBLE in Hive (GenericUDFOPDivide,
    FunctionRegistry.java:337) and string compares against numbers as
    double — the coercion hard-part from SURVEY §7.4."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT key, key / 2 AS half, key % 3 AS m, "
        "CAST(key AS INT) DIV 7 AS d "
        "FROM src WHERE key = 10"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key,
               CAST(key AS DOUBLE) / 2 AS half,
               CAST(key AS DOUBLE) % 3 AS m,
               CAST(CAST(key AS INT) // 7 AS INT) AS d
        FROM src WHERE CAST(key AS DOUBLE) = 10
        """,
    )


def test_q_groupby_cube(qenv):
    """groupby_cube1.q: CUBE over two derived keys with grouping()."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT substr(key,1,1) AS a, substr(value,5,1) AS b, "
        "count(*) AS c, grouping(substr(key,1,1)) AS ga "
        "FROM src GROUP BY substr(key,1,1), substr(value,5,1) WITH CUBE"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT substr(key,1,1) AS a, substr(value,5,1) AS b,
               CAST(count(*) AS BIGINT) AS c,
               CAST(grouping(substr(key,1,1)) AS INT) AS ga
        FROM src GROUP BY CUBE (substr(key,1,1), substr(value,5,1))
        """,
    )


def test_q_subquery_notin_null_semantics(qenv):
    """subquery_notin.q: NOT IN over a subquery CONTAINING a NULL must
    return the empty set (three-valued logic) — the classic trap; and
    the null-free variant behaves as the anti join."""
    eng, con, root = qenv
    spark = eng.spark
    path = f"{root}/notin_probe"
    spark.createDataFrame(
        [("1",), ("2",), (None,)], "key string"
    ).write.mode("overwrite").parquet(path)
    eng.register_table("notin_probe", path)
    # subquery with a NULL → empty result
    got = eng.sql(
        "SELECT key FROM src WHERE key NOT IN (SELECT key FROM notin_probe)"
    )
    assert got.count() == 0
    # null-free subquery → anti-join semantics
    got2 = eng.sql(
        "SELECT count(*) AS n FROM src WHERE key NOT IN "
        "(SELECT key FROM notin_probe WHERE key IS NOT NULL)"
    )
    assert_matches_oracle(
        got2,
        con,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM src "
        "WHERE key NOT IN ('1', '2')",
    )


def test_q_join_filters_outer_where(qenv):
    """join_filters.q family: WHERE on the preserved side of a LEFT
    OUTER join filters AFTER the join; the ON-clause residual filters
    the joined side only (NULL-extended rows survive)."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT a.key, b.value FROM src a "
        "LEFT JOIN (SELECT * FROM src WHERE key < 5) b "
        "ON a.key = b.key AND b.value LIKE 'val_1%' "
        "WHERE a.key < 12"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT a.key AS key, b.value AS value FROM src a
        LEFT JOIN (SELECT * FROM src WHERE CAST(key AS DOUBLE) < 5) b
          ON a.key = b.key AND b.value LIKE 'val_1%'
        WHERE CAST(a.key AS DOUBLE) < 12
        """,
    )


def test_q_windowing_mixed_running_aggregates(qenv):
    """windowing.q expressions: mixed ROWS frame running sum + overall
    partition share in one select."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT key, "
        "sum(key) OVER (PARTITION BY substr(key,1,1) ORDER BY key, value "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum, "
        "count(*) OVER (PARTITION BY substr(key,1,1)) AS ptotal "
        "FROM src WHERE key < 15"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key,
               sum(CAST(key AS DOUBLE)) OVER (
                 PARTITION BY substr(key,1,1) ORDER BY key, value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum,
               CAST(count(*) OVER (
                 PARTITION BY substr(key,1,1)) AS BIGINT) AS ptotal
        FROM src WHERE CAST(key AS DOUBLE) < 15
        """,
    )


def test_q_order_by_nulls_and_setops(qenv):
    """order_null.q + union_remove/setop families: NULLS FIRST/LAST
    ordering and INTERSECT/EXCEPT over derived sets."""
    eng, con, root = qenv
    spark = eng.spark
    path = f"{root}/nullable_keys"
    spark.createDataFrame(
        [("1", 1), (None, 2), ("3", 3), (None, 4)], "k string, v int"
    ).write.mode("overwrite").parquet(path)
    eng.register_table("nullable_keys", path)
    got = eng.sql(
        "SELECT k, v FROM nullable_keys ORDER BY k DESC NULLS LAST, v"
    ).collect()
    assert [r.v for r in got] == [3, 1, 2, 4]
    got = eng.sql(
        "SELECT k, v FROM nullable_keys ORDER BY k ASC NULLS FIRST, v"
    ).collect()
    assert [r.v for r in got] == [2, 4, 1, 3]
    assert_matches_oracle(
        eng.sql(
            "SELECT key FROM src WHERE key < 20 "
            "INTERSECT SELECT key FROM src WHERE key >= 10"
        ),
        con,
        "SELECT key FROM src WHERE CAST(key AS DOUBLE) < 20 "
        "INTERSECT SELECT key FROM src WHERE CAST(key AS DOUBLE) >= 10",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT key FROM src WHERE key < 20 "
            "EXCEPT SELECT key FROM src WHERE key >= 10"
        ),
        con,
        "SELECT key FROM src WHERE CAST(key AS DOUBLE) < 20 "
        "EXCEPT SELECT key FROM src WHERE CAST(key AS DOUBLE) >= 10",
    )


def test_q_udf_string_battery(qenv):
    """udf_*.q one-per-function style: a battery of string/conditional
    functions in one projection, diffed against DuckDB equivalents."""
    eng, con, _ = qenv
    got = eng.sql(
        "SELECT key, length(value) AS ln, reverse(key) AS rk, "
        "lpad(key, 5, '0') AS lp, instr(value, '_') AS ix, "
        "split(value, '_')[1] AS suffix, "
        "if(key > 40, 'hi', 'lo') AS band "
        "FROM src WHERE key IN (1, 17, 42)"
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT key, CAST(length(value) AS INT) AS ln, reverse(key) AS rk,
               lpad(key, 5, '0') AS lp,
               CAST(instr(value, '_') AS INT) AS ix,
               string_split(value, '_')[2] AS suffix,
               CASE WHEN CAST(key AS DOUBLE) > 40
                    THEN 'hi' ELSE 'lo' END AS band
        FROM src WHERE CAST(key AS DOUBLE) IN (1, 17, 42)
        """,
    )


def test_q_null_join_keys_and_count_semantics(qenv):
    """join_nulls.q + count.q: NULL equi-join keys never match (inner
    and outer), COUNT(col) skips NULLs while COUNT(*) doesn't, and
    COUNT(DISTINCT col) ignores NULLs."""
    eng, con, root = qenv
    spark = eng.spark
    path = f"{root}/nullkeys"
    spark.createDataFrame(
        [("1", 10), (None, 20), ("2", 30), (None, 40), ("2", 50)],
        "k string, v int",
    ).write.mode("overwrite").parquet(path)
    eng.register_table("nullkeys", path)
    con.execute(
        "CREATE OR REPLACE VIEW nullkeys AS "
        f"SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT a.v AS av, b.v AS bv FROM nullkeys a "
            "JOIN nullkeys b ON a.k = b.k"
        ),
        con,
        "SELECT a.v AS av, b.v AS bv FROM nullkeys a "
        "JOIN nullkeys b ON a.k = b.k",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT a.v AS av, b.v AS bv FROM nullkeys a "
            "LEFT JOIN nullkeys b ON a.k = b.k"
        ),
        con,
        "SELECT a.v AS av, b.v AS bv FROM nullkeys a "
        "LEFT JOIN nullkeys b ON a.k = b.k",
    )
    assert_matches_oracle(
        eng.sql(
            "SELECT count(*) AS c_star, count(k) AS c_k, "
            "count(DISTINCT k) AS c_dk FROM nullkeys"
        ),
        con,
        "SELECT CAST(count(*) AS BIGINT) AS c_star, "
        "CAST(count(k) AS BIGINT) AS c_k, "
        "CAST(count(DISTINCT k) AS BIGINT) AS c_dk FROM nullkeys",
    )
    # null-safe <=> DOES match NULLs (Hive's null-safe equality)
    got = eng.sql(
        "SELECT count(*) AS n FROM nullkeys a "
        "JOIN nullkeys b ON a.k <=> b.k"
    ).collect()[0].n
    # pairs: k='1'(1x1) + k='2'(2x2) + NULL(2x2) = 1 + 4 + 4
    assert got == 9
