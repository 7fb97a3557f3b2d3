"""clientpositive `.q` slice, round 5: the auto_join* (mapjoin
auto-conversion, reference ql/src/test/queries/clientpositive/
auto_join0.q ff.) and ppd_* (predicate pushdown under outer joins /
group-bys, ppd_outer_join1.q ff.) families.

Same method as tests/test_qfile_slice.py: each test replays one file's
statement shapes through Engine.sql on the standard `src` fixture and
diffs order-insensitively against DuckDB with Hive's coercions
hand-expanded. Where the reference digests row sets via
``sum(hash(...))`` (a Java-hashCode digest DuckDB cannot reproduce),
the tests compare the FULL projected row set instead — strictly
stronger than the digest. auto-conversion itself (hive.auto.convert.
join) is Catalyst's broadcast decision; the semantic content replayed
here is that ON-clause filters bind before NULL-extension and WHERE
binds after, which is exactly what those goldens pin."""

from __future__ import annotations

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfiles_aj")
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


def test_q_auto_join0_cross_of_filtered_subqueries(qenv):
    """auto_join0.q: JOIN with NO condition (cross) of two filtered
    ordered subqueries — the goldens digest with sum(hash(...)); here
    the full 4-column row set is diffed."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT src1.key AS k1, src1.value AS v1,
               src2.key AS k2, src2.value AS v2
        FROM (SELECT * FROM src WHERE src.key < 5) src1
        JOIN (SELECT * FROM src WHERE src.key < 5) src2
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT s1.key AS k1, s1.value AS v1, s2.key AS k2, s2.value AS v2
        FROM (SELECT * FROM src WHERE CAST(key AS DOUBLE) < 5) s1
        CROSS JOIN (SELECT * FROM src WHERE CAST(key AS DOUBLE) < 5) s2
        """,
    )


def test_q_auto_join4_left_outer_overlapping_ranges(qenv):
    """auto_join4.q: LEFT OUTER of two range-filtered subqueries with
    partial overlap, materialized via INSERT OVERWRITE then re-read —
    rows in (10,20) keep NULL right-side columns outside (15,25)."""
    eng, con, root = qenv
    spark = eng.spark
    spark.createDataFrame(
        [], "c1 string, c2 string, c3 string, c4 string"
    ).write.mode("overwrite").parquet(f"{root}/dest_aj4")
    eng.register_table("dest_aj4", f"{root}/dest_aj4")
    eng.sql(
        """
        INSERT OVERWRITE TABLE dest_aj4
        SELECT a.c1, a.c2, b.c3, b.c4 FROM
        (SELECT key AS c1, value AS c2 FROM src
         WHERE key > 10 AND key < 20) a
        LEFT OUTER JOIN
        (SELECT key AS c3, value AS c4 FROM src
         WHERE key > 15 AND key < 25) b
        ON (a.c1 = b.c3)
        """
    )
    assert_matches_oracle(
        eng.sql("SELECT c1, c2, c3, c4 FROM dest_aj4"),
        con,
        """
        SELECT a.c1, a.c2, b.c3, b.c4 FROM
        (SELECT key AS c1, value AS c2 FROM src
         WHERE CAST(key AS DOUBLE) > 10 AND CAST(key AS DOUBLE) < 20) a
        LEFT OUTER JOIN
        (SELECT key AS c3, value AS c4 FROM src
         WHERE CAST(key AS DOUBLE) > 15 AND CAST(key AS DOUBLE) < 25) b
        ON a.c1 = b.c3
        """,
    )


def test_q_auto_join16_on_residuals_plus_outer_where(qenv):
    """auto_join16.q: extra inequality conditions inside the inner-join
    ON plus a WHERE on the probe side — for INNER joins ON and WHERE
    predicates are interchangeable and must all apply."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT subq.key AS key, tab.value AS value
        FROM (SELECT a.key, a.value FROM src a WHERE a.key > 10) subq
        JOIN src tab
          ON (subq.key = tab.key AND subq.key > 20
              AND subq.value = tab.value)
        WHERE tab.key < 40
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT subq.key AS key, tab.value AS value
        FROM (SELECT key, value FROM src
              WHERE CAST(key AS DOUBLE) > 10) subq
        JOIN src tab
          ON subq.key = tab.key AND CAST(subq.key AS DOUBLE) > 20
             AND subq.value = tab.value
        WHERE CAST(tab.key AS DOUBLE) < 40
        """,
    )


def test_q_auto_join20_inner_then_right_outer_with_on_filters(qenv):
    """auto_join20.q: (src1 JOIN src2 ON k AND src1.key<10) RIGHT OUTER
    JOIN src3 ON (k AND src3.key<20) — the ON filter of the INNER join
    binds before the RIGHT OUTER's NULL-extension, and the outer's own
    ON filter (src3.key<20) only disqualifies MATCHES, never src3 rows."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT src1.key AS k1, src2.key AS k2, src3.key AS k3,
               src3.value AS v3
        FROM src src1
        JOIN src src2 ON (src1.key = src2.key AND src1.key < 10)
        RIGHT OUTER JOIN src src3
          ON (src1.key = src3.key AND src3.key < 20)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT src1.key AS k1, src2.key AS k2, src3.key AS k3,
               src3.value AS v3
        FROM src src1
        JOIN src src2
          ON src1.key = src2.key AND CAST(src1.key AS DOUBLE) < 10
        RIGHT OUTER JOIN src src3
          ON src1.key = src3.key AND CAST(src3.key AS DOUBLE) < 20
        """,
    )


def test_q_auto_join21_contradictory_on_filters(qenv):
    """auto_join21.q: LEFT OUTER with CONTRADICTORY ON conditions
    (src1.key<10 AND src2.key>10 on equal keys → no matches, all rows
    NULL-extended) then RIGHT OUTER on the NULL-extended column — joins
    on a NULL key never match, so every src3 row survives unmatched."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT src1.key AS k1, src2.key AS k2, src3.key AS k3
        FROM src src1
        LEFT OUTER JOIN src src2
          ON (src1.key = src2.key AND src1.key < 10 AND src2.key > 10)
        RIGHT OUTER JOIN src src3
          ON (src2.key = src3.key AND src3.key < 10)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT src1.key AS k1, src2.key AS k2, src3.key AS k3
        FROM src src1
        LEFT OUTER JOIN src src2
          ON src1.key = src2.key AND CAST(src1.key AS DOUBLE) < 10
             AND CAST(src2.key AS DOUBLE) > 10
        RIGHT OUTER JOIN src src3
          ON src2.key = src3.key AND CAST(src3.key AS DOUBLE) < 10
        """,
    )


def test_q_auto_join27_union_mixed_distinct_join(qenv):
    """auto_join27.q: (src UNION ALL SELECT DISTINCT src) joined against
    a filtered subquery — union-branch dedup happens per branch, not
    across the UNION ALL."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT count(1) AS n
        FROM (
          SELECT src.key, src.value FROM src
          UNION ALL
          SELECT DISTINCT src.key, src.value FROM src
        ) src_12
        JOIN (SELECT src.key AS k, src.value AS v FROM src) src3
          ON src_12.key = src3.k AND src3.k < 20
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT CAST(count(1) AS BIGINT) AS n
        FROM (
          SELECT key, value FROM src
          UNION ALL
          SELECT DISTINCT key, value FROM src
        ) src_12
        JOIN (SELECT key AS k, value AS v FROM src) src3
          ON src_12.key = src3.k AND CAST(src3.k AS DOUBLE) < 20
        """,
    )


def test_q_ppd_gby_filter_through_groupby(qenv):
    """ppd_gby.q: outer WHERE mixing a pushable group-key predicate with
    an OR over the aggregate — only the pure group-key conjunct may push
    below the aggregation; results must be identical either way."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT src1.c1
        FROM (SELECT src.value AS c1, count(src.key) AS c2
              FROM src WHERE src.value > 'val_10' GROUP BY src.value) src1
        WHERE src1.c1 > 'val_20' AND (src1.c2 > 5 OR src1.c1 < 'val_40')
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT c1
        FROM (SELECT value AS c1, count(key) AS c2
              FROM src WHERE value > 'val_10' GROUP BY value) src1
        WHERE c1 > 'val_20' AND (c2 > 5 OR c1 < 'val_40')
        """,
    )


def test_q_ppd_join2_three_way_messy_residuals(qenv):
    """ppd_join2.q: three-way join over filtered subqueries with mixed
    pushable (<> literals) and cross-table residual predicates plus a
    sqrt() on a string key (numeric coercion)."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT src1.c1, src2.c4
        FROM (SELECT src.key AS c1, src.value AS c2 FROM src
              WHERE src.key <> '30') src1
        JOIN (SELECT src.key AS c3, src.value AS c4 FROM src
              WHERE src.key <> '35') src2
          ON src1.c1 = src2.c3 AND src1.c1 < '40'
        JOIN (SELECT src.key AS c5, src.value AS c6 FROM src
              WHERE src.key <> '36') src3
          ON src1.c2 = src3.c6
        WHERE src1.c1 <> '31'
          AND (src1.c2 <> 'val_50' OR src1.c1 > '1')
          AND (src2.c3 <> '10' OR src1.c1 <> '10')
          AND (src2.c3 <> '14')
          AND (sqrt(src3.c5) <> 13)
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT src1.c1, src2.c4
        FROM (SELECT key AS c1, value AS c2 FROM src
              WHERE key <> '30') src1
        JOIN (SELECT key AS c3, value AS c4 FROM src
              WHERE key <> '35') src2
          ON src1.c1 = src2.c3 AND src1.c1 < '40'
        JOIN (SELECT key AS c5, value AS c6 FROM src
              WHERE key <> '36') src3
          ON src1.c2 = src3.c6
        WHERE src1.c1 <> '31'
          AND (src1.c2 <> 'val_50' OR src1.c1 > '1')
          AND (src2.c3 <> '10' OR src1.c1 <> '10')
          AND (src2.c3 <> '14')
          AND (sqrt(CAST(src3.c5 AS DOUBLE)) <> 13)
        """,
    )


def test_q_ppd_outer_join1_where_on_both_sides(qenv):
    """ppd_outer_join1.q: WHERE predicates on BOTH sides of a LEFT OUTER
    join — the null-intolerant b-side predicate makes the join
    effectively inner; the optimizer may push, the results must not
    change (that's what the two hive.ppd.remove.duplicatefilters runs
    in the golden pin)."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a LEFT OUTER JOIN src b ON (a.key = b.key)
        WHERE a.key > 10 AND a.key < 20 AND b.key > 15 AND b.key < 25
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a LEFT OUTER JOIN src b ON a.key = b.key
        WHERE CAST(a.key AS DOUBLE) > 10 AND CAST(a.key AS DOUBLE) < 20
          AND CAST(b.key AS DOUBLE) > 15 AND CAST(b.key AS DOUBLE) < 25
        """,
    )


def test_q_ppd_outer_join2_string_comparison_ranges(qenv):
    """ppd_outer_join2.q: RIGHT OUTER variant with STRING-literal range
    comparisons (a.key > '10' is lexicographic, NOT numeric — '2' >
    '15') — the coercion trap the golden exists to pin."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a RIGHT OUTER JOIN src b ON (a.key = b.key)
        WHERE a.key > '10' AND a.key < '20' AND b.key > '15' AND b.key < '25'
        """
    )
    assert_matches_oracle(
        got,
        con,
        """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a RIGHT OUTER JOIN src b ON a.key = b.key
        WHERE a.key > '10' AND a.key < '20'
          AND b.key > '15' AND b.key < '25'
        """,
    )


def test_q_ppd_udf_col_nondeterministic_not_pushed(qenv):
    """ppd_udf_col.q: a rand()-derived column must be evaluated ONCE per
    row — the contradictory inner <=0.1 / outer >0.1 filters can never
    both hold on the same evaluation, so the result is empty regardless
    of pushdown decisions; the deterministic arithmetic variant is
    value-diffed."""
    eng, con, _ = qenv
    got = eng.sql(
        """
        SELECT * FROM (
          SELECT key, randum123
          FROM (SELECT *, cast(rand() AS double) AS randum123
                FROM src WHERE key = 10) a
          WHERE randum123 <= 0.1
        ) s WHERE s.randum123 > 0.1 LIMIT 20
        """
    )
    assert got.count() == 0
    got2 = eng.sql(
        """
        SELECT key, k10 FROM
        (SELECT *, key * 10 AS k10 FROM src WHERE key < 30) a
        WHERE a.k10 <= 200
        """
    )
    assert_matches_oracle(
        got2,
        con,
        """
        SELECT key, CAST(key AS DOUBLE) * 10 AS k10 FROM src
        WHERE CAST(key AS DOUBLE) < 30
          AND CAST(key AS DOUBLE) * 10 <= 200
        """,
    )


def test_q_groupby_multi_single_reducer(qenv):
    """groupby_multi_single_reducer.q: one FROM src fanned out to THREE
    aggregate sinks — per-branch WHERE + GROUP BY with multi-DISTINCT
    aggregates and original-name column qualification (src.key), plus a
    two-key grouped branch with ORDER BY ... LIMIT. The r5 alias fix:
    the shared-scan temp view re-aliases as `src` so the goldens'
    qualified references resolve."""
    eng, con, root = qenv
    spark = eng.spark
    for t in ("dest_g2", "dest_g3", "dest_h2"):
        spark.createDataFrame(
            [], "key string, c1 long, c2 string, c3 double, c4 long"
        ).write.mode("overwrite").parquet(f"{root}/{t}")
        eng.register_table(t, f"{root}/{t}")
    eng.sql(
        """
        FROM src
        INSERT OVERWRITE TABLE dest_g2
          SELECT substr(src.key,1,1),
                 count(DISTINCT substr(src.value,5)),
                 concat(substr(src.key,1,1), sum(substr(src.value,5))),
                 sum(DISTINCT substr(src.value, 5)), count(src.value)
          WHERE substr(src.key,1,1) >= 5 GROUP BY substr(src.key,1,1)
        INSERT OVERWRITE TABLE dest_g3
          SELECT substr(src.key,1,1),
                 count(DISTINCT substr(src.value,5)),
                 concat(substr(src.key,1,1), sum(substr(src.value,5))),
                 sum(DISTINCT substr(src.value, 5)), count(src.value)
          WHERE substr(src.key,1,1) < 5 GROUP BY substr(src.key,1,1)
        INSERT OVERWRITE TABLE dest_h2
          SELECT substr(src.key,1,1) AS c1,
                 count(DISTINCT substr(src.value,5)) AS c2,
                 concat(substr(src.key,1,1), sum(substr(src.value,5)))
                   AS c3,
                 sum(DISTINCT substr(src.value, 5)) AS c4,
                 count(src.value) AS c6
          GROUP BY substr(src.key,1,1), substr(src.key,2,1)
          ORDER BY c1, c2, c3, c4, c6 LIMIT 10
        """
    )
    branch_oracle = """
        SELECT substr(key,1,1) AS key,
               CAST(count(DISTINCT substr(value,5)) AS BIGINT) AS c1,
               substr(key,1,1) ||
                 CAST(SUM(CAST(substr(value,5) AS DOUBLE)) AS VARCHAR)
                 AS c2,
               SUM(DISTINCT CAST(substr(value,5) AS DOUBLE)) AS c3,
               CAST(count(value) AS BIGINT) AS c4
        FROM src WHERE CAST(substr(key,1,1) AS DOUBLE) {cond} 5
        GROUP BY substr(key,1,1)
    """
    assert_matches_oracle(
        eng.sql("SELECT * FROM dest_g2"),
        con,
        branch_oracle.format(cond=">="),
    )
    assert_matches_oracle(
        eng.sql("SELECT * FROM dest_g3"),
        con,
        branch_oracle.format(cond="<"),
    )
    assert_matches_oracle(
        eng.sql("SELECT * FROM dest_h2"),
        con,
        """
        SELECT key, c1, c2, c3, c4 FROM (
          SELECT substr(key,1,1) AS key,
                 CAST(count(DISTINCT substr(value,5)) AS BIGINT) AS c1,
                 substr(key,1,1) ||
                   CAST(SUM(CAST(substr(value,5) AS DOUBLE)) AS VARCHAR)
                   AS c2,
                 SUM(DISTINCT CAST(substr(value,5) AS DOUBLE)) AS c3,
                 CAST(count(value) AS BIGINT) AS c4
          FROM src GROUP BY substr(key,1,1), substr(key,2,1)
          ORDER BY key, c1, c2, c3, c4 LIMIT 10
        ) t
        """,
    )


def test_q_union_remove_1_aggregate_branches(qenv):
    """union_remove_1.q: INSERT OVERWRITE of a UNION ALL of two
    identical group-bys (the union-remove optimization must not dedup
    across branches), read back and diffed."""
    eng, con, root = qenv
    spark = eng.spark
    spark.createDataFrame([], "key string, vals bigint").write.mode(
        "overwrite"
    ).parquet(f"{root}/out_ur1")
    eng.register_table("out_ur1", f"{root}/out_ur1")
    eng.sql(
        """
        INSERT OVERWRITE TABLE out_ur1
        SELECT * FROM (
          SELECT key, count(1) AS vals FROM src GROUP BY key
          UNION ALL
          SELECT key, count(1) AS vals FROM src GROUP BY key
        ) a
        """
    )
    assert_matches_oracle(
        eng.sql("SELECT key, vals FROM out_ur1"),
        con,
        """
        SELECT key, vals FROM (
          SELECT key, CAST(count(1) AS BIGINT) AS vals
          FROM src GROUP BY key
          UNION ALL
          SELECT key, CAST(count(1) AS BIGINT) AS vals
          FROM src GROUP BY key
        ) a
        """,
    )


def test_q_outer_join_ppr_on_vs_where(qenv, spark, tmp_path_factory):
    """outer_join_ppr.q: FULL OUTER src × partitioned srcpart with the
    partition predicate b.ds='2008-04-08' in the ON clause vs in the
    WHERE clause — DIFFERENT results by SQL semantics (ON only
    disqualifies matches, unmatched rows of BOTH sides survive; WHERE
    filters after NULL-extension). The WHERE form lets the optimizer
    collapse the outer join and PRUNE the partition (plan-asserted);
    the ON form cannot prune (every ds must be scanned to emit its
    unmatched rows)."""
    eng, con, _ = qenv
    root = tmp_path_factory.mktemp("ojppr")
    sp = str(root / "srcpart")
    base = spark.table("src") if "src" in [
        t.name for t in spark.catalog.listTables()
    ] else None
    rows = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    df = spark.createDataFrame(rows, "key string, value string")
    for ds in ("2008-04-08", "2008-04-09"):
        df.selectExpr("key", "value", f"'{ds}' AS ds").write.mode(
            "append"
        ).partitionBy("ds").parquet(sp)
    eng.register_table("srcpart", sp, ["ds"])
    con.execute(
        "CREATE OR REPLACE VIEW srcpart AS SELECT * FROM "
        f"read_parquet('{sp}/*/*.parquet', hive_partitioning=1)"
    )
    on_form = """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a FULL OUTER JOIN srcpart b
          ON (a.key = b.key AND b.ds = '2008-04-08')
        WHERE a.key > 10 AND a.key < 20
    """
    where_form = """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a FULL OUTER JOIN srcpart b ON (a.key = b.key)
        WHERE a.key > 10 AND a.key < 20 AND b.ds = '2008-04-08'
    """
    oracle_on = """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a FULL OUTER JOIN srcpart b
          ON a.key = b.key AND b.ds = '2008-04-08'
        WHERE CAST(a.key AS DOUBLE) > 10 AND CAST(a.key AS DOUBLE) < 20
    """
    oracle_where = """
        SELECT a.key AS ak, a.value AS av, b.key AS bk, b.value AS bv
        FROM src a FULL OUTER JOIN srcpart b ON a.key = b.key
        WHERE CAST(a.key AS DOUBLE) > 10 AND CAST(a.key AS DOUBLE) < 20
          AND b.ds = '2008-04-08'
    """
    assert_matches_oracle(eng.sql(on_form), con, oracle_on)
    assert_matches_oracle(eng.sql(where_form), con, oracle_where)
    # pruning: the WHERE form's scan reads ONLY ds=2008-04-08
    from hive_2_3_2_spark.plans import explain_str

    plan = explain_str(eng.sql(where_form))
    assert "ds" in plan and "2008-04-08" in plan
    import re as _re

    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("2008-04-08" in f for f in pf), plan
