"""The group-by-constant / position-alias matrix under BOTH settings
of hive.groupby.orderby.position.alias (reference default: false,
HiveConf.java HIVE_GROUPBY_ORDERBY_POSITION_ALIAS) — and the SPLIT
confs Hive 2.3 actually dispatches on (processPositionAlias,
SemanticAnalyzer.java:12743-12748): hive.groupby.position.alias
(default false) and hive.orderby.position.alias (default TRUE — ORDER
BY ordinals by default, which is exactly Spark's orderByOrdinal).

Reference: ql/src/test/queries/clientpositive/constGby.q (alias OFF —
bare GROUP BY integers are constants; over the empty t1 every
group-by-constant select returns ZERO rows while the plain counts
return 0) and groupby_position.q (alias ON — positions resolve to
select items in FROM-first multi-inserts, subqueries, and joins).

r12 additions: the per-ITEM semantics — processPositionAlias walks
each Number node individually, so a MIXED list ('group by 1, value')
turns only the integer into a constant with the alias off; SORT BY is
absent from processPositionAlias entirely, so its integers are ALWAYS
constants.
"""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine

SRC_ROWS = [
    ("0", "val_0"), ("0", "val_0"), ("0", "val_0"),
    ("2", "val_2"), ("4", "val_4"), ("5", "val_5"), ("5", "val_5"),
    ("8", "val_8"), ("9", "val_9"), ("10", "val_10"), ("11", "val_11"),
    ("15", "val_15"), ("17", "val_17"), ("19", "val_19"),
    ("100", "val_100"), ("238", "val_238"),
]


@pytest.fixture()
def eng(spark):
    e = Engine(spark=spark)
    spark.createDataFrame(
        SRC_ROWS, "key string, value string"
    ).createOrReplaceTempView("src_gbp")
    yield e
    e.sql("set hive.groupby.orderby.position.alias=false")
    spark.catalog.dropTempView("src_gbp")


def test_constgby_empty_table_matrix(eng, spark):
    """constGby.q's exact statements over the empty t1 — group-by-
    constant selects return NO rows, the plain counts return 0."""
    spark.sql("DROP TABLE IF EXISTS t1_constgby")
    eng.sql("create table t1_constgby (a int)")
    try:
        assert eng.sql(
            "select count(1) from t1_constgby group by 1"
        ).collect() == []
        assert eng.sql(
            "select count(1) from t1_constgby"
        ).collect()[0][0] == 0
        assert eng.sql(
            "select count(*) from t1_constgby"
        ).collect()[0][0] == 0
        assert eng.sql(
            "select count(1) from t1_constgby group by 1=1"
        ).collect() == []
        assert eng.sql(
            "select count(1), max(a) from t1_constgby group by 1=1"
        ).collect() == []
    finally:
        spark.sql("DROP TABLE IF EXISTS t1_constgby")


def test_alias_off_bare_ordinal_is_constant(eng):
    # one global bucket over a non-empty table
    assert eng.sql(
        "select count(1) from src_gbp group by 1"
    ).collect()[0][0] == len(SRC_ROWS)
    # multiple constants — still one bucket
    assert eng.sql(
        "select count(1) from src_gbp group by 1, 2"
    ).collect()[0][0] == len(SRC_ROWS)


def test_alias_off_ungrouped_column_errors_like_hive(eng):
    """Hive raises 'Expression not in GROUP BY key' here; the constant
    interpretation surfaces Spark's MISSING_AGGREGATION — same class,
    instead of the silent ordinal success the r10 engine had."""
    with pytest.raises(Exception, match="MISSING_AGGREGATION"):
        eng.sql(
            "select key, count(*) from src_gbp group by 1"
        ).collect()
    with pytest.raises(Exception, match="MISSING_AGGREGATION"):
        eng.sql("select key from src_gbp group by 1").collect()


def test_alias_off_mixed_list_integer_is_constant(eng):
    """Mixed GROUP BY list, alias OFF: 'group by 1, value' groups by
    (const, value) — selecting key surfaces the not-grouped error
    class (previously Spark silently grouped by (key, value))."""
    with pytest.raises(Exception, match="MISSING_AGGREGATION"):
        eng.sql(
            "select key, value, count(*) from src_gbp group by 1, value"
        ).collect()
    # integer in SECOND position, same rule
    with pytest.raises(Exception, match="MISSING_AGGREGATION"):
        eng.sql(
            "select key, value, count(*) from src_gbp group by key, 2"
        ).collect()
    # grouping by the real column plus a constant works and yields
    # the per-column groups
    got = sorted(
        tuple(r) for r in eng.sql(
            "select key, count(*) from src_gbp group by key, 2"
        ).collect()
    )
    assert len(got) == len({k for k, _ in SRC_ROWS})


def test_alias_on_mixed_list_resolves_positions(eng, spark):
    """Split conf: hive.groupby.position.alias=true resolves the
    integer inside a mixed list to its select item."""
    eng.sql("set hive.groupby.position.alias=true")
    try:
        got = sorted(
            tuple(r) for r in eng.sql(
                "select key, value, count(*) from src_gbp "
                "group by 1, value"
            ).collect()
        )
        want = sorted(
            tuple(r) for r in spark.sql(
                "select key, value, count(*) from src_gbp "
                "group by key, value"
            ).collect()
        )
        assert got == want and len(got) > 1
    finally:
        eng.sql("set hive.groupby.position.alias=false")


def test_sortby_integer_always_constant_in_matrix(eng):
    """TOK_SORTBY is absent from processPositionAlias — SORT BY 1 is a
    constant under EVERY conf combination (no-op per-partition sort,
    full result set back)."""
    for conf in (
        "set hive.groupby.orderby.position.alias=true",
        "set hive.groupby.orderby.position.alias=false",
    ):
        eng.sql(conf)
        rows = eng.sql("select key from src_gbp sort by 1").collect()
        assert len(rows) == len(SRC_ROWS)


def test_orderby_split_conf_matrix(eng):
    """hive.orderby.position.alias default TRUE → ordinal; explicitly
    false → constant (no-op, every row still returned)."""
    got = [
        r.key for r in eng.sql(
            "select key from src_gbp order by 1 limit 3"
        ).collect()
    ]
    assert got == sorted((k for k, _ in SRC_ROWS))[:3]
    eng.sql("set hive.orderby.position.alias=false")
    try:
        rows = eng.sql("select key from src_gbp order by 1").collect()
        assert len(rows) == len(SRC_ROWS)
    finally:
        eng.sql("set hive.orderby.position.alias=true")


def test_alias_on_positions_resolve_to_select_items(eng, spark):
    eng.sql("set hive.groupby.orderby.position.alias=true")
    got = sorted(
        tuple(r) for r in eng.sql(
            "SELECT key, COUNT(DISTINCT SUBSTR(value, 5)) "
            "FROM src_gbp WHERE key < 20 GROUP BY 1"
        ).collect()
    )
    want = sorted(
        tuple(r) for r in spark.sql(
            "SELECT key, COUNT(DISTINCT SUBSTR(value, 5)) "
            "FROM src_gbp WHERE key < 20 GROUP BY key"
        ).collect()
    )
    assert got == want and len(got) > 1
    # two positions, reversed order (groupby_position.q's GROUP BY 2,1)
    got2 = sorted(
        tuple(r) for r in eng.sql(
            "SELECT key, value, COUNT(1) FROM src_gbp "
            "WHERE key < 20 GROUP BY 2, 1"
        ).collect()
    )
    want2 = sorted(
        tuple(r) for r in spark.sql(
            "SELECT key, value, COUNT(1) FROM src_gbp "
            "WHERE key < 20 GROUP BY value, key"
        ).collect()
    )
    assert got2 == want2


def test_alias_on_subquery_position(eng, spark):
    """groupby_position.q's subquery shape: GROUP BY 1 inside a
    derived table, ORDER BY positions outside."""
    eng.sql("set hive.groupby.orderby.position.alias=true")
    got = [
        tuple(r) for r in eng.sql(
            "SELECT t.key, t.value FROM (SELECT b.key as key, "
            "count(1) as value FROM src_gbp b WHERE b.key <= 20 "
            "GROUP BY 1) t ORDER BY 2 DESC, 1 ASC"
        ).collect()
    ]
    want = [
        tuple(r) for r in spark.sql(
            "SELECT t.key, t.value FROM (SELECT b.key as key, "
            "count(1) as value FROM src_gbp b WHERE b.key <= 20 "
            "GROUP BY b.key) t ORDER BY t.value DESC, t.key ASC"
        ).collect()
    ]
    assert got == want and len(got) > 1


def test_alias_on_aggregate_position_still_errors(eng):
    """With the conf ON, a position landing on an aggregate errors in
    Hive too ('position refers to an aggregate') — the engine must NOT
    silently rewrite it to a constant."""
    eng.sql("set hive.groupby.orderby.position.alias=true")
    with pytest.raises(Exception, match="GROUP_BY_POS_AGGREGATE"):
        eng.sql(
            "select key, count(*) from src_gbp group by 2"
        ).collect()


def test_alias_off_from_first_multi_insert_constant(eng, spark):
    """A FROM-first INSERT body's GROUP BY integer is a constant under
    the default conf as well (the rewrite runs before dispatch)."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "gbp_sink")
    spark.createDataFrame(
        [], "c bigint"
    ).write.parquet(p)
    eng.register_table("gbp_sink", p)
    eng.sql(
        "FROM src_gbp INSERT OVERWRITE TABLE gbp_sink "
        "SELECT count(1) GROUP BY 1"
    )
    assert [tuple(r) for r in eng.sql(
        "select * from gbp_sink"
    ).collect()] == [(len(SRC_ROWS),)]
