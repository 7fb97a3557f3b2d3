"""clientpositive `.q` slice, round 8: add_part_exist.q — ADD
PARTITION guards and the MULTI-SPEC form (reference:
ql/src/test/queries/clientpositive/add_part_exist.q)."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError


@pytest.fixture()
def eng(spark, tmp_path):
    eng = Engine(spark=spark)
    p = str(tmp_path / "add_part_test")
    spark.createDataFrame(
        [("k", "v", "seed")], "key string, value string, ds string"
    ).write.partitionBy("ds").parquet(p)
    eng.register_table("add_part_test", p, ["ds"])
    return eng


def _parts(eng):
    return sorted(
        r[0] for r in eng.sql("SHOW PARTITIONS add_part_test").collect()
    )


def test_q_add_part_exist(eng):
    eng.sql("ALTER TABLE add_part_test ADD PARTITION (ds='2010-01-01')")
    assert "ds=2010-01-01" in _parts(eng)
    # un-guarded duplicate ADD errors; guarded is a no-op
    with pytest.raises(HiveQLUnsupportedError, match="already exists"):
        eng.sql(
            "ALTER TABLE add_part_test ADD PARTITION (ds='2010-01-01')"
        )
    eng.sql(
        "ALTER TABLE add_part_test ADD IF NOT EXISTS "
        "PARTITION (ds='2010-01-01')"
    )
    # the multi-spec form: one statement, three partitions
    eng.sql(
        "ALTER TABLE add_part_test ADD IF NOT EXISTS "
        "PARTITION (ds='2010-01-01') PARTITION (ds='2010-01-02') "
        "PARTITION (ds='2010-01-03')"
    )
    assert {"ds=2010-01-01", "ds=2010-01-02", "ds=2010-01-03"} <= set(
        _parts(eng)
    )
    # multi-spec DROP removes both
    eng.sql(
        "ALTER TABLE add_part_test DROP IF EXISTS "
        "PARTITION (ds='2010-01-02'), PARTITION (ds='2010-01-03')"
    )
    got = _parts(eng)
    assert "ds=2010-01-02" not in got and "ds=2010-01-03" not in got
