"""clientpositive `.q` slice, round 8: the exim family's partition
forms — EXPORT TABLE ... PARTITION (full and PARTIAL specs) and
re-IMPORT of the partition subset (reference:
ql/src/test/queries/clientpositive/exim_04_all_part.q,
exim_09_part_spec_nonoverlap.q)."""

from __future__ import annotations

import os

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture()
def emp(spark, tmp_path):
    eng = Engine(spark=spark)
    rows = [(i, c, s) for i in range(6)
            for c in ("in", "us") for s in ("tn", "ka")]
    p = str(tmp_path / "exim_employee")
    (spark.createDataFrame(
        rows, "emp_id int, emp_country string, emp_state string")
        .repartition("emp_country", "emp_state")
        .write.partitionBy("emp_country", "emp_state").parquet(p))
    eng.register_table("exim_employee", p, ["emp_country", "emp_state"])
    return eng


def test_q_exim_partition_spec_export_import(emp, tmp_path):
    """Full-spec export carries ONE partition; the import registers
    exactly that partition."""
    eng = emp
    exp = str(tmp_path / "exp_one")
    n = eng.sql(
        f"EXPORT TABLE exim_employee PARTITION (emp_country='in', "
        f"emp_state='tn') TO '{exp}'"
    ).collect()[0][0]
    assert n == 6
    assert os.path.isdir(os.path.join(exp, "data", "emp_country=in",
                                      "emp_state=tn"))
    assert not os.path.isdir(os.path.join(exp, "data", "emp_country=us"))
    eng.sql(f"IMPORT TABLE exim_imported FROM '{exp}'")
    parts = [r[0] for r in
             eng.sql("SHOW PARTITIONS exim_imported").collect()]
    assert parts == ["emp_country=in/emp_state=tn"]
    assert eng.sql(
        "SELECT count(*) AS c FROM exim_imported"
    ).collect()[0].c == 6


def test_q_exim_partial_spec_export(emp, tmp_path):
    """PARTIAL spec (country only) exports every matching state
    (exim_09's nonoverlap surface)."""
    eng = emp
    exp = str(tmp_path / "exp_country")
    n = eng.sql(
        f"EXPORT TABLE exim_employee PARTITION (emp_country='in') "
        f"TO '{exp}'"
    ).collect()[0][0]
    assert n == 12
    assert sorted(os.listdir(os.path.join(exp, "data", "emp_country=in"))) \
        == ["emp_state=ka", "emp_state=tn"]
    eng.sql(f"IMPORT TABLE exim_in FROM '{exp}'")
    parts = sorted(
        r[0] for r in eng.sql("SHOW PARTITIONS exim_in").collect()
    )
    assert parts == ["emp_country=in/emp_state=ka",
                     "emp_country=in/emp_state=tn"]


def test_q_exim_bad_partition_spec_errors(emp, tmp_path):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    eng = emp
    with pytest.raises(HiveQLUnsupportedError, match="no partition"):
        eng.sql(
            f"EXPORT TABLE exim_employee PARTITION (emp_country='xx') "
            f"TO '{tmp_path}/exp_bad'"
        )
