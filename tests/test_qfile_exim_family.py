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


def test_q_exim_08_import_under_new_name(emp, tmp_path):
    """exim_08_nonpart_rename.q: IMPORT TABLE <other_name> FROM dir
    registers the export under the new name."""
    out = str(tmp_path / "exp8")
    emp.sql(f"EXPORT TABLE exim_employee TO '{out}'")
    emp.sql(f"IMPORT TABLE exim_imported_emp FROM '{out}'")
    assert emp.sql(
        "select count(*) as n from exim_imported_emp"
    ).collect()[0].n == 24


def test_q_exim_03_import_from_without_table_name(emp, spark, tmp_path):
    """exim_03_nonpart_over_compat.q: `import from 'dir'` takes the
    table name from the export metadata; importing into an existing
    COMPATIBLE table appends the exported files."""
    eng = emp
    src = str(tmp_path / "dept")
    rows = [(i,) for i in range(1, 7)]
    spark.createDataFrame(rows, "dep_id int").coalesce(1).write.parquet(src)
    eng.register_table("exim_department", src)
    out = str(tmp_path / "exp3")
    eng.sql(f"EXPORT TABLE exim_department TO '{out}'")
    # fresh EMPTY compatible table under the same name (the importer-db
    # side of the golden), then `import from` — appends
    dst = str(tmp_path / "dept2")
    spark.createDataFrame([], "dep_id int").write.parquet(dst)
    eng.register_table("exim_department", dst)
    eng.sql(f"IMPORT FROM '{out}'")
    got = sorted(
        r.dep_id for r in eng.sql(
            "select dep_id from exim_department").collect()
    )
    assert got == [1, 2, 3, 4, 5, 6]
    # importing AGAIN appends again (Hive's import is a file copy)
    eng.sql(f"IMPORT FROM '{out}'")
    assert eng.sql(
        "select count(*) as n from exim_department").collect()[0].n == 12


def test_q_exim_09_nonoverlapping_partitions_merge(emp, spark, tmp_path):
    """exim_09_part_spec_nonoverlap.q: importing a partition subset
    into an existing partitioned table adds only the NEW partitions;
    an overlapping partition is the typed 'Partition already
    exists'."""
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    eng = emp
    out = str(tmp_path / "exp9")
    eng.sql(
        f"EXPORT TABLE exim_employee PARTITION (emp_country='in') "
        f"TO '{out}'"
    )
    # target with only the us partitions
    dst = str(tmp_path / "emp_us")
    rows = [(i, "us", s) for i in range(6) for s in ("tn", "ka")]
    (spark.createDataFrame(
        rows, "emp_id int, emp_country string, emp_state string")
        .write.partitionBy("emp_country", "emp_state").parquet(dst))
    eng.register_table(
        "exim_employee", dst, ["emp_country", "emp_state"]
    )
    eng.sql(f"IMPORT TABLE exim_employee FROM '{out}'")
    got = {
        (r.emp_country, r.emp_state, r.n)
        for r in eng.sql(
            "select emp_country, emp_state, count(*) as n "
            "from exim_employee group by emp_country, emp_state"
        ).collect()
    }
    assert got == {("in", "tn", 6), ("in", "ka", 6),
                   ("us", "tn", 6), ("us", "ka", 6)}
    with pytest.raises(HiveQLUnsupportedError, match="already exist"):
        eng.sql(f"IMPORT TABLE exim_employee FROM '{out}'")


def test_q_exim_schema_mismatch_typed_error(emp, spark, tmp_path):
    """ImportSemanticAnalyzer checkTable: importing into an existing
    table whose schema differs is 'table exists and schema does not
    match' — never a silent append of mismatched files."""
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    eng = emp
    out = str(tmp_path / "expm")
    eng.sql(f"EXPORT TABLE exim_employee TO '{out}'")
    other = str(tmp_path / "other")
    spark.createDataFrame([("x",)], "name string").write.parquet(other)
    eng.register_table("exim_other", other)
    with pytest.raises(HiveQLUnsupportedError, match="do(es)? not match"):
        eng.sql(f"IMPORT TABLE exim_other FROM '{out}'")
