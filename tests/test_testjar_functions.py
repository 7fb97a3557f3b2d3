"""CREATE TEMPORARY FUNCTION accepts the reference TEST-JAR class
names (engine._TEST_JAR_CLASSES → functions/test_jar_udfs.py).

Reference classes (behavior replicated, see the module docstring):
itests/util/src/main/java/org/apache/hadoop/hive/ql/udf/
UDFTestLength.java, UDFTestLength2.java, UDAFTestMax.java,
generic/GenericUDAFSumList.java, generic/GenericUDFTestGetJavaString
.java; contrib/src/java/org/apache/hadoop/hive/contrib/udtf/example/
GenericUDTFCount2.java; itests/custom-udfs/udf-vectorized-badexample/
src/main/java/hive/it/custom/udfs/GenericUDFRot13.java.

Deliberately does NOT name the golden query files: the value sweep
(tools/qfile_value_sweep.py) replays those end-to-end vs DuckDB now
that it executes CREATE TEMPORARY FUNCTION preludes."""

from __future__ import annotations

import pytest

from hive_2_3_2_spark.engine import Engine


@pytest.fixture(scope="module")
def feng(spark):
    eng = Engine(spark=spark)
    spark.createDataFrame(
        [(str(i % 83), f"val_{i % 83}") for i in range(500)],
        "key string, value string",
    ).createOrReplaceTempView("tj_src")
    return eng


def test_testlength_both_variants(feng):
    feng.sql("CREATE TEMPORARY FUNCTION testlength AS "
             "'org.apache.hadoop.hive.ql.udf.UDFTestLength'")
    feng.sql("CREATE TEMPORARY FUNCTION testlength2 AS "
             "'org.apache.hadoop.hive.ql.udf.UDFTestLength2'")
    rows = feng.sql(
        "SELECT testlength(value) AS a, testlength2(value) AS b "
        "FROM tj_src WHERE key = '7'"
    ).collect()
    assert all((r.a, r.b) == (5, 5) for r in rows) and rows


def test_test_max_aliases_builtin_max_all_overloads(feng):
    """UDAFTestMax = max over every primitive overload — registered as
    a builtin alias so smallint/bigint/double/float/string all work."""
    feng.sql("CREATE TEMPORARY FUNCTION test_max AS "
             "'org.apache.hadoop.hive.ql.udf.UDAFTestMax'")
    r = feng.sql(
        "SELECT test_max(length(value)) AS a, "
        "test_max(CAST(length(value) AS DOUBLE)) AS b, "
        "test_max(substr(value,5)) AS c FROM tj_src"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (6, 6.0, "9")


def test_sum_list_sums_every_element(feng):
    feng.sql("create temporary function sum_list as "
             "'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFSumList'")
    got = feng.sql(
        "select sum_list(array(key, key)) AS s from tj_src"
    ).collect()[0].s
    expect = sum(2 * (i % 83) for i in range(500))
    assert got == expect


def test_udtf_count2_emits_global_count_twice(feng):
    feng.sql(
        "create temporary function udtfCount2 as "
        "'org.apache.hadoop.hive.contrib.udtf.example.GenericUDTFCount2'"
    )
    rows = feng.sql("select udtfCount2() from tj_src").collect()
    assert [tuple(r) for r in rows] == [(500,), (500,)]


def test_rot13_and_get_java_string(feng):
    feng.sql("CREATE TEMPORARY FUNCTION rot13 as "
             "'hive.it.custom.udfs.GenericUDFRot13'")
    feng.sql(
        "CREATE TEMPORARY FUNCTION test_udf_get_java_string AS "
        "'org.apache.hadoop.hive.ql.udf.generic."
        "GenericUDFTestGetJavaString'"
    )
    r = feng.sql("SELECT rot13('Hello') AS r").collect()[0].r
    assert r == "Uryyb"
    n = feng.sql(
        'select count(*) as n from tj_src '
        'where value = test_udf_get_java_string("val_66")'
    ).collect()[0].n
    assert n == 6  # 66 appears for i in {66, 149, 232, 315, 398, 481}


def test_unknown_test_class_still_typed_error(feng):
    from hive_2_3_2_spark.engine import HiveQLUnsupportedError

    with pytest.raises(HiveQLUnsupportedError):
        feng.sql("CREATE TEMPORARY FUNCTION nope AS "
                 "'org.apache.hadoop.hive.ql.udf.UDFNotAThing'")
