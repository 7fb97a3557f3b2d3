"""Variable substitution matrix — VariableSubstitution /
SystemVariables parity (reference
common/src/java/org/apache/hadoop/hive/conf/VariableSubstitution.java:26,
SystemVariables.java:48-120; SetProcessor.java system-property writes),
replaying set_variable_sub.q's shapes:

- ``${hivevar:x}`` / ``${hiveconf:x}`` / bare ``${x}`` from SET state;
- ``${system:x}`` from the emulated JVM/QTestUtil property map
  (user.name, java.io.tmpdir, hive.version, test.tmp.dir — the
  properties QTestUtil seeds before every golden run), writable via
  ``SET system:x=y``;
- ``${env:X}`` from the process environment (read-only — SetProcessor
  rejects env: writes);
- NESTED spellings ``${hivevar:${hivevar:b}}`` resolve inside-out, up
  to hive.variable.substitute.depth (default 40);
- hive.variable.substitute=false turns the whole machinery off.

Deliberate divergence (pinned): unbound names raise a typed error where
Hive appends the literal text as-is (SystemVariables.java:105) — the
literal would fail parse later with a worse message.
"""

from __future__ import annotations

import os

import pytest

from hive_2_3_2_spark.engine import Engine, HiveQLUnsupportedError


@pytest.fixture()
def eng(spark):
    return Engine(spark=spark)


def test_hivevar_set_and_reference(eng):
    """set_variable_sub.q head: set hivevar:key1=value1 then both the
    bare and the prefixed spellings substitute."""
    eng.sql("set hivevar:key1=value1")
    assert eng.sql("SELECT '${key1}' AS v").collect()[0].v == "value1"
    assert (
        eng.sql("SELECT '${hivevar:key1}' AS v").collect()[0].v
        == "value1"
    )


def test_nested_substitution_resolves_inside_out(eng):
    """set_variable_sub.q: set hivevar:a=1; set hivevar:b=a;
    set hivevar:c=${hivevar:${hivevar:b}} → c=1 (the inner match
    rewrites first — SystemVariables' varPat excludes $ inside the
    braces, so only innermost references match per pass)."""
    eng.sql("set hivevar:a=1")
    eng.sql("set hivevar:b=a")
    eng.sql("set hivevar:c=${hivevar:${hivevar:b}}")
    assert eng.sql("SELECT '${hivevar:c}' AS v").collect()[0].v == "1"


def test_substitution_depth_guard(eng):
    """A self-referential variable exhausts the depth budget with the
    reference's error text instead of looping."""
    eng.hiveconf["selfref"] = "${selfref}"
    with pytest.raises(HiveQLUnsupportedError, match="depth"):
        eng.sql("SELECT '${selfref}' AS v")


def test_system_namespace_reads_and_writes(eng):
    """${system:...} resolves the emulated JVM property map; SET
    system:x=y writes it (SetProcessor calls
    System.getProperties().setProperty); SET system:x reads it back."""
    assert (
        eng.sql("SELECT '${system:hive.version}' AS v").collect()[0].v
        == "2.3.2"
    )
    sep = eng.sql("SELECT '${system:file.separator}' AS v").collect()[0].v
    assert sep == os.sep
    eng.sql("SET system:my.prop=hello")
    assert (
        eng.sql("SELECT '${system:my.prop}' AS v").collect()[0].v
        == "hello"
    )
    row = eng.sql("SET system:my.prop").collect()[0]
    assert (row.name, row.value) == ("system:my.prop", "hello")
    with pytest.raises(HiveQLUnsupportedError, match="system"):
        eng.sql("SELECT '${system:definitely.unbound.prop}' AS v")


def test_qtestutil_harness_properties_seeded(eng):
    """The reference corpus reads ${system:test.tmp.dir} in 357
    statements (QTestUtil seeds it) — the emulated map pre-seeds it
    with a real writable directory."""
    tmp = eng.sql("SELECT '${system:test.tmp.dir}' AS v").collect()[0].v
    assert os.path.isdir(tmp)
    uri = eng.sql(
        "SELECT '${system:test.tmp.dir.uri}' AS v"
    ).collect()[0].v
    assert uri == "file://" + tmp


def test_env_namespace_read_only(eng):
    os.environ["HIVE232_SUB_TEST"] = "zz"
    try:
        assert (
            eng.sql("SELECT '${env:HIVE232_SUB_TEST}' AS v")
            .collect()[0].v
            == "zz"
        )
    finally:
        del os.environ["HIVE232_SUB_TEST"]
    with pytest.raises(HiveQLUnsupportedError, match="env"):
        eng.sql("SET env:HIVE232_SUB_TEST=nope")


def test_substitution_in_real_statement_positions(eng, spark):
    """Substitution is pure text (SystemVariables.substitute) — it
    reaches identifiers, LIMIT counts, and WHERE literals alike."""
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).createOrReplaceTempView("subst_t")
    eng.sql("set hivevar:tbl=subst_t")
    eng.sql("set hivevar:lim=2")
    eng.sql("set hivevar:needle=b")
    assert len(
        eng.sql("SELECT k FROM ${tbl} ORDER BY k LIMIT ${lim}").collect()
    ) == 2
    got = eng.sql(
        "SELECT k FROM ${hivevar:tbl} WHERE v = '${needle}'"
    ).collect()
    assert [r.k for r in got] == [2]
    spark.catalog.dropTempView("subst_t")


def test_substitute_off_passes_text_through(eng):
    eng.sql("set hive.variable.substitute=false")
    try:
        v = eng.sql("SELECT '${anything.goes}' AS v").collect()[0].v
        assert v == "${anything.goes}"
    finally:
        eng.sql("set hive.variable.substitute=true")
