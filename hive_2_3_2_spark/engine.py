"""Engine facade — the single entry point a reference user would switch to.

Collapses the reference's three front-ends (CLI ``CliDriver.java:94``,
HiveServer2 ``SQLOperation.java:91``, programmatic ``Driver.java:1371``;
SURVEY.md §3) into one in-process API:

    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM lineitem ...")     # HiveQL-compatible SQL
    eng.table("lineitem")                        # DataFrame handle

Spark's SQL parser natively accepts the Hive dialect the reference's ANTLR
grammar defines (parse/HiveParser.g) — LATERAL VIEW, DISTRIBUTE/SORT/
CLUSTER BY, GROUPING SETS, TRANSFORM — so ``sql()`` is a direct pass-through
plus a tiny rewriter for the few Hive-isms Spark rejects.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hive_2_3_2_spark.catalog import register_star_schema
from hive_2_3_2_spark.session import get_spark


class HiveQLUnsupportedError(NotImplementedError):
    """A HiveQL construct this engine deliberately does not emulate —
    raised with a precise reason instead of letting Spark produce a
    generic parse/analysis error (or, worse, silently wrong rows)."""


# Hive: FROM t TABLESAMPLE(BUCKET x OUT OF y ON col) [alias]
#   → inline filtered subquery with a deterministic modulo predicate
#   (genSamplePredicate, parse/SemanticAnalyzer.java:10268). Hive's bucket
#   hash of an integral column IS the value (ObjectInspectorUtils.hashCode),
#   so pmod(col, y) = x-1 reproduces Hive's exact bucket row set for int
#   keys. Non-integral keys use Java String.hashCode — NOT reproduced;
#   Engine.sql raises HiveQLUnsupportedError rather than silently
#   returning a different row set. The subquery form (rather than an
#   appended WHERE) stays valid with existing WHERE clauses, aliases and
#   following joins.
_TABLESAMPLE = re.compile(
    r"([\w.]+)\s+TABLESAMPLE\s*\(\s*BUCKET\s+(\d+)\s+OUT\s+OF\s+(\d+)"
    r"\s+ON\s+([\w.]+)\s*\)(\s+(?:AS\s+)?(?!WHERE|GROUP|ORDER|JOIN|ON|LEFT|"
    r"RIGHT|FULL|INNER|CROSS|UNION|LIMIT|HAVING\b)(\w+))?",
    re.IGNORECASE,
)

_INTEGRAL_TYPES = {"byte", "short", "int", "integer", "long", "bigint",
                   "smallint", "tinyint"}


def _rewrite_tablesample(m: re.Match[str], col_type: str | None = None) -> str:
    table, x, y, col = m.group(1), m.group(2), m.group(3), m.group(4)
    alias = m.group(6) or table.split(".")[-1]
    bare_col = col.split(".")[-1]
    if col_type == "string":
        # Hive buckets strings with the signed-UTF-8-byte fold
        # (ObjectInspectorUtils.hashCode:673) then
        # (hash & Integer.MAX_VALUE) % y (getBucketNumber:625) —
        # hive_bucket_hash reproduces the fold exactly.
        pred = f"(hive_bucket_hash({bare_col}) & 2147483647) % {y} = {int(x) - 1}"
    else:
        pred = f"pmod({bare_col}, {y}) = {int(x) - 1}"
    return f"(SELECT * FROM {table} WHERE {pred}) {alias}"


# Other Hive-isms Spark's parser rejects → portable rewrites. Kept
# deliberately small: almost all of HiveQL parses natively in Spark SQL.
_REWRITES: list[tuple[re.Pattern[str], str]] = [
    # Hive virtual columns (parse/VirtualColumn.java): INPUT__FILE__NAME
    # maps 1:1 to Spark's input_file_name(). BLOCK__OFFSET__INSIDE__FILE /
    # ROW__OFFSET__INSIDE__BLOCK have no parquet-scan equivalent in Spark
    # (the closest row-identity primitive is monotonically_increasing_id,
    # a different contract) — HiveQLUnsupportedError below.
    (
        re.compile(r"\bINPUT__FILE__NAME\b", re.IGNORECASE),
        "input_file_name()",
    ),
]

_UNSUPPORTED_VIRTUAL = re.compile(
    r"\b(BLOCK__OFFSET__INSIDE__FILE|ROW__OFFSET__INSIDE__BLOCK)\b",
    re.IGNORECASE,
)


# SQL-string DML front-end (reference: parse/UpdateDeleteSemanticAnalyzer
# .java:62 UPDATE, :80 DELETE — both compile to rewrites). Spark only
# parses DELETE/UPDATE for v2 catalogs, so the Engine intercepts the two
# statements and routes them to the staged-rewrite helpers in
# sources/writers.py. MERGE stays API-level (sources/writers.merge_upsert)
# — its multi-clause grammar isn't worth a regex front-end.
_DELETE_STMT = re.compile(
    r"^\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_STMT = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_assignments(s: str) -> list[tuple[str, str]]:
    """Split ``a = expr1, b = expr2`` on top-level commas only (commas
    inside function-call parens belong to the expression)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        col, _, expr = p.partition("=")
        if not _:
            raise HiveQLUnsupportedError(
                f"malformed SET assignment: {p.strip()!r}"
            )
        out.append((col.strip(), expr.strip()))
    return out


class Engine:
    """A session + catalog bound to a data directory."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str | None = None,
    ) -> None:
        self.spark = spark or get_spark()
        self.tables: dict[str, DataFrame] = {}
        self.table_paths: dict[str, str] = {}
        self.table_partitions: dict[str, list[str]] = {}
        if sf_dir is not None:
            self.tables = register_star_schema(self.spark, sf_dir)
            import os

            for name in self.tables:
                self.table_paths[name] = os.path.join(
                    sf_dir, f"{name}.parquet"
                )

    def register_table(
        self,
        name: str,
        path: str,
        partition_cols: list[str] | None = None,
    ) -> DataFrame:
        """Register a writable parquet table: a temp view for reads plus
        the path/partition metadata the DML front-end needs."""
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        self.table_paths[name] = path
        if partition_cols:
            self.table_partitions[name] = list(partition_cols)
        return df

    def _resolve_dml_table(self, name: str) -> str:
        key = name.split(".")[-1].lower()
        if key not in self.table_paths:
            raise HiveQLUnsupportedError(
                f"DML target {name!r} is not a path-backed table this "
                "Engine registered (register_table(name, path) first)"
            )
        return key

    def sql(self, query: str) -> DataFrame:
        """Run HiveQL-compatible SQL (reference entry:
        ql/src/java/org/apache/hadoop/hive/ql/Driver.java:1371 ``run``).
        SELECT/DQL passes through (plus the HiveQL rewrites); DELETE and
        UPDATE route to the staged-rewrite DML helpers and return a
        1-row (rows_affected) DataFrame like a CLI row count."""
        from pyspark.sql import functions as F

        m = _DELETE_STMT.match(query)
        if m:
            from hive_2_3_2_spark.sources.writers import delete_where

            key = self._resolve_dml_table(m.group(1))
            cond = F.expr(m.group(2)) if m.group(2) else F.lit(True)
            path = self.table_paths[key]
            parts = self.table_partitions.get(key)
            affected = (
                self.spark.read.parquet(path)
                .filter(F.coalesce(cond, F.lit(False)))
                .count()
            )
            delete_where(self.spark, path, cond, parts)
            self.register_table(key, path, parts)
            return self.spark.createDataFrame(
                [(affected,)], "rows_affected bigint"
            )
        m = _UPDATE_STMT.match(query)
        if m:
            from hive_2_3_2_spark.sources.writers import update_where

            key = self._resolve_dml_table(m.group(1))
            sets = {
                col: F.expr(expr)
                for col, expr in _split_assignments(m.group(2))
            }
            cond = F.expr(m.group(3)) if m.group(3) else F.lit(True)
            path = self.table_paths[key]
            parts = self.table_partitions.get(key)
            affected = (
                self.spark.read.parquet(path)
                .filter(F.coalesce(cond, F.lit(False)))
                .count()
            )
            update_where(self.spark, path, sets, cond, parts)
            self.register_table(key, path, parts)
            return self.spark.createDataFrame(
                [(affected,)], "rows_affected bigint"
            )
        return self.spark.sql(rewrite_hiveql(query, spark=self.spark))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def explain(self, query: str) -> str:
        """Formatted physical plan (reference: exec/ExplainTask.java:117).
        Uses the portable stdout-capture path (works under Spark Connect
        too), not private py4j internals."""
        from hive_2_3_2_spark.plans import explain_str

        return explain_str(self.sql(query))


def rewrite_hiveql(query: str, spark: SparkSession | None = None) -> str:
    """Apply the (small) set of HiveQL→Spark SQL rewrites.

    When a ``spark`` session is provided, TABLESAMPLE(BUCKET ... ON col)
    bucket columns are type-checked against the catalog: Hive buckets
    non-integral keys with Java String.hashCode, which pmod does not
    reproduce, so those raise HiveQLUnsupportedError instead of silently
    returning a different row set than Hive.
    """
    un = _UNSUPPORTED_VIRTUAL.search(query)
    if un:
        raise HiveQLUnsupportedError(
            f"virtual column {un.group(1)} has no Spark parquet-scan "
            "equivalent (row-identity inside a file block); use "
            "INPUT__FILE__NAME or monotonically_increasing_id() depending "
            "on intent"
        )
    col_types: dict[int, str | None] = {}
    if spark is not None:
        for m in _TABLESAMPLE.finditer(query):
            table, col = m.group(1), m.group(4).split(".")[-1]
            try:
                schema = spark.table(table).schema
            except Exception:
                continue  # unregistered table — cannot resolve, let it run
            for f in schema.fields:
                if f.name.lower() == col.lower():
                    t = f.dataType.simpleString()
                    if t in ("string", "varchar", "char"):
                        # full Hive parity via the hive_bucket_hash UDF
                        from hive_2_3_2_spark.functions.hive_hash import (
                            register_hive_hash,
                        )

                        register_hive_hash(spark)
                        col_types[m.start()] = "string"
                    elif t not in _INTEGRAL_TYPES:
                        raise HiveQLUnsupportedError(
                            f"TABLESAMPLE(BUCKET ... ON {col}): column type "
                            f"{t} has no Hive bucket-hash emulation here "
                            "(integral keys use the value, string keys the "
                            "UTF-8 byte fold) — sample on an integral or "
                            "string column"
                        )
    out = _TABLESAMPLE.sub(
        lambda m: _rewrite_tablesample(m, col_types.get(m.start())), query
    )
    for pat, repl in _REWRITES:
        out = pat.sub(repl, out)
    return out
