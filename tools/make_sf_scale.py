"""Scale up the driver-generated sf0.1 fixture by deterministic
key-shifted replication — for LOCAL stress sweeps only (TESTDATA.md
marks /root/testdata read-only, so scaled fixtures land elsewhere).

Method: each table is unioned FACTOR times; copy c shifts every id-key
domain by c * 100_000_000, consistently across tables, so every foreign
key joins to its own copy's rows and per-key fanouts (orders/customer,
lineitem/order, events/user) are preserved exactly. Value distributions
(prices, dates, quantities, flags) are untouched. Two content columns
are perturbed so replication doesn't manufacture EXACT duplicates:
documents.text gets a per-copy suffix token (cross-copy pairs remain
NEAR-duplicates — deliberately: a dup-heavy corpus is the interesting
dedup stress), and embeddings get one dimension nudged per copy.
region/nation stay as-is (dimension tables don't scale in TPC-H
either).

Usage:
    python tools/make_sf_scale.py [factor] [src_dir] [dst_dir]
    # defaults: 10 /root/testdata/sf0.1 /tmp/sf1
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

OFF = 100_000_000

# table -> columns to shift by copy * OFF
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def scale_table(spark, src: str, dst: str, table: str, factor: int) -> int:
    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    copies = spark.range(factor).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for col in SHIFT.get(table, []):
        out = out.withColumn(col, F.col(col) + F.col("__copy") * OFF)
    if table == "documents":
        out = out.withColumn(
            "text",
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                F.concat(
                    F.col("text"), F.lit(" copytag"),
                    F.col("__copy").cast("string"),
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + CASE WHEN i = "
                "CAST(__copy % 64 AS INT) THEN (__copy % 7) * 0.003 "
                "ELSE CAST(0.0 AS DOUBLE) END AS FLOAT))"
            ),
        )
    out = out.drop("__copy")
    n = out.count()
    out.repartition(max(4, factor)).write.mode("overwrite").parquet(
        os.path.join(dst, f"{table}.parquet")
    )
    return n


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    from hive_2_3_2_spark.session import get_spark

    spark = get_spark(app_name="make-sf-scale")
    os.makedirs(dst, exist_ok=True)
    for t in COPY_AS_IS:
        spark.read.parquet(os.path.join(src, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: copied")
    for t in SHIFT:
        n = scale_table(spark, src, dst, t, factor)
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
