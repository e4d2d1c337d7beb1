#!/usr/bin/env python
"""Generate sf10-scale documents + embeddings (VERDICT r7 task 7).

The sf0.1->sf1 soak (tools/bench_sf1.py) bounds every heavy op at 10x
data; this adds a SECOND decade for the three corpus heavies
(text-ngram-novelty, embed-hubness, dedup-span-coverage) so their "100
TB shape" argument rests on a measured two-decade scaling curve
(sf0.1 -> sf1 -> sf10). Only the two tables those ops read are
generated (500k documents / 200k embeddings, ~150 MB) — upsampling the
full warehouse 100x would cost ~100M event rows for ops that never
read them.

Method matches tools/gen_sf1.py: 100 copies via broadcast cross join,
ids shifted by copy*stride, text given a distinct per-copy prefix
token and embeddings a small deterministic per-copy offset so near-dup
and ANN candidate generation see realistic (non-degenerate) input
rather than verbatim clones.

Output: $OUT (default /root/repo/.sf10). Idempotent: skips tables whose
output already exists unless FORCE=1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from transit_scrape_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT", "/root/repo/.sf10")
COPIES = int(os.environ.get("COPIES", "100"))


# r9 extension (VERDICT r8 task 6): the two heaviest iterative-join ops
# (graph-pagerank, graph-components-iterative) derive their edge table
# from the lineitem->orders->customer->supplier chain — the other
# super-linear risk class (driver-loop joins) previously stopped at sf1.
# Generate just the four chain tables (keys shifted per copy so
# referential integrity holds, like tools/gen_sf1.py) plus the nation
# dim passthrough (fixed 25 rows per TPC-H — the GRAPH stays 25 nodes;
# what scales 100x is the edge-derivation join the ops spend their time
# in, which is the honest scale axis for these fixtures).
GRAPH_SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
GRAPH_SPACES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
}
GRAPH_COL_SPACE = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
}


def gen_graph_tables(spark, copies) -> None:
    todo = [
        t for t in GRAPH_SHIFT
        if not os.path.isdir(f"{OUT}/{t}.parquet") or os.environ.get("FORCE") == "1"
    ]
    for t in ("nation", "region"):
        dest = f"{OUT}/{t}.parquet"
        if not os.path.isdir(dest) or os.environ.get("FORCE") == "1":
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(dest)
            print(f"{t}: passthrough", flush=True)
    if not todo:
        print("graph tables: exist, skipped (FORCE=1 to regenerate)", flush=True)
        return
    src = {t: spark.read.parquet(f"{SRC}/{t}.parquet") for t in GRAPH_SHIFT}
    strides = {
        space: max(src[t].agg(F.max(c)).collect()[0][0] for t, c in cols) + 1
        for space, cols in GRAPH_SPACES.items()
    }
    for t in todo:
        df = src[t]
        out = df.crossJoin(F.broadcast(copies))
        for c in GRAPH_SHIFT[t]:
            dt = dict(df.dtypes)[c]
            out = out.withColumn(
                c,
                (F.col(c) + F.col("_copy") * strides[GRAPH_COL_SPACE[c]]).cast(dt),
            )
        out.drop("_copy").repartition(32).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)


def main() -> None:
    spark = get_spark("gen-sf10")
    os.makedirs(OUT, exist_ok=True)
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("_copy"))
    gen_graph_tables(spark, copies)

    for t, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        dest = f"{OUT}/{t}.parquet"
        if os.path.isdir(dest) and os.environ.get("FORCE") != "1":
            print(f"{t}: exists, skipped (FORCE=1 to regenerate)", flush=True)
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        stride = df.agg(F.max(key)).collect()[0][0] + 1
        dt = dict(df.dtypes)[key]
        out = df.crossJoin(F.broadcast(copies)).withColumn(
            key, (F.col(key) + F.col("_copy") * F.lit(stride)).cast(dt)
        )
        if t == "documents":
            out = out.withColumn(
                "text",
                F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.lit("c"),
                        F.col("_copy").cast("string"),
                        F.lit(" "),
                        F.col("text"),
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        else:
            out = out.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + F.col("_copy").cast("float")
                        * 0.0003
                        * ((i % 7) - 3).cast("float")
                    ).cast("float"),
                ),
            )
        out.drop("_copy").repartition(32).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
