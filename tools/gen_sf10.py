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
ids shifted by copy*stride, every 3rd text token copy-tagged and
embeddings given a copy-specific offset at vector-norm magnitude so
near-dup and ANN candidate generation see realistic (non-degenerate)
input rather than shingle-/cosine-level clones (r12: the earlier
prefix-token / tiny-offset perturbation left cross-copy similarity
above the ops' thresholds, so candidate AND output sizes grew
copies^2 — dedup-near-minhash hit 23.7x at this decade).

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
            # tag every 3rd TOKEN with the copy id (see tools/gen_sf1.py
            # — the single prefix token left copies ~99% shingle-identical
            # and blew shingle-level near-dup ops up copies^2-fold:
            # dedup-near-minhash measured 23.7x at this decade from
            # output rows alone, a degenerate-input artifact)
            out = out.withColumn(
                "text",
                F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w, i: F.when(
                                i % 3 == 0,
                                F.concat(
                                    w, F.lit("c"),
                                    F.col("_copy").cast("string"),
                                ),
                            ).otherwise(w),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        else:
            # copy-specific offset at vector-norm magnitude (see
            # tools/gen_sf1.py): cross-copy cosine falls below ANN
            # thresholds instead of sitting at ~1
            out = out.withColumn(
                "embedding",
                F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        "embedding",
                        lambda x, i: (
                            x
                            + 0.8
                            * (
                                (
                                    (i * 31 + F.col("_copy") * 17) % 13
                                ).cast("float")
                                - 6.0
                            )
                        ).cast("float"),
                    )
                ),
            )
        out.drop("_copy").repartition(32).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
