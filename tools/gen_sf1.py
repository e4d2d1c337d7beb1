#!/usr/bin/env python
"""Generate an sf1-scale warehouse (~6M lineitem rows) for the scale
soak (VERDICT r3 item 3) by upsampling the driver's sf0.1 fixtures 10x.

Method: cross-join each table with a 10-row `copies` relation and shift
every key column by copy * (max_key + 1), so referential integrity
(lineitem.l_orderkey -> orders, orders.o_custkey -> customer,
lineitem.l_partkey -> part, ...) holds across copies and per-key
cardinalities match the original distribution exactly (each order still
has the same lineitems, each customer the same orders).

Text/embedding payloads are PERTURBED per copy (every 3rd token
copy-tagged / copy-specific vector offset at norm magnitude): clones
of every document that stay shingle- or cosine-similar across copies
would hand the near-dup ops a quadratic candidate AND OUTPUT blowup by
construction, which is a property of degenerate input, not of scale
(r12: the original prefix-token form left copies ~99% shingle-identical
and dedup-near-minhash paid copies^2 output rows at sf10 — 23.7x for
10x data).

nation/region keep their fixed 25/5 rows (dims, per TPC-H).

Output: $OUT (default /root/repo/.sf1), one parquet DIRECTORY per
table (multi-file - which also gives scans real mapper parallelism,
like a cluster layout). Wall time ~1 min on local[32].
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from transit_scrape_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT", "/root/repo/.sf1")
COPIES = int(os.environ.get("COPIES", "10"))

# key columns to shift, per table: (col, stride-source-table-col)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PASSTHROUGH = ["nation", "region"]


def main() -> None:
    spark = get_spark("gen-sf1")
    os.makedirs(OUT, exist_ok=True)

    # stride per keyed id-space: max over every table referencing it
    strides: dict[str, int] = {}
    src = {t: spark.read.parquet(f"{SRC}/{t}.parquet") for t in list(SHIFT) + PASSTHROUGH}
    for space, cols in {
        "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
        "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
        "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
        "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
        "event_id": [("events", "event_id")],
        "user_id": [("events", "user_id")],
        "doc_id": [("documents", "doc_id")],
        "vec_id": [("embeddings", "vec_id")],
    }.items():
        strides[space] = (
            max(src[t].agg(F.max(c)).collect()[0][0] for t, c in cols) + 1
        )
    col_space = {
        "c_custkey": "custkey", "o_custkey": "custkey",
        "o_orderkey": "orderkey", "l_orderkey": "orderkey",
        "p_partkey": "partkey", "l_partkey": "partkey",
        "s_suppkey": "suppkey", "l_suppkey": "suppkey",
        "event_id": "event_id", "user_id": "user_id",
        "doc_id": "doc_id", "vec_id": "vec_id",
    }

    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("_copy"))

    def upsample(t: str, df: DataFrame) -> DataFrame:
        out = df.crossJoin(F.broadcast(copies))
        for c in SHIFT[t]:
            dt = dict(df.dtypes)[c]
            out = out.withColumn(
                c, (F.col(c) + F.col("_copy") * strides[col_space[c]]).cast(dt)
            )
        if t == "documents":
            # perturb: tag every 3rd TOKEN with the copy id so every
            # 3-token shingle contains a copy-specific token — cross-copy
            # shingle overlap (and hence minhash/LSH similarity) drops to
            # ~0 while length stats and within-copy near-dup structure
            # are preserved. (r12: the previous single PREFIX token left
            # copies ~99% shingle-identical, handing shingle-level
            # near-dup ops a copies^2 candidate/output blowup at sf10 —
            # exactly the degenerate-input artifact this perturbation
            # exists to prevent; dedup-near-minhash measured 23.7x at
            # the 10x decade from output rows alone.)
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
        if t == "embeddings":
            # deterministic copy-specific offset with magnitude on the
            # order of the vector norm, direction varying per copy —
            # cross-copy cosine falls well below ANN/near-dup thresholds
            # (r12: the previous +-0.003*copy pattern left adjacent
            # copies cosine~1, the same copies^2 cluster artifact as the
            # prefix-token text perturbation). Copy 0 stays verbatim.
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
        return out.drop("_copy")

    for t in PASSTHROUGH:
        src[t].write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(f"{t}: passthrough", flush=True)
    for t in SHIFT:
        df = upsample(t, src[t]).repartition(16)
        df.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
