"""Scale-technique demonstration ops: each implements a 100 TB pattern
on the local fixtures with an oracle proving it changes the PLAN, not
the ANSWER.

- bucketed co-located join: bucketBy + sortBy table layout removes the
  per-query shuffle from recurring fact-fact joins (the warehouse
  'pay the shuffle once at write time' move).
- salted skew aggregation: two-stage agg via a synthetic salt key —
  identical result, bounded per-task key cardinality under skew.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table

# One bucket file = one read task (Spark never splits a bucket), so
# bucket count IS the join's parallelism ceiling — size it to the
# cluster's cores, not to the data. 8 buckets left 24 of local[32]'s
# cores idle and the op at 5.7s; 32 buckets run it in ~1.5s.
N_BUCKETS = 32


@query(
    "join-bucketed",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS n_items,
               round(sum(l.l_quantity), 2) AS sum_qty
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc="Co-located fact-fact join via bucketed table layout: both sides "
    "written bucketBy(N_BUCKETS, orderkey) + sortBy -> the recurring join "
    "compiles to SortMergeJoin with ZERO exchanges (bucket pruning of "
    "the shuffle). At 100 TB this converts the dominant per-query "
    "shuffle into a one-time write-layout cost.",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.fixtures import content_tag

    # content-keyed: a changed fixture set yields new table names/paths
    # instead of reusing a stale bucketed layout
    tag = f"{content_tag(sf_dir)}_b{N_BUCKETS}"
    base = f"/tmp/tss_bucketed_{tag}"
    ot, lt = f"tss_orders_b_{tag}", f"tss_lineitem_b_{tag}"

    def _ensure(table: str, df: DataFrame, key: str) -> None:
        if spark.catalog.tableExists(table):
            return
        path = f"{base}/{table}"
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            # data written by a previous session: register the external
            # bucketed table over it instead of rewriting (the bucketed
            # file layout is already on disk)
            cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
            spark.sql(
                f"CREATE TABLE {table} ({cols}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
                f"LOCATION '{path}'"
            )
            return
        shutil.rmtree(path, ignore_errors=True)
        (
            # repartition on the bucket key first: hashpartitioning and
            # bucketBy share the Murmur3 bucket function, so every
            # write task owns exactly one bucket — N_BUCKETS parallel
            # sort+write tasks instead of a few input partitions each
            # sorting and writing all N_BUCKETS files (15s -> ~3s for
            # the one-time layout build at sf0.1)
            df.repartition(N_BUCKETS, F.col(key))
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(table)
        )

    _ensure(ot, load_table(spark, sf_dir, "orders"), "o_orderkey")
    _ensure(lt, load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    o = spark.table(ot)
    li = spark.table(lt)
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    out = joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )
    # the point of the exercise: no shuffle before the join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    return out


N_SALTS = 8


@query(
    "agg-salted-skew",
    oracle="""
        SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Skew-resistant two-stage aggregation: stage 1 groups on "
    "(key, salt) — a hot key spreads over 8 reducers — stage 2 merges "
    "partials per key. Identical result to the direct groupBy (the "
    "oracle proves it); the manual form of what AQE skew handling does "
    "for joins, needed when one groupBy key dominates.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("_n"),
        F.sum("l_extendedprice").alias("_s"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s"), 2).alias("total"),
    )


N_JOIN_SALTS = 8


@query(
    "join-skew-salted",
    oracle="""
        WITH fact AS (
            SELECT CASE WHEN l_quantity < 10 THEN 0
                        ELSE CAST(l_orderkey % 500 AS BIGINT) END AS k,
                   l_quantity
            FROM lineitem
        ),
        dim AS (SELECT range AS k, CAST(range AS DOUBLE) * 0.01 AS weight
                FROM range(0, 500))
        SELECT CAST(floor(f.k / 100) AS BIGINT) AS key_band,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(d.weight * f.l_quantity
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS weighted_qty
        FROM fact f JOIN dim d ON f.k = d.k
        GROUP BY key_band
        ORDER BY key_band
    """,
    doc="Skew-resistant SHUFFLE join via salting — the join-side "
    "companion of agg-salted-skew: ~20% of the fact lands on one hot "
    "key (l_quantity<10 -> k=0), which under a plain hash-partitioned "
    "join funnels through one reducer. The fact gets a uniform salt, "
    "the dim is replicated once per salt value, and the join runs on "
    "(k, salt) — hot-key rows spread over N_JOIN_SALTS reducers. The "
    "merge hint forces a real shuffle join (broadcast would hide the "
    "skew this op exists to demonstrate); the oracle is the UNsalted "
    "join, proving salting changes the partitioning, not the answer. "
    "Weighted sums aggregate through DECIMAL so reducer order can't "
    "move the rounding.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_quantity") < 10, F.lit(0))
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(500)))
        .cast("long")
        .alias("k"),
        "l_quantity",
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_JOIN_SALTS)
        ).alias("_salt"),
    )
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id").cast("double") * 0.01).alias("weight")
    )
    dim_rep = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(N_JOIN_SALTS)])),
    )
    j = fact.hint("merge").join(dim_rep, ["k", "_salt"])
    return (
        j.groupBy(F.floor(F.col("k") / 100).cast("long").alias("key_band"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(
                    (F.col("weight") * F.col("l_quantity")).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("weighted_qty"),
        )
        .orderBy("key_band")
    )
