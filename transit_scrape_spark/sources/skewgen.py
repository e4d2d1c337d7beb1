"""Zipfian-key warehouse generator (r9 skew evidence axis).

Rewrites the FOREIGN-KEY columns of the fact tables to a zipf(1)
distribution over the SAME key domain — referential integrity holds
(every remapped value exists in its dimension), row counts and payloads
are unchanged, only the key distribution moves:

- events.user_id      -> zipf over the distinct user_id domain
- lineitem.l_orderkey -> zipf over orders.o_orderkey
- lineitem.l_partkey  -> zipf over part.p_partkey
- orders.o_custkey    -> zipf over customer.c_custkey

zipf(1) via inverse-CDF: u ~ Uniform(0,1) deterministic per row
(pmod(hash(row cols), M)), rank = ceil(1/u) capped at the domain size,
so P(rank >= k) = 1/k — the hottest key receives ~50% of all rows, the
second ~17%, a long tail follows. This is the classic 100x-scale
killer shape no uniform fixture exercises: a hot key that pins one
reducer unless the plan (or AQE) splits it.

All other tables are copied unchanged. Output is multi-file parquet
(8 files/table) so scans have real mapper parallelism — AQE can only
split a skewed partition along mapper boundaries.

Consumed by tools/gen_skew.py (CLI, sf0.1 -> .skew for
tools/bench_skew.py) and tests/test_skew_parity.py (sf0.01 -> tmp for
the registry-wide distribution-robustness parity sweep).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_scrape_spark.sources.hostilegen import write_table_like_testdata

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_M = 1000003  # prime modulus for the per-row uniform draw


def _zipf_rank(*seed_cols) -> F.Column:
    """Deterministic zipf(1) rank >= 1 from the row's content: inverse
    CDF of P(rank >= k) = 1/k applied to a hash-derived uniform."""
    u = (F.pmod(F.hash(*seed_cols), F.lit(_M)) + 1) / F.lit(float(_M + 1))
    return F.ceil(1.0 / u).cast("long")


def _rank_table(df: DataFrame, key: str) -> tuple[DataFrame, int]:
    """(rank -> key value) lookup over the column's distinct domain,
    rank 1 = smallest key. Bounded by the dimension's cardinality."""
    w = Window.orderBy(key)
    dom = df.select(key).distinct().withColumn("__rank", F.row_number().over(w))
    return dom, dom.count()


def _remap(df: DataFrame, col: str, dom: DataFrame, n: int, *seed_cols) -> DataFrame:
    """Replace ``col`` with the zipf-rank-selected value from ``dom``."""
    dom = dom.withColumnRenamed(dom.columns[0], "__newval")
    out = (
        df.withColumn("__rank", F.least(_zipf_rank(*seed_cols), F.lit(n)))
        .join(F.broadcast(dom), "__rank")
        .drop("__rank")
        .withColumn(col, F.col("__newval").cast(dict(df.dtypes)[col]))
        .drop("__newval")
    )
    return out.select(df.columns)


def generate_skew_warehouse(spark: SparkSession, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    t = {name: spark.read.parquet(f"{src}/{name}.parquet") for name in TABLES}

    users, n_users = _rank_table(t["events"], "user_id")
    ordkeys, n_ord = _rank_table(t["orders"], "o_orderkey")
    partkeys, n_part = _rank_table(t["part"], "p_partkey")
    custkeys, n_cust = _rank_table(t["customer"], "c_custkey")

    ev = _remap(t["events"], "user_id", users, n_users, F.col("event_id"))
    li = _remap(
        t["lineitem"], "l_orderkey", ordkeys, n_ord,
        F.col("l_orderkey"), F.col("l_linenumber"),
    )
    li = _remap(
        li, "l_partkey", partkeys, n_part,
        F.col("l_orderkey"), F.col("l_linenumber"), F.lit("p"),
    )
    od = _remap(t["orders"], "o_custkey", custkeys, n_cust, F.col("o_orderkey"))

    skewed = {"events": ev, "lineitem": li, "orders": od}
    for name in TABLES:
        df = skewed.get(name, t[name])
        # driver-testdata layout (single parquet FILE per table): the
        # hostility warehouses double as sf_dir drop-ins for the
        # streaming file source, which silently streams ZERO rows from
        # a multi-file directory (see hostilegen.write_table_like_testdata)
        write_table_like_testdata(df, out, name)
