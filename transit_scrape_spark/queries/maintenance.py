"""Warehouse-operations family: the jobs that keep a 100 TB lakehouse
healthy — data-quality gates, CDC snapshot diffs, incremental rollup
maintenance, small-file compaction, schema evolution, layout keys.

The reference's load pipeline does these implicitly and sequentially
(push_to_db.py re-load + dedup hazard, db_helpers.py DDL); here each is
an explicit, oracled, distributed operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.session import cache_width
from transit_scrape_spark.sources.fixtures import fixture_dir
from transit_scrape_spark.sources.tables import load_table


@query(
    "dq-constraint-check",
    oracle="""
        SELECT 'l_orderkey_not_null' AS check_name,
               CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
                   AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'li_no_orphans',
               CAST(count(*) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        UNION ALL
        SELECT 'o_orderkey_unique',
               CAST(coalesce(sum(c - 1), 0) AS BIGINT)
        FROM (SELECT o_orderkey, count(*) AS c FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)
        UNION ALL
        SELECT 'l_quantity_in_range',
               CAST(count(*) FILTER (WHERE l_quantity < 0 OR l_quantity > 60)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate_after_orderdate',
               CAST(count(*) AS BIGINT)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate < o.o_orderdate
    """,
    doc="Data-quality gate (the Deequ/dbt-test shape): five constraint "
    "classes — non-null, referential integrity (anti-join orphans), "
    "key uniqueness, numeric range, cross-table temporal ordering — "
    "each as a violation COUNT, unioned into one verdict table. Every "
    "check is a scan-shaped aggregate or an equi-join keyed on the "
    "constraint column, so the whole gate is a handful of shuffles "
    "regardless of table size; at 100 TB this runs as the admission "
    "check before a partition is published to consumers.",
)
def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # c1 + c4 are both plain conditional counts over lineitem: ONE scan
    # emits both rows (was two full scans). Counts are integer-exact, so
    # the fusion cannot move any value.
    c14 = (
        li.agg(
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("v1"),
            F.sum(
                F.when(
                    (F.col("l_quantity") < 0) | (F.col("l_quantity") > 60), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("v4"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("l_orderkey_not_null").alias("check_name"),
                        F.col("v1").alias("n_violations"),
                    ),
                    F.struct(
                        F.lit("l_quantity_in_range").alias("check_name"),
                        F.col("v4").alias("n_violations"),
                    ),
                )
            ).alias("_r")
        )
        .select("_r.*")
    )
    # c2 + c5 share ONE left join (was an anti-join scan pair plus an
    # inner-join scan pair): an orphan lineitem row emits exactly one
    # null-extended row (duplicate orders only multiply MATCHED rows,
    # which c2 never counts), so sum(right IS NULL) == the anti-join
    # count; matched-row multiplicity under duplicate keys is identical
    # to the inner join's, so the shipdate count matches too.
    lo = li.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left",
    )
    c25 = (
        lo.agg(
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("v2"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            )
            .cast("long")
            .alias("v5"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("li_no_orphans").alias("check_name"),
                        F.col("v2").alias("n_violations"),
                    ),
                    F.struct(
                        F.lit("l_shipdate_after_orderdate").alias("check_name"),
                        F.col("v5").alias("n_violations"),
                    ),
                )
            ).alias("_r")
        )
        .select("_r.*")
    )
    c3 = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias("n_violations"))
        .select(F.lit("o_orderkey_unique").alias("check_name"), "n_violations")
    )
    # row ORDER is free (driver + oracle compare order-insensitively),
    # so the fused frames union directly — re-splitting them with
    # filters would re-plan each shared aggregate per branch.
    return c14.unionByName(c25).unionByName(c3)


@query(
    "cdc-snapshot-diff",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 11 <> 0
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN round(o_totalprice + 1.0, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderkey % 13 <> 0
        )
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN o.o_totalprice <> n.o_totalprice THEN 'update'
                    ELSE 'unchanged' END AS change_type,
               CAST(count(*) AS BIGINT) AS n
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        GROUP BY 1
    """,
    doc="CDC by snapshot diff: two versions of the orders table (11%% "
    "simulated inserts, 13%% deletes, 7%% price updates, arithmetic on "
    "the shared fixture so both engines derive identical snapshots) "
    "full-outer-joined on the key, each row classified "
    "insert/delete/update/unchanged. One co-partitioned shuffle join; "
    "at 100 TB compare 64-bit row hashes instead of full payloads and "
    "diff partition-by-partition so unchanged partitions (by file "
    "fingerprint) never join at all. The batch-side dual of the "
    "streaming foreachBatch MERGE op.",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 0).select("o_orderkey", "o_totalprice")
    new = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 1.0, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a, b = old.alias("a"), new.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), "update")
        .otherwise("unchanged")
    )
    return joined.groupBy(change.alias("change_type")).agg(F.count("*").alias("n"))


@query(
    "rollup-incremental-merge",
    oracle="""
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS sum_value
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
    """,
    doc="Incremental materialized-rollup maintenance: the standing "
    "per-(type, day) aggregate is computed for the history partition "
    "(ts < 2024-01-20) and the fresh delta partition separately, then "
    "MERGED by summing partial states — count and sum are mergeable, "
    "so merged == full recompute (the oracle computes the full "
    "version; the plan never rescans history). THE pattern that keeps "
    "100 TB dashboards cheap: each day touches only the new "
    "partition, history stays as stored aggregate state; avg/var "
    "merge the same way via (sum, count, M2), and non-mergeable "
    "metrics (exact distinct) switch to mergeable sketches "
    "(agg-sketch-merge).",
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cut = F.lit("2024-01-20").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))

    base = partial(ev.filter(F.col("ts") < cut))
    delta = partial(ev.filter(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
        )
    )


def _merge_schema_dir(spark: SparkSession, sf_dir: str) -> str:
    """Two supplier snapshots with EVOLVED schemas: v=1 lacks the
    s_acctbal column that v=2 adds (the reference's scrape feeds gained
    columns across scrapes the same way)."""

    def build(d: str) -> None:
        sup = load_table(spark, sf_dir, "supplier")
        sup.filter(F.col("s_suppkey") % 2 == 0).select(
            "s_suppkey", "s_nationkey"
        ).write.parquet(os.path.join(d, "v=1"))
        sup.filter(F.col("s_suppkey") % 2 == 1).select(
            "s_suppkey", "s_nationkey", "s_acctbal"
        ).write.parquet(os.path.join(d, "v=2"))

    return fixture_dir("tss_schema_evo", sf_dir, build)


@query(
    "scan-merge-schema",
    oracle="""
        SELECT CAST(v AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(count(*) FILTER (WHERE v = 1 OR s_acctbal IS NULL)
                    AS BIGINT) AS n_null_acctbal,
               round(sum(CASE WHEN v = 2 THEN s_acctbal ELSE 0 END), 2) AS total_bal
        FROM (SELECT s_suppkey, s_acctbal,
                     CASE WHEN s_suppkey % 2 = 0 THEN 1 ELSE 2 END AS v
              FROM supplier)
        GROUP BY v
    """,
    doc="Schema-evolution scan (mergeSchema): two parquet snapshot "
    "generations where the newer adds a column; the merged read "
    "surfaces the union schema with NULLs for pre-evolution rows, and "
    "the partition column (v) identifies generations. The 100 TB "
    "reality: schemas drift across years of feed history — explicit "
    "mergeSchema on write-compatible evolution (add-nullable-column) "
    "keeps old partitions readable without rewrite; note mergeSchema "
    "costs footer reads across files, so production pins the merged "
    "schema in a catalog instead.",
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _merge_schema_dir(spark, sf_dir)
    back = spark.read.option("mergeSchema", "true").parquet(d)
    return back.groupBy(F.col("v").cast("long").alias("v")).agg(
        F.count("*").alias("n_suppliers"),
        F.sum(F.when(F.col("s_acctbal").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_acctbal"),
        F.round(F.sum(F.coalesce(F.col("s_acctbal"), F.lit(0.0))), 2).alias(
            "total_bal"
        ),
    )


_COMPACT_SMALL, _COMPACT_TARGET = 64, 4


def _compaction_dirs(spark: SparkSession, sf_dir: str) -> str:
    """A deliberately fragmented lineitem copy (64 shards) and its
    compacted rewrite (4 files)."""

    def build(d: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
        )
        li.repartition(_COMPACT_SMALL).write.parquet(os.path.join(d, "small"))
        spark.read.parquet(os.path.join(d, "small")).repartition(
            _COMPACT_TARGET
        ).write.parquet(os.path.join(d, "compacted"))

    return fixture_dir("tss_compact", sf_dir, build)


@query(
    "sink-compaction",
    oracle=f"""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS total,
               CAST({_COMPACT_SMALL} AS BIGINT) AS n_files_before,
               CAST({_COMPACT_TARGET} AS BIGINT) AS n_files_after
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Small-file compaction: a 64-shard fragmented table rewritten "
    "to 4 right-sized files (repartition -> write), content verified "
    "equal against the origin and the file counts asserted from the "
    "directory listing. The silent 100 TB killer this fixes: "
    "per-file open/footer/list costs dominate scans of "
    "million-small-file tables (streaming sinks and over-parallel "
    "writers create them); the fix is this exact job scheduled on "
    "recent partitions, sized so each output file ~ one HDFS/S3 "
    "block (128-512 MB).",
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _compaction_dirs(spark, sf_dir)
    n_small = len(
        [f for f in os.listdir(os.path.join(root, "small")) if f.endswith(".parquet")]
    )
    n_comp = len(
        [
            f
            for f in os.listdir(os.path.join(root, "compacted"))
            if f.endswith(".parquet")
        ]
    )
    back = spark.read.parquet(os.path.join(root, "compacted"))
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
        F.lit(n_small).cast("long").alias("n_files_before"),
        F.lit(n_comp).cast("long").alias("n_files_after"),
    )


@query(
    "layout-zorder-key",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey % 256 AS BIGINT) AS zx,
               CAST(l_suppkey % 256 AS BIGINT) AS zy,
               CAST((
                    ((l_partkey % 256) & 1) * 1 + ((l_suppkey % 256) & 1) * 2
                  + (((l_partkey % 256) >> 1) & 1) * 4 + (((l_suppkey % 256) >> 1) & 1) * 8
                  + (((l_partkey % 256) >> 2) & 1) * 16 + (((l_suppkey % 256) >> 2) & 1) * 32
                  + (((l_partkey % 256) >> 3) & 1) * 64 + (((l_suppkey % 256) >> 3) & 1) * 128
                  + (((l_partkey % 256) >> 4) & 1) * 256 + (((l_suppkey % 256) >> 4) & 1) * 512
                  + (((l_partkey % 256) >> 5) & 1) * 1024 + (((l_suppkey % 256) >> 5) & 1) * 2048
                  + (((l_partkey % 256) >> 6) & 1) * 4096 + (((l_suppkey % 256) >> 6) & 1) * 8192
                  + (((l_partkey % 256) >> 7) & 1) * 16384 + (((l_suppkey % 256) >> 7) & 1) * 32768
               ) AS BIGINT) AS zkey
        FROM lineitem
        WHERE l_orderkey <= 64
    """,
    doc="Z-order (Morton) layout key: bit-interleave two join/filter "
    "dimensions (part, supplier buckets) into one sort key — rows "
    "close in EITHER dimension land close in the file order, so "
    "parquet row-group min/max stats prune scans filtered on either "
    "column (a total sort by one column only helps that column). "
    "Pure integer bit arithmetic, codegen'd, no UDF. The data-layout "
    "lever at 100 TB: sort-within-partitions by zkey at write time "
    "turns full-partition scans into a few row groups for "
    "2-dimensional predicates; Delta/Iceberg OPTIMIZE ZORDER is this "
    "exact computation.",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 64)
    zx = F.col("l_partkey") % 256
    zy = F.col("l_suppkey") % 256
    zkey = None
    for i in range(8):
        bx = zx.bitwiseAND(1 << i) != 0
        by = zy.bitwiseAND(1 << i) != 0
        term = F.when(bx, 1 << (2 * i)).otherwise(0) + F.when(
            by, 1 << (2 * i + 1)
        ).otherwise(0)
        zkey = term if zkey is None else zkey + term
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zx.cast("long").alias("zx"),
        zy.cast("long").alias("zy"),
        zkey.cast("long").alias("zkey"),
    )


@query(
    "scd2-apply-changes",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 0
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN round(o_totalprice + 1.0, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 13 <> 0
        ),
        diff AS (
            SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
                   o.o_totalprice AS old_price, n.o_totalprice AS new_price,
                   CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                        WHEN n.o_orderkey IS NULL THEN 'delete'
                        WHEN o.o_totalprice <> n.o_totalprice THEN 'update'
                        ELSE 'unchanged' END AS change_type
            FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        )
        SELECT k AS o_orderkey, old_price AS price, 'closed' AS row_status
        FROM diff WHERE change_type IN ('update', 'delete')
        UNION ALL
        SELECT k, new_price, 'current' FROM diff WHERE change_type = 'update'
        UNION ALL
        SELECT k, new_price, 'current' FROM diff WHERE change_type = 'insert'
        UNION ALL
        SELECT k, old_price, 'current' FROM diff WHERE change_type = 'unchanged'
    """,
    doc="SCD2 change application — the WRITE side of the history "
    "dimension: the CDC diff (cdc-snapshot-diff's classification) "
    "becomes row actions — updates CLOSE the old version and open a "
    "new current one, deletes close, inserts open, unchanged pass "
    "through. One full-outer co-partitioned join then a union of "
    "filtered projections (single shuffle; the unions are "
    "scan-free reuses of the joined relation). With a transactional "
    "table format this is MERGE WHEN MATCHED/NOT MATCHED; the "
    "emitted row_status is what effective_to timestamps would pin "
    "(scd2-intervals' algebra).",
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    new = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 1.0, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    a, b = old.alias("a"), new.alias("b")
    diff = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
        "old_price",
        "new_price",
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .when(F.col("old_price") != F.col("new_price"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    # persist the classified diff: the three row-action branches each
    # re-ran the full-outer join (6 orders scans -> 2). r11 tried this
    # at the session's static 32-partition cache width and reverted
    # (+147%/+109% sweeps); the cached shape now coalesces to summary
    # width (session.cache_width), which removes the width drag.
    diff = diff.coalesce(cache_width(spark)).persist()
    closed = diff.filter(F.col("change_type").isin("update", "delete")).select(
        F.col("k").alias("o_orderkey"),
        F.col("old_price").alias("price"),
        F.lit("closed").alias("row_status"),
    )
    opened = diff.filter(F.col("change_type").isin("update", "insert")).select(
        F.col("k").alias("o_orderkey"),
        F.col("new_price").alias("price"),
        F.lit("current").alias("row_status"),
    )
    kept = diff.filter(F.col("change_type") == "unchanged").select(
        F.col("k").alias("o_orderkey"),
        F.col("old_price").alias("price"),
        F.lit("current").alias("row_status"),
    )
    return closed.unionByName(opened).unionByName(kept)


@query(
    "dq-volume-drift",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        seq AS (
            SELECT day, n, lag(n) OVER (ORDER BY day) AS prev_n
            FROM daily
        )
        SELECT day, n, prev_n,
               round(CAST(n - prev_n AS DOUBLE) / prev_n, 6) AS drift,
               (abs(CAST(n - prev_n AS DOUBLE) / prev_n) > 0.5) AS is_anomalous
        FROM seq
        WHERE prev_n IS NOT NULL
    """,
    doc="Ingestion volume drift monitor: day-over-day row-count deltas "
    "with a +/-50%% anomaly flag — the cheapest, highest-yield "
    "pipeline alarm (a scraper auth failure or a duplicated load "
    "shows up here before any content check fires; the reference's "
    "silent re-run append hazard, push_to_db.py:29-30, trips this "
    "immediately). Daily counts are summary-sized, so the lag window "
    "is trivial; in production the threshold comes from the series' "
    "own MAD (agg-robust-mad) instead of a constant.",
)
def dq_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("day")
    seq = daily.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    drift = (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n")
    return seq.select(
        "day",
        "n",
        "prev_n",
        F.round(drift, 6).alias("drift"),
        (F.abs(drift) > 0.5).alias("is_anomalous"),
    )


@query(
    "dq-column-profile",
    oracle="""
        SELECT 'o_orderstatus' AS column_name,
               CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT)
                   AS n_null,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
               CAST(min(length(o_orderstatus)) AS BIGINT) AS min_len,
               CAST(max(length(o_orderstatus)) AS BIGINT) AS max_len
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
               CAST(count(DISTINCT o_orderpriority) AS BIGINT),
               CAST(min(length(o_orderpriority)) AS BIGINT),
               CAST(max(length(o_orderpriority)) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'c_mktsegment',
               CAST(count(*) FILTER (WHERE c_mktsegment IS NULL) AS BIGINT),
               CAST(count(DISTINCT c_mktsegment) AS BIGINT),
               CAST(min(length(c_mktsegment)) AS BIGINT),
               CAST(max(length(c_mktsegment)) AS BIGINT)
        FROM customer
    """,
    doc="Column profiling (the discovery pass a catalog runs on every "
    "new table): null counts, distinct cardinality, length bounds per "
    "string column, one row per column. Each table contributes ONE "
    "scan however many of its columns are profiled (the aggregates "
    "fuse), and the per-column stats later feed broadcast-vs-shuffle "
    "and dictionary-encoding decisions; at 100 TB swap the exact "
    "distinct for approx_count_distinct (the profile is advisory) "
    "and the scan reads column chunks, not rows — columnar profiling "
    "is nearly IO-free per extra column.",
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def profile(df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(F.length(col)).cast("long").alias("min_len"),
            F.max(F.length(col)).cast("long").alias("max_len"),
        ).select(F.lit(col).alias("column_name"), "n_null", "n_distinct", "min_len", "max_len")

    return (
        profile(o, "o_orderstatus")
        .unionByName(profile(o, "o_orderpriority"))
        .unionByName(profile(c, "c_mktsegment"))
    )


@query(
    "dq-benford-screen",
    oracle="""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS d
            FROM orders WHERE o_totalprice >= 1
        ),
        observed AS (
            SELECT d, CAST(count(*) AS BIGINT) AS n,
                   count(*) / CAST((SELECT count(*) FROM digits) AS DOUBLE) AS p_obs
            FROM digits GROUP BY d
        )
        SELECT d, n,
               round(p_obs, 6) AS p_observed,
               round(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS p_benford,
               round(abs(p_obs - ln(1.0 + 1.0 / d) / ln(10.0)), 6) AS abs_dev
        FROM observed
    """,
    doc="Benford's-law first-digit screen over order totals: observed "
    "leading-digit frequencies vs the log10(1 + 1/d) law — the "
    "forensic-accounting anomaly test (fabricated or capped amounts "
    "bend the curve; organic multiplicative amounts follow it). Nine "
    "output rows from one digit-extraction groupBy + a broadcast "
    "total; the synthetic fixture's uniform-ish prices will NOT fit "
    "Benford (abs_dev shows it) — which is itself the point: the "
    "screen flags distributions that need explaining, human or "
    "synthetic.",
)
def dq_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    total = digits.agg(F.count("*").alias("total_n"))
    import math

    observed = digits.groupBy("d").agg(F.count("*").alias("n"))
    p_obs = F.col("n") / F.col("total_n").cast("double")
    p_ben = F.log(1.0 + 1.0 / F.col("d")) / math.log(10.0)
    return (
        observed.join(F.broadcast(total))
        .select(
            "d",
            "n",
            F.round(p_obs, 6).alias("p_observed"),
            F.round(p_ben, 6).alias("p_benford"),
            F.round(F.abs(p_obs - p_ben), 6).alias("abs_dev"),
        )
    )


@query(
    "dq-referential-integrity",
    oracle="""
        SELECT 'lineitem.l_orderkey -> orders' AS fk,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation',
               CAST((SELECT count(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM customer) AS BIGINT)
        UNION ALL
        SELECT 'supplier.s_nationkey -> nation',
               CAST((SELECT count(*) FROM supplier s
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = s.s_nationkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM supplier) AS BIGINT)
    """,
    doc="Referential-integrity audit across the star schema's FK edges: "
    "orphan counts via LEFT ANTI joins (lineitem->orders, "
    "orders->customer, customer->nation, supplier->nation), one "
    "summary row per edge. Each anti-join is the usual co-partitioned "
    "hash probe (broadcast when the parent side is a dim); counts are "
    "map-side combinable, so at 100 TB the audit costs one shuffle "
    "per big-big edge and nothing per dim edge. The pre-load gate "
    "that catches a truncated parent extract before it poisons every "
    "downstream join (joins silently DROP orphans; this op makes the "
    "drop visible).",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    def edge(label: str, child: DataFrame, cond, parent: DataFrame) -> DataFrame:
        orphans = child.join(parent, cond, "left_anti").agg(
            F.count("*").cast("long").alias("n_orphans")
        )
        total = child.agg(F.count("*").cast("long").alias("n_rows"))
        return (
            orphans.crossJoin(total)
            .select(F.lit(label).alias("fk"), "n_orphans", "n_rows")
        )

    return (
        edge(
            "lineitem.l_orderkey -> orders",
            li, li.l_orderkey == o.o_orderkey, o,
        )
        .unionByName(
            edge("orders.o_custkey -> customer", o, o.o_custkey == c.c_custkey, c)
        )
        .unionByName(
            edge(
                "customer.c_nationkey -> nation",
                c, c.c_nationkey == n.n_nationkey, n,
            )
        )
        .unionByName(
            edge(
                "supplier.s_nationkey -> nation",
                s, s.s_nationkey == n.n_nationkey, n,
            )
        )
    )


@query(
    "dq-freshness-lag",
    oracle="""
        WITH per_type AS (
            SELECT event_type,
                   max(ts) AS latest_ts,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events GROUP BY event_type
        ),
        anchor AS (SELECT max(ts) AS corpus_max FROM events)
        SELECT event_type, latest_ts, n_rows,
               CAST(date_diff('second', latest_ts, corpus_max) // 60 AS BIGINT)
                   AS lag_minutes,
               date_diff('second', latest_ts, corpus_max) // 60 > 360 AS is_stale
        FROM per_type, anchor
    """,
    doc="Data-freshness audit: per-feed latest watermark vs the corpus "
    "high-water mark, lag in minutes, stale flag at 6 h — the "
    "monitor that catches a silently-dead upstream feed (volume "
    "drift, dq-volume-drift, only catches it a full period later; a "
    "freshness lag fires within the SLA window). Anchored to the "
    "corpus max rather than now() so the op is deterministic and "
    "oracle-checkable; production substitutes current_timestamp() "
    "in the same expression (lag = floor(elapsed seconds / 60) on "
    "both engines — minute-BOUNDARY counting differs between them). "
    "Two map-side-combined max-aggregates "
    "(one per type, one global single-row broadcast) — a metadata "
    "scan at any scale, and with parquet footer stats effectively "
    "free.",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"),
        F.count("*").cast("long").alias("n_rows"),
    )
    anchor = ev.agg(F.max("ts").alias("corpus_max"))
    lag_min = (
        (F.unix_timestamp("corpus_max") - F.unix_timestamp("latest_ts")) / 60
    ).cast("long")
    return per_type.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        "latest_ts",
        "n_rows",
        lag_min.alias("lag_minutes"),
        (lag_min > 360).alias("is_stale"),
    )


@query(
    "dq-distribution-drift-psi",
    oracle="""
        WITH anchor AS (
            SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
        ),
        tagged AS (
            SELECT value,
                   epoch_us(ts) < t0 + (t1 - t0) // 2 AS first_half,
                   least(CAST(floor(value / 50) AS BIGINT), 9) AS bin_id
            FROM events, anchor
        ),
        shares AS (
            SELECT bin_id,
                   CAST(count(*) FILTER (WHERE first_half) AS DOUBLE)
                       / sum(count(*) FILTER (WHERE first_half)) OVER () AS p,
                   CAST(count(*) FILTER (WHERE NOT first_half) AS DOUBLE)
                       / sum(count(*) FILTER (WHERE NOT first_half)) OVER () AS q
            FROM tagged
            GROUP BY bin_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               round(sum((p - q) * ln(p / q)), 6) AS psi,
               sum((p - q) * ln(p / q)) > 0.2 AS drift_alert
        FROM shares
        WHERE p > 0 AND q > 0
    """,
    doc="Population Stability Index between the first and second half "
    "of the event stream (time-split at the corpus midpoint so the "
    "op is deterministic; production splits reference-vs-current "
    "window): values bin into fixed buckets, PSI = "
    "sum((p-q)*ln(p/q)) over bins, alert past the classic 0.2 "
    "threshold — the model-monitoring drift metric that catches a "
    "shifted feature distribution before accuracy dashboards do "
    "(dq-volume-drift sees row counts; this sees SHAPE). One "
    "grouped pass: both halves' bin counts come from FILTER-clause "
    "aggregates in the same groupBy, normalized by window totals "
    "over the 10-row bin relation. Bins with mass in only one half "
    "are excluded (ln undefined); production smooths instead.",
)
def dq_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    tagged = ev.crossJoin(F.broadcast(anchor)).select(
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9)).alias(
            "bin_id"
        ),
        (
            F.unix_micros("ts")
            < F.col("t0") + F.floor((F.col("t1") - F.col("t0")) / 2).cast("long")
        ).alias("first_half"),
    )
    w = Window.partitionBy()
    counts = tagged.groupBy("bin_id").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("c_p"),
        F.sum(F.when(~F.col("first_half"), 1).otherwise(0)).alias("c_q"),
    )
    shares = counts.select(
        "bin_id",
        (F.col("c_p").cast("double") / F.sum("c_p").over(w)).alias("p"),
        (F.col("c_q").cast("double") / F.sum("c_q").over(w)).alias("q"),
    ).filter((F.col("p") > 0) & (F.col("q") > 0))
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return shares.agg(
        F.count("*").cast("long").alias("n_bins"),
        F.round(F.sum(term), 6).alias("psi"),
        (F.sum(term) > 0.2).alias("drift_alert"),
    )


@query(
    "dq-profile-drift",
    oracle="""
        WITH a AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
        b AS (SELECT * FROM orders WHERE o_orderkey % 2 = 1),
        pa AS (
            SELECT 'o_orderstatus' AS col_name,
                   count(*) - count(o_orderstatus) AS nulls,
                   count(DISTINCT o_orderstatus) AS n_distinct,
                   count(*) AS n FROM a
            UNION ALL
            SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority), count(*) FROM a
            UNION ALL
            SELECT 'o_totalprice', count(*) - count(o_totalprice),
                   count(DISTINCT o_totalprice), count(*) FROM a
            UNION ALL
            SELECT 'o_custkey', count(*) - count(o_custkey),
                   count(DISTINCT o_custkey), count(*) FROM a
        ),
        pb AS (
            SELECT 'o_orderstatus' AS col_name,
                   count(*) - count(o_orderstatus) AS nulls,
                   count(DISTINCT o_orderstatus) AS n_distinct,
                   count(*) AS n FROM b
            UNION ALL
            SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority), count(*) FROM b
            UNION ALL
            SELECT 'o_totalprice', count(*) - count(o_totalprice),
                   count(DISTINCT o_totalprice), count(*) FROM b
            UNION ALL
            SELECT 'o_custkey', count(*) - count(o_custkey),
                   count(DISTINCT o_custkey), count(*) FROM b
        )
        SELECT pa.col_name,
               round(CAST(pa.nulls AS DOUBLE) / pa.n, 6) AS null_frac_a,
               round(CAST(pb.nulls AS DOUBLE) / pb.n, 6) AS null_frac_b,
               CAST(pa.n_distinct AS BIGINT) AS distinct_a,
               CAST(pb.n_distinct AS BIGINT) AS distinct_b,
               round(abs(CAST(pa.n_distinct AS DOUBLE) / pa.n
                         - CAST(pb.n_distinct AS DOUBLE) / pb.n), 6)
                   AS distinct_rate_drift,
               (abs(CAST(pa.n_distinct AS DOUBLE) / pa.n
                    - CAST(pb.n_distinct AS DOUBLE) / pb.n) > 0.05
                OR abs(CAST(pa.nulls AS DOUBLE) / pa.n
                       - CAST(pb.nulls AS DOUBLE) / pb.n) > 0.01)
                   AS drifted
        FROM pa JOIN pb USING (col_name)
        ORDER BY col_name
    """,
    doc="Column-profile drift report between two dataset snapshots "
    "(deterministic o_orderkey%2 halves standing in for yesterday/"
    "today): per column, null fraction and distinct-rate on each "
    "side plus a drift flag — the schema-stability check a "
    "warehouse runs before promoting a new load, complementing "
    "dq-distribution-drift-psi (which compares VALUE distributions "
    "of one column; this compares STRUCTURAL profiles of many). "
    "Each half is ONE conditional-aggregate pass producing a "
    "4-column-profile wide row (count distinct per column shares "
    "the scan via Expand, as in agg-multi-distinct-expand); the "
    "long-format pivot and the drift comparison run on the 4-row "
    "summary. Facts read twice (once per half) at worst, never "
    "per-column.",
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def profile(half: DataFrame) -> DataFrame:
        cols = ["o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey"]
        aggs = [F.count("*").alias("n")]
        for c in cols:
            aggs.append((F.count("*") - F.count(c)).alias(f"nulls_{c}"))
            aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        wide = half.agg(*aggs)
        stack = ", ".join(
            f"'{c}', nulls_{c}, nd_{c}" for c in cols
        )
        return wide.selectExpr(
            "n",
            f"stack({len(cols)}, {stack}) AS (col_name, nulls, n_distinct)",
        )

    pa = profile(o.filter(F.col("o_orderkey") % 2 == 0)).select(
        "col_name",
        F.col("nulls").alias("nulls_a"),
        F.col("n_distinct").alias("nd_a"),
        F.col("n").alias("n_a"),
    )
    pb = profile(o.filter(F.col("o_orderkey") % 2 == 1)).select(
        "col_name",
        F.col("nulls").alias("nulls_b"),
        F.col("n_distinct").alias("nd_b"),
        F.col("n").alias("n_b"),
    )
    nf_a = F.col("nulls_a").cast("double") / F.col("n_a")
    nf_b = F.col("nulls_b").cast("double") / F.col("n_b")
    dr_a = F.col("nd_a").cast("double") / F.col("n_a")
    dr_b = F.col("nd_b").cast("double") / F.col("n_b")
    return (
        pa.join(pb, "col_name")
        .select(
            "col_name",
            F.round(nf_a, 6).alias("null_frac_a"),
            F.round(nf_b, 6).alias("null_frac_b"),
            F.col("nd_a").cast("long").alias("distinct_a"),
            F.col("nd_b").cast("long").alias("distinct_b"),
            F.round(F.abs(dr_a - dr_b), 6).alias("distinct_rate_drift"),
            (
                (F.abs(dr_a - dr_b) > 0.05) | (F.abs(nf_a - nf_b) > 0.01)
            ).alias("drifted"),
        )
        .orderBy("col_name")
    )


@query(
    "sample-weighted-priority",
    oracle="""
        WITH rev AS (
            SELECT c_custkey, sum(o_totalprice) AS w
            FROM customer JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey
        ),
        keyed AS (
            SELECT c_custkey, w,
                   power(((c_custkey * 2654435761 % 2147483648) + 0.5)
                         / 2147483648.0, 1.0 / w) AS priority
            FROM rev
        )
        SELECT c_custkey, round(w, 2) AS weight,
               round(priority, 6) AS priority
        FROM keyed
        ORDER BY priority DESC, c_custkey
        LIMIT 10
    """,
    doc="Weighted sampling without replacement via priority keys "
    "(Efraimidis-Spirakis A-ES): each customer gets key u^(1/w) "
    "with w = lifetime revenue and u a DETERMINISTIC uniform from "
    "the portable Knuth mix (no rand() — reproducible across "
    "engines, reruns, and partitionings, the same discipline as "
    "sample-hash-split); the top-k keys ARE a weighted sample "
    "without replacement. The property that makes A-ES the "
    "distributed-systems answer: priorities are embarrassingly "
    "parallel to compute and top-k merges via "
    "TakeOrderedAndProject — no sequential pass, no rejection "
    "loop, no global state. One join+agg for weights, one "
    "map-only priority projection, one bounded top-k.",
    tags=("sample",),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum("o_totalprice").alias("w"))
    )
    u = (
        (F.col("c_custkey") * 2654435761 % 2147483648) + 0.5
    ) / 2147483648.0
    keyed = rev.select(
        "c_custkey",
        "w",
        F.pow(u, 1.0 / F.col("w")).alias("priority"),
    )
    return (
        keyed.select(
            "c_custkey",
            F.round("w", 2).alias("weight"),
            F.round("priority", 6).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "c_custkey")
        .limit(10)
    )


@query(
    "dq-reconciliation",
    oracle="""
        WITH expected AS (
            SELECT l_orderkey,
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                       AS computed_total
            FROM lineitem GROUP BY l_orderkey
        ),
        cmp AS (
            SELECT o.o_orderkey,
                   o.o_totalprice,
                   e.computed_total,
                   abs(o.o_totalprice - e.computed_total)
                       / o.o_totalprice AS rel_err
            FROM orders o JOIN expected e ON e.l_orderkey = o.o_orderkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN rel_err > 0.01 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mismatched,
               round(max(rel_err), 6) AS worst_rel_err,
               round(avg(rel_err), 6) AS mean_rel_err
        FROM cmp
    """,
    doc="Cross-table reconciliation: does each order's header total "
    "agree with the recomputed sum over its line items "
    "(extendedprice * (1-discount) * (1+tax))? The financial-"
    "close control every warehouse runs between a summary table "
    "and its detail — and the TPC-H-style generator here does "
    "NOT maintain the invariant, which is exactly what the "
    "report quantifies (mismatch count at 1% tolerance, worst "
    "and mean relative error) rather than asserting. One "
    "map-side-combinable detail aggregation, one key-"
    "co-partitioned join, one scalar rollup; at 100 TB this is "
    "the cheapest possible two-table audit because nothing but "
    "(key, total) survives either scan.",
    tags=("dq",),
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    expected = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("computed_total")
    )
    cmp = o.join(expected, o.o_orderkey == expected.l_orderkey).select(
        # try_divide: a zero header total (hostile fixture) makes rel_err
        # NULL on both engines (DuckDB x/0 is NULL); count(*) still counts
        # the order, the >0.01 flag and avg/max skip it identically.
        F.try_divide(
            F.abs(F.col("o_totalprice") - F.col("computed_total")),
            F.col("o_totalprice"),
        ).alias("rel_err")
    )
    return cmp.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(F.col("rel_err") > 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.round(F.max("rel_err"), 6).alias("worst_rel_err"),
        F.round(F.avg("rel_err"), 6).alias("mean_rel_err"),
    )


@query(
    "featurestore-time-decay-score",
    oracle="""
        WITH ref AS (SELECT max(ts) AS now_ts FROM events),
        scored AS (
            SELECT user_id,
                   sum(value * exp(-0.1 * date_diff('second', ts, now_ts)
                                   / 86400.0)) AS decay_score,
                   sum(value) AS raw_score,
                   count(*) AS n_events
            FROM events, ref
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        )
        SELECT user_id, round(decay_score, 6) AS decay_score,
               round(raw_score, 4) AS raw_score,
               CAST(n_events AS BIGINT) AS n_events
        FROM scored
        ORDER BY decay_score DESC, user_id
        LIMIT 20
    """,
    doc="Exponentially time-decayed engagement score per user "
    "(half-life ~6.9 days at lambda=0.1/day): each click/purchase "
    "contributes value * e^(-lambda * age) against the corpus "
    "max-timestamp reference — the recency-weighted feature every "
    "ranking/churn model wants, computed as ONE map-side-"
    "combinable aggregation because e^(-l*(now-t)) factors "
    "per-row (no window, no sort, unlike a sliding-window "
    "recency). The reference timestamp comes from a 1-row "
    "broadcast, making the op deterministic across runs on "
    "static data while the production variant pins now() at "
    "feature-materialization time — the point-in-time discipline "
    "featurestore-pit-join enforces downstream.",
    tags=("featurestore",),
)
def featurestore_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    ref = load_table(spark, sf_dir, "events").agg(
        F.max("ts").alias("now_ts")
    )
    age_days = (
        F.col("now_ts").cast("long") - F.col("ts").cast("long")
    ) / 86400.0
    scored = (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value") * F.exp(-0.1 * age_days)).alias(
                "decay_score"
            ),
            F.sum("value").alias("raw_score"),
            F.count("*").alias("n_events"),
        )
    )
    return (
        scored.select(
            "user_id",
            F.round("decay_score", 6).alias("decay_score"),
            F.round("raw_score", 4).alias("raw_score"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        .orderBy(F.col("decay_score").desc(), "user_id")
        .limit(20)
    )


@query(
    "dq-sequence-monotonicity",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY event_id)
                       AS prev_ts
            FROM events
        )
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               round(CAST(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS violation_rate
        FROM seq WHERE prev_ts IS NOT NULL
    """,
    doc="Sequence-monotonicity audit: within each user, do timestamps "
    "increase with event_id (the does-the-sequence-key-agree-with-"
    "event-time invariant that breaks when producers retry or "
    "clocks skew)? One lag() window per user partition, one "
    "conditional count — the cheapest ordering audit a pipeline "
    "can run, and the one that decides whether event_id is safe "
    "as a tiebreaker (every sessionize/funnel op here relies on "
    "it). Violations counted, not asserted, so the op stays a "
    "report on dirty data rather than a crash.",
    tags=("dq",),
)
def dq_sequence_monotonicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "ts", F.lag("ts").over(w).alias("prev_ts")
    ).filter(F.col("prev_ts").isNotNull())
    viol = F.sum(F.when(F.col("ts") < F.col("prev_ts"), 1).otherwise(0))
    return seq.agg(
        F.count("*").cast("long").alias("n_checked"),
        viol.cast("long").alias("n_violations"),
        F.round(viol.cast("double") / F.count("*"), 6).alias(
            "violation_rate"
        ),
    )


@query(
    "privacy-randomized-response",
    oracle="""
        WITH flags AS (
            SELECT DISTINCT user_id,
                   CASE WHEN user_id IN (
                       SELECT user_id FROM events
                       WHERE event_type = 'purchase'
                   ) THEN 1 ELSE 0 END AS truth
            FROM events
        ),
        coins AS (
            SELECT user_id, truth,
                   (user_id * 2654435761 % 2147483648)
                       / 2147483648.0 AS c1,
                   (user_id * 2246822519 % 2147483648)
                       / 2147483648.0 AS c2
            FROM flags
        ),
        reported AS (
            SELECT CASE WHEN c1 < 0.5 THEN truth
                        WHEN c2 < 0.5 THEN 1 ELSE 0 END AS resp,
                   truth
            FROM coins
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               round(avg(CAST(resp AS DOUBLE)), 6) AS reported_rate,
               round((avg(CAST(resp AS DOUBLE)) - 0.25) / 0.5, 6)
                   AS debiased_estimate,
               round(avg(CAST(truth AS DOUBLE)), 6) AS true_rate
        FROM reported
    """,
    doc="Warner randomized response — the classic local-DP mechanism: "
    "each user answers truthfully with prob 1/2, else flips a "
    "second coin (ln(3)-LDP for the 'did you purchase' bit); the "
    "population rate debiases as (observed - 1/4) / (1/2). Coins "
    "are deterministic per-user uniforms from two different "
    "multiplicative mixes (reproducible across engines and runs — "
    "the corpus-curation hash-not-rand discipline applied to "
    "privacy), and the true rate is reported alongside so the "
    "output quantifies the mechanism's own estimation error. One "
    "distinct-user semi-join + one map-only projection + one "
    "scalar agg.",
    tags=("privacy",),
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select(
        "user_id"
    ).distinct().withColumn("truth", F.lit(1))
    flags = (
        ev.select("user_id")
        .distinct()
        .join(purchasers, "user_id", "left")
        .select(
            "user_id", F.coalesce(F.col("truth"), F.lit(0)).alias("truth")
        )
    )
    c1 = (F.col("user_id") * 2654435761 % 2147483648) / 2147483648.0
    c2 = (F.col("user_id") * 2246822519 % 2147483648) / 2147483648.0
    resp = F.when(c1 < 0.5, F.col("truth")).otherwise(
        F.when(c2 < 0.5, 1).otherwise(0)
    )
    reported = flags.select(
        resp.alias("resp"), F.col("truth")
    )
    return reported.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg(F.col("resp").cast("double")), 6).alias(
            "reported_rate"
        ),
        F.round(
            (F.avg(F.col("resp").cast("double")) - 0.25) / 0.5, 6
        ).alias("debiased_estimate"),
        F.round(F.avg(F.col("truth").cast("double")), 6).alias("true_rate"),
    )


@query(
    "dq-winsorize-impact",
    oracle="""
        WITH b AS (
            SELECT quantile_cont(o_totalprice, 0.01) AS p01,
                   quantile_cont(o_totalprice, 0.99) AS p99
            FROM orders
        ),
        capped AS (
            SELECT o_totalprice AS x,
                   least(greatest(o_totalprice, p01), p99) AS xc,
                   p01, p99
            FROM orders, b
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN x <> xc THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_capped,
               round(avg(x), 4) AS mean_before,
               round(avg(xc), 4) AS mean_after,
               round(stddev_samp(x), 4) AS sd_before,
               round(stddev_samp(xc), 4) AS sd_after
        FROM capped
    """,
    doc="Winsorization impact report: what 1%/99% capping of order "
    "totals would change — rows affected, mean and stddev before "
    "vs after — priced BEFORE committing the transform, the same "
    "look-before-you-leap posture as corpus-dedup-impact. Capping "
    "is least(greatest(x, p01), p99) pure codegen after an exact-"
    "percentile pre-pass broadcast (approx_percentile at 100 TB); "
    "both raw and capped moment sets accumulate in the SAME "
    "single-scan aggregation, so the comparison costs one extra "
    "pass over nothing. Complements agg-trimmed-mean: trimming "
    "drops tails, winsorizing clamps them — this op quantifies "
    "the difference on real data.",
    tags=("dq",),
)
def dq_winsorize_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("p01"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )
    capped = o.crossJoin(F.broadcast(b)).select(
        F.col("o_totalprice").alias("x"),
        F.least(
            F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99")
        ).alias("xc"),
    )
    return capped.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("x") != F.col("xc"), 1).otherwise(0))
        .cast("long")
        .alias("n_capped"),
        F.round(F.avg("x"), 4).alias("mean_before"),
        F.round(F.avg("xc"), 4).alias("mean_after"),
        F.round(F.stddev_samp("x"), 4).alias("sd_before"),
        F.round(F.stddev_samp("xc"), 4).alias("sd_after"),
    )


@query(
    "tpch-refresh-sim",
    oracle="""
        WITH inserts AS (
            SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM orders WHERE o_orderkey % 100 = 7
        ),
        deletes AS (
            SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 13
        ),
        refreshed AS (
            SELECT * FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
            UNION ALL
            SELECT * FROM inserts
        )
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_revenue
        FROM refreshed
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="TPC-H refresh-stream simulation (RF1 insert + RF2 delete, "
    "spelled deterministically as keymod slices): ~1% of orders "
    "re-inserted under shifted keys, a disjoint ~1% deleted via "
    "anti-join, then the Q1-style status rollup over the "
    "refreshed relation — the maintenance pattern behind every "
    "warehouse's nightly incremental load, and the batch twin of "
    "what merge-upsert/cdc-snapshot-diff do row-wise. The "
    "anti-join is a broadcast semi-filter (delete keys are "
    "tiny); the insert branch unions BY POSITION after identical "
    "projections. At 100 TB the same plan runs partition-"
    "pruned: refresh slices land in today's partition, the "
    "rollup re-aggregates only affected partitions.",
    tags=("tpch", "maintenance"),
)
def tpch_refresh_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    inserts = o.filter(F.col("o_orderkey") % 100 == 7).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10000000
    )
    deletes = o.filter(F.col("o_orderkey") % 100 == 13).select("o_orderkey")
    kept = o.join(F.broadcast(deletes), "o_orderkey", "left_anti")
    refreshed = kept.unionByName(inserts)
    return (
        refreshed.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "dq-drift-battery",
    oracle="""
        WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        s AS (
            SELECT value AS v,
                   CASE WHEN CAST(ts AS DATE) < d0 + INTERVAL 14 DAY
                        THEN 1 ELSE 0 END AS is_ref
            FROM events, span
        ),
        ext AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
        binned AS (
            SELECT least(63, CAST(floor((v - lo) / (hi - lo) * 64.0)
                                  AS INT)) AS bin,
                   CAST(sum(is_ref) AS DOUBLE) AS c_ref,
                   CAST(sum(1 - is_ref) AS DOUBLE) AS c_cur,
                   max(hi - lo) AS span_
            FROM s, ext GROUP BY 1
        ),
        probs AS (
            SELECT bin, span_,
                   (c_ref + 0.5) / sum(c_ref + 0.5) OVER () AS p,
                   (c_cur + 0.5) / sum(c_cur + 0.5) OVER () AS q,
                   sum(c_ref) OVER (ORDER BY bin)
                       / sum(c_ref) OVER () AS cdf_ref,
                   sum(c_cur) OVER (ORDER BY bin)
                       / sum(c_cur) OVER () AS cdf_cur
            FROM binned
        )
        SELECT round(sum((q - p) * ln(q / p)), 6) AS psi,
               round(max(abs(cdf_ref - cdf_cur)), 6) AS ks_d,
               round(sum(abs(cdf_ref - cdf_cur) * span_ / 64.0), 6)
                   AS wasserstein_1,
               round(0.5 * sum(abs(p - q)), 6) AS total_variation
        FROM probs
    """,
    doc="Unified drift battery: PSI, KS, Wasserstein-1, and total "
    "variation between the first-fortnight (reference) and "
    "later (current) value distributions, ALL from one shared "
    "64-bin histogram — four drift metrics, one fact scan, one "
    "summary window pass. Each metric fails differently (PSI "
    "explodes on empty-bin mismatches — hence the +0.5 Laplace "
    "smoothing on the density-based pair only; KS sees the "
    "worst point; W1 sees total mass displacement; TV bounds "
    "classifier advantage), so monitors should alert on the "
    "battery, not a single favorite — and computing all four "
    "costs exactly what computing one does, which is the point "
    "of sharing the binned-ECDF machinery across "
    "dq-distribution-drift-psi / stats-ks-binned / "
    "stats-wasserstein-binned.",
    tags=("dq", "stats"),
)
def dq_drift_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    # persist the 2-column reference/current tagging: the extent
    # aggregate AND the histogram both consume it — unpersisted each
    # re-planned the events scan + span join (4 fact scans in the r11
    # before-plan)
    s = ev.crossJoin(F.broadcast(span)).select(
        F.col("value").alias("v"),
        F.when(
            F.to_date("ts") < F.date_add(F.col("d0"), 14), 1
        ).otherwise(0).alias("is_ref"),
    ).persist()
    ext = s.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = (
        s.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(63),
                F.floor(
                    (F.col("v") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 64.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(
            F.sum("is_ref").cast("double").alias("c_ref"),
            F.sum(1 - F.col("is_ref")).cast("double").alias("c_cur"),
            F.max(F.col("hi") - F.col("lo")).alias("span_"),
        )
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    probs = binned.select(
        "bin",
        "span_",
        (
            (F.col("c_ref") + 0.5)
            / F.sum(F.col("c_ref") + 0.5).over(w_all)
        ).alias("p"),
        (
            (F.col("c_cur") + 0.5)
            / F.sum(F.col("c_cur") + 0.5).over(w_all)
        ).alias("q"),
        (
            F.sum("c_ref").over(w_cum) / F.sum("c_ref").over(w_all)
        ).alias("cdf_ref"),
        (
            F.sum("c_cur").over(w_cum) / F.sum("c_cur").over(w_all)
        ).alias("cdf_cur"),
    )
    return probs.agg(
        F.round(
            F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))),
            6,
        ).alias("psi"),
        F.round(
            F.max(F.abs(F.col("cdf_ref") - F.col("cdf_cur"))), 6
        ).alias("ks_d"),
        F.round(
            F.sum(
                F.abs(F.col("cdf_ref") - F.col("cdf_cur"))
                * F.col("span_")
                / 64.0
            ),
            6,
        ).alias("wasserstein_1"),
        F.round(0.5 * F.sum(F.abs(F.col("p") - F.col("q"))), 6).alias(
            "total_variation"
        ),
    )


@query(
    "privacy-ldp-histogram",
    oracle="""
        WITH flags AS (
            SELECT DISTINCT user_id,
                   CAST(user_id % 4 AS BIGINT) AS true_bucket
            FROM events
        ),
        coins AS (
            SELECT user_id, true_bucket,
                   (user_id * 2654435761 % 2147483648)
                       / 2147483648.0 AS c1,
                   CAST(user_id * 2246822519 % 2147483648 AS BIGINT) % 4
                       AS rand_bucket
            FROM flags
        ),
        reported AS (
            SELECT CASE WHEN c1 < 0.5 THEN true_bucket
                        ELSE rand_bucket END AS bucket,
                   true_bucket
            FROM coins
        ),
        obs AS (
            SELECT bucket, CAST(count(*) AS DOUBLE) AS c,
                   CAST(sum(count(*)) OVER () AS DOUBLE) AS n
            FROM reported GROUP BY bucket
        ),
        truth AS (
            SELECT true_bucket AS bucket,
                   CAST(count(*) AS BIGINT) AS true_count
            FROM reported GROUP BY true_bucket
        )
        SELECT o.bucket,
               CAST(o.c AS BIGINT) AS reported_count,
               round((o.c - o.n * 0.5 / 4) / 0.5, 2) AS debiased_count,
               t.true_count
        FROM obs o JOIN truth t ON t.bucket = o.bucket
        ORDER BY o.bucket
    """,
    doc="Local-DP histogram by generalized randomized response "
    "(k-RR, k=4 user segments): each user reports their true "
    "bucket with prob 1/2, else a uniformly random bucket — the "
    "aggregator NEVER sees true per-user values — and per-bucket "
    "counts debias as (c - n*(1-p)/k)/p. Deterministic coin and "
    "random-bucket draws from two independent multiplicative "
    "mixes (the privacy-randomized-response discipline extended "
    "from a bit to a categorical), true counts alongside so the "
    "output exhibits the mechanism's error. One distinct-user "
    "agg, one map-only mechanism projection, one grouped count "
    "with a window total — the frequency-oracle shape RAPPOR-"
    "style telemetry ships at fleet scale.",
    tags=("privacy",),
)
def privacy_ldp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    flags = ev.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 4).cast("long").alias("true_bucket")
    )
    c1 = (F.col("user_id") * 2654435761 % 2147483648) / 2147483648.0
    rand_bucket = (
        (F.col("user_id") * 2246822519 % 2147483648).cast("long") % 4
    )
    reported = flags.select(
        F.when(c1 < 0.5, F.col("true_bucket"))
        .otherwise(rand_bucket)
        .alias("bucket"),
        "true_bucket",
    )
    obs = reported.groupBy("bucket").agg(
        F.count("*").cast("double").alias("c")
    ).withColumn("n", F.sum("c").over(Window.partitionBy()))
    truth = reported.groupBy(
        F.col("true_bucket").alias("bucket")
    ).agg(F.count("*").cast("long").alias("true_count"))
    return (
        obs.join(truth, "bucket")
        .select(
            "bucket",
            F.col("c").cast("long").alias("reported_count"),
            F.round((F.col("c") - F.col("n") * 0.5 / 4) / 0.5, 2).alias(
                "debiased_count"
            ),
            "true_count",
        )
        .orderBy("bucket")
    )


@query(
    "dq-rare-categories",
    oracle="""
        WITH counts AS (
            SELECT source AS level, CAST(count(*) AS DOUBLE) AS c
            FROM documents GROUP BY source
        ),
        tot AS (SELECT sum(c) AS n, count(*) AS k FROM counts),
        flagged AS (
            SELECT level, c, c / n AS share, c / n < 0.04 AS is_rare
            FROM counts, tot
        )
        SELECT CAST(count(*) AS BIGINT) AS n_levels,
               CAST(sum(CASE WHEN is_rare THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rare_levels,
               round(sum(CASE WHEN is_rare THEN share ELSE 0 END), 6)
                   AS rare_mass,
               CAST(count(*) - sum(CASE WHEN is_rare THEN 1 ELSE 0 END)
                    + least(1, sum(CASE WHEN is_rare THEN 1 ELSE 0 END))
                    AS BIGINT) AS levels_after_other_bucket
        FROM flagged
    """,
    doc="Rare-category audit: levels of the source column holding "
    "< 4% share, the total probability mass they carry, and the "
    "cardinality after folding them into a single OTHER bucket — "
    "the pre-encoding hygiene every categorical feature needs "
    "(rare levels destabilize target encoding, explode one-hot "
    "width, and leak identity; the k-anonymity ladder in "
    "privacy-generalization-ladder is this same fold driven by "
    "a privacy constraint instead of a frequency one). One hash "
    "agg to the level summary, one windowless reduce — "
    "vocabulary-bounded like every profile op here.",
    tags=("dq",),
)
def dq_rare_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy(F.col("source").alias("level")).agg(
        F.count("*").cast("double").alias("c")
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    flagged = counts.withColumn(
        "share", F.col("c") / F.sum("c").over(w_all)
    ).withColumn("is_rare", F.col("share") < 0.04)
    n_rare = F.sum(F.when(F.col("is_rare"), 1).otherwise(0))
    return flagged.agg(
        F.count("*").cast("long").alias("n_levels"),
        n_rare.cast("long").alias("n_rare_levels"),
        F.round(
            F.sum(F.when(F.col("is_rare"), F.col("share")).otherwise(0.0)),
            6,
        ).alias("rare_mass"),
        (F.count("*") - n_rare + F.least(F.lit(1), n_rare))
        .cast("long")
        .alias("levels_after_other_bucket"),
    )


@query(
    "maintenance-analyze-stats",
    oracle="""
        SELECT 'n_nationkey' AS column_name,
               TRUE AS ndv_within_5pct,
               CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_count,
               CAST(min(n_nationkey) AS VARCHAR) AS min_value,
               CAST(max(n_nationkey) AS VARCHAR) AS max_value
        FROM nation
        UNION ALL
        SELECT 'n_regionkey',
               TRUE,
               CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(min(n_regionkey) AS VARCHAR),
               CAST(max(n_regionkey) AS VARCHAR)
        FROM nation
    """,
    doc="Cost-based-optimizer statistics collection: saveAsTable + "
    "ANALYZE TABLE .. COMPUTE STATISTICS FOR COLUMNS, then read the "
    "catalog column stats back via DESCRIBE EXTENDED — the ndv/"
    "null/min/max numbers Catalyst's CBO joins-reordering and "
    "broadcast decisions consume (spark.sql.cbo.enabled). The "
    "oracle recomputes null/min/max exactly from data; ndv is HLL++-"
    "approximate BY DESIGN (off-by-one already at 25 distinct with "
    "duplicate rows present), so it is asserted as a 5%-tolerance "
    "boolean — the agg-approx-sketch contract idiom. The op's value "
    "is that stats collection is one scan, not a per-column loop. Table is dropped after the stats are read; the result "
    "is catalog metadata, inherently driver-sized.",
    tags=("maintenance",),
)
def maintenance_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    n = load_table(spark, sf_dir, "nation")
    # per-process table name: a fixed name can collide across
    # concurrent sessions sharing a catalog/warehouse (ADVICE r4)
    tbl = f"tss_analyze_nation_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    path = tempfile.mkdtemp(prefix="tss_analyze_")
    n.write.mode("overwrite").option("path", path).saveAsTable(tbl)
    try:
        spark.sql(
            f"ANALYZE TABLE {tbl} COMPUTE STATISTICS "
            "FOR COLUMNS n_nationkey, n_regionkey"
        )
        rows = []
        for col in ["n_nationkey", "n_regionkey"]:
            desc = {
                r["info_name"]: r["info_value"]
                for r in spark.sql(f"DESCRIBE EXTENDED {tbl} {col}").collect()
            }
            # ndv is HLL++-approximate BY DESIGN (observed 26 for 25
            # distinct once duplicate rows exist), so the cross-engine
            # contract is a tolerance, not equality — same idiom as
            # agg-approx-sketch
            exact_ndv = n.select(col).distinct().count()
            ndv_ok = abs(int(desc["distinct_count"]) - exact_ndv) <= max(
                1, int(0.05 * exact_ndv)
            )
            rows.append(
                (
                    col,
                    ndv_ok,
                    int(desc["num_nulls"]),
                    desc["min"],
                    desc["max"],
                )
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # DROP TABLE on an EXTERNAL (path-based) table leaves the
        # parquet files behind — reclaim the scratch dir (ADVICE r4)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "column_name string, ndv_within_5pct boolean, null_count long, "
        "min_value string, max_value string",
    )


@query(
    "dq-partition-digest",
    oracle=f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum({sql_string_hash(
                   "o_orderkey || '|' || o_custkey || '|' || coalesce(o_orderstatus, '<NULL>')"
               )}) AS BIGINT) AS digest
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
    doc="Order-insensitive partition content digests: per month, "
    "sum-mod-P of a canonical per-row hash (key columns joined with "
    "'|', md5-prefix hashed — the engine-portable hash the dedup "
    "stack already uses). Two systems holding the same partition "
    "produce the same digest REGARDLESS of row order or physical "
    "layout, so cross-system reconciliation (after a migration, a "
    "CDC replay, a backfill) compares one row per partition instead "
    "of re-shipping data — the digest-exchange protocol behind "
    "storage-level anti-entropy. Canonical strings stick to "
    "int/string columns (float formatting is not engine-portable). "
    "One scan, one hash aggregation; at 100 TB each partition "
    "digests independently, embarrassingly parallel.",
    tags=("dq", "maintenance"),
)
def dq_partition_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.dedup import string_hash

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.coalesce(F.col("o_orderstatus"), F.lit("<NULL>")),
    )
    return o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(string_hash(canon)).cast("long").alias("digest"),
    )


@query(
    "dq-cardinality-drift",
    oracle="""
        WITH monthly AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(DISTINCT o_custkey) AS n_cust,
                   count(*) AS n_orders
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY strftime(o_orderdate, '%Y-%m')
        ),
        lagged AS (
            SELECT month, n_cust, n_orders,
                   lag(n_cust) OVER (ORDER BY month) AS prev_cust
            FROM monthly
        )
        SELECT month,
               CAST(n_cust AS BIGINT) AS n_distinct_cust,
               CAST(n_orders AS BIGINT) AS n_orders,
               round(CAST(n_orders AS DOUBLE) / n_cust, 6)
                   AS orders_per_cust,
               round(CAST(n_cust AS DOUBLE) / prev_cust - 1, 6)
                   AS cust_mom_drift
        FROM lagged WHERE prev_cust IS NOT NULL
    """,
    doc="Month-over-month CARDINALITY drift: distinct customers per "
    "month, the orders-per-customer density, and the relative "
    "drift vs the prior month — the key-population monitor that "
    "catches what dq-volume-drift (row counts) cannot: an "
    "upstream join gone wrong duplicates rows but also COLLAPSES "
    "or EXPLODES distinct keys, and the density ratio moves "
    "first. Exact distincts per month (one hash agg; at 100 TB "
    "swap count(DISTINCT) for approx_count_distinct per the "
    "agg-approx-sketch pattern, same plan shape), then one lag "
    "window on the month summary.",
    tags=("dq",),
)
def dq_cardinality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count_distinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("month")
    lagged = monthly.select(
        "month",
        "n_cust",
        "n_orders",
        F.lag("n_cust").over(w).alias("prev_cust"),
    )
    return lagged.filter(F.col("prev_cust").isNotNull()).select(
        "month",
        F.col("n_cust").cast("long").alias("n_distinct_cust"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("n_orders").cast("double") / F.col("n_cust"), 6).alias(
            "orders_per_cust"
        ),
        F.round(
            F.col("n_cust").cast("double") / F.col("prev_cust") - 1, 6
        ).alias("cust_mom_drift"),
    )


@query(
    "dq-sequence-integrity",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_id,
                   lag(event_id) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_id,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        )
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST((SELECT count(*) - count(DISTINCT event_id) FROM events)
                    AS BIGINT) AS n_dup_event_ids,
               CAST(sum(CASE WHEN ts = prev_ts THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ts_ties,
               CAST(sum(CASE WHEN prev_id IS NOT NULL AND event_id < prev_id
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_id_inversions,
               round(avg(CASE WHEN prev_ts IS NOT NULL
                              THEN epoch(ts) - epoch(prev_ts) END), 4)
                   AS mean_gap_sec
        FROM seq
    """,
    doc="Event-sequence integrity audit — the ingestion-quality gate "
    "for any event-sourced table: duplicate event ids (exactly-once "
    "violations), same-timestamp ties per user (ordering ambiguity "
    "that makes window results nondeterministic without a tiebreak — "
    "the hazard every ORDER BY in this repo guards with event_id), "
    "id/time inversions (late or re-sequenced delivery; a proxy for "
    "how much watermark delay a streaming consumer needs), and the "
    "mean inter-event gap (sessionization-threshold calibration). "
    "One user-partitioned window pass + one distinct count — both "
    "shuffle-bounded by the key, no global ordering anywhere.",
    tags=("dq",),
)
def dq_sequence_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    dups = ev.agg(
        (F.count("*") - F.count_distinct("event_id"))
        .cast("long")
        .alias("n_dup_event_ids")
    )
    return seq.crossJoin(F.broadcast(dups)).agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
        F.max("n_dup_event_ids").alias("n_dup_event_ids"),
        F.sum(F.when(F.col("ts") == F.col("prev_ts"), 1).otherwise(0))
        .cast("long")
        .alias("n_ts_ties"),
        F.sum(
            F.when(
                F.col("prev_id").isNotNull()
                & (F.col("event_id") < F.col("prev_id")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_id_inversions"),
        F.round(
            F.avg(
                F.when(
                    F.col("prev_ts").isNotNull(),
                    F.col("ts").cast("double") - F.col("prev_ts").cast("double"),
                )
            ),
            4,
        ).alias("mean_gap_sec"),
    )
