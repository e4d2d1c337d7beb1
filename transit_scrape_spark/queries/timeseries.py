"""Time-series rollup and distribution-summary operators over the
events/lineitem fact tables — the "continuous aggregate" family a
hypertable-style store serves (multi-granularity time buckets,
histograms, heavy hitters).

100 TB shape: every op here is a single grouped aggregation on a
derived low-cardinality key (time bucket, bin id, token). Partial
aggregation (map-side combine) collapses each scan partition to at
most |buckets| rows before the shuffle, so the exchange carries the
*summary* cardinality, not the fact cardinality — the plan that
survives a 1000-executor scan of a year of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "rollup-timebucket",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
                   CAST(date_trunc('day',  ts) AS TIMESTAMP) AS bucket_day,
                   value
            FROM events
        )
        SELECT CASE WHEN grouping(bucket_hour) = 0 THEN 'hour' ELSE 'day' END
                   AS granularity,
               coalesce(bucket_hour, bucket_day) AS bucket_ts,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((event_type, bucket_hour), (event_type, bucket_day))
    """,
    doc="Hypertable-style continuous aggregate: hour AND day rollups of "
    "the events stream in ONE pass via GROUPING SETS (the Expand "
    "operator emits both granularities before a single shuffle). The "
    "100 TB pattern for multi-resolution dashboards: partial-agg "
    "collapses each scan partition to |hours|+|days| rows; coarser "
    "granularities could equally be re-rolled from the hour tier "
    "without touching the fact again.",
)
def rollup_timebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("tss_ev_rollup")
    return spark.sql(
        """
        WITH b AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_hour,
                   date_trunc('day',  ts) AS bucket_day,
                   value
            FROM tss_ev_rollup
        )
        SELECT CASE WHEN grouping(bucket_hour) = 0 THEN 'hour' ELSE 'day' END
                   AS granularity,
               coalesce(bucket_hour, bucket_day) AS bucket_ts,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((event_type, bucket_hour), (event_type, bucket_day))
        """
    )


# Fixed histogram bounds: l_extendedprice is bounded well inside
# [0, 100k) at every SF, so the bin edges are constants — at 100 TB
# constants (or a first-pass approx min/max) are exactly how you'd set
# them; a per-query exact min/max would cost an extra full pass.
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 100_000.0, 20
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS


@query(
    "agg-histogram",
    oracle=f"""
        WITH binned AS (
            SELECT least(CAST(floor((l_extendedprice - {_HIST_LO}) / {_HIST_W}) AS BIGINT),
                         {_HIST_BINS - 1}) AS bin_id
            FROM lineitem
        )
        SELECT bin_id,
               round(bin_id * {_HIST_W} + {_HIST_LO}, 2) AS bin_lo,
               round((bin_id + 1) * {_HIST_W} + {_HIST_LO}, 2) AS bin_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM binned
        GROUP BY bin_id
    """,
    doc="Fixed-bin histogram of l_extendedprice (20 equal-width bins, "
    "width_bucket semantics spelled as floor arithmetic so both engines "
    "bin identically): ONE groupBy on a derived int — map-side combine "
    "reduces every scan partition to <=20 rows, the shuffle moves only "
    "bin counts. The same plan at 100 TB; for unknown bounds, seed the "
    "edges from approx_percentile in a sketch pre-pass, never a global "
    "sort.",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bin_id = F.least(
        F.floor((F.col("l_extendedprice") - _HIST_LO) / _HIST_W).cast("long"),
        F.lit(_HIST_BINS - 1).cast("long"),
    ).alias("bin_id")
    return (
        li.select(bin_id)
        .groupBy("bin_id")
        .agg(F.count("*").alias("n"))
        .select(
            "bin_id",
            F.round(F.col("bin_id") * _HIST_W + _HIST_LO, 2).alias("bin_lo"),
            F.round((F.col("bin_id") + 1) * _HIST_W + _HIST_LO, 2).alias("bin_hi"),
            "n",
        )
    )


@query(
    "agg-heavy-hitters",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        counted AS (
            SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
        ),
        total AS (SELECT sum(n) AS total_n FROM counted)
        SELECT token, n, round(CAST(n AS DOUBLE) / total_n, 6) AS share
        FROM counted, total
        WHERE CAST(n AS DOUBLE) / total_n >= 0.005
    """,
    doc="Exact heavy hitters (tokens carrying >=0.5%% of corpus mass): "
    "explode -> count -> broadcast the single-row total -> threshold. "
    "Two shuffles total, both on token (the second is the scalar agg). "
    "At 100 TB the exact version stays viable because the pre-threshold "
    "map-side combine bounds shuffle rows by vocabulary, not corpus "
    "size; if the vocabulary itself explodes (n-grams), swap in a "
    "count-min / Misra-Gries sketch per partition and merge — same "
    "plan shape, bounded state.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counted = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = counted.agg(F.sum("n").alias("total_n"))
    return (
        counted.join(F.broadcast(total))
        .withColumn("share", F.round(F.col("n").cast("double") / F.col("total_n"), 6))
        .filter(F.col("n").cast("double") / F.col("total_n") >= 0.005)
        .select("token", "n", "share")
    )


@query(
    "agg-bitmap-distinct",
    oracle="""
        WITH words AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   user_id // 32 AS word,
                   bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER))
                       AS bits
            FROM events
            GROUP BY 1, 2
        )
        SELECT day,
               CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct_users
        FROM words
        GROUP BY day
    """,
    doc="EXACT distinct counting via bitmap OR-merge (the roaring-bitmap "
    "idea spelled relationally): user ids pack into 32-bit words "
    "(word = id/32, bit = id%32), bit_or() merges per (day, word), "
    "popcount sums give exact distinct users per day. Unlike "
    "count(DISTINCT) — whose state is the value set itself — bitmap "
    "state is id-range/64 bits, merges are associative single "
    "instructions, and partial OR happens map-side; the exact-answer "
    "alternative to HLL when ids are dense integers (the standard "
    "trick for user-id universes at 100 TB).",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    words = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("user_id") / 32).alias("word"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
        ).alias("bits")
    )
    return words.groupBy("day").agg(
        F.sum(F.bit_count(F.col("bits"))).cast("long").alias("n_distinct_users")
    )
