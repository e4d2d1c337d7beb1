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

from pyspark.sql import DataFrame, SparkSession, Window
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
    try:
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
    finally:
        spark.catalog.dropTempView("tss_ev_rollup")


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


@query(
    "window-ewma",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts, value,
                   lag(value, 1) OVER w AS v1,
                   lag(value, 2) OVER w AS v2,
                   lag(value, 3) OVER w AS v3,
                   lag(value, 4) OVER w AS v4
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, ts,
               round(
                 (value + 0.5 * coalesce(v1, 0) + 0.25 * coalesce(v2, 0)
                        + 0.125 * coalesce(v3, 0) + 0.0625 * coalesce(v4, 0))
                 / (1 + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
                      + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
                      + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END
                      + CASE WHEN v4 IS NULL THEN 0 ELSE 0.0625 END), 6)
                   AS ewma
        FROM seq
    """,
    doc="Exponentially-weighted moving average (alpha=0.5, 5-tap "
    "truncation) per user: the infinite recursion ewma_i = a*v_i + "
    "(1-a)*ewma_{i-1} truncates to a fixed lag-tap sum once weights "
    "decay below noise (0.5^5 ~ 3%), which turns an inherently "
    "SEQUENTIAL recurrence into one parallel window over (user, time) "
    "— same single shuffle as any per-key window, no driver loop, no "
    "UDAF state. The smoothing primitive for metric dashboards and "
    "drift monitors; widen the taps to trade accuracy for compute.",
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625]
    lags = [F.col("value")] + [F.lag("value", k).over(w) for k in range(1, 5)]
    num = sum(
        (F.coalesce(v, F.lit(0.0)) * wgt for v, wgt in zip(lags[1:], weights[1:])),
        lags[0] * weights[0],
    )
    den = sum(
        (F.when(v.isNull(), 0.0).otherwise(wgt) for v, wgt in zip(lags[1:], weights[1:])),
        F.lit(weights[0]),
    )
    return ev.select(
        "user_id", "event_id", "ts", F.round(num / den, 6).alias("ewma")
    )


@query(
    "observe-pipeline-metrics",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE value < 0) AS BIGINT) AS n_negative,
               round(sum(value), 2) AS total_value,
               round(max(value), 6) AS max_value
        FROM events
    """,
    doc="Pipeline instrumentation via the Observation API: named "
    "aggregate metrics (row count, invariant-violation count, control "
    "totals) piggyback on a query's EXISTING pass — Spark accumulates "
    "them per task alongside normal execution (DISTINCT aggregates "
    "are the one disallowed form — the accumulator must merge), so "
    "the audit costs "
    "zero extra scans (vs dq-constraint-check, which is its own job). "
    "The observed metrics come back on the driver after the action "
    "and are emitted here as the result row. At 100 TB this is how "
    "every production job self-reports reconciliation counts to the "
    "pipeline ledger without doubling IO.",
)
def observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("pipeline-metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).cast("long").alias("n_negative"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real job's action
    m = obs.get
    # empty input: sum/max observe as None (count stays 0) — keep the
    # op total, matching the oracle's count FILTER = 0 / NULL totals
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_negative"] or 0),
                None if m["total_value"] is None else float(m["total_value"]),
                None if m["max_value"] is None else float(m["max_value"]),
            )
        ],
        "n_rows long, n_negative long, total_value double, max_value double",
    )


@query(
    "timeseries-gap-fill",
    oracle="""
        WITH bounds AS (
            SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
                   CAST(date_trunc('day', max(ts)) AS DATE) AS d1
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM bounds
        ),
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 4) AS total_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT s.day,
               coalesce(d.n, 0) AS n,
               coalesce(d.total_value, 0.0) AS total_value,
               d.n IS NULL AS is_gap
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    doc="Time-series gap filling over a generated date spine: "
    "sequence(min_day, max_day) explodes into one row per calendar "
    "day, the sparse daily aggregate left-joins onto it, and absent "
    "days surface as explicit zero rows with an is_gap flag — the "
    "correction every downstream moving average / EWMA / chart needs "
    "(a missing day is NOT a day with average activity). The spine is "
    "|days| rows however big the fact is, so it broadcasts; the "
    "aggregate is the usual map-side-combined groupBy. Dual of "
    "rolling-active-users' bounded-fanout trick.",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("total_value"), F.lit(0.0)).alias("total_value"),
        F.col("n").isNull().alias("is_gap"),
    )


EWMA_ALPHA = 0.3


@query(
    "timeseries-ewma",
    oracle=f"""
        WITH folded AS (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   count(*) AS n_obs,
                   list_reduce(list(value ORDER BY ts, event_id),
                               (acc, x) -> {1 - EWMA_ALPHA} * acc
                                           + {EWMA_ALPHA} * x) AS ewma
            FROM events
            GROUP BY user_id, date_trunc('day', ts)
        )
        SELECT user_id, day, CAST(n_obs AS BIGINT) AS n_obs,
               CAST(floor(ewma * 1000000 + 0.5) AS BIGINT) AS ewma_e6
        FROM folded
    """,
    doc="Exponentially-weighted moving average per (user, day): events "
    "sorted by (ts, event_id) inside each group, then a sequential "
    "left fold y = (1-a)*y + a*x (pandas ewm(adjust=False) semantics; "
    "seed = first observation). The fold runs as array_sort(collect_"
    "list(struct)) + F.aggregate — pure codegen, one shuffle on the "
    "group key, state bounded by the per-day event count. The naive "
    "closed form sum(x_i*(1-a)^(t-i)) overflows (1-a)^(-i) for long "
    "histories; the fold is exact at any length. At 100 TB, day-"
    "segmented folds recombine exactly because the recurrence is "
    "linear: a segment folds to (scale, offset) = ((1-a)^n, partial), "
    "and segments compose by function composition — the same "
    "mergeable-partial-aggregate shape as variance merging. DuckDB "
    "list_reduce replays the identical ordered fold, so the raw doubles "
    "match bit-for-bit; the output quantizes via floor(x*1e6 + 0.5) "
    "(double arithmetic only) because engine round() implementations "
    "disagree on exact-halfway decimals like 32.3278955 — Spark "
    "HALF_UPs the shortest decimal repr, DuckDB rounds the binary "
    "double, and quantized fixture values make such halfway folds "
    "common enough to matter.",
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = EWMA_ALPHA
    grouped = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", F.col("value")))
        ).alias("seq"),
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(1 - a) * acc + F.lit(a) * x,
    )
    return grouped.select(
        "user_id",
        "day",
        "n_obs",
        F.floor(ewma * 1000000 + 0.5).cast("long").alias("ewma_e6"),
    )


@query(
    "timeseries-resample-ohlc",
    oracle="""
        WITH ranked AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_ts,
                   value,
                   row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            -- a tick with no timestamp is in no bar; a NULL partition
            -- key also triggers a DuckDB parallel-window flake
            -- (row_number restarts per thread chunk -> close == high)
            FROM events WHERE ts IS NOT NULL
        )
        SELECT event_type, bar_ts,
               round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
               round(max(value), 6) AS high,
               round(min(value), 6) AS low,
               round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
               CAST(count(*) AS BIGINT) AS n_ticks
        FROM ranked
        GROUP BY event_type, bar_ts
    """,
    doc="OHLC bar resampling (the financial downsample; same shape as "
    "any first/last-in-bucket rollup): open/close picked by two "
    "row_number windows ordered (ts, event_id) asc/desc — deterministic "
    "under timestamp ties, unlike min_by/max_by on a non-unique sort "
    "key — high/low/count by plain aggregates. One window sort + one "
    "groupBy, both partitioned by (event_type, hour): a single shuffle "
    "at scale, and bars land pre-partitioned for time-range serving.",
)
def timeseries_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # a tick with no timestamp is in no bar (see oracle comment)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bar = F.date_trunc("hour", F.col("ts"))
    wa = Window.partitionBy("event_type", bar).orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", bar).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type",
        bar.alias("bar_ts"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bar_ts").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias("close"),
        F.count("*").cast("long").alias("n_ticks"),
    )


@query(
    "timeseries-autocorr",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   round(sum(value), 6) AS v
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, v,
                   lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
                   lag(v, 2) OVER (PARTITION BY event_type ORDER BY day) AS v2,
                   lag(v, 3) OVER (PARTITION BY event_type ORDER BY day) AS v3
            FROM daily
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(corr(v, v1), 6) AS acf1,
               round(corr(v, v2), 6) AS acf2,
               round(corr(v, v3), 6) AS acf3
        FROM lagged
        GROUP BY event_type
    """,
    doc="Lag-1/2/3 autocorrelation of the daily value series per event "
    "type (the seasonality / persistence screen before fitting any "
    "forecaster). Daily reduction first — the fact table collapses to "
    "|types|x|days| rows via map-side partial agg — then lag windows "
    "within each (small) per-type series and corr aggregates, so the "
    "expensive part is one partial-agg shuffle of summary cardinality; "
    "the window sort touches only the collapsed series. corr() skips "
    "null lag pairs identically in Spark and DuckDB, so series edges "
    "need no special-casing.",
)
def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 2).over(w).alias("v2"),
        F.lag("v", 3).over(w).alias("v3"),
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.corr("v", "v1"), 6).alias("acf1"),
        F.round(F.corr("v", "v2"), 6).alias("acf2"),
        F.round(F.corr("v", "v3"), 6).alias("acf3"),
    )


@query(
    "timeseries-cusum",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(round(sum(value) * 100) AS BIGINT) AS v_c
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        ),
        centered AS (
            SELECT event_type, day, v_c,
                   CAST(round(avg(CAST(v_c AS DOUBLE)) OVER (PARTITION BY event_type))
                        AS BIGINT) AS mu_c
            FROM daily
        )
        SELECT event_type, day,
               round(CAST(sum(v_c - mu_c) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100, 2) AS cusum
        FROM centered
    """,
    doc="CUSUM drift statistic: running sum of deviations from the "
    "per-series mean — the classic level-shift / changepoint screen "
    "(a sustained drift shows as a monotone ramp; white noise hovers "
    "near 0). Same collapsed-daily-series shape as autocorr: one "
    "partial-agg shuffle to |types|x|days|, then an unbounded-frame "
    "mean window and an ordered running-sum window over the tiny "
    "summary relation. Daily totals and the series mean quantize to "
    "integer cents BEFORE the running sum, making the prefix sums "
    "exact integer arithmetic — engines are free to associate window "
    "sums differently (DuckDB uses a segment tree, Spark a running "
    "accumulator), so a float prefix sum near the zero-crossing would "
    "be a parity cliff.",
)
def timeseries_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.round(F.sum("value") * 100).cast("long").alias("v_c"))
    centered = daily.withColumn(
        "mu_c",
        F.round(F.avg(F.col("v_c").cast("double")).over(Window.partitionBy("event_type")))
        .cast("long"),
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return centered.select(
        "event_type",
        "day",
        F.round(
            F.sum(F.col("v_c") - F.col("mu_c")).over(wrun).cast("double") / 100, 2
        ).alias("cusum"),
    )


@query(
    "timeseries-mom-growth",
    oracle="""
        WITH monthly AS (
            SELECT event_type,
                   CAST(date_trunc('month', ts) AS DATE) AS month,
                   round(sum(value), 4) AS v
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        )
        SELECT event_type, month, v,
               round(lag(v) OVER (PARTITION BY event_type ORDER BY month), 4)
                   AS prev_v,
               round((v - lag(v) OVER (PARTITION BY event_type ORDER BY month))
                     / nullif(lag(v) OVER (PARTITION BY event_type ORDER BY month), 0)
                     * 100, 4) AS growth_pct
        FROM monthly
    """,
    doc="Month-over-month growth: monthly rollup then lag-1 window and "
    "percent delta (nullif guards a zero prior month; the first month "
    "reports null growth). The KPI-report staple — at scale the only "
    "full-data pass is the monthly partial agg; the growth window runs "
    "over |types|x|months| rows.",
)
def timeseries_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    monthly = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("month", F.col("ts"))).alias("month")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = Window.partitionBy("event_type").orderBy("month")
    prev = F.lag("v").over(w)
    return monthly.select(
        "event_type",
        "month",
        "v",
        F.round(prev, 4).alias("prev_v"),
        F.round((F.col("v") - prev) / F.nullif(prev, F.lit(0)) * 100, 4).alias(
            "growth_pct"
        ),
    )


@query(
    "timeseries-interpolate-linear",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   round(sum(value), 6) AS v
            FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
            GROUP BY 1
        ),
        holed AS (  -- deterministic synthetic gaps: day-of-month % 4 = 1 unknown
            SELECT day,
                   CASE WHEN extract(day FROM day) % 4 <> 1 THEN v END AS v_known
            FROM daily
        ),
        fenced AS (
            SELECT day, v_known,
                   max(CASE WHEN v_known IS NOT NULL THEN day END) OVER (
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
                   min(CASE WHEN v_known IS NOT NULL THEN day END) OVER (
                       ORDER BY day
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_day
            FROM holed
        )
        SELECT f.day,
               f.v_known IS NULL AS interpolated,
               round(CASE
                   WHEN f.v_known IS NOT NULL THEN f.v_known
                   WHEN pk.v_known IS NULL THEN nk.v_known
                   WHEN nk.v_known IS NULL THEN pk.v_known
                   ELSE pk.v_known
                        + (nk.v_known - pk.v_known)
                          * date_diff('day', f.prev_day, f.day)
                          / date_diff('day', f.prev_day, f.next_day)
               END, 4) AS v_filled
        FROM fenced f
        LEFT JOIN holed pk ON pk.day = f.prev_day
        LEFT JOIN holed nk ON nk.day = f.next_day
    """,
    doc="Linear interpolation of missing points in a daily series "
    "(pandas interpolate(method='linear') semantics, distributed). "
    "Gaps are synthesized deterministically (day-of-month % 4 == 1 "
    "treated as unknown) so the op exercises real holes on any "
    "fixture. Shape: running max/min windows locate each row's "
    "bracketing known days WITHOUT ignore-nulls support, then two "
    "self-joins on the (tiny) daily relation fetch the bracket values "
    "and the slope formula fills the hole; series edges fall back to "
    "nearest-known. At scale the windows and joins run over the "
    "date-spine cardinality, never the fact.",
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    # persist the CALENDAR-BOUNDED holed series (<= ~3650 rows at any
    # scale) as ONE cached partition: the fence windows and both
    # known-value lookup sides re-consumed it (3 events scans -> 1)
    holed = daily.select(
        "day",
        F.when(F.dayofmonth("day") % 4 != 1, F.col("v")).alias("v_known"),
    ).coalesce(1).persist()
    known_day = F.when(F.col("v_known").isNotNull(), F.col("day"))
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("day").rowsBetween(1, Window.unboundedFollowing)
    fenced = holed.select(
        "day",
        "v_known",
        F.max(known_day).over(wprev).alias("prev_day"),
        F.min(known_day).over(wnext).alias("next_day"),
    )
    pk = holed.select(F.col("day").alias("pk_day"), F.col("v_known").alias("pk_v"))
    nk = holed.select(F.col("day").alias("nk_day"), F.col("v_known").alias("nk_v"))
    f = (
        fenced.join(F.broadcast(pk), fenced.prev_day == pk.pk_day, "left")
        .join(F.broadcast(nk), fenced.next_day == nk.nk_day, "left")
    )
    frac = F.datediff(F.col("day"), F.col("prev_day")) / F.datediff(
        F.col("next_day"), F.col("prev_day")
    )
    filled = (
        F.when(F.col("v_known").isNotNull(), F.col("v_known"))
        .when(F.col("pk_v").isNull(), F.col("nk_v"))
        .when(F.col("nk_v").isNull(), F.col("pk_v"))
        .otherwise(F.col("pk_v") + (F.col("nk_v") - F.col("pk_v")) * frac)
    )
    return f.select(
        "day",
        F.col("v_known").isNull().alias("interpolated"),
        F.round(filled, 4).alias("v_filled"),
    )


@query(
    "timeseries-seasonal-naive-eval",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   round(sum(value), 6) AS v
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        ),
        fc AS (
            SELECT event_type, day, v,
                   lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
            FROM daily
        )
        SELECT event_type,
               CAST(count(yhat) AS BIGINT) AS n_scored,
               round(avg(abs(v - yhat)), 4) AS mae,
               round(avg(abs(v - yhat) / abs(v)) * 100, 4) AS mape_pct,
               round(avg(v - yhat), 4) AS bias
        FROM fc
        GROUP BY event_type
    """,
    doc="Seasonal-naive baseline evaluation: forecast each day with the "
    "value 7 days prior (lag-7 window), score MAE / MAPE / bias per "
    "series — the floor every real forecaster must beat, and the "
    "first number a forecasting pipeline should publish (cf. "
    "timeseries-autocorr for picking the season length). avg() "
    "skips the null first week identically in both engines; "
    "n_scored counts only scored days. Same collapsed-daily shape "
    "as the rest of the family: the fact is touched once.",
)
def timeseries_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    fc = daily.withColumn(
        "yhat", F.lag("v", 7).over(Window.partitionBy("event_type").orderBy("day"))
    )
    err = F.col("v") - F.col("yhat")
    return fc.groupBy("event_type").agg(
        F.count("yhat").cast("long").alias("n_scored"),
        F.round(F.avg(F.abs(err)), 4).alias("mae"),
        F.round(F.avg(F.abs(err) / F.abs(F.col("v"))) * 100, 4).alias("mape_pct"),
        F.round(F.avg(err), 4).alias("bias"),
    )


@query(
    "timeseries-rolling-corr",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   round(sum(CASE WHEN event_type = 'view' THEN value END), 6)
                       AS v_view,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6)
                       AS v_purchase
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1
        ),
        rolled AS (
            SELECT day,
                   corr(v_view, v_purchase) OVER (
                       ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS c,
                   count(*) OVER (
                       ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS n_window
            FROM daily
        )
        SELECT day, CAST(n_window AS BIGINT) AS n_window,
               round(c, 4) AS rolling_corr
        FROM rolled
        WHERE n_window = 14
    """,
    doc="Rolling 14-day correlation between the view and purchase "
    "series: conditional aggregation pivots both series out of ONE "
    "events pass (no self-join of two filtered scans), then corr() "
    "as a window aggregate over a trailing ROWS frame, emitted only "
    "for full windows. The co-movement monitor behind 'did the "
    "funnel decouple this week' alerts — a structural break shows "
    "as the rolling corr diving while each series alone looks "
    "normal (cf. timeseries-autocorr for the self-lag view). One "
    "fact shuffle to |days| rows; the window sort is over the tiny "
    "daily spine.",
)
def timeseries_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(
        F.round(
            F.sum(F.when(F.col("event_type") == "view", F.col("value"))), 6
        ).alias("v_view"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("v_purchase"),
    )
    w = Window.orderBy("day").rowsBetween(-13, Window.currentRow)
    rolled = daily.select(
        "day",
        F.corr("v_view", "v_purchase").over(w).alias("c"),
        F.count("*").over(w).alias("n_window"),
    ).filter(F.col("n_window") == 14)
    return rolled.select(
        "day",
        F.col("n_window").cast("long").alias("n_window"),
        F.round(F.col("c"), 4).alias("rolling_corr"),
    )


@query(
    "timeseries-yoy-growth",
    oracle="""
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   round(sum(o_totalprice), 2) AS rev,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT cur.month, cur.rev, cur.n_orders,
               prev.rev AS rev_prior_year,
               round((cur.rev - prev.rev) / prev.rev * 100, 4) AS yoy_pct
        FROM monthly cur
        JOIN monthly prev ON prev.month = cur.month - INTERVAL 12 MONTH
    """,
    doc="Year-over-year growth per month: monthly revenue joined to "
    "itself at month minus 12 — the seasonality-free growth read "
    "(timeseries-mom-growth compares adjacent months and conflates "
    "seasonality with trend; YoY cancels it). Deliberately a "
    "calendar-shift EQUI-JOIN rather than lag(12): lag counts ROWS, "
    "so one missing month silently compares against the wrong year "
    "forever after — the classic sparse-series bug. The join runs "
    "on the |months| summary; months without a prior-year partner "
    "drop out (inner join) rather than reporting a false base.",
)
def timeseries_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev"),
        F.count("*").cast("long").alias("n_orders"),
    )
    prev = monthly.select(
        F.col("month").alias("p_month"), F.col("rev").alias("rev_prior_year")
    )
    return (
        monthly.join(prev, F.add_months(F.col("p_month"), 12) == F.col("month"))
        .select(
            "month",
            "rev",
            "n_orders",
            "rev_prior_year",
            F.round(
                (F.col("rev") - F.col("rev_prior_year"))
                / F.col("rev_prior_year")
                * 100,
                4,
            ).alias("yoy_pct"),
        )
    )


@query(
    "timeseries-periodogram",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT x - avg(x) OVER () AS xc,
                   CAST(row_number() OVER (ORDER BY day) - 1 AS DOUBLE) AS t,
                   CAST(count(*) OVER () AS DOUBLE) AS n
            FROM daily
        ),
        freqs AS (SELECT CAST(range AS DOUBLE) AS k FROM range(1, 11))
        SELECT CAST(k AS BIGINT) AS k,
               round(max(n) / k, 4) AS period_days,
               round((power(sum(xc * cos(2 * pi() * k * t / n)), 2)
                      + power(sum(xc * sin(2 * pi() * k * t / n)), 2))
                     / power(max(n), 2), 6) AS power_norm
        FROM idx, freqs
        GROUP BY k ORDER BY k
    """,
    doc="Discrete-Fourier periodogram of the daily event-count series "
    "at harmonics k=1..10: spectral power via two plain SUM "
    "aggregates per frequency (sum(x*cos), sum(x*sin)) — the DFT as "
    "a GROUP BY, no FFT library, no single-node gather. The fact "
    "pass is one groupBy(day); mean-centering (kills the DC spike) "
    "and the day index ride windows over the ~30-row daily summary, "
    "which then cross-joins a 10-row frequency table. At 100 TB the "
    "same plan holds: the only thing that grows is the first "
    "hash-agg, and power at every frequency still reduces "
    "map-side. Power normalized by N^2 to keep magnitudes O(var).",
    tags=("timeseries", "stats"),
)
def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w_all = Window.partitionBy()
    idx = daily.select(
        (F.col("x") - F.avg("x").over(w_all)).alias("xc"),
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("double")
        .alias("t"),
        F.count("*").over(w_all).cast("double").alias("n"),
    )
    freqs = spark.range(1, 11).select(F.col("id").cast("double").alias("k"))
    ang = 2 * F.expr("pi()") * F.col("k") * F.col("t") / F.col("n")
    return (
        idx.crossJoin(F.broadcast(freqs))
        .groupBy("k")
        .agg(
            F.round(F.max("n") / F.col("k"), 4).alias("period_days"),
            F.round(
                (
                    F.pow(F.sum(F.col("xc") * F.cos(ang)), 2)
                    + F.pow(F.sum(F.col("xc") * F.sin(ang)), 2)
                )
                / F.pow(F.max("n"), 2),
                6,
            ).alias("power_norm"),
        )
        .select(
            F.col("k").cast("long").alias("k"), "period_days", "power_norm"
        )
        .orderBy("k")
    )


@query(
    "timeseries-changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY event_type, CAST(ts AS DATE)
        ),
        cum AS (
            SELECT event_type, day,
                   row_number() OVER w AS t,
                   sum(x) OVER w AS cs,
                   sum(x * x) OVER w AS csq,
                   count(*) OVER (PARTITION BY event_type) AS n,
                   sum(x) OVER (PARTITION BY event_type) AS ts_,
                   sum(x * x) OVER (PARTITION BY event_type) AS tsq
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        gains AS (
            SELECT event_type, day, t, n,
                   (tsq - ts_ * ts_ / n)
                   - (csq - cs * cs / t)
                   - ((tsq - csq) - (ts_ - cs) * (ts_ - cs) / (n - t))
                       AS gain,
                   cs / t AS mean_left,
                   (ts_ - cs) / (n - t) AS mean_right
            FROM cum WHERE t >= 2 AND t <= n - 2
        )
        SELECT event_type, day AS split_day,
               round(gain, 6) AS sse_gain,
               round(mean_left, 6) AS mean_left,
               round(mean_right, 6) AS mean_right
        FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
                          ORDER BY gain DESC, day) AS rk
            FROM gains
        ) WHERE rk = 1 ORDER BY event_type
    """,
    doc="Single-changepoint detection (first step of binary "
    "segmentation) per event_type series: the split t* maximizing "
    "the SSE reduction SSE_full - SSE_left(t) - SSE_right(t), with "
    "every candidate split scored in O(1) from running cumulative "
    "(sum, sumsq) windows — the classic prefix-sum trick that turns "
    "the naive O(n^2) segment-cost scan into one window pass. Facts "
    "are touched once (groupBy day); all candidate scoring runs on "
    "the ~30-row-per-series summary, co-partitioned by series key. "
    "Interior splits only (2 <= t <= n-2) so both segment variances "
    "are defined; deterministic earliest-day tie-break.",
    tags=("timeseries", "stats"),
)
def timeseries_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias("t"),
        F.sum("x").over(w).alias("cs"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("csq"),
        F.count("*").over(w_tot).alias("n"),
        F.sum("x").over(w_tot).alias("ts_"),
        F.sum(F.col("x") * F.col("x")).over(w_tot).alias("tsq"),
    )
    gain = (
        (F.col("tsq") - F.col("ts_") * F.col("ts_") / F.col("n"))
        - (F.col("csq") - F.col("cs") * F.col("cs") / F.col("t"))
        - (
            (F.col("tsq") - F.col("csq"))
            - (F.col("ts_") - F.col("cs"))
            * (F.col("ts_") - F.col("cs"))
            / (F.col("n") - F.col("t"))
        )
    )
    gains = cum.filter(
        (F.col("t") >= 2) & (F.col("t") <= F.col("n") - 2)
    ).select(
        "event_type",
        "day",
        gain.alias("gain"),
        (F.col("cs") / F.col("t")).alias("mean_left"),
        ((F.col("ts_") - F.col("cs")) / (F.col("n") - F.col("t"))).alias(
            "mean_right"
        ),
    )
    best = gains.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("gain").desc(), "day"
            )
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("day").alias("split_day"),
        F.round("gain", 6).alias("sse_gain"),
        F.round("mean_left", 6).alias("mean_left"),
        F.round("mean_right", 6).alias("mean_right"),
    ).orderBy("event_type")


@query(
    "timeseries-stl-naive",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        tr AS (
            SELECT day, x,
                   CASE WHEN count(*) OVER w7 = 7
                        THEN avg(x) OVER w7 END AS trend,
                   (isodow(day) - 1) % 7 AS dow
            FROM daily
            WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING)
        ),
        seas AS (
            SELECT *,
                   avg(x - trend) OVER (PARTITION BY dow) AS seasonal_raw
            FROM tr
        ),
        norm AS (
            SELECT *,
                   seasonal_raw - avg(seasonal_raw) OVER () AS seasonal
            FROM seas
        )
        SELECT day, x,
               round(trend, 6) AS trend,
               round(seasonal, 6) AS seasonal,
               round(x - trend - seasonal, 6) AS residual
        FROM norm WHERE trend IS NOT NULL ORDER BY day
    """,
    doc="Naive STL-style decomposition of the daily event-count "
    "series: trend = centered 7-day moving average (emitted only "
    "where the full 7-row frame exists — edge days get NULL, not a "
    "shrunken-window estimate), seasonal = day-of-week mean of the "
    "detrended series re-centered to sum to zero (the STL "
    "identifiability constraint), residual = x - trend - seasonal. "
    "Facts collapse in one groupBy(day) hash agg; every window "
    "(moving average, per-dow mean, global recenter) runs over the "
    "daily summary. Weekday via Spark weekday() == DuckDB "
    "(isodow-1)%7, both 0=Monday, avoiding the engines' different "
    "dayofweek conventions.",
    tags=("timeseries",),
)
def timeseries_stl_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "x",
        F.when(F.count("*").over(w7) == 7, F.avg("x").over(w7)).alias(
            "trend"
        ),
        F.weekday("day").alias("dow"),
    )
    seas = tr.withColumn(
        "seasonal_raw",
        F.avg(F.col("x") - F.col("trend")).over(Window.partitionBy("dow")),
    )
    norm = seas.withColumn(
        "seasonal",
        F.col("seasonal_raw")
        - F.avg("seasonal_raw").over(Window.partitionBy()),
    )
    return (
        norm.filter(F.col("trend").isNotNull())
        .select(
            "day",
            "x",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(
                F.col("x") - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
        )
        .orderBy("day")
    )


@query(
    "timeseries-vwap",
    oracle="""
        WITH daily AS (
            SELECT CAST(l_shipdate AS DATE) AS day,
                   sum(l_extendedprice * l_quantity) AS pq,
                   sum(l_quantity) AS q
            FROM lineitem WHERE l_shipdate IS NOT NULL
            GROUP BY CAST(l_shipdate AS DATE)
        )
        SELECT day,
               round(pq / q, 6) AS day_vwap,
               round(sum(pq) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                                   AND CURRENT ROW)
                     / sum(q) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                                    AND CURRENT ROW), 6) AS vwap_7d,
               round(sum(pq) OVER (ORDER BY day)
                     / sum(q) OVER (ORDER BY day), 6) AS vwap_cum
        FROM daily ORDER BY day
    """,
    doc="Volume-weighted average price of shipped lineitems: per-day "
    "VWAP plus 7-day rolling and cumulative variants. The "
    "ratio-of-sums decomposes perfectly for scale: ONE fact hash "
    "agg produces per-day (sum pq, sum q) partials — map-side "
    "combinable — and every rolling/cumulative frame sums the "
    "PARTIALS over the daily summary then divides once (never "
    "average the daily ratios: avg-of-VWAPs is not the VWAP). "
    "The frame windows share one sort of the ~2500-row summary.",
    tags=("timeseries",),
)
def timeseries_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows without a ship date cannot be placed on the time axis (null
    # ordering diverges between engines) — drop them on BOTH engines
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("pq"),
        F.sum("l_quantity").alias("q"),
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        F.round(F.col("pq") / F.col("q"), 6).alias("day_vwap"),
        F.round(F.sum("pq").over(w7) / F.sum("q").over(w7), 6).alias(
            "vwap_7d"
        ),
        F.round(F.sum("pq").over(wc) / F.sum("q").over(wc), 6).alias(
            "vwap_cum"
        ),
    ).orderBy("day")


@query(
    "timeseries-max-drawdown",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        cum AS (
            SELECT day, sum(rev) OVER (ORDER BY day) AS equity
            FROM daily
        ),
        dd AS (
            SELECT day, equity,
                   max(equity) OVER (ORDER BY day) AS peak
            FROM cum
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(max((peak - equity) / peak), 6) AS max_drawdown,
               round(max(peak - equity), 2) AS max_drawdown_abs
        FROM dd
    """,
    doc="Maximum drawdown of the cumulative daily revenue curve: "
    "running peak via a cumulative max window, drawdown = "
    "(peak - equity)/peak, global max — the risk metric every "
    "equity-curve monitor reports, in three windows and an "
    "aggregate. One fact hash agg to the daily series; the "
    "cumulative sum and cumulative max share one sort of the "
    "summary. Revenue is monotone-positive here so equity only "
    "rises day-over-day — the drawdown within a day's partial "
    "fills would need intraday buckets, same plan one level "
    "finer.",
    tags=("timeseries",),
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select("day", F.sum("rev").over(wc).alias("equity"))
    dd = cum.select(
        "day", "equity", F.max("equity").over(wc).alias("peak")
    )
    return dd.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.max((F.col("peak") - F.col("equity")) / F.col("peak")), 6
        ).alias("max_drawdown"),
        F.round(F.max(F.col("peak") - F.col("equity")), 2).alias(
            "max_drawdown_abs"
        ),
    )


@query(
    "timeseries-time-weighted-avg",
    oracle="""
        WITH seq AS (
            SELECT event_type, CAST(ts AS DATE) AS day, ts, value,
                   lead(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        weighted AS (
            SELECT event_type, day, value,
                   date_diff('second', ts, nxt) AS dt
            FROM seq WHERE nxt IS NOT NULL
        )
        SELECT event_type, day,
               CAST(count(*) AS BIGINT) AS n_intervals,
               round(sum(value * dt) / sum(dt), 6) AS twap,
               round(avg(value), 6) AS naive_avg
        FROM weighted
        WHERE day IN (SELECT day FROM weighted GROUP BY day
                      ORDER BY day LIMIT 5)
        GROUP BY event_type, day
        ORDER BY event_type, day
    """,
    doc="Time-weighted average (TWAP) per series per day for "
    "irregularly-sampled values: each observation is weighted by "
    "its holding time (seconds until the next observation, via "
    "lead() within the day), so bursts of samples don't dominate "
    "the way they do in the naive mean (reported alongside for "
    "contrast). The sensor/price aggregation every irregular "
    "series needs. One window shuffle on (series, day) — "
    "observations stay in their partition — then a hash agg of "
    "(sum v*dt, sum dt) partials; restricted to the first 5 days "
    "to keep the parity fixture small, the full-range plan is "
    "identical.",
    tags=("timeseries",),
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "value",
        F.lead("ts").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    weighted = seq.select(
        "event_type",
        "day",
        "value",
        (F.col("nxt").cast("long") - F.col("ts").cast("long")).alias("dt"),
    )
    days = (
        weighted.select("day").distinct().orderBy("day").limit(5)
    )
    return (
        weighted.join(F.broadcast(days), "day")
        .groupBy("event_type", "day")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
            ).alias("twap"),
            F.round(F.avg("value"), 6).alias("naive_avg"),
        )
        .select("event_type", "day", "n_intervals", "twap", "naive_avg")
        .orderBy("event_type", "day")
    )


@query(
    "timeseries-peak-detect",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        ctx AS (
            SELECT event_type, day, x,
                   lag(x) OVER w AS prev, lead(x) OVER w AS nxt,
                   avg(x) OVER (PARTITION BY event_type) AS mu,
                   stddev_samp(x) OVER (PARTITION BY event_type) AS sd
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, day AS peak_day, x AS volume,
               round((x - mu) / sd, 6) AS z
        FROM ctx
        WHERE prev IS NOT NULL AND nxt IS NOT NULL
          AND x > prev AND x > nxt AND (x - mu) / sd > 0.5
        ORDER BY event_type, peak_day
    """,
    doc="Local-peak detection on daily volume per series: a day is a "
    "peak when it exceeds BOTH neighbors (strict local maximum "
    "via lag/lead on one shared sort) AND clears a z > 0.5 "
    "prominence floor against the series mean (otherwise every "
    "noise wiggle is a 'peak'). Interior days only — endpoints "
    "have one neighbor and are excluded rather than "
    "half-compared. One fact hash agg; all four window "
    "expressions ride the same per-series partition of the "
    "~30-row summary. The spike-finder feeding "
    "anomaly-alert-debounce's cooldown logic.",
    tags=("timeseries",),
)
def timeseries_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    ctx = daily.select(
        "event_type",
        "day",
        "x",
        F.lag("x").over(w).alias("prev"),
        F.lead("x").over(w).alias("nxt"),
        F.avg("x").over(wt).alias("mu"),
        F.stddev_samp("x").over(wt).alias("sd"),
    )
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    return (
        ctx.filter(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("x") > F.col("prev"))
            & (F.col("x") > F.col("nxt"))
            & (z > 0.5)
        )
        .select(
            "event_type",
            F.col("day").alias("peak_day"),
            F.col("x").alias("volume"),
            F.round(z, 6).alias("z"),
        )
        .orderBy("event_type", "peak_day")
    )


@query(
    "timeseries-variance-ratio",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        rets AS (
            SELECT day,
                   ln(x / lag(x) OVER (ORDER BY day)) AS r1,
                   ln(x / lag(x, 5) OVER (ORDER BY day)) AS r5
            FROM daily
        )
        SELECT CAST(count(r1) AS BIGINT) AS n_returns,
               round(var_samp(r1), 6) AS var_1d,
               round(var_samp(r5), 6) AS var_5d,
               round(var_samp(r5) / (5 * var_samp(r1)), 6)
                   AS variance_ratio,
               round((var_samp(r5) / (5 * var_samp(r1)) - 1)
                     * sqrt(count(r5) * 5.0 / (2 * (5 - 1))), 6)
                   AS z_approx
        FROM rets
    """,
    doc="Lo-MacKinlay variance-ratio test on daily log-changes of "
    "event volume: under a random walk, Var of 5-day log changes "
    "= 5x Var of 1-day changes; VR < 1 flags mean reversion, "
    "> 1 momentum (the z uses the homoskedastic asymptotic "
    "sqrt(nq/(2(q-1)))). Overlapping q-day changes come from a "
    "second lag(x,5) on the SAME window sort — both horizons, "
    "one sort of the ~30-row daily summary, facts aggregated "
    "once. Companion evidence to stats-runs-test (sign-based) "
    "and timeseries-hurst-rs (range-based): three independent "
    "looks at the same 'is this series trending' question.",
    tags=("timeseries", "stats"),
)
def timeseries_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w = Window.orderBy("day")
    rets = daily.select(
        F.log(F.col("x") / F.lag("x", 1).over(w)).alias("r1"),
        F.log(F.col("x") / F.lag("x", 5).over(w)).alias("r5"),
    )
    vr = F.var_samp("r5") / (5 * F.var_samp("r1"))
    return rets.agg(
        F.count("r1").cast("long").alias("n_returns"),
        F.round(F.var_samp("r1"), 6).alias("var_1d"),
        F.round(F.var_samp("r5"), 6).alias("var_5d"),
        F.round(vr, 6).alias("variance_ratio"),
        F.round(
            (vr - 1) * F.sqrt(F.count("r5") * 5.0 / (2 * (5 - 1))), 6
        ).alias("z_approx"),
    )


@query(
    "timeseries-stl-anomaly",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        tr AS (
            SELECT day, x,
                   CASE WHEN count(*) OVER w7 = 7
                        THEN avg(x) OVER w7 END AS trend,
                   (isodow(day) - 1) % 7 AS dow
            FROM daily
            WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING)
        ),
        seas AS (
            SELECT *, avg(x - trend) OVER (PARTITION BY dow)
                          AS seasonal_raw
            FROM tr
        ),
        norm AS (
            SELECT *, seasonal_raw - avg(seasonal_raw) OVER () AS seasonal
            FROM seas
        ),
        resid AS (
            SELECT day, x, x - trend - seasonal AS r
            FROM norm WHERE trend IS NOT NULL
        ),
        scored AS (
            SELECT day, x, r,
                   (r - avg(r) OVER ()) / stddev_samp(r) OVER () AS z
            FROM resid
        )
        SELECT day, x AS volume, round(r, 6) AS residual,
               round(z, 6) AS residual_z
        FROM scored WHERE abs(z) > 1.5 ORDER BY day
    """,
    doc="Seasonality-aware anomaly detection: the timeseries-stl-naive "
    "decomposition's RESIDUAL is z-scored and days beyond |z| > 1.5 "
    "flagged — the upgrade over anomaly-zscore that stops crying "
    "wolf every weekend, because the day-of-week effect and the "
    "trend are subtracted BEFORE scoring (raw z-scores conflate "
    "'anomalous' with 'Saturday'). Identical window pipeline to "
    "the decomposition op (one fact agg, everything else over the "
    "daily summary) plus one more scoring window; anomalies on "
    "residuals compose with anomaly-alert-debounce's cooldown "
    "downstream.",
    tags=("timeseries",),
)
def timeseries_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "x",
        F.when(F.count("*").over(w7) == 7, F.avg("x").over(w7)).alias(
            "trend"
        ),
        F.weekday("day").alias("dow"),
    )
    seas = tr.withColumn(
        "seasonal_raw",
        F.avg(F.col("x") - F.col("trend")).over(Window.partitionBy("dow")),
    )
    w_all = Window.partitionBy()
    norm = seas.withColumn(
        "seasonal",
        F.col("seasonal_raw") - F.avg("seasonal_raw").over(w_all),
    )
    resid = norm.filter(F.col("trend").isNotNull()).select(
        "day",
        "x",
        (F.col("x") - F.col("trend") - F.col("seasonal")).alias("r"),
    )
    scored = resid.select(
        "day",
        "x",
        "r",
        (
            (F.col("r") - F.avg("r").over(w_all))
            / F.stddev_samp("r").over(w_all)
        ).alias("z"),
    )
    return (
        scored.filter(F.abs("z") > 1.5)
        .select(
            "day",
            F.col("x").alias("volume"),
            F.round("r", 6).alias("residual"),
            F.round("z", 6).alias("residual_z"),
        )
        .orderBy("day")
    )


@query(
    "timeseries-slope-change",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT y, CAST(row_number() OVER (ORDER BY day) AS DOUBLE) AS t,
                   CAST(count(*) OVER () AS DOUBLE) AS n
            FROM daily
        ),
        seg AS (
            SELECT y, t, CASE WHEN t <= n / 2 THEN 'pre' ELSE 'post' END
                       AS period
            FROM idx
        ),
        fits AS (
            SELECT period,
                   count(*) AS n,
                   (sum(t * y) - sum(t) * sum(y) / count(*))
                   / (sum(t * t) - sum(t) * sum(t) / count(*)) AS slope,
                   (sum(y * y) - sum(y) * sum(y) / count(*)
                    - power(sum(t * y) - sum(t) * sum(y) / count(*), 2)
                      / (sum(t * t) - sum(t) * sum(t) / count(*)))
                   / (count(*) - 2)
                   / (sum(t * t) - sum(t) * sum(t) / count(*)) AS var_slope
            FROM seg GROUP BY period
        )
        SELECT round(max(CASE WHEN period = 'pre' THEN slope END), 6)
                   AS slope_pre,
               round(max(CASE WHEN period = 'post' THEN slope END), 6)
                   AS slope_post,
               round(max(CASE WHEN period = 'post' THEN slope END)
                     - max(CASE WHEN period = 'pre' THEN slope END), 6)
                   AS slope_change,
               round((max(CASE WHEN period = 'post' THEN slope END)
                      - max(CASE WHEN period = 'pre' THEN slope END))
                     / sqrt(max(CASE WHEN period = 'pre'
                                     THEN var_slope END)
                            + max(CASE WHEN period = 'post'
                                       THEN var_slope END)), 6)
                   AS slope_change_z
        FROM fits
    """,
    doc="Interrupted-time-series slope-change test: independent OLS "
    "trend fits on the first and second halves of the daily "
    "series, with the slope difference z-scored against the "
    "combined slope standard errors (var(b) = MSE/Sxx, both in "
    "closed form from the same moment sums — no matrix algebra, "
    "no library). Detects TREND breaks that analytics-event-"
    "study's level comparison misses entirely (a series can keep "
    "its mean while reversing direction). One fact hash agg; "
    "both fits come from a single grouped moment aggregation "
    "over the ~30-row summary — the per-GROUP closed-form-OLS "
    "generalization of the global fit in stats-durbin-watson.",
    tags=("timeseries", "stats"),
)
def timeseries_slope_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("y")
    )
    w_all = Window.partitionBy()
    idx = daily.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
        F.count("*").over(w_all).cast("double").alias("n"),
    )
    seg = idx.select(
        "y",
        "t",
        F.when(F.col("t") <= F.col("n") / 2, "pre").otherwise("post").alias(
            "period"
        ),
    )
    cnt = F.count("*")
    sxx = F.sum(F.col("t") * F.col("t")) - F.sum("t") * F.sum("t") / cnt
    sxy = F.sum(F.col("t") * F.col("y")) - F.sum("t") * F.sum("y") / cnt
    syy = F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y") / cnt
    fits = seg.groupBy("period").agg(
        (sxy / sxx).alias("slope"),
        ((syy - F.pow(sxy, 2) / sxx) / (cnt - 2) / sxx).alias("var_slope"),
    )
    pre_s = F.max(F.when(F.col("period") == "pre", F.col("slope")))
    post_s = F.max(F.when(F.col("period") == "post", F.col("slope")))
    pre_v = F.max(F.when(F.col("period") == "pre", F.col("var_slope")))
    post_v = F.max(F.when(F.col("period") == "post", F.col("var_slope")))
    return fits.agg(
        F.round(pre_s, 6).alias("slope_pre"),
        F.round(post_s, 6).alias("slope_post"),
        F.round(post_s - pre_s, 6).alias("slope_change"),
        F.round((post_s - pre_s) / F.sqrt(pre_v + post_v), 6).alias(
            "slope_change_z"
        ),
    )


@query(
    "timeseries-spectral-entropy",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT x - avg(x) OVER () AS xc,
                   CAST(row_number() OVER (ORDER BY day) - 1 AS DOUBLE)
                       AS t,
                   CAST(count(*) OVER () AS DOUBLE) AS n
            FROM daily
        ),
        freqs AS (SELECT CAST(range AS DOUBLE) AS k FROM range(1, 11)),
        power_ AS (
            SELECT k,
                   power(sum(xc * cos(2 * pi() * k * t / n)), 2)
                   + power(sum(xc * sin(2 * pi() * k * t / n)), 2) AS p
            FROM idx, freqs GROUP BY k
        ),
        norm AS (
            SELECT k, p / sum(p) OVER () AS q FROM power_
        )
        SELECT CAST(count(*) AS BIGINT) AS n_freqs,
               round(-sum(CASE WHEN q > 0 THEN q * ln(q) ELSE 0 END), 6)
                   AS spectral_entropy,
               round(-sum(CASE WHEN q > 0 THEN q * ln(q) ELSE 0 END)
                     / ln(count(*)), 6) AS normalized_se,
               round(max(q), 6) AS peak_share
        FROM norm
    """,
    doc="Spectral entropy of the daily volume series: the periodogram "
    "powers (same GROUP-BY DFT as timeseries-periodogram, "
    "harmonics 1-10) normalized to a distribution, then Shannon "
    "entropy over frequencies — low entropy = energy concentrated "
    "in one cycle = FORECASTABLE; entropy near ln(k) = white-"
    "noise-like, don't bother with seasonal models (the "
    "forecastability triage feature in every auto-forecasting "
    "system, e.g. the catch22/tsfeatures battery). Normalized "
    "variant in [0,1] plus the peak frequency's power share. "
    "Same scale shape as the periodogram: one fact hash agg, a "
    "10-row frequency cross, two summary reduces.",
    tags=("timeseries", "stats"),
)
def timeseries_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w_all = Window.partitionBy()
    idx = daily.select(
        (F.col("x") - F.avg("x").over(w_all)).alias("xc"),
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("double")
        .alias("t"),
        F.count("*").over(w_all).cast("double").alias("n"),
    )
    freqs = spark.range(1, 11).select(F.col("id").cast("double").alias("k"))
    ang = 2 * F.expr("pi()") * F.col("k") * F.col("t") / F.col("n")
    power_ = (
        idx.crossJoin(F.broadcast(freqs))
        .groupBy("k")
        .agg(
            (
                F.pow(F.sum(F.col("xc") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("xc") * F.sin(ang)), 2)
            ).alias("p")
        )
    )
    norm = power_.select(
        "k", (F.col("p") / F.sum("p").over(w_all)).alias("q")
    )
    ent = -F.sum(
        F.when(F.col("q") > 0, F.col("q") * F.log("q")).otherwise(0.0)
    )
    return norm.agg(
        F.count("*").cast("long").alias("n_freqs"),
        F.round(ent, 6).alias("spectral_entropy"),
        F.round(ent / F.log(F.count("*").cast("double")), 6).alias(
            "normalized_se"
        ),
        F.round(F.max("q"), 6).alias("peak_share"),
    )


@query(
    "timeseries-lttb-downsample",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT day, y,
                   CAST(row_number() OVER (ORDER BY day) - 1 AS DOUBLE)
                       AS t,
                   CAST(count(*) OVER () AS DOUBLE) AS n
            FROM daily
        ),
        bucketed AS (
            SELECT *, least(9, CAST(floor(t * 10 / n) AS INT)) AS bucket
            FROM idx
        ),
        means AS (
            SELECT bucket, avg(t) AS mt, avg(y) AS my FROM bucketed
            GROUP BY bucket
        ),
        ctx AS (
            SELECT b.bucket, b.day, b.y, b.t, m.my,
                   lp.mt AS prev_mt, lp.my AS prev_my,
                   ln.mt AS next_mt, ln.my AS next_my
            FROM bucketed b
            JOIN means m ON m.bucket = b.bucket
            LEFT JOIN means lp ON lp.bucket = b.bucket - 1
            LEFT JOIN means ln ON ln.bucket = b.bucket + 1
        ),
        scored AS (
            SELECT bucket, day, y,
                   abs((coalesce(prev_mt, t - 1) - next_mt)
                       * (y - coalesce(next_my, y))
                       - (coalesce(prev_mt, t - 1) - t)
                       * (coalesce(next_my, my) - y)) AS area
            FROM ctx
        )
        SELECT CAST(bucket AS BIGINT) AS bucket, day,
               CAST(y AS BIGINT) AS value
        FROM (
            SELECT *, row_number() OVER (PARTITION BY bucket
                          ORDER BY area DESC, day) AS rk
            FROM scored
        ) WHERE rk = 1
        ORDER BY bucket
    """,
    doc="LTTB-style downsampling (largest-triangle three-buckets, "
    "parallel variant): the series splits into 10 buckets and "
    "each keeps the point forming the largest triangle with its "
    "NEIGHBOR BUCKETS' MEAN points — the visually-faithful "
    "downsample dashboards need (uniform sampling erases peaks; "
    "this provably keeps them). Canonical LTTB anchors on the "
    "previously SELECTED point, a sequential dependency; "
    "anchoring on bucket means instead (documented deviation, "
    "both engines identical) makes every bucket independent — "
    "fully parallel, one window per bucket — at negligible "
    "visual cost. Edge buckets fall back to degenerate anchors "
    "via coalesce. The plan: one fact agg, a 10-row means "
    "join, WindowGroupLimit argmax per bucket.",
    tags=("timeseries",),
)
def timeseries_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("y")
    )
    w_all = Window.partitionBy()
    idx = daily.select(
        "day",
        "y",
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("double")
        .alias("t"),
        F.count("*").over(w_all).cast("double").alias("n"),
    )
    # persist the bucketed day frame and the 10-row bucket means: the
    # means, the context join and its two shifted copies all consume
    # them — unpersisted each re-planned the global row_number window
    # (4 events scans / 22 Exchanges in the r11 before-plan)
    bucketed = idx.withColumn(
        "bucket",
        F.least(F.lit(9), F.floor(F.col("t") * 10 / F.col("n")).cast("int")),
    ).persist()
    means = bucketed.groupBy("bucket").agg(
        F.avg("t").alias("mt"), F.avg("y").alias("my")
    ).persist()
    lp = means.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("mt").alias("prev_mt"),
        F.col("my").alias("prev_my"),
    )
    ln_ = means.select(
        (F.col("bucket") - 1).alias("bucket"),
        F.col("mt").alias("next_mt"),
        F.col("my").alias("next_my"),
    )
    ctx = (
        bucketed.join(F.broadcast(means), "bucket")
        .join(F.broadcast(lp), "bucket", "left")
        .join(F.broadcast(ln_), "bucket", "left")
    )
    area = F.abs(
        (F.coalesce(F.col("prev_mt"), F.col("t") - 1) - F.col("next_mt"))
        * (F.col("y") - F.coalesce(F.col("next_my"), F.col("y")))
        - (F.coalesce(F.col("prev_mt"), F.col("t") - 1) - F.col("t"))
        * (F.coalesce(F.col("next_my"), F.col("my")) - F.col("y"))
    )
    scored = ctx.select("bucket", "day", "y", area.alias("area"))
    wr = Window.partitionBy("bucket").orderBy(F.col("area").desc(), "day")
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "day",
            F.col("y").cast("long").alias("value"),
        )
        .orderBy("bucket")
    )


@query(
    "timeseries-seasonality-strength",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        tr AS (
            SELECT day, x,
                   CASE WHEN count(*) OVER w7 = 7
                        THEN avg(x) OVER w7 END AS trend,
                   (isodow(day) - 1) % 7 AS dow
            FROM daily
            WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING)
        ),
        seas AS (
            SELECT *, avg(x - trend) OVER (PARTITION BY dow)
                          AS seasonal_raw
            FROM tr
        ),
        norm AS (
            SELECT *, seasonal_raw - avg(seasonal_raw) OVER () AS seasonal
            FROM seas
        ),
        comp AS (
            SELECT x - trend AS detrended,
                   x - trend - seasonal AS resid
            FROM norm WHERE trend IS NOT NULL
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(var_samp(detrended), 6) AS var_detrended,
               round(var_samp(resid), 6) AS var_residual,
               round(greatest(0, 1 - var_samp(resid)
                                 / var_samp(detrended)), 6)
                   AS seasonality_strength
        FROM comp
    """,
    doc="Seasonality strength F_s = max(0, 1 - var(residual)/"
    "var(detrended)) from the STL-naive decomposition — the "
    "tsfeatures/forecastability scalar that says how much of the "
    "non-trend variance the weekly cycle explains (F_s near 1: "
    "seasonal models pay; near 0: the dow pattern is noise, see "
    "timeseries-spectral-entropy for the frequency-domain "
    "second opinion). Shares the exact decomposition pipeline "
    "with timeseries-stl-naive/-stl-anomaly — one fact hash "
    "agg, windows over the daily summary — and reduces it to "
    "one variance-ratio row; the three ops form a "
    "decompose/alert/score family over identical plan "
    "machinery.",
    tags=("timeseries",),
)
def timeseries_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "x",
        F.when(F.count("*").over(w7) == 7, F.avg("x").over(w7)).alias(
            "trend"
        ),
        F.weekday("day").alias("dow"),
    )
    seas = tr.withColumn(
        "seasonal_raw",
        F.avg(F.col("x") - F.col("trend")).over(Window.partitionBy("dow")),
    )
    w_all = Window.partitionBy()
    norm = seas.withColumn(
        "seasonal",
        F.col("seasonal_raw") - F.avg("seasonal_raw").over(w_all),
    )
    comp = norm.filter(F.col("trend").isNotNull()).select(
        (F.col("x") - F.col("trend")).alias("detrended"),
        (F.col("x") - F.col("trend") - F.col("seasonal")).alias("resid"),
    )
    return comp.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.var_samp("detrended"), 6).alias("var_detrended"),
        F.round(F.var_samp("resid"), 6).alias("var_residual"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1 - F.var_samp("resid") / F.var_samp("detrended"),
            ),
            6,
        ).alias("seasonality_strength"),
    )


@query(
    "timeseries-bollinger-bands",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
        ),
        banded AS (
            SELECT day, rev,
                   row_number() OVER (ORDER BY day) AS rn,
                   avg(rev) OVER w AS mid,
                   stddev_samp(rev) OVER w AS sd
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT day, round(rev, 4) AS rev, round(mid, 4) AS mid,
               round(mid + 2 * sd, 4) AS upper_band,
               round(mid - 2 * sd, 4) AS lower_band,
               CASE WHEN rev > mid + 2 * sd THEN 1
                    WHEN rev < mid - 2 * sd THEN -1 ELSE 0 END AS breach
        FROM banded WHERE rn >= 20
    """,
    doc="Bollinger bands over daily revenue: 20-day rolling mean +/- 2 "
    "rolling sample-stddevs with a breach flag (+1 above, -1 below). "
    "The fact pass is one hash aggregation to daily sums; both "
    "windows share one sort of the ~2.4k-day summary (single "
    "partition is fine at summary size; at 100 TB the day count is "
    "still thousands of rows). Warm-up rows (rn < 20) are dropped so "
    "every emitted band is a full 20-day frame; round(,4) absorbs "
    "window-frame summation-order drift between engines.",
    tags=("timeseries",),
)
def timeseries_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-19, 0)
    banded = daily.select(
        "day",
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.avg("rev").over(w).alias("mid"),
        F.stddev_samp("rev").over(w).alias("sd"),
    )
    up = F.col("mid") + 2 * F.col("sd")
    lo = F.col("mid") - 2 * F.col("sd")
    return banded.filter(F.col("rn") >= 20).select(
        "day",
        F.round("rev", 4).alias("rev"),
        F.round("mid", 4).alias("mid"),
        F.round(up, 4).alias("upper_band"),
        F.round(lo, 4).alias("lower_band"),
        F.when(F.col("rev") > up, 1)
        .when(F.col("rev") < lo, -1)
        .otherwise(0)
        .alias("breach"),
    )


@query(
    "timeseries-acf-pacf",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        lagged AS (
            SELECT x,
                   lag(x, 1) OVER (ORDER BY day) AS x1,
                   lag(x, 2) OVER (ORDER BY day) AS x2,
                   lag(x, 3) OVER (ORDER BY day) AS x3
            FROM daily
        ),
        mu AS (SELECT avg(x) AS m, count(*) AS n FROM lagged),
        acf AS (
            SELECT max(mu.n) AS n,
                   sum((x - mu.m) * (x1 - mu.m)) FILTER (x1 IS NOT NULL)
                       / sum(power(x - mu.m, 2)) AS r1,
                   sum((x - mu.m) * (x2 - mu.m)) FILTER (x2 IS NOT NULL)
                       / sum(power(x - mu.m, 2)) AS r2,
                   sum((x - mu.m) * (x3 - mu.m)) FILTER (x3 IS NOT NULL)
                       / sum(power(x - mu.m, 2)) AS r3
            FROM lagged, mu GROUP BY ALL
        ),
        lev AS (
            SELECT n, r1, r2, r3,
                   (r2 - r1 * r1) / (1 - r1 * r1) AS p22
            FROM acf
        ),
        lev2 AS (
            SELECT *, r1 * (1 - p22) AS p21 FROM lev
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(r1, 6) AS acf1, round(r2, 6) AS acf2,
               round(r3, 6) AS acf3,
               round(r1, 6) AS pacf1,
               round(p22, 6) AS pacf2,
               round((r3 - p21 * r2 - p22 * r1)
                     / (1 - p21 * r1 - p22 * r2), 6) AS pacf3
        FROM lev2
    """,
    doc="ACF(1..3) and PACF(1..3) of the daily mean event value: "
    "autocovariances from one window pass over the ~30-row daily "
    "summary (global mean as the scalar normalizer, the standard "
    "large-n ACF estimator), then PACF via the closed-form "
    "Durbin-Levinson recursion (phi22 = (r2-r1^2)/(1-r1^2); phi33 "
    "from the order-2 coefficients) — no matrix solve, pure scalar "
    "math on the 1-row ACF summary. The AR-order diagnostic that "
    "pairs with timeseries-autocorr (raw ACF) and "
    "timeseries-ljung-box (joint whiteness test).",
    tags=("timeseries",),
)
def timeseries_acf_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    mu = lagged.agg(F.avg("x").alias("m"), F.count("*").alias("n"))
    j = lagged.join(F.broadcast(mu))
    m = F.col("m")
    den = F.sum(F.pow(F.col("x") - m, 2))
    rk = lambda c: (  # noqa: E731
        F.sum(
            F.when(
                F.col(c).isNotNull(), (F.col("x") - m) * (F.col(c) - m)
            ).otherwise(0.0)
        )
        / den
    )
    acf = j.agg(
        F.max("n").alias("n"),
        rk("x1").alias("r1"),
        rk("x2").alias("r2"),
        rk("x3").alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    lev = acf.select("n", "r1", "r2", "r3", p22.alias("p22"))
    p21 = r1 * (1 - F.col("p22"))
    lev2 = lev.select("*", p21.alias("p21"))
    return lev2.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(r1, 6).alias("acf1"),
        F.round(r2, 6).alias("acf2"),
        F.round(r3, 6).alias("acf3"),
        F.round(r1, 6).alias("pacf1"),
        F.round(F.col("p22"), 6).alias("pacf2"),
        F.round(
            (r3 - F.col("p21") * r2 - F.col("p22") * r1)
            / (1 - F.col("p21") * r1 - F.col("p22") * r2),
            6,
        ).alias("pacf3"),
    )


@query(
    "timeseries-sax-symbolic",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        stats AS (SELECT avg(x) AS mu, stddev_samp(x) AS sd FROM daily),
        segd AS (
            SELECT (row_number() OVER (ORDER BY day) - 1) // 5 AS seg,
                   (x - stats.mu) / stats.sd AS z
            FROM daily, stats
        ),
        z AS (
            SELECT seg, z, count(*) OVER (PARTITION BY seg) AS seg_n
            FROM segd
        ),
        paa AS (
            SELECT CAST(seg AS BIGINT) AS seg, avg(z) AS paa
            FROM z WHERE seg_n = 5 GROUP BY seg
        )
        SELECT seg, round(paa, 6) AS paa,
               CASE WHEN paa < -0.6745 THEN 'a'
                    WHEN paa < 0 THEN 'b'
                    WHEN paa < 0.6745 THEN 'c'
                    ELSE 'd' END AS symbol
        FROM paa
    """,
    doc="SAX symbolic discretization (Lin et al. 2003) of the daily "
    "mean event value: z-normalize against the global mean/sd, "
    "Piecewise Aggregate Approximation over non-overlapping 5-day "
    "segments (incomplete tail segments dropped), then map each PAA "
    "value to a 4-letter alphabet at the N(0,1) equiprobable "
    "breakpoints (-0.6745, 0, 0.6745). The discretized words feed "
    "hash-based motif discovery and similarity search over time "
    "series the way shingles feed MinHash — a 5x compression whose "
    "distance lower-bounds Euclidean, which is what makes indexed "
    "time-series search feasible at 100 TB. One fact aggregation; "
    "everything after runs on the day-count-sized summary.",
    tags=("timeseries",),
)
def timeseries_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    stats = daily.agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")
    )
    seg = F.floor((F.row_number().over(Window.orderBy("day")) - 1) / 5)
    z = daily.join(F.broadcast(stats)).select(
        seg.alias("seg"),
        ((F.col("x") - F.col("mu")) / F.col("sd")).alias("z"),
    )
    z = z.withColumn("seg_n", F.count("*").over(Window.partitionBy("seg")))
    paa = (
        z.filter(F.col("seg_n") == 5)
        .groupBy(F.col("seg").cast("long").alias("seg"))
        .agg(F.avg("z").alias("paa"))
    )
    return paa.select(
        "seg",
        F.round("paa", 6).alias("paa"),
        F.when(F.col("paa") < -0.6745, "a")
        .when(F.col("paa") < 0, "b")
        .when(F.col("paa") < 0.6745, "c")
        .otherwise("d")
        .alias("symbol"),
    )


@query(
    "timeseries-cross-correlation",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS x,
                   avg(CASE WHEN event_type = 'purchase' THEN value END) AS y
            FROM events WHERE event_type IN ('click', 'purchase')
                          AND ts IS NOT NULL
            GROUP BY CAST(ts AS DATE)
        ),
        stats AS (
            SELECT avg(x) AS mx, stddev_pop(x) AS sx,
                   avg(y) AS my, stddev_pop(y) AS sy,
                   count(*) AS n
            FROM daily
        ),
        lagged AS (
            SELECT d.x, d.y,
                   lag(d.y, 1) OVER w AS ym1, lead(d.y, 1) OVER w AS yp1,
                   lag(d.y, 2) OVER w AS ym2, lead(d.y, 2) OVER w AS yp2,
                   lag(d.y, 3) OVER w AS ym3, lead(d.y, 3) OVER w AS yp3
            FROM daily d WINDOW w AS (ORDER BY day)
        ),
        ccf AS (
            SELECT CAST(max(s.n) AS BIGINT) AS n_days, lags.lag AS lag,
                   round(avg((l.x - s.mx) * (CASE lags.lag
                        WHEN -3 THEN l.ym3 WHEN -2 THEN l.ym2
                        WHEN -1 THEN l.ym1 WHEN 0 THEN l.y
                        WHEN 1 THEN l.yp1 WHEN 2 THEN l.yp2
                        ELSE l.yp3 END - s.my)) / (s.sx * s.sy), 6) AS r
            FROM lagged l, stats s,
                 (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag) lags
            WHERE (CASE lags.lag
                        WHEN -3 THEN l.ym3 WHEN -2 THEN l.ym2
                        WHEN -1 THEN l.ym1 WHEN 0 THEN l.y
                        WHEN 1 THEN l.yp1 WHEN 2 THEN l.yp2
                        ELSE l.yp3 END) IS NOT NULL
            GROUP BY lags.lag, s.sx, s.sy
        )
        SELECT n_days, CAST(lag AS BIGINT) AS lag, r
        FROM ccf
    """,
    doc="Cross-correlation function between click and purchase daily "
    "mean values at lags -3..+3 (negative lag = purchase leads): "
    "one conditional-aggregation pass builds both aligned series, "
    "one window sort materializes every shifted copy, and the CCF "
    "is a 7-cell aggregate normalized by the global sds — the "
    "lead/lag detector that answers 'does click activity PREDICT "
    "purchases days later' where timeseries-rolling-corr only "
    "measures contemporaneous co-movement. Peak |r| at nonzero lag "
    "feeds timeseries-granger-1lag's causality followup.",
    tags=("timeseries",),
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))).alias("x"),
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("y"),
        )
    )
    # persist the tiny per-day frame: unpersisted, the stats aggregate
    # AND the lag pipeline each re-planned the events scan + daily agg,
    # and the 7 per-lag branches re-planned the whole window pipeline
    # (14 events scans / 70 Exchanges in the r11 before-plan).
    daily = daily.persist()
    stats = daily.agg(
        F.avg("x").alias("mx"), F.stddev_pop("x").alias("sx"),
        F.avg("y").alias("my"), F.stddev_pop("y").alias("sy"),
        F.count("*").alias("n"),
    )
    w = Window.orderBy("day")
    shifted = {
        -3: F.lag("y", 3).over(w), -2: F.lag("y", 2).over(w),
        -1: F.lag("y", 1).over(w), 0: F.col("y"),
        1: F.lead("y", 1).over(w), 2: F.lead("y", 2).over(w),
        3: F.lead("y", 3).over(w),
    }
    lagged = daily.select(
        "x", *[c.alias(f"y_{k + 3}") for k, c in shifted.items()]
    ).join(F.broadcast(stats))
    # all 7 lags in ONE aggregation pass instead of 7 filtered single-row
    # aggregates unioned (each re-ran the window pipeline). The per-lag
    # filter yc IS NOT NULL is reproduced exactly by null-skipping
    # aggregates: avg ignores null products (x null on a lag-valid row
    # was skipped before too), and the conditional max over the
    # broadcast constants returns the same constant — or NULL on an
    # empty lag, as the filtered branch did. Same contributing rows,
    # same accumulation order: bit-identical r.
    cols = []
    for k in range(-3, 4):
        yc = F.col(f"y_{k + 3}")
        cols.append(
            F.max(F.when(yc.isNotNull(), F.col("n")))
            .cast("long")
            .alias(f"nd_{k + 3}")
        )
        cols.append(
            F.round(
                F.avg((F.col("x") - F.col("mx")) * (yc - F.col("my")))
                / (
                    F.max(F.when(yc.isNotNull(), F.col("sx")))
                    * F.max(F.when(yc.isNotNull(), F.col("sy")))
                ),
                6,
            ).alias(f"r_{k + 3}")
        )
    fused = lagged.agg(*cols)
    rows = F.array(
        *[
            F.struct(
                F.col(f"nd_{k + 3}").alias("n_days"),
                F.lit(k).cast("long").alias("lag"),
                F.col(f"r_{k + 3}").alias("r"),
            )
            for k in range(-3, 4)
        ]
    )
    return fused.select(F.explode(rows).alias("_r")).select("_r.*")


@query(
    "timeseries-kpss-level",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        mu AS (SELECT avg(x) AS m, count(*) AS n FROM daily),
        parts AS (
            SELECT sum(d.x - mu.m) OVER (ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS s_t,
                   d.x - mu.m AS e, mu.n AS n
            FROM daily d, mu
        )
        SELECT CAST(max(n) AS BIGINT) AS n_days,
               round(sum(s_t * s_t)
                     / (max(n) * max(n) * (sum(e * e) / max(n))), 6)
                   AS kpss_stat,
               CAST(CASE WHEN sum(s_t * s_t)
                         / (max(n) * max(n) * (sum(e * e) / max(n)))
                         > 0.463 THEN 1 ELSE 0 END AS BIGINT)
                   AS reject_level_stationarity_5pct
        FROM parts
    """,
    doc="KPSS level-stationarity statistic (lag-0 long-run variance): "
    "partial sums of demeaned daily values via one running-sum "
    "window, eta = sum(S_t^2) / (n^2 * s^2), compared to the 5% "
    "critical value 0.463 (KPSS 1992 table). The null here is "
    "STATIONARITY — the complement of unit-root tests — so "
    "rejecting says 'difference this series before modeling'. "
    "Pairs with timeseries-hurst-rs (long memory) and "
    "timeseries-variance-ratio (random walk): three independent "
    "lenses on the same decision. Summary-sized after one fact "
    "aggregation.",
    tags=("timeseries",),
)
def timeseries_kpss_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    mu = daily.agg(F.avg("x").alias("m"), F.count("*").alias("n"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    parts = daily.join(F.broadcast(mu)).select(
        F.sum(F.col("x") - F.col("m")).over(w).alias("s_t"),
        (F.col("x") - F.col("m")).alias("e"),
        "n",
    )
    n = F.max("n")
    eta = F.sum(F.col("s_t") * F.col("s_t")) / (
        n * n * (F.sum(F.col("e") * F.col("e")) / n)
    )
    return parts.agg(
        n.cast("long").alias("n_days"),
        F.round(eta, 6).alias("kpss_stat"),
        F.when(eta > 0.463, 1)
        .otherwise(0)
        .cast("long")
        .alias("reject_level_stationarity_5pct"),
    )


@query(
    "anomaly-poisson-deviance",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, count(*) AS k
            FROM events GROUP BY date_trunc('hour', ts)
        ),
        lam AS (SELECT avg(k) AS lambda FROM hourly),
        dev AS (
            SELECT h.h, h.k, lam.lambda,
                   2 * (h.k * ln(h.k / lam.lambda) - (h.k - lam.lambda))
                       AS deviance
            FROM hourly h, lam WHERE h.k > 0
        )
        SELECT h AS hour, CAST(k AS BIGINT) AS k,
               round(lambda, 4) AS baseline_rate,
               round(deviance, 6) AS deviance,
               CAST(CASE WHEN deviance > 6.635 AND k > lambda
                         THEN 1 ELSE 0 END AS BIGINT) AS burst_flag
        FROM dev
    """,
    doc="Poisson-deviance burst detection on hourly event counts: "
    "D = 2(k ln(k/lambda) - (k - lambda)) against the global mean "
    "rate, flagged when D exceeds the chi2(1) 1% critical value "
    "6.635 AND the count is above baseline — the COUNT-data "
    "anomaly detector that anomaly-zscore's Gaussian assumption "
    "gets wrong at low rates (a 3-sigma rule on counts of 5 fires "
    "constantly; the deviance test is the GLM-correct likelihood "
    "ratio). One hash aggregation + a 1-row rate broadcast; the "
    "per-hour flags are codegen. Kleinberg's burst model is this "
    "statistic chained over states.",
    tags=("timeseries",),
)
def anomaly_poisson_deviance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("k")
    )
    lam = hourly.agg(F.avg("k").alias("lambda"))
    dev = hourly.join(F.broadcast(lam)).filter(F.col("k") > 0)
    k, l = F.col("k"), F.col("lambda")
    deviance = 2 * (k * F.log(k / l) - (k - l))
    return dev.select(
        F.col("h").alias("hour"),
        k.cast("long").alias("k"),
        F.round(l, 4).alias("baseline_rate"),
        F.round(deviance, 6).alias("deviance"),
        F.when((deviance > 6.635) & (k > l), 1)
        .otherwise(0)
        .cast("long")
        .alias("burst_flag"),
    )


@query(
    "timeseries-drawdown-episodes",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
        ),
        cum AS (
            SELECT day, rev,
                   max(rev) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak
            FROM daily
        ),
        flagged AS (
            SELECT day, rev, peak,
                   CASE WHEN rev < 0.5 * peak THEN 1 ELSE 0 END AS in_dd
            FROM cum
        ),
        runs AS (
            SELECT day, in_dd, rev, peak,
                   row_number() OVER (ORDER BY day)
                   - row_number() OVER (PARTITION BY in_dd ORDER BY day)
                       AS grp
            FROM flagged
        ),
        episodes AS (
            SELECT min(day) AS start_day, max(day) AS end_day,
                   count(*) AS n_days,
                   round(min(rev / peak), 6) AS worst_ratio
            FROM runs WHERE in_dd = 1
            GROUP BY grp
        )
        SELECT start_day, end_day, CAST(n_days AS BIGINT) AS n_days,
               worst_ratio
        FROM episodes
    """,
    doc="Drawdown EPISODE segmentation on daily revenue: running peak "
    "via one cumulative-max window, days below 50% of peak flagged, "
    "consecutive flagged days grouped into episodes by the "
    "gaps-and-islands difference-of-row-numbers idiom, each episode "
    "reporting span, duration and depth. timeseries-max-drawdown "
    "gives the single worst number; this op inventories EVERY "
    "stress period with start/end/severity — what incident "
    "review and capacity planning actually consume. Two window "
    "sorts over the day-count summary, one aggregation.",
    tags=("timeseries",),
)
def timeseries_drawdown_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select("day", "rev", F.max("rev").over(wc).alias("peak"))
    flagged = cum.select(
        "day",
        "rev",
        "peak",
        F.when(F.col("rev") < 0.5 * F.col("peak"), 1).otherwise(0).alias("in_dd"),
    )
    runs = flagged.select(
        "day",
        "in_dd",
        "rev",
        "peak",
        (
            F.row_number().over(Window.orderBy("day"))
            - F.row_number().over(Window.partitionBy("in_dd").orderBy("day"))
        ).alias("grp"),
    )
    return (
        runs.filter(F.col("in_dd") == 1)
        .groupBy("grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count("*").cast("long").alias("n_days"),
            F.round(F.min(F.col("rev") / F.col("peak")), 6).alias("worst_ratio"),
        )
        .drop("grp")
    )


@query(
    "timeseries-harmonic-fit",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT x, row_number() OVER (ORDER BY day) - 1 AS t,
                   count(*) OVER () AS n, avg(x) OVER () AS mu
            FROM daily
        ),
        per_k AS (
            SELECT k.k, max(idx.n) AS n,
                   2.0 / max(idx.n)
                       * sum((idx.x - idx.mu)
                             * cos(2 * pi() * k.k * idx.t / idx.n)) AS a,
                   2.0 / max(idx.n)
                       * sum((idx.x - idx.mu)
                             * sin(2 * pi() * k.k * idx.t / idx.n)) AS b,
                   sum(power(idx.x - idx.mu, 2)) AS sst
            FROM idx, (SELECT unnest(generate_series(1, 10)) AS k) k
            GROUP BY k.k
        ),
        best AS (
            SELECT *, row_number() OVER (ORDER BY a * a + b * b DESC, k) AS rn
            FROM per_k
        )
        SELECT CAST(k AS BIGINT) AS dominant_k,
               CAST(n AS BIGINT) AS n_days,
               round(n / CAST(k AS DOUBLE), 4) AS period_days,
               round(sqrt(a * a + b * b), 6) AS amplitude,
               round(atan2(b, a), 6) AS phase,
               round((a * a + b * b) * n / 4 / (sst / 1), 6) * 2
                   AS r2_explained
        FROM best WHERE rn = 1
    """,
    doc="Single-harmonic Fourier fit: Fourier coefficients a_k, b_k "
    "of the demeaned daily series at k = 1..10 cycles (one literal "
    "fan-out over the day summary — the DFT as a groupBy, no FFT "
    "needed at summary scale), pick the dominant k by power with a "
    "deterministic tie-break, report period, amplitude, phase, and "
    "the variance share the single harmonic explains (harmonic "
    "R^2 = n(a^2+b^2)/2 / SST). The parametric companion to "
    "timeseries-periodogram (which reports the whole spectrum): "
    "this one returns the FITTED seasonal component a downstream "
    "forecaster subtracts. At 100 TB the day summary is still "
    "thousands of rows; k stays a literal constant.",
    tags=("timeseries",),
)
def timeseries_harmonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = daily.select(
        "x",
        (F.row_number().over(w) - 1).alias("t"),
        F.count("*").over(wall).alias("n"),
        F.avg("x").over(wall).alias("mu"),
    )
    ks = idx.sparkSession.range(1, 11).select(F.col("id").alias("k"))
    j = idx.crossJoin(F.broadcast(ks))
    ang = 2 * math.pi * F.col("k") * F.col("t") / F.col("n")
    dx = F.col("x") - F.col("mu")
    per_k = j.groupBy("k").agg(
        F.max("n").alias("n"),
        (2.0 / F.max("n") * F.sum(dx * F.cos(ang))).alias("a"),
        (2.0 / F.max("n") * F.sum(dx * F.sin(ang))).alias("b"),
        F.sum(F.pow(dx, 2)).alias("sst"),
    )
    power = F.col("a") * F.col("a") + F.col("b") * F.col("b")
    best = per_k.withColumn(
        "rn", F.row_number().over(Window.orderBy(power.desc(), "k"))
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("k").cast("long").alias("dominant_k"),
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("n") / F.col("k").cast("double"), 4).alias("period_days"),
        F.round(F.sqrt(power), 6).alias("amplitude"),
        F.round(F.atan2("b", "a"), 6).alias("phase"),
        (F.round(power * F.col("n") / 4 / (F.col("sst") / 1), 6) * 2).alias(
            "r2_explained"
        ),
    )


@query(
    "timeseries-wma-crossover",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
        ),
        sig AS (
            SELECT day, rev,
                   (7 * rev + 6 * lag(rev, 1) OVER w + 5 * lag(rev, 2) OVER w
                    + 4 * lag(rev, 3) OVER w + 3 * lag(rev, 4) OVER w
                    + 2 * lag(rev, 5) OVER w + 1 * lag(rev, 6) OVER w)
                       / 28.0 AS wma7,
                   avg(rev) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sma7,
                   row_number() OVER w AS rn
            FROM daily WINDOW w AS (ORDER BY day)
        )
        SELECT day, round(rev, 4) AS rev,
               round(wma7, 4) AS wma7, round(sma7, 4) AS sma7,
               CAST(CASE WHEN wma7 > sma7 THEN 1 ELSE 0 END AS BIGINT)
                   AS momentum_up
        FROM sig WHERE rn >= 7
    """,
    doc="7-day linearly-weighted moving average vs simple moving "
    "average with a momentum crossover flag: WMA weights recent "
    "days 7..1/28 so it leads the SMA when the series accelerates "
    "— wma > sma is the classic cheap momentum-direction signal, "
    "and the SPREAD between the two is a slope estimate that costs "
    "one window sort (the lag terms and the frame average share "
    "it). Warm-up rows dropped so every emitted row has a full "
    "7-day kernel. Complements timeseries-ewma (geometric "
    "weights, infinite kernel) and timeseries-bollinger-bands "
    "(level bands, not direction).",
    tags=("timeseries",),
)
def timeseries_wma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day")
    wma = (
        7 * F.col("rev")
        + sum((7 - k) * F.lag("rev", k).over(w) for k in range(1, 7))
    ) / 28.0
    sma = F.avg("rev").over(w.rowsBetween(-6, 0))
    sig = daily.select(
        "day",
        "rev",
        wma.alias("wma7"),
        sma.alias("sma7"),
        F.row_number().over(w).alias("rn"),
    )
    return sig.filter(F.col("rn") >= 7).select(
        "day",
        F.round("rev", 4).alias("rev"),
        F.round("wma7", 4).alias("wma7"),
        F.round("sma7", 4).alias("sma7"),
        F.when(F.col("wma7") > F.col("sma7"), 1)
        .otherwise(0)
        .cast("long")
        .alias("momentum_up"),
    )


@query(
    "timeseries-despike-med3",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
        ),
        tri AS (
            SELECT day, rev,
                   lag(rev) OVER w AS a, lead(rev) OVER w AS c,
                   row_number() OVER w AS rn, count(*) OVER () AS n
            FROM daily WINDOW w AS (ORDER BY day)
        ),
        med AS (
            SELECT day, rev,
                   greatest(least(a, rev),
                            least(greatest(a, rev), c)) AS med3
            FROM tri WHERE rn > 1 AND rn < n
        ),
        scale AS (
            SELECT median(abs(rev - med3)) AS mad FROM med
        )
        SELECT m.day, round(m.rev, 4) AS rev, round(m.med3, 4) AS med3,
               CAST(CASE WHEN abs(m.rev - m.med3) > 5 * s.mad
                         THEN 1 ELSE 0 END AS BIGINT) AS spike_flag
        FROM med m, scale s
    """,
    doc="3-point rolling-median despiking: med3 via the branch-free "
    "max/min identity greatest(least(a,b), least(greatest(a,b), c)) "
    "— a median filter with NO sort and no percentile state, pure "
    "codegen over one window's lag/lead — and a spike flag at 5x "
    "the MAD of the residuals (median filters kill single-sample "
    "spikes exactly; moving averages smear them, which is why "
    "sensor pipelines despike with medians BEFORE any smoothing). "
    "Boundary rows without both neighbors are excluded from the "
    "contract. One window sort + a 1-row robust-scale broadcast.",
    tags=("timeseries",),
)
def timeseries_despike_med3(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day")
    tri = daily.select(
        "day",
        "rev",
        F.lag("rev").over(w).alias("a"),
        F.lead("rev").over(w).alias("c"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    med3 = F.greatest(
        F.least(F.col("a"), F.col("rev")),
        F.least(F.greatest(F.col("a"), F.col("rev")), F.col("c")),
    )
    med = tri.filter((F.col("rn") > 1) & (F.col("rn") < F.col("n"))).select(
        "day", "rev", med3.alias("med3")
    )
    scale = med.agg(F.median(F.abs(F.col("rev") - F.col("med3"))).alias("mad"))
    return med.join(F.broadcast(scale)).select(
        "day",
        F.round("rev", 4).alias("rev"),
        F.round("med3", 4).alias("med3"),
        F.when(F.abs(F.col("rev") - F.col("med3")) > 5 * F.col("mad"), 1)
        .otherwise(0)
        .cast("long")
        .alias("spike_flag"),
    )


@query(
    "timeseries-pettitt",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        ranked AS (
            SELECT day,
                   row_number() OVER (ORDER BY day) AS t,
                   CAST(rank() OVER (ORDER BY x) AS DOUBLE)
                       + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS r,
                   count(*) OVER () AS n
            FROM daily
        ),
        u AS (
            SELECT day, t, n,
                   2 * sum(r) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t * (n + 1.0) AS u_t
            FROM ranked
        ),
        best AS (
            SELECT day, n, abs(u_t) AS k,
                   row_number() OVER (ORDER BY abs(u_t) DESC, day) AS rn
            FROM u WHERE t < n
        )
        SELECT day AS change_point_day,
               CAST(n AS BIGINT) AS n_days,
               round(k, 4) AS k_stat,
               round(2 * exp(-6 * k * k
                             / (CAST(n AS DOUBLE) * n * n + n * n)), 6)
                   AS p_approx
        FROM best WHERE rn = 1
    """,
    doc="Pettitt change-point test on daily mean values: U_t = "
    "2*sum(ranks through t) - t(n+1) via mid-ranks and ONE "
    "running-sum window (the O(n^2) double-sum definition "
    "collapses to a rank cumsum), K = max|U_t| locates the most "
    "likely break and p ~ 2exp(-6K^2/(n^3+n^2)) calibrates it. "
    "Rank-based, so immune to the outliers that pull "
    "timeseries-changepoint's mean-split and timeseries-cusum's "
    "drift statistic — run all three and a break that survives is "
    "real. Day-summary-sized after the one fact aggregation; "
    "deterministic (|U| desc, day) argmax.",
    tags=("timeseries",),
)
def timeseries_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    wd = Window.orderBy("day")
    ranked = daily.select(
        "day",
        F.row_number().over(wd).alias("t"),
        (
            F.rank().over(Window.orderBy("x")).cast("double")
            + (F.count("*").over(Window.partitionBy("x")) - 1) / 2.0
        ).alias("r"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    u = ranked.select(
        "day",
        "t",
        "n",
        (
            2 * F.sum("r").over(wd.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("t") * (F.col("n") + 1.0)
        ).alias("u_t"),
    )
    best = (
        u.filter(F.col("t") < F.col("n"))
        .select(
            "day",
            "n",
            F.abs("u_t").alias("k"),
            F.row_number()
            .over(Window.orderBy(F.abs("u_t").desc(), "day"))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    n, k = F.col("n").cast("double"), F.col("k")
    return best.select(
        F.col("day").alias("change_point_day"),
        F.col("n").cast("long").alias("n_days"),
        F.round(k, 4).alias("k_stat"),
        F.round(2 * F.exp(-6 * k * k / (n * n * n + n * n)), 6).alias(
            "p_approx"
        ),
    )


@query(
    "timeseries-dfa",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        prof AS (
            SELECT row_number() OVER (ORDER BY day) AS t,
                   sum(x - (SELECT avg(x) FROM daily))
                       OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS y,
                   count(*) OVER () AS n
            FROM daily
        ),
        boxed AS (
            SELECT s.s, (p.t - 1) // s.s AS box,
                   (p.t - 1) % s.s AS i, p.y,
                   p.n
            FROM prof p, (SELECT unnest([5, 10]) AS s) s
            WHERE (p.t - 1) // s.s < p.n // s.s
        ),
        fits AS (
            SELECT s, box, count(*) AS m,
                   sum(i) AS sx, sum(y) AS sy,
                   sum(i * i) AS sxx, sum(i * y) AS sxy,
                   sum(y * y) AS syy
            FROM boxed GROUP BY s, box
        ),
        resid AS (
            SELECT s,
                   avg((syy - sy * sy / m
                        - power(sxy - sx * sy / m, 2)
                          / (sxx - sx * sx / m)) / m) AS f2
            FROM fits GROUP BY s
        ),
        piv AS (
            SELECT max(CASE WHEN s = 5 THEN sqrt(f2) END) AS f5,
                   max(CASE WHEN s = 10 THEN sqrt(f2) END) AS f10
            FROM resid
        )
        SELECT round(f5, 6) AS f_s5,
               round(f10, 6) AS f_s10,
               round((ln(f10) - ln(f5)) / (ln(10.0) - ln(5.0)), 6)
                   AS dfa_alpha
        FROM piv
    """,
    doc="Detrended fluctuation analysis (two-scale): integrate the "
    "demeaned daily series, split into boxes of 5 and 10 days, "
    "remove a per-box LINEAR fit (closed-form residual SS from "
    "the regression sums — no solver), F(s) = rms residual, alpha "
    "= the log-log slope between the two scales. Alpha ~ 0.5 = "
    "uncorrelated, > 0.5 = persistent long-range correlation — "
    "the detrending makes DFA robust to the slow trends that "
    "inflate timeseries-hurst-rs's R/S estimate (the two ops "
    "disagreeing IS the trend diagnostic). Day-summary-sized "
    "after one fact aggregation; box fits are one groupBy.",
    tags=("timeseries",),
)
def timeseries_dfa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    mu = daily.agg(F.avg("x").alias("mu"))
    w = Window.orderBy("day")
    prof = daily.join(F.broadcast(mu)).select(
        F.row_number().over(w).alias("t"),
        F.sum(F.col("x") - F.col("mu"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("y"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    sizes = prof.sparkSession.createDataFrame([(5,), (10,)], "s long")
    boxed = (
        prof.crossJoin(F.broadcast(sizes))
        .filter(
            F.floor((F.col("t") - 1) / F.col("s"))
            < F.floor(F.col("n") / F.col("s"))
        )
        .select(
            "s",
            F.floor((F.col("t") - 1) / F.col("s")).alias("box"),
            ((F.col("t") - 1) % F.col("s")).alias("i"),
            "y",
        )
    )
    fits = boxed.groupBy("s", "box").agg(
        F.count("*").alias("m"),
        F.sum("i").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i") * F.col("i")).alias("sxx"),
        F.sum(F.col("i") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    ss_res = (
        F.col("syy")
        - sy * sy / m
        - F.pow(F.col("sxy") - sx * sy / m, 2) / (F.col("sxx") - sx * sx / m)
    )
    resid = fits.groupBy("s").agg(F.avg(ss_res / m).alias("f2"))
    piv = resid.agg(
        F.max(F.when(F.col("s") == 5, F.sqrt("f2"))).alias("f5"),
        F.max(F.when(F.col("s") == 10, F.sqrt("f2"))).alias("f10"),
    )
    import math

    return piv.select(
        F.round("f5", 6).alias("f_s5"),
        F.round("f10", 6).alias("f_s10"),
        F.round(
            (F.log("f10") - F.log("f5")) / (math.log(10.0) - math.log(5.0)), 6
        ).alias("dfa_alpha"),
    )


HOLT_ALPHA = 0.4
HOLT_BETA = 0.2


@query(
    "timeseries-holt-linear",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(count(*) AS DOUBLE) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY event_type, date_trunc('day', ts)
        ),
        folded AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days,
                   list_reduce(
                       list_transform(list(y ORDER BY day), x -> [x, 0.0]),
                       (acc, x) -> [
                           {HOLT_ALPHA} * x[1]
                               + {1 - HOLT_ALPHA} * (acc[1] + acc[2]),
                           {HOLT_BETA} * (({HOLT_ALPHA} * x[1]
                               + {1 - HOLT_ALPHA} * (acc[1] + acc[2]))
                               - acc[1])
                               + {1 - HOLT_BETA} * acc[2]
                       ]) AS st
            FROM daily GROUP BY event_type
        )
        SELECT event_type, n_days,
               CAST(floor(st[1] * 1000000 + 0.5) AS BIGINT) AS level_e6,
               CAST(floor(st[2] * 1000000 + 0.5) AS BIGINT) AS trend_e6,
               CAST(floor((st[1] + 7 * st[2]) * 1000000 + 0.5) AS BIGINT)
                   AS forecast_7d_e6
        FROM folded
    """,
    doc="Holt double exponential smoothing (level + additive trend) over "
    "the daily event-count series per event_type, with the 7-step-ahead "
    "linear forecast l + 7b. Seed l1 = y1, b1 = 0; recurrences "
    "l_t = a*y_t + (1-a)(l+b), b_t = g*(l_t - l) + (1-g)b run as a "
    "single ordered left fold whose state is the 2-vector [l, b] — "
    "F.aggregate with an array accumulator on the Spark side, "
    "list_reduce over [y, 0] pairs in DuckDB, identical operation "
    "order, so the doubles match bit-for-bit before e6 quantization. "
    "y is a COUNT (exact integer) precisely so the fold input is "
    "engine-independent; a float daily aggregate would inject "
    "summation-order noise that the recurrence then amplifies. Same "
    "two-shuffle shape as timeseries-ewma: daily rollup (map-side "
    "combine collapses each scan partition to <= |days| rows), then a "
    "per-series fold over a bounded array — state is 2 doubles no "
    "matter the series length, and day-segmented folds recombine by "
    "affine composition at 100 TB because the recurrence is linear in "
    "the state.",
)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, g = HOLT_ALPHA, HOLT_BETA
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    grouped = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("seq"),
    )
    vals = F.transform(F.col("seq"), lambda s: s["y"])

    def step(acc, x):
        lvl, trd = F.element_at(acc, 1), F.element_at(acc, 2)
        new_lvl = F.lit(a) * x + F.lit(1 - a) * (lvl + trd)
        return F.array(
            new_lvl, F.lit(g) * (new_lvl - lvl) + F.lit(1 - g) * trd
        )

    st = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.array(F.element_at(vals, 1), F.lit(0.0)),
        step,
    )
    lvl, trd = F.element_at(st, 1), F.element_at(st, 2)
    return grouped.select(
        "event_type",
        "n_days",
        F.floor(lvl * 1000000 + 0.5).cast("long").alias("level_e6"),
        F.floor(trd * 1000000 + 0.5).cast("long").alias("trend_e6"),
        F.floor((lvl + 7 * trd) * 1000000 + 0.5)
        .cast("long")
        .alias("forecast_7d_e6"),
    )


@query(
    "timeseries-forecast-backtest",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
        ),
        lagged AS (
            SELECT day, y,
                   lag(y, 7) OVER w AS f_snaive,
                   lag(y, 1) OVER w AS y_prev,
                   row_number() OVER w AS rn
            FROM daily WINDOW w AS (ORDER BY day)
        ),
        scored AS (
            SELECT y, f_snaive,
                   abs(y - f_snaive) AS ae,
                   abs(y - y_prev) AS naive_ae
            FROM lagged WHERE rn > 7
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(avg(abs(y - f_snaive) / y), 6) AS mape,
               round(avg(2 * abs(y - f_snaive)
                         / (abs(y) + abs(f_snaive))), 6) AS smape,
               round(avg(ae) / avg(naive_ae), 6) AS mase
        FROM scored
    """,
    doc="Forecast backtest of the seasonal-naive baseline (y_hat_t = "
    "y_{t-7}) on daily revenue, scored with the three standard "
    "accuracy metrics: MAPE (interpretable but explodes near zero "
    "actuals), sMAPE (bounded symmetric variant), and MASE (error "
    "scaled by the in-sample one-step naive MAE — the only one of "
    "the three that is scale-free AND zero-safe, which is why M-"
    "competitions report it; MASE < 1 means the method beats naive). "
    "Any real forecaster must clear this bar first. Lags/ranks are "
    "windows over the daily summary (calendar-bounded); warm-up week "
    "excluded from scoring.",
    tags=("timeseries",),
)
def timeseries_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "y",
        F.lag("y", 7).over(w).alias("f_snaive"),
        F.lag("y", 1).over(w).alias("y_prev"),
        F.row_number().over(w).alias("rn"),
    )
    scored = lagged.filter(F.col("rn") > 7).select(
        "y",
        "f_snaive",
        F.abs(F.col("y") - F.col("f_snaive")).alias("ae"),
        F.abs(F.col("y") - F.col("y_prev")).alias("naive_ae"),
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_days"),
        # try_divide: a zero actual (hostile values + NULL-thinned days)
        # makes that day's MAPE/sMAPE term undefined — NULL on both
        # engines (DuckDB x/0 is NULL), avg skips it identically
        F.round(
            F.avg(F.try_divide(F.abs(F.col("y") - F.col("f_snaive")), F.col("y"))), 6
        ).alias("mape"),
        F.round(
            F.avg(
                F.try_divide(
                    2 * F.abs(F.col("y") - F.col("f_snaive")),
                    F.abs(F.col("y")) + F.abs(F.col("f_snaive")),
                )
            ),
            6,
        ).alias("smape"),
        F.round(F.avg("ae") / F.avg("naive_ae"), 6).alias("mase"),
    )


@query(
    "timeseries-page-hinkley",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        run AS (
            SELECT day, x,
                   avg(x) OVER w AS xbar,
                   row_number() OVER w AS rn
            FROM daily WINDOW w AS (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        m AS (
            SELECT day,
                   sum(x - xbar - 0.005) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS m_t
            FROM run
        ),
        ph AS (
            SELECT day, m_t,
                   m_t - min(m_t) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS ph_t
            FROM m
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(max(ph_t), 6) AS max_ph,
               CAST(min(CASE WHEN ph_t > 5.0 THEN day END) AS DATE)
                   AS first_alarm_day,
               CAST(count(CASE WHEN ph_t > 5.0 THEN 1 END) AS BIGINT)
                   AS n_alarm_days
        FROM ph
    """,
    doc="Page-Hinkley upward-drift detector on the daily mean value: "
    "m_t accumulates deviations from the RUNNING mean (minus a "
    "tolerance delta=0.005), and PH_t = m_t - min_{s<=t} m_s alarms "
    "when it exceeds lambda=5 — the sequential change detector used "
    "in streaming-ML drift monitors (cheaper than CUSUM's two-sided "
    "bookkeeping, more robust than threshold-on-mean because the "
    "running mean adapts). Complements timeseries-changepoint "
    "(retrospective single split) and stats-sprt-monitor (two simple "
    "hypotheses) as the online-detection member of the family. "
    "Windows over the daily summary only (calendar-bounded).",
    tags=("timeseries",),
)
def timeseries_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("x")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = daily.select(
        "day", "x", F.avg("x").over(w).alias("xbar")
    )
    m = run.select(
        "day",
        F.sum(F.col("x") - F.col("xbar") - 0.005).over(w).alias("m_t"),
    )
    ph = m.select(
        "day", "m_t", (F.col("m_t") - F.min("m_t").over(w)).alias("ph_t")
    )
    return ph.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.max("ph_t"), 6).alias("max_ph"),
        F.min(F.when(F.col("ph_t") > 5.0, F.col("day"))).alias(
            "first_alarm_day"
        ),
        F.count(F.when(F.col("ph_t") > 5.0, 1)).cast("long").alias(
            "n_alarm_days"
        ),
    )


@query(
    "timeseries-ses-grid",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
        ),
        base AS (SELECT avg(y) AS mu FROM daily),
        lagged AS (
            SELECT d.day, d.y, b.mu, row_number() OVER w AS rn
            FROM daily d CROSS JOIN base b
            WINDOW w AS (ORDER BY d.day)
        ),
        fc AS (
            SELECT CAST(0.1 AS DOUBLE) AS alpha, day, y, rn,
                   CAST(0.1 AS DOUBLE) * lag(y, 1) OVER w1 + CAST(0.09000000000000001 AS DOUBLE) * lag(y, 2) OVER w1 + CAST(0.08100000000000002 AS DOUBLE) * lag(y, 3) OVER w1 + CAST(0.0729 AS DOUBLE) * lag(y, 4) OVER w1 + CAST(0.06561 AS DOUBLE) * lag(y, 5) OVER w1 + CAST(0.05904900000000001 AS DOUBLE) * lag(y, 6) OVER w1 + CAST(0.05314410000000001 AS DOUBLE) * lag(y, 7) OVER w1 + CAST(0.04782969000000001 AS DOUBLE) * lag(y, 8) OVER w1 + CAST(0.04304672100000001 AS DOUBLE) * lag(y, 9) OVER w1 + CAST(0.03874204890000001 AS DOUBLE) * lag(y, 10) OVER w1 + CAST(0.03486784401000001 AS DOUBLE) * lag(y, 11) OVER w1 + CAST(0.031381059609000006 AS DOUBLE) * lag(y, 12) OVER w1 + CAST(0.028242953648100012 AS DOUBLE) * lag(y, 13) OVER w1 + CAST(0.02541865828329001 AS DOUBLE) * lag(y, 14) OVER w1
                   + CAST(0.2287679245496101 AS DOUBLE) * mu AS f
            FROM lagged WINDOW w1 AS (ORDER BY day)
            UNION ALL
            SELECT CAST(0.3 AS DOUBLE) AS alpha, day, y, rn,
                   CAST(0.3 AS DOUBLE) * lag(y, 1) OVER w2 + CAST(0.21 AS DOUBLE) * lag(y, 2) OVER w2 + CAST(0.14699999999999996 AS DOUBLE) * lag(y, 3) OVER w2 + CAST(0.10289999999999998 AS DOUBLE) * lag(y, 4) OVER w2 + CAST(0.07202999999999998 AS DOUBLE) * lag(y, 5) OVER w2 + CAST(0.05042099999999998 AS DOUBLE) * lag(y, 6) OVER w2 + CAST(0.035294699999999984 AS DOUBLE) * lag(y, 7) OVER w2 + CAST(0.02470628999999999 AS DOUBLE) * lag(y, 8) OVER w2 + CAST(0.01729440299999999 AS DOUBLE) * lag(y, 9) OVER w2 + CAST(0.012106082099999993 AS DOUBLE) * lag(y, 10) OVER w2 + CAST(0.008474257469999994 AS DOUBLE) * lag(y, 11) OVER w2 + CAST(0.005931980228999996 AS DOUBLE) * lag(y, 12) OVER w2 + CAST(0.0041523861602999965 AS DOUBLE) * lag(y, 13) OVER w2 + CAST(0.0029066703122099975 AS DOUBLE) * lag(y, 14) OVER w2
                   + CAST(0.006782230728489994 AS DOUBLE) * mu AS f
            FROM lagged WINDOW w2 AS (ORDER BY day)
            UNION ALL
            SELECT CAST(0.5 AS DOUBLE) AS alpha, day, y, rn,
                   CAST(0.5 AS DOUBLE) * lag(y, 1) OVER w3 + CAST(0.25 AS DOUBLE) * lag(y, 2) OVER w3 + CAST(0.125 AS DOUBLE) * lag(y, 3) OVER w3 + CAST(0.0625 AS DOUBLE) * lag(y, 4) OVER w3 + CAST(0.03125 AS DOUBLE) * lag(y, 5) OVER w3 + CAST(0.015625 AS DOUBLE) * lag(y, 6) OVER w3 + CAST(0.0078125 AS DOUBLE) * lag(y, 7) OVER w3 + CAST(0.00390625 AS DOUBLE) * lag(y, 8) OVER w3 + CAST(0.001953125 AS DOUBLE) * lag(y, 9) OVER w3 + CAST(0.0009765625 AS DOUBLE) * lag(y, 10) OVER w3 + CAST(0.00048828125 AS DOUBLE) * lag(y, 11) OVER w3 + CAST(0.000244140625 AS DOUBLE) * lag(y, 12) OVER w3 + CAST(0.0001220703125 AS DOUBLE) * lag(y, 13) OVER w3 + CAST(6.103515625e-05 AS DOUBLE) * lag(y, 14) OVER w3
                   + CAST(6.103515625e-05 AS DOUBLE) * mu AS f
            FROM lagged WINDOW w3 AS (ORDER BY day)
            UNION ALL
            SELECT CAST(0.7 AS DOUBLE) AS alpha, day, y, rn,
                   CAST(0.7 AS DOUBLE) * lag(y, 1) OVER w4 + CAST(0.21000000000000002 AS DOUBLE) * lag(y, 2) OVER w4 + CAST(0.06300000000000001 AS DOUBLE) * lag(y, 3) OVER w4 + CAST(0.018900000000000007 AS DOUBLE) * lag(y, 4) OVER w4 + CAST(0.005670000000000003 AS DOUBLE) * lag(y, 5) OVER w4 + CAST(0.0017010000000000011 AS DOUBLE) * lag(y, 6) OVER w4 + CAST(0.0005103000000000004 AS DOUBLE) * lag(y, 7) OVER w4 + CAST(0.00015309000000000015 AS DOUBLE) * lag(y, 8) OVER w4 + CAST(4.592700000000005e-05 AS DOUBLE) * lag(y, 9) OVER w4 + CAST(1.3778100000000016e-05 AS DOUBLE) * lag(y, 10) OVER w4 + CAST(4.133430000000006e-06 AS DOUBLE) * lag(y, 11) OVER w4 + CAST(1.2400290000000018e-06 AS DOUBLE) * lag(y, 12) OVER w4 + CAST(3.7200870000000064e-07 AS DOUBLE) * lag(y, 13) OVER w4 + CAST(1.1160261000000021e-07 AS DOUBLE) * lag(y, 14) OVER w4
                   + CAST(4.78296900000001e-08 AS DOUBLE) * mu AS f
            FROM lagged WINDOW w4 AS (ORDER BY day)
            UNION ALL
            SELECT CAST(0.9 AS DOUBLE) AS alpha, day, y, rn,
                   CAST(0.9 AS DOUBLE) * lag(y, 1) OVER w5 + CAST(0.08999999999999998 AS DOUBLE) * lag(y, 2) OVER w5 + CAST(0.008999999999999996 AS DOUBLE) * lag(y, 3) OVER w5 + CAST(0.0008999999999999994 AS DOUBLE) * lag(y, 4) OVER w5 + CAST(8.999999999999992e-05 AS DOUBLE) * lag(y, 5) OVER w5 + CAST(8.99999999999999e-06 AS DOUBLE) * lag(y, 6) OVER w5 + CAST(8.999999999999988e-07 AS DOUBLE) * lag(y, 7) OVER w5 + CAST(8.999999999999987e-08 AS DOUBLE) * lag(y, 8) OVER w5 + CAST(8.999999999999985e-09 AS DOUBLE) * lag(y, 9) OVER w5 + CAST(8.999999999999982e-10 AS DOUBLE) * lag(y, 10) OVER w5 + CAST(8.99999999999998e-11 AS DOUBLE) * lag(y, 11) OVER w5 + CAST(8.999999999999979e-12 AS DOUBLE) * lag(y, 12) OVER w5 + CAST(8.999999999999977e-13 AS DOUBLE) * lag(y, 13) OVER w5 + CAST(8.999999999999974e-14 AS DOUBLE) * lag(y, 14) OVER w5
                   + CAST(9.999999999999968e-15 AS DOUBLE) * mu AS f
            FROM lagged WINDOW w5 AS (ORDER BY day)
        ),
        scored AS (
            SELECT alpha,
                   sum(power(y - f, 2)) AS sse
            FROM fc WHERE rn > 15
            GROUP BY alpha
        )
        SELECT alpha,
               round(sse, 2) AS sse,
               CAST(CASE WHEN row_number() OVER (ORDER BY sse, alpha) = 1
                    THEN 1 ELSE 0 END AS BIGINT) AS is_best
        FROM scored
        ORDER BY alpha
    """,
    doc="Simple-exponential-smoothing hyperparameter sweep: the "
    "one-step-ahead SES forecast (geometric recursion unrolled to "
    "14 lags with the truncated tail replaced by its expectation, "
    "the stats-ewma-control-chart device) evaluated at 5 alphas in "
    "ONE pass — the 14 lag columns are computed once and each "
    "alpha's forecast is a different codegen linear combination of "
    "the same lags, so the grid is a constant fan-out over the "
    "daily summary, not 5 scans. SSE over the post-warm-up window "
    "picks the winner. The hyperparameter-sweep-as-fan-out shape "
    "that generalizes to any unrollable recursive smoother at "
    "100 TB (sweeps parallelize over the grid for free; the data "
    "pass count stays 1).",
    tags=("timeseries",),
)
def timeseries_ses_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    base = daily.agg(F.avg("y").alias("mu"))
    w = Window.orderBy("day")
    # persist the calendar-bounded lag frame: the 5 alpha branches each
    # reference it, and uncached every branch re-runs the orders scan +
    # daily rollup (20 fact scans in the executed plan — rfm-class
    # fan-out). release_caches() drops it after materialization.
    lagged = daily.crossJoin(F.broadcast(base)).select(
        "day",
        "y",
        "mu",
        F.row_number().over(w).alias("rn"),
        *[F.lag("y", k + 1).over(w).alias(f"l{k}") for k in range(14)],
    ).persist()
    alpha_rows = []
    for a in [0.1, 0.3, 0.5, 0.7, 0.9]:
        cs = [a * (1 - a) ** k for k in range(14)]
        f_hat = sum(
            (F.lit(c) * F.col(f"l{k}") for k, c in enumerate(cs)),
            start=F.lit(0.0),
        ) + F.lit((1 - a) ** 14) * F.col("mu")
        alpha_rows.append(
            lagged.select(
                F.lit(a).alias("alpha"), "y", "rn", f_hat.alias("f")
            )
        )
    fc = alpha_rows[0]
    for df_a in alpha_rows[1:]:
        fc = fc.unionByName(df_a)
    scored = (
        fc.filter(F.col("rn") > 15)
        .groupBy("alpha")
        .agg(F.sum(F.pow(F.col("y") - F.col("f"), 2)).alias("sse"))
    )
    # argmin via row_number over the 5-row grid summary, NOT a float
    # equality against a separately-computed min: re-evaluating the
    # aggregation for the min sums in a different order, and the
    # last-bit-different value matches nothing (the zipf skew sweep
    # caught DuckDB doing exactly that with the inlined CTE)
    wbest = Window.orderBy("sse", "alpha")
    return (
        scored.select(
            "alpha",
            F.round("sse", 2).alias("sse"),
            F.when(F.row_number().over(wbest) == 1, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_best"),
        )
        .orderBy("alpha")
    )



@query(
    "timeseries-matrix-profile-discord",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        win AS (
            SELECT day,
                   row_number() OVER w AS i,
                   x AS x0,
                   lead(x, 1) OVER w AS x1,
                   lead(x, 2) OVER w AS x2
            FROM daily WINDOW w AS (ORDER BY day)
        ),
        sub AS (SELECT * FROM win WHERE x2 IS NOT NULL),
        dist AS (
            SELECT a.day, a.i,
                   min(sqrt(power(a.x0 - b.x0, 2)
                            + power(a.x1 - b.x1, 2)
                            + power(a.x2 - b.x2, 2))) AS nn_dist
            FROM sub a JOIN sub b ON abs(a.i - b.i) >= 3
            GROUP BY a.day, a.i
        )
        SELECT day AS discord_day, round(nn_dist, 6) AS nn_dist
        FROM dist
        ORDER BY nn_dist DESC, discord_day
        LIMIT 3
    """,
    doc="Matrix-profile discord discovery (length-3 subsequences over "
    "the daily mean series): each window's distance to its NEAREST "
    "non-overlapping neighbor; the windows whose nearest neighbor is "
    "FARTHEST are discords — the 'most unusual shape' anomaly that "
    "point detectors (z-score, IQR fence) miss because every single "
    "value is in range while the 3-day PATTERN is unprecedented. "
    "The all-pairs join runs on the daily SUMMARY (calendar-bounded "
    "~900x900 at a 2.5-year corpus — constant at any data volume); "
    "at longer horizons the standard STOMP ordering or an LSH over "
    "z-normed windows bounds it, same discipline as the dedup "
    "family. Top-3 via TakeOrderedAndProject.",
    tags=("timeseries",),
)
def timeseries_matrix_profile_discord(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("x")
    )
    w = Window.orderBy("day")
    win = daily.select(
        "day",
        F.row_number().over(w).alias("i"),
        F.col("x").alias("x0"),
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    ).filter(F.col("x2").isNotNull())
    a = win.select(
        F.col("day").alias("day"), F.col("i").alias("ia"),
        F.col("x0").alias("a0"), F.col("x1").alias("a1"), F.col("x2").alias("a2"),
    )
    b = win.select(
        F.col("i").alias("ib"),
        F.col("x0").alias("b0"), F.col("x1").alias("b1"), F.col("x2").alias("b2"),
    )
    dist = (
        a.join(F.broadcast(b), F.abs(F.col("ia") - F.col("ib")) >= 3)
        .groupBy("day", "ia")
        .agg(
            F.min(
                F.sqrt(
                    F.pow(F.col("a0") - F.col("b0"), 2)
                    + F.pow(F.col("a1") - F.col("b1"), 2)
                    + F.pow(F.col("a2") - F.col("b2"), 2)
                )
            ).alias("nn_dist")
        )
    )
    return (
        dist.orderBy(F.col("nn_dist").desc(), "day")
        .limit(3)
        .select(F.col("day").alias("discord_day"), F.round("nn_dist", 6).alias("nn_dist"))
    )
