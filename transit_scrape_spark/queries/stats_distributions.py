"""Distribution fitting, tail/extreme-value estimators, divergence
and inequality measures over the warehouse tables. Split from
stats.py in round 6. Same @query/oracle discipline as stats.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.session import cache_width
from transit_scrape_spark.sources.tables import load_table


@query(
    "stats-ks-binned",
    oracle="""
        WITH s AS (
            SELECT value AS v,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
            FROM events WHERE event_type IN ('click', 'view')
        ),
        ext AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
        binned AS (
            SELECT least(255, CAST(floor((v - lo) / (hi - lo) * 256.0) AS INT))
                       AS bin,
                   sum(is1) AS c1, sum(1 - is1) AS c2
            FROM s, ext GROUP BY 1
        ),
        ecdf AS (
            SELECT bin,
                   sum(c1) OVER (ORDER BY bin) AS cum1,
                   sum(c2) OVER (ORDER BY bin) AS cum2,
                   sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
            FROM binned
        )
        SELECT CAST(max(n1) AS BIGINT) AS n1,
               CAST(max(n2) AS BIGINT) AS n2,
               round(max(abs(CAST(cum1 AS DOUBLE) / n1
                             - CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_d,
               round(2 * exp(-2 * power(max(abs(CAST(cum1 AS DOUBLE) / n1
                                              - CAST(cum2 AS DOUBLE) / n2))
                                        * sqrt(CAST(max(n1) AS DOUBLE) * max(n2)
                                               / (max(n1) + max(n2))), 2)), 6)
                   AS p_approx
        FROM ecdf
    """,
    doc="Two-sample Kolmogorov-Smirnov distance between the 'click' and "
    "'view' value distributions, evaluated at 256 equi-width bin "
    "boundaries (the distributed-safe ECDF: exact KS needs a global "
    "sort of raw values into one ordered partition; binning reduces "
    "the fact pass to one groupBy(bin) hash aggregation and the ECDF "
    "window runs over <=256 summary rows). First-term asymptotic "
    "p-value 2*exp(-2*(D*sqrt(n1*n2/(n1+n2)))^2) alongside. Bin "
    "edges from a first min/max pass broadcast as a single row.",
    tags=("stats",),
)
def stats_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    ext = s.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = (
        s.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 256.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(F.sum("is1").alias("c1"), F.sum(1 - F.col("is1")).alias("c2"))
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    ecdf = binned.select(
        "bin",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    d = F.max(
        F.abs(
            F.col("cum1").cast("double") / F.col("n1")
            - F.col("cum2").cast("double") / F.col("n2")
        )
    )
    scale = F.sqrt(
        F.max("n1").cast("double") * F.max("n2") / (F.max("n1") + F.max("n2"))
    )
    return ecdf.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(d, 6).alias("ks_d"),
        F.round(2 * F.exp(-2 * F.pow(d * scale, 2)), 6).alias("p_approx"),
    )


@query(
    "agg-trimmed-mean",
    oracle="""
        WITH bounds AS (
            SELECT event_type,
                   quantile_cont(value, 0.1) AS p10,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n_kept,
               round(avg(e.value), 6) AS trimmed_mean,
               round(max(b.p10), 6) AS p10,
               round(max(b.p90), 6) AS p90
        FROM events e JOIN bounds b ON e.event_type = b.event_type
        WHERE e.value BETWEEN b.p10 AND b.p90
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    doc="10%-trimmed mean of value per event_type — the robust "
    "location estimate dashboards want when a metric has outlier "
    "tails but MAD is too blunt. Two fact passes by construction: "
    "pass 1 computes exact interpolated p10/p90 per group "
    "(percentile aggregate; at 100 TB approx_percentile's "
    "t-digest sketch replaces it with one map-side-combinable "
    "pass at bounded error), pass 2 re-filters the facts against "
    "the BROADCAST 5-row bounds table and averages — the "
    "filter-against-broadcast-thresholds join keeps the second "
    "pass shuffle-free except the final per-group agg. Spark "
    "percentile() and DuckDB quantile_cont both linearly "
    "interpolate, so the bounds agree exactly.",
    tags=("stats",),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.1)").alias("p10"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .filter(
            (F.col("value") >= F.col("p10")) & (F.col("value") <= F.col("p90"))
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.round(F.avg("value"), 6).alias("trimmed_mean"),
            F.round(F.max("p10"), 6).alias("p10"),
            F.round(F.max("p90"), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


@query(
    "stats-gini-split",
    oracle="""
        WITH ext AS (
            SELECT min(value) AS lo, max(value) AS hi FROM events
        ),
        binned AS (
            SELECT least(31, CAST(floor((value - lo) / (hi - lo) * 32.0)
                                  AS INT)) AS bin,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events, ext
        ),
        cells AS (
            SELECT bin, CAST(sum(y) AS DOUBLE) AS pos,
                   CAST(count(*) AS DOUBLE) AS n
            FROM binned GROUP BY bin
        ),
        cum AS (
            SELECT bin,
                   sum(pos) OVER (ORDER BY bin) AS lpos,
                   sum(n) OVER (ORDER BY bin) AS ln_,
                   sum(pos) OVER () AS tpos,
                   sum(n) OVER () AS tn,
                   lo, hi
            FROM cells, ext
        ),
        scored AS (
            SELECT bin,
                   round(lo + (bin + 1) * (hi - lo) / 32.0, 6) AS threshold,
                   (ln_ / tn) * (2 * (lpos / ln_) * (1 - lpos / ln_))
                   + ((tn - ln_) / tn)
                     * (2 * ((tpos - lpos) / (tn - ln_))
                          * (1 - (tpos - lpos) / (tn - ln_)))
                       AS gini_w,
                   2 * (tpos / tn) * (1 - tpos / tn) AS gini_root
            FROM cum WHERE ln_ > 0 AND ln_ < tn
        )
        SELECT CAST(bin AS BIGINT) AS bin, threshold,
               round(gini_w, 6) AS weighted_gini,
               round(gini_root - gini_w, 6) AS gini_gain
        FROM scored
        ORDER BY gini_w, bin LIMIT 1
    """,
    doc="Best decision-stump split of `value` for predicting "
    "event_type='purchase', by weighted Gini impurity over a 32-bin "
    "candidate grid — exactly how distributed tree learners "
    "(XGBoost hist mode, Spark MLlib trees) find splits at scale: "
    "NEVER sort the raw column; bin it in one hash agg (map-side "
    "combinable class-count cells), then every candidate "
    "threshold's left/right class distributions come from "
    "cumulative windows over the 32-row summary. Min-bound "
    "min/max pre-pass broadcast for bin edges; argmin via "
    "deterministic (gini, bin) ordering + LIMIT 1.",
    tags=("stats",),
)
def stats_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # persist the 1-row extent: the binning pass AND the threshold
    # labelling both re-consumed it, each replaying an events scan
    # (3 scans -> 2)
    ext = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).coalesce(1).persist()
    binned = ev.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.lit(31),
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 32.0
            ).cast("int"),
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum("y").cast("double").alias("pos"),
        F.count("*").cast("double").alias("n"),
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    cum = cells.crossJoin(F.broadcast(ext)).select(
        "bin",
        "lo",
        "hi",
        F.sum("pos").over(w_cum).alias("lpos"),
        F.sum("n").over(w_cum).alias("ln_"),
        F.sum("pos").over(w_all).alias("tpos"),
        F.sum("n").over(w_all).alias("tn"),
    )
    lp = F.col("lpos") / F.col("ln_")
    rp = (F.col("tpos") - F.col("lpos")) / (F.col("tn") - F.col("ln_"))
    gini_w = (F.col("ln_") / F.col("tn")) * (2 * lp * (1 - lp)) + (
        (F.col("tn") - F.col("ln_")) / F.col("tn")
    ) * (2 * rp * (1 - rp))
    gini_root = (
        2 * (F.col("tpos") / F.col("tn")) * (1 - F.col("tpos") / F.col("tn"))
    )
    scored = cum.filter(
        (F.col("ln_") > 0) & (F.col("ln_") < F.col("tn"))
    ).select(
        "bin",
        F.round(
            F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / 32.0,
            6,
        ).alias("threshold"),
        gini_w.alias("gini_w"),
        gini_root.alias("gini_root"),
    )
    return (
        scored.select(
            F.col("bin").cast("long").alias("bin"),
            "threshold",
            F.round("gini_w", 6).alias("weighted_gini"),
            F.round(F.col("gini_root") - F.col("gini_w"), 6).alias(
                "gini_gain"
            ),
        )
        .orderBy("weighted_gini", "bin")
        .limit(1)
    )


@query(
    "timeseries-hurst-rs",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT x, row_number() OVER (ORDER BY day) - 1 AS t FROM daily
        ),
        blocks AS (
            SELECT m.m, idx.t // m.m AS blk, idx.t, idx.x
            FROM idx, (SELECT unnest([4, 8, 16]) AS m) m
        ),
        full_blocks AS (
            SELECT m, blk FROM blocks GROUP BY m, blk HAVING count(*) = m
        ),
        withmean AS (
            SELECT b.m, b.blk, b.t, b.x,
                   avg(b.x) OVER (PARTITION BY b.m, b.blk) AS mu,
                   stddev_pop(b.x) OVER (PARTITION BY b.m, b.blk) AS s
            FROM blocks b JOIN full_blocks f ON b.m = f.m AND b.blk = f.blk
        ),
        dev AS (
            SELECT m, blk, s,
                   sum(x - mu) OVER (PARTITION BY m, blk ORDER BY t) AS z
            FROM withmean
        ),
        rs AS (
            SELECT m, blk, (max(z) - min(z)) / max(s) AS rs
            FROM dev WHERE s > 0 GROUP BY m, blk
        ),
        pts AS (
            SELECT ln(CAST(m AS DOUBLE)) AS lx, ln(avg(rs)) AS ly
            FROM rs GROUP BY m
        )
        SELECT CAST(count(*) AS BIGINT) AS n_scales,
               round((sum(lx * ly) - sum(lx) * sum(ly) / count(*))
                     / (sum(lx * lx) - sum(lx) * sum(lx) / count(*)), 6)
                   AS hurst_exponent
        FROM pts
    """,
    doc="Hurst exponent by rescaled-range (R/S) analysis of the daily "
    "volume series: for block sizes m in {4,8,16}, each full block's "
    "R = range of cumulative mean-deviations and S = block stddev "
    "give R/S; H is the log-log slope of mean R/S vs m (H>0.5 "
    "trending/persistent, <0.5 mean-reverting). Facts collapse "
    "once; the block machinery — block id by integer division of "
    "the day index, cumulative deviation windows partitioned by "
    "(m, block) — runs over a 3x-exploded ~30-row summary, and the "
    "final slope is the closed-form simple regression on 3 points. "
    "Long-memory detection with zero iteration, windows and joins "
    "only.",
    tags=("timeseries", "stats"),
)
def timeseries_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    idx = daily.select(
        "x", (F.row_number().over(Window.orderBy("day")) - 1).alias("t")
    )
    ms = spark.range(0, 3).selectExpr(
        "CAST(shiftleft(4, CAST(id AS INT)) AS BIGINT) AS m"
    )
    blocks = idx.crossJoin(F.broadcast(ms)).select(
        "m", (F.col("t") / F.col("m")).cast("long").alias("blk"), "t", "x"
    )
    full = blocks.groupBy("m", "blk").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") == F.col("m")
    ).select("m", "blk")
    wb = Window.partitionBy("m", "blk")
    wbo = Window.partitionBy("m", "blk").orderBy("t")
    withmean = blocks.join(full, ["m", "blk"]).select(
        "m",
        "blk",
        "t",
        "x",
        F.avg("x").over(wb).alias("mu"),
        F.stddev_pop("x").over(wb).alias("s"),
    )
    dev = withmean.select(
        "m",
        "blk",
        "s",
        F.sum(F.col("x") - F.col("mu")).over(wbo).alias("z"),
    )
    rs = (
        dev.filter(F.col("s") > 0)
        .groupBy("m", "blk")
        .agg(((F.max("z") - F.min("z")) / F.max("s")).alias("rs"))
    )
    pts = rs.groupBy("m").agg(F.avg("rs").alias("mean_rs")).select(
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log("mean_rs").alias("ly"),
    )
    n = F.count("*")
    slope = (F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly") / n) / (
        F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx") / n
    )
    return pts.agg(
        n.cast("long").alias("n_scales"),
        F.round(slope, 6).alias("hurst_exponent"),
    )


@query(
    "stats-jarque-bera",
    oracle="""
        WITH m AS (
            SELECT count(*) AS n, avg(value) AS mu,
                   avg(value * value) AS m2r,
                   avg(value * value * value) AS m3r,
                   avg(value * value * value * value) AS m4r
            FROM events
        ),
        c AS (
            SELECT n,
                   m2r - mu * mu AS v,
                   m3r - 3 * mu * m2r + 2 * mu * mu * mu AS m3,
                   m4r - 4 * mu * m3r + 6 * mu * mu * m2r
                       - 3 * mu * mu * mu * mu AS m4
            FROM m
        )
        SELECT CAST(n AS BIGINT) AS n,
               round(m3 / power(v, 1.5), 6) AS skewness,
               round(m4 / (v * v) - 3, 6) AS excess_kurtosis,
               round(n / 6.0 * (power(m3 / power(v, 1.5), 2)
                                + power(m4 / (v * v) - 3, 2) / 4), 6)
                   AS jarque_bera
        FROM c
    """,
    doc="Jarque-Bera normality test of the value column: skewness and "
    "excess kurtosis from the first four RAW moments (one scalar "
    "aggregation — four sums, map-side combinable, the "
    "moments-to-central-moments algebra on the single summary "
    "row), JB = n/6 * (S^2 + K^2/4) ~ chi2(2) under normality. "
    "Population moments on both sides (avg of powers), matching "
    "the textbook JB definition rather than Spark's "
    "sample-corrected skewness()/kurtosis() builtins — which is "
    "also what makes the DuckDB oracle an exact twin rather than "
    "a bias-correction scavenger hunt.",
    tags=("stats",),
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = ev.agg(
        F.count("*").alias("n"),
        F.avg(v).alias("mu"),
        F.avg(v * v).alias("m2r"),
        F.avg(v * v * v).alias("m3r"),
        F.avg(v * v * v * v).alias("m4r"),
    )
    mu = F.col("mu")
    var = F.col("m2r") - mu * mu
    m3 = F.col("m3r") - 3 * mu * F.col("m2r") + 2 * mu * mu * mu
    m4 = (
        F.col("m4r")
        - 4 * mu * F.col("m3r")
        + 6 * mu * mu * F.col("m2r")
        - 3 * mu * mu * mu * mu
    )
    skew = m3 / F.pow(var, 1.5)
    kurt = m4 / (var * var) - 3
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(
            F.col("n") / 6.0 * (F.pow(skew, 2) + F.pow(kurt, 2) / 4), 6
        ).alias("jarque_bera"),
    )


@query(
    "stats-exponential-fit-ks",
    oracle="""
        WITH arr AS (
            SELECT user_id, ts,
                   date_diff('second', lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id), ts) AS dt
            FROM events
        ),
        gaps AS (SELECT CAST(dt AS DOUBLE) AS dt FROM arr
                 WHERE dt IS NOT NULL AND dt > 0),
        lam AS (SELECT 1.0 / avg(dt) AS lambda_, count(*) AS n FROM gaps),
        binned AS (
            SELECT CAST(floor(dt * lambda_ / 0.125) AS BIGINT) AS bin,
                   count(*) AS c, max(lambda_) AS lambda_, max(n) AS n
            FROM gaps, lam
            WHERE dt * lambda_ < 8.0
            GROUP BY 1
        ),
        ecdf AS (
            SELECT bin,
                   CAST(sum(c) OVER (ORDER BY bin) AS DOUBLE)
                       / max(n) OVER () AS f_emp,
                   1 - exp(-((bin + 1) * 0.125)) AS f_fit,
                   lambda_, n
            FROM binned
        )
        SELECT round(max(lambda_) * 3600, 6) AS events_per_hour,
               CAST(max(n) AS BIGINT) AS n_gaps,
               round(max(abs(f_emp - f_fit)), 6) AS ks_to_exponential
        FROM ecdf
    """,
    doc="Exponential goodness-of-fit for per-user inter-event times "
    "(the Poisson-process sanity check behind every arrival-rate "
    "model): MLE rate lambda = 1/mean(gap) in one pass, then the "
    "binned-ECDF KS distance (same distributed-safe 64-bin "
    "discretization as stats-ks-binned — exact KS would demand a "
    "global sort) against the fitted CDF 1-e^(-lambda*t), "
    "evaluated at upper bin edges in standardized lambda*t units "
    "so the bin grid is scale-free. Gaps computed with one "
    "lag() window inside each user partition; zero gaps "
    "(same-timestamp events) excluded as ties, standardized "
    "domain capped at 8 mean-lifetimes (P(beyond) < 0.04%).",
    tags=("stats", "timeseries"),
)
def stats_exponential_fit_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    arr = ev.select(
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("dt")
    )
    gaps = arr.filter(F.col("dt").isNotNull() & (F.col("dt") > 0)).select(
        F.col("dt").cast("double").alias("dt")
    )
    lam = gaps.agg(
        (1.0 / F.avg("dt")).alias("lambda_"), F.count("*").alias("n")
    )
    binned = (
        gaps.crossJoin(F.broadcast(lam))
        .filter(F.col("dt") * F.col("lambda_") < 8.0)
        .groupBy(
            F.floor(F.col("dt") * F.col("lambda_") / 0.125)
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").alias("c"),
            F.max("lambda_").alias("lambda_"),
            F.max("n").alias("n"),
        )
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    ecdf = binned.select(
        "bin",
        (
            F.sum("c").over(w_cum).cast("double")
            / F.max("n").over(w_all)
        ).alias("f_emp"),
        (1 - F.exp(-((F.col("bin") + 1) * 0.125))).alias("f_fit"),
        "lambda_",
        "n",
    )
    return ecdf.agg(
        F.round(F.max("lambda_") * 3600, 6).alias("events_per_hour"),
        F.max("n").cast("long").alias("n_gaps"),
        F.round(F.max(F.abs(F.col("f_emp") - F.col("f_fit"))), 6).alias(
            "ks_to_exponential"
        ),
    )


@query(
    "stats-capture-recapture",
    oracle="""
        WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        s1 AS (
            SELECT DISTINCT user_id FROM events, span
            WHERE CAST(ts AS DATE) BETWEEN d0 AND d0 + INTERVAL 6 DAY
        ),
        s2 AS (
            SELECT DISTINCT user_id FROM events, span
            WHERE CAST(ts AS DATE) BETWEEN d0 + INTERVAL 7 DAY
                                       AND d0 + INTERVAL 13 DAY
        ),
        counts AS (
            SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s1 JOIN s2 USING (user_id)) AS m
        )
        SELECT CAST(n1 AS BIGINT) AS week1_users,
               CAST(n2 AS BIGINT) AS week2_users,
               CAST(m AS BIGINT) AS recaptured,
               round(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / (m + 1) - 1, 6)
                   AS chapman_estimate
        FROM counts
    """,
    doc="Capture-recapture (Chapman-corrected Lincoln-Petersen) "
    "estimate of the true audience size from two observation "
    "windows: users seen in week 1 are the 'marked' sample, week "
    "2 the recapture; N-hat = (n1+1)(n2+1)/(m+1) - 1 estimates "
    "the population INCLUDING users your telemetry never saw — "
    "the standard trick for estimating coverage gaps in event "
    "collection (or dedup undercounts). Two distinct-user hash "
    "aggs + one co-partitioned semi-join on user_id; every count "
    "is map-side combinable. At 100 TB the distinct sets become "
    "HLL sketches and m comes from inclusion-exclusion of the "
    "merged sketch.",
    tags=("stats",),
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    dated = ev.crossJoin(F.broadcast(span)).select(
        "user_id", F.to_date("ts").alias("day"), "d0"
    )
    # persist the two distinct-user sets: each is consumed twice (its
    # count and the recapture join). r11 tried this at the session's
    # static 32-partition cache width and reverted (+51% sweep — cache
    # machinery over near-empty partitions); cache_width() shrinks the
    # cached shape to the summary-appropriate width while still scaling
    # with the cluster (see session.cache_width).
    w = cache_width(spark)
    s1 = dated.filter(
        (F.col("day") >= F.col("d0"))
        & (F.col("day") <= F.date_add(F.col("d0"), 6))
    ).select("user_id").distinct().coalesce(w).persist()
    s2 = dated.filter(
        (F.col("day") >= F.date_add(F.col("d0"), 7))
        & (F.col("day") <= F.date_add(F.col("d0"), 13))
    ).select("user_id").distinct().coalesce(w).persist()
    n1 = s1.agg(F.count("*").alias("n1"))
    n2 = s2.agg(F.count("*").alias("n2"))
    m = s1.join(s2, "user_id").agg(F.count("*").alias("m"))
    counts = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    est = (
        ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
        / (F.col("m") + 1)
        - 1
    )
    return counts.select(
        F.col("n1").cast("long").alias("week1_users"),
        F.col("n2").cast("long").alias("week2_users"),
        F.col("m").cast("long").alias("recaptured"),
        F.round(est, 6).alias("chapman_estimate"),
    )


@query(
    "stats-hill-tail-index",
    oracle="""
        WITH xm AS (
            SELECT quantile_cont(o_totalprice, 0.9) AS xmin FROM orders
        ),
        tail AS (
            SELECT o_totalprice AS x, xmin FROM orders, xm
            WHERE o_totalprice > xmin
        )
        SELECT CAST(count(*) AS BIGINT) AS n_tail,
               round(max(xmin), 2) AS xmin_p90,
               round(1.0 + count(*) / sum(ln(x / xmin)), 6)
                   AS hill_alpha,
               round(count(*) / sum(ln(x / xmin)), 6) AS tail_index
        FROM tail
    """,
    doc="Hill estimator of the power-law tail index of order values "
    "above the p90 threshold: alpha = 1 + k / sum(ln(x_i/xmin)) "
    "over the k tail observations — finite mean needs alpha > 2, "
    "finite variance alpha > 3, and an alpha near 2 warns that "
    "revenue concentration metrics (HHI, top-share) are "
    "sample-unstable. Two passes by necessity: exact p90 "
    "(percentile agg -> approx_percentile sketch at 100 TB), "
    "then one broadcast-threshold filter + log-moment "
    "aggregation, both map-side combinable. The heavy-tail "
    "companion to dq-benford-screen on the same column.",
    tags=("stats",),
)
def stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    xm = o.agg(F.expr("percentile(o_totalprice, 0.9)").alias("xmin"))
    tail = o.crossJoin(F.broadcast(xm)).filter(
        F.col("o_totalprice") > F.col("xmin")
    )
    k = F.count("*")
    s = F.sum(F.log(F.col("o_totalprice") / F.col("xmin")))
    return tail.agg(
        k.cast("long").alias("n_tail"),
        F.round(F.max("xmin"), 2).alias("xmin_p90"),
        F.round(1.0 + k / s, 6).alias("hill_alpha"),
        F.round(k / s, 6).alias("tail_index"),
    )


@query(
    "agg-median-of-means",
    oracle="""
        WITH grouped AS (
            SELECT event_id * 2654435761 % 2147483648 % 10 AS grp,
                   avg(value) AS grp_mean,
                   count(*) AS n
            FROM events GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(n) AS BIGINT) AS n_rows,
               round(quantile_cont(grp_mean, 0.5), 6) AS median_of_means,
               round(sum(grp_mean * n) / sum(n), 6) AS plain_mean
        FROM grouped
    """,
    doc="Median-of-means robust mean estimator: rows hash into 10 "
    "deterministic groups (the portable Knuth mix — reshuffling "
    "the data cannot change the answer, unlike a "
    "partition-id-based grouping), each group's mean is computed "
    "map-side-combinably, and the MEDIAN of the 10 group means "
    "resists heavy-tailed contamination that drags the plain "
    "mean (reported alongside) — sub-Gaussian concentration from "
    "a purely aggregate plan, the estimator sketch-based robust "
    "statistics build on. Exact interpolated median over 10 "
    "summary rows; the fact table is touched once.",
    tags=("stats", "agg"),
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = F.col("event_id") * 2654435761 % 2147483648 % 10
    grouped = ev.groupBy(grp.alias("grp")).agg(
        F.avg("value").alias("grp_mean"), F.count("*").alias("n")
    )
    return grouped.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.round(F.expr("percentile(grp_mean, 0.5)"), 6).alias(
            "median_of_means"
        ),
        F.round(
            F.sum(F.col("grp_mean") * F.col("n")) / F.sum("n"), 6
        ).alias("plain_mean"),
    )


@query(
    "stats-overdispersion",
    oracle="""
        WITH per_user AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS k
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n, avg(k) AS mu,
                   var_samp(k) AS v
            FROM per_user
        )
        SELECT n AS n_users,
               round(mu, 6) AS mean_events,
               round(v / mu, 6) AS dispersion_index,
               round((v - mu) / (mu * mu), 6) AS nb_alpha,
               round((n - 1) * v / mu, 6) AS poisson_chi2
        FROM m
    """,
    doc="Overdispersion diagnostics for per-user event counts: the "
    "variance-to-mean dispersion index (1 under Poisson), the "
    "negative-binomial overdispersion alpha = (v - mu)/mu^2 "
    "(the NB2 parameter a count regression would need), and the "
    "(n-1)*v/mu chi-square against the Poisson null. Decides "
    "whether per-user activity modeling can assume Poisson "
    "arrivals (stats-exponential-fit-ks tests the same "
    "assumption from the inter-arrival side — two views, one "
    "conclusion). Two hash aggs: facts to per-user counts, "
    "counts to a single moment row.",
    tags=("stats",),
)
def stats_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("k")
    )
    m = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("k").alias("mu"),
        F.var_samp("k").alias("v"),
    )
    mu, v, n = F.col("mu"), F.col("v"), F.col("n")
    return m.select(
        n.alias("n_users"),
        F.round(mu, 6).alias("mean_events"),
        F.round(v / mu, 6).alias("dispersion_index"),
        F.round((v - mu) / (mu * mu), 6).alias("nb_alpha"),
        F.round((n - 1) * v / mu, 6).alias("poisson_chi2"),
    )


@query(
    "stats-wasserstein-binned",
    oracle="""
        WITH s AS (
            SELECT value AS v,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
            FROM events WHERE event_type IN ('click', 'view')
        ),
        ext AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
        binned AS (
            SELECT least(255, CAST(floor((v - lo) / (hi - lo) * 256.0)
                                   AS INT)) AS bin,
                   sum(is1) AS c1, sum(1 - is1) AS c2,
                   max(hi - lo) AS span
            FROM s, ext GROUP BY 1
        ),
        ecdf AS (
            SELECT bin, span,
                   sum(c1) OVER (ORDER BY bin) AS cum1,
                   sum(c2) OVER (ORDER BY bin) AS cum2,
                   sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
            FROM binned
        )
        SELECT CAST(max(n1) AS BIGINT) AS n1,
               CAST(max(n2) AS BIGINT) AS n2,
               round(sum(abs(CAST(cum1 AS DOUBLE) / n1
                             - CAST(cum2 AS DOUBLE) / n2)
                         * span / 256.0), 6) AS wasserstein_1
        FROM ecdf
    """,
    doc="Binned 1-D Wasserstein (earth-mover) distance between the "
    "click and view value distributions: W1 = integral of "
    "|ECDF1 - ECDF2|, discretized over the same 256-bin grid as "
    "stats-ks-binned — and the pair is deliberately "
    "complementary: KS is the MAX ECDF gap (sensitive to one "
    "sharp shift), W1 the INTEGRAL (sensitive to broad mass "
    "displacement; drift monitors want both, PSI being the "
    "log-weighted third). Same scale shape: one min/max "
    "broadcast pre-pass, one hash agg to 256 cells, cumulative "
    "windows over the summary, one scalar reduce.",
    tags=("stats",),
)
def stats_wasserstein_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    ext = s.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = (
        s.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("v") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 256.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(
            F.sum("is1").alias("c1"),
            F.sum(1 - F.col("is1")).alias("c2"),
            F.max(F.col("hi") - F.col("lo")).alias("span"),
        )
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    ecdf = binned.select(
        "bin",
        "span",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    return ecdf.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(
            F.sum(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
                * F.col("span")
                / 256.0
            ),
            6,
        ).alias("wasserstein_1"),
    )


@query(
    "stats-gamma-fit",
    oracle="""
        WITH pos AS (SELECT value AS x FROM events WHERE value > 0),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n, avg(x) AS mu,
                   var_samp(x) AS v
            FROM pos
        )
        SELECT n AS n_rows,
               round(mu * mu / v, 6) AS gamma_shape_k,
               round(v / mu, 6) AS gamma_scale_theta,
               round(mu, 6) AS mean_check,
               round(2.0 / sqrt(mu * mu / v), 6) AS implied_skewness
        FROM m
    """,
    doc="Method-of-moments Gamma fit for the positive value "
    "distribution: shape k = mu^2/var, scale theta = var/mu "
    "(ONE moment aggregation — the same streaming (n, sum, "
    "sumsq) state as every var_samp, map-side combinable), plus "
    "the fit's implied skewness 2/sqrt(k) for a free sanity "
    "check against stats-jarque-bera's empirical skewness — "
    "disagreement means Gamma is the wrong family. The "
    "parametric summary revenue/latency modeling starts from; "
    "MLE refinement needs digamma iterations but STARTS from "
    "exactly these MoM values.",
    tags=("stats",),
)
def stats_gamma_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pos = ev.filter(F.col("value") > 0).select(F.col("value").alias("x"))
    m = pos.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("x").alias("mu"),
        F.var_samp("x").alias("v"),
    )
    mu, v = F.col("mu"), F.col("v")
    k = mu * mu / v
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(k, 6).alias("gamma_shape_k"),
        F.round(v / mu, 6).alias("gamma_scale_theta"),
        F.round(mu, 6).alias("mean_check"),
        F.round(2.0 / F.sqrt(k), 6).alias("implied_skewness"),
    )


@query(
    "stats-gumbel-maxima",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   max(o_totalprice) AS day_max
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        weekly AS (
            SELECT CAST(date_trunc('week', day) AS DATE) AS wk,
                   max(day_max) AS block_max
            FROM daily GROUP BY 1
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n, avg(block_max) AS mu_x,
                   stddev_samp(block_max) AS sd
            FROM weekly
        )
        SELECT n AS n_blocks,
               round(sd * sqrt(6) / pi(), 6) AS gumbel_beta,
               round(mu_x - 0.5772156649 * sd * sqrt(6) / pi(), 6)
                   AS gumbel_mu,
               round(mu_x - 0.5772156649 * sd * sqrt(6) / pi()
                     - sd * sqrt(6) / pi() * ln(-ln(1 - 1.0 / 52)), 6)
                   AS return_level_52wk
        FROM m
    """,
    doc="Extreme-value analysis by block maxima: weekly maxima of "
    "order totals fitted to a Gumbel distribution by method of "
    "moments (beta = sd*sqrt(6)/pi, mu = mean - gamma*beta with "
    "Euler-Mascheroni gamma), and the 52-week return level "
    "mu - beta*ln(-ln(1-1/52)) — 'the largest order we should "
    "expect in a year', the capacity-planning number that mean "
    "and p99 cannot give because extremes follow their own "
    "distribution (Fisher-Tippett). Block maxima are two nested "
    "hash aggs (day then week — both map-side combinable "
    "max()), the fit one moment row. The EVT companion to "
    "stats-hill-tail-index: Hill reads the tail exponent, this "
    "projects forward.",
    tags=("stats",),
)
def stats_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.max("o_totalprice").alias("day_max")
    )
    weekly = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("wk")
    ).agg(F.max("day_max").alias("block_max"))
    m = weekly.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("block_max").alias("mu_x"),
        F.stddev_samp("block_max").alias("sd"),
    )
    beta = F.col("sd") * math.sqrt(6) / math.pi
    mu = F.col("mu_x") - 0.5772156649 * beta
    return m.select(
        F.col("n").alias("n_blocks"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(
            mu - beta * math.log(-math.log(1 - 1.0 / 52)), 6
        ).alias("return_level_52wk"),
    )


@query(
    "timeseries-approx-entropy",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT x, lead(x) OVER (ORDER BY day) AS x1,
                   row_number() OVER (ORDER BY day) AS i,
                   0.2 * stddev_samp(x) OVER () AS r,
                   count(*) OVER () AS n
            FROM daily
        ),
        c1 AS (
            SELECT a.i, CAST(count(*) AS DOUBLE) / max(a.n) AS ci
            FROM idx a JOIN idx b ON abs(a.x - b.x) < a.r
            GROUP BY a.i
        ),
        c2 AS (
            SELECT a.i, CAST(count(*) AS DOUBLE) / (max(a.n) - 1) AS ci
            FROM idx a JOIN idx b
              ON abs(a.x - b.x) < a.r AND abs(a.x1 - b.x1) < a.r
             AND a.x1 IS NOT NULL AND b.x1 IS NOT NULL
            GROUP BY a.i
        ),
        phi AS (
            SELECT (SELECT avg(ln(ci)) FROM c1) AS phi1,
                   (SELECT avg(ln(ci)) FROM c2) AS phi2
        )
        SELECT round(phi1, 6) AS phi_m1,
               round(phi2, 6) AS phi_m2,
               round(phi1 - phi2, 6) AS approx_entropy
        FROM phi
    """,
    doc="Approximate entropy ApEn(m=1, r=0.2*sd) of the daily volume "
    "series: the regularity statistic from physiological signal "
    "analysis — low ApEn = patterns repeat (predictable), high = "
    "irregular. phi_m = mean ln of the fraction of days whose "
    "length-m template matches within tolerance r; ApEn = phi_1 "
    "- phi_2. The O(n^2) template matching is a self-join ON THE "
    "~30-ROW DAILY SUMMARY (the Theil-Sen discipline: quadratic "
    "in the summary, linear in the facts), with the m=2 "
    "condition just one extra lead() column in the same join. "
    "Completes the complexity battery: spectral entropy "
    "(frequency domain), Hurst (scaling), ApEn (pattern "
    "recurrence).",
    tags=("timeseries", "stats"),
)
def timeseries_approx_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w_all = Window.partitionBy()
    w = Window.orderBy("day")
    # persist the CALENDAR-BOUNDED indexed series (<= ~3650 rows at any
    # scale) as ONE cached partition: both sides of both template
    # self-joins re-consumed it (4 events scans -> 1)
    idx = daily.select(
        "x",
        F.lead("x").over(w).alias("x1"),
        F.row_number().over(w).alias("i"),
        (0.2 * F.stddev_samp("x").over(w_all)).alias("r"),
        F.count("*").over(w_all).alias("n"),
    ).coalesce(1).persist()
    a = idx.alias("a")
    b = idx.alias("b")
    c1 = (
        a.join(b, F.abs(F.col("a.x") - F.col("b.x")) < F.col("a.r"))
        .groupBy(F.col("a.i").alias("i"))
        .agg(
            (F.count("*").cast("double") / F.max(F.col("a.n"))).alias("ci")
        )
    )
    c2 = (
        a.join(
            b,
            (F.abs(F.col("a.x") - F.col("b.x")) < F.col("a.r"))
            & (F.abs(F.col("a.x1") - F.col("b.x1")) < F.col("a.r"))
            & F.col("a.x1").isNotNull()
            & F.col("b.x1").isNotNull(),
        )
        .groupBy(F.col("a.i").alias("i"))
        .agg(
            (
                F.count("*").cast("double") / (F.max(F.col("a.n")) - 1)
            ).alias("ci")
        )
    )
    phi1 = c1.agg(F.avg(F.log("ci")).alias("phi1"))
    phi2 = c2.agg(F.avg(F.log("ci")).alias("phi2"))
    return phi1.crossJoin(F.broadcast(phi2)).select(
        F.round("phi1", 6).alias("phi_m1"),
        F.round("phi2", 6).alias("phi_m2"),
        F.round(F.col("phi1") - F.col("phi2"), 6).alias("approx_entropy"),
    )


@query(
    "stats-lorenz-asymmetry",
    oracle="""
        WITH rev AS (
            SELECT o_custkey, sum(o_totalprice) AS r
            FROM orders GROUP BY o_custkey
        ),
        m AS (SELECT avg(r) AS mu, sum(r) AS tot,
                     CAST(count(*) AS DOUBLE) AS n FROM rev)
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               round(sum(CASE WHEN r < mu THEN 1 ELSE 0 END) / max(n), 6)
                   AS f_below_mean,
               round(sum(CASE WHEN r < mu THEN r ELSE 0 END) / max(tot), 6)
                   AS share_below_mean,
               round(sum(CASE WHEN r < mu THEN 1 ELSE 0 END) / max(n)
                     + sum(CASE WHEN r < mu THEN r ELSE 0 END) / max(tot),
                     6) AS lorenz_asymmetry_s
        FROM rev, m
    """,
    doc="Lorenz asymmetry coefficient S = F(mu) + L(mu): the fraction "
    "of customers below mean revenue plus their revenue share — "
    "S = 1 means the Lorenz curve is symmetric, S > 1 says "
    "inequality is driven by a few giants, S < 1 by many smalls; "
    "two populations with IDENTICAL Gini (agg-gini-coefficient) "
    "can differ here, which is why ecology and concentration "
    "audits report both. Unlike Gini's rank machinery this needs "
    "NO sort at all: one per-customer agg, one broadcast mean, "
    "one conditional reduce — strictly cheaper at any scale.",
    tags=("stats",),
)
def stats_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    m = rev.agg(
        F.avg("r").alias("mu"),
        F.sum("r").alias("tot"),
        F.count("*").cast("double").alias("n"),
    )
    j = rev.crossJoin(F.broadcast(m))
    below = F.when(F.col("r") < F.col("mu"), 1).otherwise(0)
    below_r = F.when(F.col("r") < F.col("mu"), F.col("r")).otherwise(0.0)
    f_below = F.sum(below) / F.max("n")
    l_below = F.sum(below_r) / F.max("tot")
    return j.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(f_below, 6).alias("f_below_mean"),
        F.round(l_below, 6).alias("share_below_mean"),
        F.round(f_below + l_below, 6).alias("lorenz_asymmetry_s"),
    )


@query(
    "stats-quantile-ci",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS m
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        ranked AS (
            SELECT m, row_number() OVER (ORDER BY m, day) AS r,
                   count(*) OVER () AS n
            FROM daily
        ),
        bounds AS (
            SELECT n,
                   greatest(1, CAST(floor(0.9 * n
                       - 1.959964 * sqrt(n * 0.9 * 0.1)) AS BIGINT))
                       AS r_lo,
                   least(n, CAST(ceil(0.9 * n
                       + 1.959964 * sqrt(n * 0.9 * 0.1)) + 1 AS BIGINT))
                       AS r_hi
            FROM ranked LIMIT 1
        )
        SELECT CAST(max(r.n) AS BIGINT) AS n_days,
               round(max(CASE WHEN r.r = CAST(ceil(0.9 * r.n) AS BIGINT)
                              THEN r.m END), 6) AS p90_point,
               round(max(CASE WHEN r.r = b.r_lo THEN r.m END), 6)
                   AS ci_lo,
               round(max(CASE WHEN r.r = b.r_hi THEN r.m END), 6)
                   AS ci_hi
        FROM ranked r, bounds b
    """,
    doc="Distribution-free confidence interval for the p90 of daily "
    "mean values via order statistics: the binomial bounds "
    "r = n*q +/- z*sqrt(n*q*(1-q)) name the RANKS whose values "
    "bracket the true quantile at ~95% coverage — no normality, "
    "no bootstrap resampling, just the ranked summary (the "
    "classic Conover construction). Ranking happens on the "
    "~30-row daily aggregate only; at raw-fact scale the same "
    "bounds apply to sketch quantiles by querying the t-digest "
    "at the bound ranks. The honest error bar that "
    "agg-percentile's point estimate lacks.",
    tags=("stats",),
)
def stats_quantile_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("m")
    )
    w_all = Window.partitionBy()
    ranked = daily.select(
        "m",
        F.row_number().over(Window.orderBy("m", "day")).alias("r"),
        F.count("*").over(w_all).alias("n"),
    )
    q, z = 0.9, 1.959964
    n = F.col("n")
    r_lo = F.greatest(
        F.lit(1).cast("long"),
        F.floor(q * n - z * F.sqrt(n * q * (1 - q))).cast("long"),
    )
    r_hi = F.least(
        n.cast("long"),
        (F.ceil(q * n + z * F.sqrt(n * q * (1 - q))) + 1).cast("long"),
    )
    point_r = F.ceil(q * n).cast("long")
    return ranked.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(
            F.max(F.when(F.col("r") == point_r, F.col("m"))), 6
        ).alias("p90_point"),
        F.round(F.max(F.when(F.col("r") == r_lo, F.col("m"))), 6).alias(
            "ci_lo"
        ),
        F.round(F.max(F.when(F.col("r") == r_hi, F.col("m"))), 6).alias(
            "ci_hi"
        ),
    )


@query(
    "stats-anderson-darling-binned",
    oracle="""
        WITH s AS (
            SELECT value AS v,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
            FROM events WHERE event_type IN ('click', 'view')
        ),
        ext AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
        binned AS (
            SELECT least(255, CAST(floor((v - lo) / (hi - lo) * 256.0)
                                   AS INT)) AS bin,
                   sum(is1) AS c1, sum(1 - is1) AS c2
            FROM s, ext GROUP BY 1
        ),
        ecdf AS (
            SELECT bin,
                   sum(c1 + c2) OVER (ORDER BY bin) AS cumn,
                   sum(c1) OVER (ORDER BY bin) AS cum1,
                   sum(c2) OVER (ORDER BY bin) AS cum2,
                   sum(c1) OVER () AS n1, sum(c2) OVER () AS n2,
                   sum(c1 + c2) OVER () AS n
            FROM binned
        ),
        terms AS (
            SELECT CAST(cum1 AS DOUBLE) / n1
                       - CAST(cum2 AS DOUBLE) / n2 AS d,
                   CAST(cumn AS DOUBLE) / n AS h,
                   CAST(n1 AS DOUBLE) AS n1, CAST(n2 AS DOUBLE) AS n2,
                   CAST(n AS DOUBLE) AS n
            FROM ecdf WHERE cumn < n AND cumn > 0
        )
        SELECT CAST(max(n1) AS BIGINT) AS n1,
               CAST(max(n2) AS BIGINT) AS n2,
               round(max(n1) * max(n2) / max(n)
                     * sum(d * d / (h * (1 - h)) / 256.0), 6)
                   AS ad_statistic
        FROM terms
    """,
    doc="Two-sample Anderson-Darling statistic on the shared 256-bin "
    "grid: the ECDF-difference integral WEIGHTED by 1/(H(1-H)) — "
    "tail deviations count most, exactly where KS (max, "
    "center-dominated) and W1 (uniform weight) are least "
    "sensitive; the completion of the drift-metric family "
    "dq-drift-battery aggregates. Interior support only "
    "(0 < H < 1 — the weight diverges at the edges by design; "
    "binned Riemann discretization over bin width 1/256 keeps "
    "it finite and engine-identical). Same scale shape as every "
    "binned ECDF op here: broadcast extrema, one hash agg, "
    "windows over 256 summary rows.",
    tags=("stats",),
)
def stats_anderson_darling_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    ext = s.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = (
        s.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("v") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 256.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(F.sum("is1").alias("c1"), F.sum(1 - F.col("is1")).alias("c2"))
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    ecdf = binned.select(
        "bin",
        F.sum(F.col("c1") + F.col("c2")).over(w_cum).alias("cumn"),
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
        F.sum(F.col("c1") + F.col("c2")).over(w_all).alias("n"),
    )
    terms = ecdf.filter(
        (F.col("cumn") < F.col("n")) & (F.col("cumn") > 0)
    ).select(
        (
            F.col("cum1").cast("double") / F.col("n1")
            - F.col("cum2").cast("double") / F.col("n2")
        ).alias("d"),
        (F.col("cumn").cast("double") / F.col("n")).alias("h"),
        F.col("n1").cast("double").alias("n1"),
        F.col("n2").cast("double").alias("n2"),
        F.col("n").cast("double").alias("n"),
    )
    return terms.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(
            F.max("n1")
            * F.max("n2")
            / F.max("n")
            * F.sum(
                F.col("d")
                * F.col("d")
                / (F.col("h") * (1 - F.col("h")))
                / 256.0
            ),
            6,
        ).alias("ad_statistic"),
    )


@query(
    "stats-weibull-fit",
    oracle="""
        WITH pos AS (
            SELECT ln(value) AS lx FROM events WHERE value > 0
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n, avg(lx) AS mu,
                   stddev_samp(lx) AS sd
            FROM pos
        )
        SELECT n AS n_rows,
               round(pi() / (sd * sqrt(6)), 6) AS weibull_shape_k,
               round(exp(mu + 0.5772156649 * sd * sqrt(6) / pi()), 6)
                   AS weibull_scale_lambda
        FROM m
    """,
    doc="Weibull fit by the log-Gumbel identity: if X ~ Weibull(k, "
    "lambda) then ln X follows a Gumbel-minimum law with beta = 1/k "
    "and mode ln(lambda), so the method-of-moments Gumbel "
    "machinery (stats-gumbel-maxima's, mirrored for minima) fits "
    "the Weibull from just mean and stddev OF THE LOGS: k = "
    "pi/(sd*sqrt(6)), lambda = exp(mu + gamma/k). One moment "
    "aggregation over a log projection — the lifetime/survival "
    "parametric fit (k < 1 infant-mortality, k > 1 wear-out) "
    "without a single iteration of the usual Newton MLE, and "
    "the MoM values are exactly the standard MLE warm start. "
    "Cross-check against stats-gamma-fit on the same column: "
    "disagreeing shape stories reveal which family fits.",
    tags=("stats",),
)
def stats_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    pos = ev.filter(F.col("value") > 0).select(
        F.log("value").alias("lx")
    )
    m = pos.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("lx").alias("mu"),
        F.stddev_samp("lx").alias("sd"),
    )
    beta = F.col("sd") * math.sqrt(6) / math.pi
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(1 / beta, 6).alias("weibull_shape_k"),
        F.round(
            F.exp(F.col("mu") + 0.5772156649 * beta), 6
        ).alias("weibull_scale_lambda"),
    )


@query(
    "stats-power-mean",
    oracle="""
        WITH base AS (
            SELECT avg(value) AS mu, var_samp(value) AS v FROM events
        )
        SELECT round(mu, 6) AS baseline_mean,
               round(sqrt(v), 6) AS baseline_sd,
               round(mu * 0.05, 6) AS mde_abs,
               CAST(ceil(2 * power(1.959964 + 0.841621, 2) * v
                         / power(mu * 0.05, 2)) AS BIGINT)
                   AS n_per_variant
        FROM base
    """,
    doc="A/B sample-size calculator for a difference in MEANS "
    "(alpha=5% two-sided, power=80%, MDE = 5% of baseline): "
    "n = 2*(z_a+z_b)^2 * sigma^2 / delta^2 with variance "
    "estimated from the live metric in one moment aggregation — "
    "the continuous-metric companion to stats-power-proportions, "
    "and the formula whose sigma^2 input is exactly what "
    "stats-cuped-adjustment shrinks (multiply n by 1-rho^2 for "
    "the CUPED-adjusted runtime — the planning chain those "
    "three ops form). Normal quantiles as literals, everything "
    "else data-derived; one scan, one row.",
    tags=("stats",),
)
def stats_power_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.agg(F.avg("value").alias("mu"), F.var_samp("value").alias("v"))
    delta = F.col("mu") * 0.05
    z = 1.959964 + 0.841621
    return base.select(
        F.round("mu", 6).alias("baseline_mean"),
        F.round(F.sqrt("v"), 6).alias("baseline_sd"),
        F.round(delta, 6).alias("mde_abs"),
        F.ceil(2 * z * z * F.col("v") / F.pow(delta, 2))
        .cast("long")
        .alias("n_per_variant"),
    )


@query(
    "stats-dagostino-k2",
    oracle="""
        WITH mu AS (SELECT avg(value) AS m FROM events),
        mom AS (
            SELECT count(*) AS n,
                   avg(power(value - mu.m, 2)) AS m2,
                   avg(power(value - mu.m, 3)) AS m3,
                   avg(power(value - mu.m, 4)) AS m4
            FROM events, mu GROUP BY ALL
        ),
        gs AS (
            SELECT CAST(n AS DOUBLE) AS n,
                   m3 / power(m2, 1.5) AS g1,
                   m4 / power(m2, 2) AS b2
            FROM mom
        ),
        zs AS (
            SELECT n, g1, b2,
                   g1 * sqrt((n + 1) * (n + 3) / (6 * (n - 2))) AS y,
                   3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
                       / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2,
                   3.0 * (n - 1) / (n + 1) AS e_b2,
                   24.0 * n * (n - 2) * (n - 3)
                       / (power(n + 1, 2) * (n + 3) * (n + 5)) AS v_b2,
                   6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
                       * sqrt(6.0 * (n + 3) * (n + 5)
                              / (n * (n - 2) * (n - 3))) AS sb1
            FROM gs
        ),
        z1c AS (
            SELECT *,
                   sqrt(-1 + sqrt(2 * (beta2 - 1))) AS w,
                   (b2 - e_b2) / sqrt(v_b2) AS x,
                   6 + 8 / sb1 * (2 / sb1 + sqrt(1 + 4 / (sb1 * sb1))) AS a
            FROM zs
        ),
        fin AS (
            SELECT n, g1, b2,
                   (1 / sqrt(ln(w)))
                   * ln(y / sqrt(2 / (w * w - 1))
                        + sqrt(power(y / sqrt(2 / (w * w - 1)), 2) + 1)) AS z1,
                   ((1 - 2.0 / (9 * a))
                    - cbrt((1 - 2.0 / a) / (1 + x * sqrt(2 / (a - 4)))))
                   / sqrt(2.0 / (9 * a)) AS z2
            FROM z1c
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               round(g1, 6) AS skew_g1,
               round(b2 - 3, 6) AS excess_kurtosis,
               round(z1, 6) AS z_skew,
               round(z2, 6) AS z_kurt,
               round(z1 * z1 + z2 * z2, 6) AS k2_stat
        FROM fin
    """,
    doc="D'Agostino-Pearson K-squared omnibus normality test on the "
    "event value distribution: skewness z (D'Agostino 1970 "
    "transformation) + kurtosis z (Anscombe-Glynn 1983) combined as "
    "K2 = z1^2 + z2^2 ~ chi2(2). Central moments via the two-pass "
    "mean-then-avg((x-mu)^k) form on BOTH engines (single-pass power "
    "sums lose the 4th moment to cancellation); the transformations "
    "are pure scalar math on the 1-row moment summary. cbrt handles "
    "the negative cube-root branch identically in Spark and DuckDB. "
    "Complements stats-jarque-bera: K2's finite-n corrections stay "
    "calibrated at daily-summary sample sizes where JB's asymptotic "
    "chi2 is anticonservative.",
    tags=("stats",),
)
def stats_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mu = ev.agg(F.avg("value").alias("m"))
    d = F.col("value") - F.col("m")
    mom = ev.join(F.broadcast(mu)).agg(
        F.count("*").cast("double").alias("n"),
        F.avg(F.pow(d, 2)).alias("m2"),
        F.avg(F.pow(d, 3)).alias("m3"),
        F.avg(F.pow(d, 4)).alias("m4"),
    )
    n = F.col("n")
    gs = mom.select(
        n,
        (F.col("m3") / F.pow(F.col("m2"), 1.5)).alias("g1"),
        (F.col("m4") / F.pow(F.col("m2"), 2)).alias("b2"),
    )
    y = F.col("g1") * F.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    e_b2 = 3.0 * (n - 1) / (n + 1)
    v_b2 = 24.0 * n * (n - 2) * (n - 3) / (F.pow(n + 1, 2) * (n + 3) * (n + 5))
    sb1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * F.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    zs = gs.select(
        n, "g1", "b2",
        y.alias("y"), beta2.alias("beta2"), e_b2.alias("e_b2"),
        v_b2.alias("v_b2"), sb1.alias("sb1"),
    )
    w = F.sqrt(-1 + F.sqrt(2 * (F.col("beta2") - 1)))
    x = (F.col("b2") - F.col("e_b2")) / F.sqrt(F.col("v_b2"))
    a = 6 + 8 / F.col("sb1") * (
        2 / F.col("sb1") + F.sqrt(1 + 4 / (F.col("sb1") * F.col("sb1")))
    )
    z1c = zs.select(n, "g1", "b2", "y", w.alias("w"), x.alias("x"), a.alias("a"))
    alpha = F.sqrt(2 / (F.col("w") * F.col("w") - 1))
    z1 = (1 / F.sqrt(F.log(F.col("w")))) * F.log(
        F.col("y") / alpha + F.sqrt(F.pow(F.col("y") / alpha, 2) + 1)
    )
    z2 = (
        (1 - 2.0 / (9 * F.col("a")))
        - F.cbrt(
            (1 - 2.0 / F.col("a"))
            / (1 + F.col("x") * F.sqrt(2 / (F.col("a") - 4)))
        )
    ) / F.sqrt(2.0 / (9 * F.col("a")))
    return z1c.select(
        n.cast("long").alias("n_rows"),
        F.round("g1", 6).alias("skew_g1"),
        F.round(F.col("b2") - 3, 6).alias("excess_kurtosis"),
        F.round(z1, 6).alias("z_skew"),
        F.round(z2, 6).alias("z_kurt"),
        F.round(z1 * z1 + z2 * z2, 6).alias("k2_stat"),
    )


@query(
    "stats-negbin-fit",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, count(*) AS k
            FROM events GROUP BY date_trunc('hour', ts)
        ),
        m AS (
            SELECT count(*) AS n, avg(k) AS mu, var_samp(k) AS v
            FROM hourly
        )
        SELECT CAST(n AS BIGINT) AS n_hours,
               round(mu, 6) AS mean_count,
               round(v, 6) AS var_count,
               round(v / mu, 6) AS dispersion_index,
               round(mu * mu / (v - mu), 6) AS nb_r,
               round(mu / v, 6) AS nb_p,
               round(1.0 / (mu * mu / (v - mu)), 6) AS nb_alpha
        FROM m
    """,
    doc="Negative-binomial fit to hourly event counts by method of "
    "moments: r = mu^2/(v - mu), p = mu/v, alpha = 1/r — the "
    "two-parameter count model that FITS overdispersed arrivals "
    "where Poisson (variance = mean) cannot. The modeling follow-up "
    "to stats-overdispersion's diagnosis: once dispersion_index > 1 "
    "is established, these are the parameters a rate-forecasting or "
    "anomaly-threshold model actually uses (NB quantiles instead of "
    "Poisson ones stop 3-sigma alerts firing hourly at 100 TB event "
    "volume). One hash aggregation + scalar math on a 1-row "
    "summary.",
    tags=("stats",),
)
def stats_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("k")
    )
    m = hourly.agg(
        F.count("*").alias("n"), F.avg("k").alias("mu"), F.var_samp("k").alias("v")
    )
    mu, v = F.col("mu"), F.col("v")
    r = mu * mu / (v - mu)
    return m.select(
        F.col("n").cast("long").alias("n_hours"),
        F.round(mu, 6).alias("mean_count"),
        F.round(v, 6).alias("var_count"),
        F.round(v / mu, 6).alias("dispersion_index"),
        F.round(r, 6).alias("nb_r"),
        F.round(mu / v, 6).alias("nb_p"),
        F.round(1.0 / r, 6).alias("nb_alpha"),
    )


@query(
    "stats-ks-exact-daily",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS m
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        marked AS (
            SELECT m,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
            FROM daily
        ),
        tot AS (
            SELECT sum(is1) AS n1, sum(1 - is1) AS n2 FROM marked
        ),
        ecdf AS (
            SELECT sum(mk.is1) OVER w / CAST(t.n1 AS DOUBLE) AS f1,
                   sum(1 - mk.is1) OVER w / CAST(t.n2 AS DOUBLE) AS f2,
                   t.n1 AS n1, t.n2 AS n2
            FROM marked mk, tot t
            WINDOW w AS (ORDER BY mk.m, mk.is1
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(max(n1) AS BIGINT) AS n1,
               CAST(max(n2) AS BIGINT) AS n2,
               round(max(abs(f1 - f2)), 6) AS ks_d,
               round(max(abs(f1 - f2))
                     * sqrt(max(n1) * CAST(max(n2) AS DOUBLE)
                            / (max(n1) + max(n2))), 6) AS ks_stat_scaled
        FROM ecdf
    """,
    doc="EXACT two-sample Kolmogorov-Smirnov D between click and view "
    "daily mean distributions: both samples merged and sorted once "
    "(deterministic (m, is1) order), each ECDF as a running "
    "conditional count over the merged order, D = max|F1 - F2| — "
    "the unbinned counterpart of stats-ks-binned (whose D is only "
    "a lower bound at coarse bins). Exactness is affordable "
    "because the sort runs on the daily SUMMARY (~60 rows), the "
    "same rank-the-aggregate discipline as stats-mann-whitney; "
    "scaled statistic sqrt(n1 n2/(n1+n2)) * D feeds the "
    "Kolmogorov distribution for p-values.",
    tags=("stats",),
)
def stats_ks_exact_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("m"))
    )
    marked = daily.select(
        "m",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    tot = marked.agg(
        F.sum("is1").alias("n1"), F.sum(1 - F.col("is1")).alias("n2")
    )
    w = Window.orderBy("m", "is1").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = marked.join(F.broadcast(tot)).select(
        (F.sum("is1").over(w) / F.col("n1").cast("double")).alias("f1"),
        (F.sum(1 - F.col("is1")).over(w) / F.col("n2").cast("double")).alias("f2"),
        "n1",
        "n2",
    )
    d = F.max(F.abs(F.col("f1") - F.col("f2")))
    return ecdf.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(d, 6).alias("ks_d"),
        F.round(
            d
            * F.sqrt(
                F.max("n1") * F.max("n2").cast("double")
                / (F.max("n1") + F.max("n2"))
            ),
            6,
        ).alias("ks_stat_scaled"),
    )


@query(
    "agg-frequency-moments",
    oracle="""
        WITH freq AS (
            SELECT l_partkey, CAST(count(*) AS DOUBLE) AS c
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(count(*) AS BIGINT) AS f0_distinct,
               CAST(sum(c) AS BIGINT) AS f1_count,
               CAST(sum(c * c) AS BIGINT) AS f2_selfjoin,
               CAST(max(c) AS BIGINT) AS finf_max,
               round(sum(c * c) * count(*) / (sum(c) * sum(c)), 6)
                   AS surprise_index,
               round(-sum((c / (SELECT sum(c) FROM freq))
                          * ln(c / (SELECT sum(c) FROM freq))), 6)
                   AS shannon_entropy_nats
        FROM freq
    """,
    doc="Frequency moments of the part-key distribution (Alon-Matias-"
    "Szegedy's F0/F1/F2/F_inf): F2 is the SELF-JOIN SIZE — the "
    "number every join optimizer wants before picking a strategy on "
    "a skewed key — and the surprise index F2*F0/F1^2 is its "
    "normalized skew score (1 = uniform). Shannon entropy of the "
    "same frequency vector completes the skew profile. One hash "
    "aggregation to the per-key frequency vector, one moment pass "
    "over it; the exact ground truth that agg-kmv-sketch (F0) and "
    "agg-count-min-sketch (point freq) approximate, and the "
    "skew diagnosis that decides when join-skew-salted is needed.",
    tags=("stats", "agg"),
)
def agg_frequency_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_partkey").agg(F.count("*").cast("double").alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    j = freq.join(F.broadcast(tot))
    p = F.col("c") / F.col("t")
    return j.agg(
        F.count("*").cast("long").alias("f0_distinct"),
        F.sum("c").cast("long").alias("f1_count"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_selfjoin"),
        F.max("c").cast("long").alias("finf_max"),
        F.round(
            F.sum(F.col("c") * F.col("c")) * F.count("*")
            / (F.sum("c") * F.sum("c")),
            6,
        ).alias("surprise_index"),
        F.round(-F.sum(p * F.log(p)), 6).alias("shannon_entropy_nats"),
    )


@query(
    "stats-gpd-pot",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        thr AS (
            SELECT quantile_cont(rev, 0.90) AS u FROM daily
        ),
        exc AS (
            SELECT d.rev - thr.u AS y
            FROM daily d, thr WHERE d.rev > thr.u
        ),
        m AS (
            SELECT count(*) AS n, avg(y) AS mu, var_samp(y) AS v,
                   max(y) AS ymax
            FROM exc
        )
        SELECT CAST(n AS BIGINT) AS n_exceedances,
               round(mu, 4) AS mean_excess,
               round(0.5 * (1 - mu * mu / v), 6) AS gpd_xi,
               round(0.5 * mu * (mu * mu / v + 1), 4) AS gpd_beta,
               round(ymax, 4) AS max_excess
        FROM m
    """,
    doc="Peaks-over-threshold extreme-value fit: daily-revenue "
    "exceedances over the p90 threshold, Generalized Pareto "
    "parameters by method of moments (xi = (1 - mu^2/v)/2, beta = "
    "mu(mu^2/v + 1)/2) — the tail model that answers 'how bad is a "
    "1-in-N day' from ALL tail points, where stats-gumbel-maxima's "
    "block-maxima approach throws away every non-maximum "
    "exceedance (POT is the data-efficient of the two classical "
    "EVT routes; xi > 0 flags a heavy tail consistent with "
    "stats-hill-tail-index). Threshold via exact quantile on the "
    "day-count summary; everything downstream is scalar math.",
    tags=("stats",),
)
def stats_gpd_pot(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    thr = daily.agg(F.percentile("rev", F.lit(0.90)).alias("u"))
    exc = daily.join(F.broadcast(thr)).filter(F.col("rev") > F.col("u")).select(
        (F.col("rev") - F.col("u")).alias("y")
    )
    m = exc.agg(
        F.count("*").alias("n"),
        F.avg("y").alias("mu"),
        F.var_samp("y").alias("v"),
        F.max("y").alias("ymax"),
    )
    mu, v = F.col("mu"), F.col("v")
    return m.select(
        F.col("n").cast("long").alias("n_exceedances"),
        F.round(mu, 4).alias("mean_excess"),
        F.round(0.5 * (1 - mu * mu / v), 6).alias("gpd_xi"),
        F.round(0.5 * mu * (mu * mu / v + 1), 4).alias("gpd_beta"),
        F.round("ymax", 4).alias("max_excess"),
    )


@query(
    "stats-copula-tail-dependence",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   round(avg(CASE WHEN event_type = 'click' THEN value END),
                         6) AS x,
                   round(avg(CASE WHEN event_type = 'view' THEN value END),
                         6) AS y
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY CAST(ts AS DATE)
        ),
        paired AS (
            SELECT x, y FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
        ),
        q AS (
            SELECT quantile_cont(x, 0.8) AS qxu, quantile_cont(y, 0.8) AS qyu,
                   quantile_cont(x, 0.2) AS qxl, quantile_cont(y, 0.2) AS qyl,
                   CAST(count(*) AS DOUBLE) AS n
            FROM paired
        )
        SELECT CAST(max(q.n) AS BIGINT) AS n_days,
               round(sum(CASE WHEN p.x > q.qxu AND p.y > q.qyu
                              THEN 1 ELSE 0 END)
                     / sum(CASE WHEN p.y > q.qyu THEN 1 ELSE 0 END), 6)
                   AS lambda_upper,
               round(sum(CASE WHEN p.x < q.qxl AND p.y < q.qyl
                              THEN 1 ELSE 0 END)
                     / sum(CASE WHEN p.y < q.qyl THEN 1 ELSE 0 END), 6)
                   AS lambda_lower,
               round(0.2, 6) AS independence_baseline
        FROM paired p CROSS JOIN q
    """,
    doc="Empirical copula tail dependence between the click and view "
    "daily mean values: lambda_upper = P(X > q80_X | Y > q80_Y) and "
    "the lower-tail mirror — the co-crash/co-spike statistic that "
    "Pearson correlation CANNOT see (a Gaussian copula has r up to "
    "0.99 with ZERO asymptotic tail dependence; risk aggregation "
    "and alert-correlation decisions hinge on exactly this "
    "difference). Values well above the independence baseline (1-q "
    "= 0.2) mean the two streams fail together. Exact quantiles in "
    "one pass (approx_percentile at 100 TB), 1-row threshold "
    "broadcast, one counting aggregate.",
    tags=("stats", "timeseries"),
)
def stats_copula_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            # round BEFORE the quantile/threshold compare: engine
            # summation-order drift in the daily mean's last bits can
            # flip a point sitting exactly on a tail quantile (the
            # knife-edge class the skew axis documented)
            F.round(
                F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6
            ).alias("x"),
            F.round(
                F.avg(F.when(F.col("event_type") == "view", F.col("value"))), 6
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    q = daily.agg(
        F.percentile(F.col("x"), F.lit(0.8)).alias("qxu"),
        F.percentile(F.col("y"), F.lit(0.8)).alias("qyu"),
        F.percentile(F.col("x"), F.lit(0.2)).alias("qxl"),
        F.percentile(F.col("y"), F.lit(0.2)).alias("qyl"),
        F.count("*").cast("double").alias("n"),
    )
    p = daily.crossJoin(F.broadcast(q))
    up_joint = F.sum(
        F.when((F.col("x") > F.col("qxu")) & (F.col("y") > F.col("qyu")), 1).otherwise(0)
    )
    up_cond = F.sum(F.when(F.col("y") > F.col("qyu"), 1).otherwise(0))
    lo_joint = F.sum(
        F.when((F.col("x") < F.col("qxl")) & (F.col("y") < F.col("qyl")), 1).otherwise(0)
    )
    lo_cond = F.sum(F.when(F.col("y") < F.col("qyl"), 1).otherwise(0))
    return p.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(up_joint / up_cond, 6).alias("lambda_upper"),
        F.round(lo_joint / lo_cond, 6).alias("lambda_lower"),
        F.round(F.lit(0.2), 6).alias("independence_baseline"),
    )
