"""Distributed statistical hypothesis tests and robust estimators.

The reference pipeline ends at aggregate dashboards
(``/root/reference/app/app.py``); an analytics engine serving the same
users also needs the tests behind those dashboards: independence
(chi-square), distribution shift (KS), location shift (Mann-Whitney),
robust trend (Theil-Sen). Each is expressed so the heavy pass is a
single hash aggregation over the fact table and the test statistic is
computed on the summary-sized aggregate — the only shape that survives
100 TB (the raw-rank formulations would force a global sort of the
fact table into one partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "stats-chi-square",
    oracle="""
        WITH cells AS (
            SELECT event_type, CAST(user_id % 4 AS BIGINT) AS seg,
                   CAST(count(*) AS BIGINT) AS obs
            FROM events GROUP BY event_type, user_id % 4
        ),
        tot AS (
            SELECT event_type, seg, obs,
                   sum(obs) OVER (PARTITION BY event_type) AS row_tot,
                   sum(obs) OVER (PARTITION BY seg) AS col_tot,
                   sum(obs) OVER () AS n
            FROM cells
        )
        SELECT CAST(max(n) AS BIGINT) AS n_events,
               CAST((count(DISTINCT event_type) - 1)
                    * (count(DISTINCT seg) - 1) AS BIGINT) AS dof,
               round(sum(power(obs - CAST(row_tot AS DOUBLE) * col_tot / n, 2)
                         / (CAST(row_tot AS DOUBLE) * col_tot / n)), 6) AS chi2,
               round(sqrt(sum(power(obs - CAST(row_tot AS DOUBLE) * col_tot / n, 2)
                              / (CAST(row_tot AS DOUBLE) * col_tot / n))
                          / (max(n) * least(count(DISTINCT event_type) - 1,
                                            count(DISTINCT seg) - 1))), 6)
                   AS cramers_v
        FROM tot
    """,
    doc="Chi-square test of independence (event_type x user segment) "
    "plus Cramer's V effect size: ONE hash aggregation builds the "
    "r x c contingency table (20 cells), and the expected counts, "
    "statistic, and V all ride windows over that summary-sized "
    "aggregate — the fact table is touched exactly once, map-side "
    "combinable. The shape every 'is metric X independent of "
    "segment Y' dashboard question reduces to.",
    tags=("stats",),
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).cast("long").alias("seg")
    ).agg(F.count("*").alias("obs"))
    tot = cells.select(
        "event_type",
        "seg",
        "obs",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("seg")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    term = F.pow(F.col("obs") - exp, 2) / exp
    return tot.agg(
        F.max("n").cast("long").alias("n_events"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("seg") - 1)
        ).cast("long").alias("dof"),
        F.round(F.sum(term), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.sum(term)
                / (
                    F.max("n")
                    * F.least(
                        F.countDistinct("event_type") - 1,
                        F.countDistinct("seg") - 1,
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
    )


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
    "stats-mann-whitney",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS m
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        ranked AS (
            SELECT event_type,
                   row_number() OVER (ORDER BY m, event_type, day) AS r
            FROM daily
        )
        SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               round(sum(CASE WHEN event_type = 'click' THEN CAST(r AS DOUBLE)
                              ELSE 0 END)
                     - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       * (sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                          + 1.0) / 2, 6) AS u1,
               round((sum(CASE WHEN event_type = 'click' THEN CAST(r AS DOUBLE)
                               ELSE 0 END)
                      - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        * (sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                           + 1.0) / 2
                      - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        * CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                               AS DOUBLE) / 2)
                     / sqrt(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                            * CAST(sum(CASE WHEN event_type = 'view'
                                            THEN 1 ELSE 0 END) AS DOUBLE)
                            * (count(*) + 1.0) / 12), 6) AS z
        FROM ranked
    """,
    doc="Mann-Whitney U (rank-sum) test comparing click-vs-view daily "
    "mean values: the fact pass is one groupBy(type, day) hash "
    "aggregation; ranking then runs over the ~60-row daily summary, "
    "never the raw events (the scale discipline every rank test "
    "needs — rank the AGGREGATE, not the facts). U1 = R1 - "
    "n1(n1+1)/2 and the normal-approximation z-score "
    "(U1 - n1*n2/2)/sqrt(n1*n2*(n+1)/12). Deterministic tie-break "
    "(type, day) in the rank order keeps Spark and the oracle "
    "bit-identical; daily means of continuous doubles make real "
    "ties measure-zero so the average-rank tie correction is "
    "deliberately omitted.",
    tags=("stats",),
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("m"))
    )
    ranked = daily.select(
        "event_type",
        F.row_number().over(Window.orderBy("m", "event_type", "day")).alias("r"),
    )
    is1 = F.when(F.col("event_type") == "click", 1).otherwise(0)
    n1 = F.sum(is1)
    n2 = F.sum(1 - is1)
    r1 = F.sum(F.when(F.col("event_type") == "click", F.col("r").cast("double")).otherwise(0.0))
    u1 = r1 - n1 * (n1 + 1.0) / 2
    z = (u1 - n1 * n2.cast("double") / 2) / F.sqrt(
        n1 * n2.cast("double") * (F.count("*") + 1.0) / 12
    )
    return ranked.agg(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u1, 6).alias("u1"),
        F.round(z, 6).alias("z"),
    )


@query(
    "timeseries-theil-sen",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS m
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        )
        SELECT a.event_type,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(quantile_cont((b.m - a.m)
                     / date_diff('day', a.day, b.day), 0.5), 6) AS sen_slope
        FROM daily a
        JOIN daily b ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY a.event_type
        ORDER BY a.event_type
    """,
    doc="Theil-Sen robust trend estimator per event_type: median of all "
    "pairwise slopes (m_j - m_i)/(day_j - day_i) over the daily-mean "
    "series. The O(n^2) pair join runs on the per-day AGGREGATE "
    "(~30 rows/series -> ~435 pairs), never raw events, and is "
    "co-partitioned by series key so each series' pairs stay local "
    "— the standard way a quadratic estimator survives scale: "
    "quadratic in the summary, linear in the facts. Exact "
    "interpolated median via percentile/quantile_cont on both "
    "sides.",
    tags=("stats", "timeseries"),
)
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("m")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.m") - F.col("a.m"))
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias("sen_slope"),
        )
        .orderBy("event_type")
    )
