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

from transit_scrape_spark.operators.dedup import sql_string_hash
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


@query(
    "stats-anova-oneway",
    oracle="""
        WITH g AS (
            SELECT event_type, count(*) AS n, avg(value) AS m,
                   var_samp(value) AS s2
            FROM events GROUP BY event_type
        ),
        grand AS (
            SELECT sum(n * m) / sum(n) AS gm, sum(n) AS n_tot,
                   count(*) AS k
            FROM g
        )
        SELECT CAST(max(n_tot) AS BIGINT) AS n,
               CAST(max(k) - 1 AS BIGINT) AS dof_between,
               CAST(max(n_tot) - max(k) AS BIGINT) AS dof_within,
               round(sum(n * power(m - gm, 2)) / (max(k) - 1), 6)
                   AS ms_between,
               round(sum((n - 1) * s2) / (max(n_tot) - max(k)), 6)
                   AS ms_within,
               round((sum(n * power(m - gm, 2)) / (max(k) - 1))
                     / (sum((n - 1) * s2) / (max(n_tot) - max(k))), 6)
                   AS f_stat
        FROM g, grand
    """,
    doc="One-way ANOVA F-test (does mean value differ across "
    "event_type groups): ONE hash aggregation computes per-group "
    "(n, mean, var) partials — map-side combinable, no raw-row "
    "shuffle — and SS_between / SS_within / F ride the 5-row "
    "summary. The decomposition sum(n_g*(m_g-gm)^2) and "
    "sum((n_g-1)*s2_g) is exactly how a distributed engine avoids "
    "the two-pass textbook formula: group moments merge "
    "associatively, grand mean is a weighted mean of group means.",
    tags=("stats",),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("s2"),
    )
    grand = g.agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm"),
        F.sum("n").alias("n_tot"),
        F.count("*").alias("k"),
    )
    j = g.crossJoin(F.broadcast(grand))
    ssb = F.sum(F.col("n") * F.pow(F.col("m") - F.col("gm"), 2))
    ssw = F.sum((F.col("n") - 1) * F.col("s2"))
    msb = ssb / (F.max("k") - 1)
    msw = ssw / (F.max("n_tot") - F.max("k"))
    return j.agg(
        F.max("n_tot").cast("long").alias("n"),
        (F.max("k") - 1).cast("long").alias("dof_between"),
        (F.max("n_tot") - F.max("k")).cast("long").alias("dof_within"),
        F.round(msb, 6).alias("ms_between"),
        F.round(msw, 6).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
    )


@query(
    "stats-welch-ttest",
    oracle="""
        WITH g AS (
            SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS n1,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS n2,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS m1,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS m2,
                   var_samp(CASE WHEN event_type = 'click' THEN value END)
                       AS v1,
                   var_samp(CASE WHEN event_type = 'view' THEN value END)
                       AS v2
            FROM events WHERE event_type IN ('click', 'view')
        )
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               round(m1 - m2, 6) AS mean_diff,
               round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
               round(power(v1 / n1 + v2 / n2, 2)
                     / (power(v1 / n1, 2) / (n1 - 1)
                        + power(v2 / n2, 2) / (n2 - 1)), 6) AS dof_welch
        FROM g
    """,
    doc="Welch's unequal-variance t-test (click vs view mean value): "
    "one conditional-aggregate pass computes both groups' "
    "(n, mean, var) in a single scan — no split-then-union, no "
    "second fact pass — and t plus the Welch-Satterthwaite degrees "
    "of freedom are scalar arithmetic on the 1-row summary. The "
    "conditional-agg single-scan shape is the scale move: two "
    "filtered subqueries would read the fact table twice.",
    tags=("stats",),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    g = ev.agg(
        F.count(click).alias("n1"),
        F.count(view).alias("n2"),
        F.avg(click).alias("m1"),
        F.avg(view).alias("m2"),
        F.var_samp(click).alias("v1"),
        F.var_samp(view).alias("v2"),
    )
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    return g.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(se2_1 + se2_2), 6
        ).alias("t_stat"),
        F.round(
            F.pow(se2_1 + se2_2, 2)
            / (
                F.pow(se2_1, 2) / (F.col("n1") - 1)
                + F.pow(se2_2, 2) / (F.col("n2") - 1)
            ),
            6,
        ).alias("dof_welch"),
    )


@query(
    "stats-spearman-corr",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS x,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS y
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY CAST(ts AS DATE)
            HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
               AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0
        ),
        ranked AS (
            SELECT row_number() OVER (ORDER BY x, day) AS rx,
                   row_number() OVER (ORDER BY y, day) AS ry
            FROM daily
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(corr(CAST(rx AS DOUBLE), CAST(ry AS DOUBLE)), 6)
                   AS spearman_rho,
               round(1 - 6 * sum(power(CAST(rx AS DOUBLE) - ry, 2))
                         / (count(*) * (power(count(*), 2) - 1.0)), 6)
                   AS rho_formula
        FROM ranked
    """,
    doc="Spearman rank correlation between daily mean click value and "
    "daily mean view value: the fact pass is one conditional "
    "groupBy(day) aggregation; BOTH rankings run over the ~30-row "
    "daily summary (rank the aggregate, never the facts — a global "
    "row_number over raw events is the single-partition sort that "
    "kills rank statistics at scale). rho computed two ways — "
    "Pearson-on-ranks and the classic 1 - 6*sum(d^2)/(n(n^2-1)) — "
    "which must agree because continuous daily means plus a "
    "deterministic (value, day) tie-break make ranks a permutation. "
    "Cross-checking the two forms in one output row is the test.",
    tags=("stats", "timeseries"),
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(click).alias("x"),
            F.avg(view).alias("y"),
            F.count(click).alias("nx"),
            F.count(view).alias("ny"),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
    )
    ranked = daily.select(
        F.row_number().over(Window.orderBy("x", "day")).alias("rx"),
        F.row_number().over(Window.orderBy("y", "day")).alias("ry"),
    )
    rx = F.col("rx").cast("double")
    ry = F.col("ry").cast("double")
    n = F.count("*")
    return ranked.agg(
        n.cast("long").alias("n_days"),
        F.round(F.corr(rx, ry), 6).alias("spearman_rho"),
        F.round(
            1 - 6 * F.sum(F.pow(rx - ry, 2)) / (n * (F.pow(n, 2) - 1.0)),
            6,
        ).alias("rho_formula"),
    )


@query(
    "stats-benjamini-hochberg",
    oracle="""
        WITH grand AS (
            SELECT avg(value) AS gm, var_samp(value) AS gv FROM events
        ),
        g AS (
            SELECT event_type, count(*) AS n, avg(value) AS m
            FROM events GROUP BY event_type
        ),
        tests AS (
            SELECT event_type,
                   abs(m - gm) / sqrt(gv / n) AS z,
                   exp(-power(abs(m - gm) / sqrt(gv / n), 2) / 2) AS p
            FROM g, grand
        ),
        ranked AS (
            SELECT event_type, z, p,
                   row_number() OVER (ORDER BY p, event_type) AS k,
                   count(*) OVER () AS m_tests
            FROM tests
        ),
        flagged AS (
            SELECT *,
                   max(CASE WHEN p <= 0.05 * k / m_tests THEN k ELSE 0 END)
                       OVER () AS k_max
            FROM ranked
        )
        SELECT event_type, round(z, 6) AS z, round(p, 6) AS p,
               CAST(k AS BIGINT) AS k,
               round(0.05 * k / m_tests, 6) AS bh_threshold,
               k <= k_max AS rejected
        FROM flagged ORDER BY k
    """,
    doc="Benjamini-Hochberg FDR control over a family of per-segment "
    "location tests: each event_type's mean is z-tested against the "
    "grand mean (p-value surrogate exp(-z^2/2) — the Chernoff upper "
    "bound, engine-portable without erf, monotone in |z| which is "
    "all BH's ORDERING needs), then the BH step-up runs entirely on "
    "the 5-row test summary: sort by p, compare to alpha*k/m, and "
    "the step-up 'reject all k <= argmax' via a window max. The "
    "pattern for any metric-monitoring system running thousands of "
    "parallel segment tests: facts aggregated once, multiple-testing "
    "correction on the summary.",
    tags=("stats",),
)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grand = ev.agg(
        F.avg("value").alias("gm"), F.var_samp("value").alias("gv")
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.avg("value").alias("m")
    )
    z = F.abs(F.col("m") - F.col("gm")) / F.sqrt(F.col("gv") / F.col("n"))
    tests = g.crossJoin(F.broadcast(grand)).select(
        "event_type", z.alias("z"), F.exp(-F.pow(z, 2) / 2).alias("p")
    )
    ranked = tests.select(
        "event_type",
        "z",
        "p",
        F.row_number().over(Window.orderBy("p", "event_type")).alias("k"),
        F.count("*").over(Window.partitionBy()).alias("m_tests"),
    )
    flagged = ranked.withColumn(
        "k_max",
        F.max(
            F.when(
                F.col("p") <= 0.05 * F.col("k") / F.col("m_tests"), F.col("k")
            ).otherwise(0)
        ).over(Window.partitionBy()),
    )
    return flagged.select(
        "event_type",
        F.round("z", 6).alias("z"),
        F.round("p", 6).alias("p"),
        F.col("k").cast("long").alias("k"),
        F.round(0.05 * F.col("k") / F.col("m_tests"), 6).alias("bh_threshold"),
        (F.col("k") <= F.col("k_max")).alias("rejected"),
    ).orderBy("k")


@query(
    "stats-mutual-information",
    oracle="""
        WITH cells AS (
            SELECT event_type AS x, CAST(user_id % 4 AS BIGINT) AS y,
                   CAST(count(*) AS DOUBLE) AS c
            FROM events GROUP BY event_type, user_id % 4
        ),
        p AS (
            SELECT x, y, c / sum(c) OVER () AS pxy,
                   sum(c) OVER (PARTITION BY x) / sum(c) OVER () AS px,
                   sum(c) OVER (PARTITION BY y) / sum(c) OVER () AS py
            FROM cells
        )
        SELECT round(sum(pxy * ln(pxy / (px * py))), 6) AS mi_nats,
               round(-sum(CASE WHEN y = (SELECT min(y) FROM p)
                               THEN px * ln(px) ELSE 0 END), 6) AS h_x,
               round(-sum(CASE WHEN x = (SELECT min(x) FROM p)
                               THEN py * ln(py) ELSE 0 END), 6) AS h_y,
               round(sum(pxy * ln(pxy / (px * py)))
                     / least(-sum(CASE WHEN y = (SELECT min(y) FROM p)
                                       THEN px * ln(px) ELSE 0 END),
                             -sum(CASE WHEN x = (SELECT min(x) FROM p)
                                       THEN py * ln(py) ELSE 0 END)), 6)
                   AS nmi
        FROM p
    """,
    doc="Mutual information I(event_type; user segment) in nats, with "
    "marginal entropies and min-normalized NMI: ONE hash aggregation "
    "builds the r x c contingency table; joint and marginal "
    "probabilities ride windows over the 20-cell summary, and the "
    "MI/entropy sums reduce it to one row. Marginal entropies are "
    "summed over one representative slice of the cell grid (the "
    "min-key row/column) rather than a second DISTINCT pass — every "
    "quantity from a single fact scan. The information-theoretic "
    "companion to stats-chi-square on the same table: chi2 tests "
    "independence, MI measures its strength in bits/nats.",
    tags=("stats",),
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        (F.col("user_id") % 4).cast("long").alias("y"),
    ).agg(F.count("*").cast("double").alias("c"))
    w_all = Window.partitionBy()
    p = cells.select(
        "x",
        "y",
        (F.col("c") / F.sum("c").over(w_all)).alias("pxy"),
        (
            F.sum("c").over(Window.partitionBy("x")) / F.sum("c").over(w_all)
        ).alias("px"),
        (
            F.sum("c").over(Window.partitionBy("y")) / F.sum("c").over(w_all)
        ).alias("py"),
    ).withColumn("min_y", F.min("y").over(w_all)).withColumn(
        "min_x", F.min("x").over(w_all)
    )
    mi = F.sum(F.col("pxy") * F.log(F.col("pxy") / (F.col("px") * F.col("py"))))
    h_x = -F.sum(
        F.when(F.col("y") == F.col("min_y"), F.col("px") * F.log("px")).otherwise(
            0.0
        )
    )
    h_y = -F.sum(
        F.when(F.col("x") == F.col("min_x"), F.col("py") * F.log("py")).otherwise(
            0.0
        )
    )
    return p.agg(
        F.round(mi, 6).alias("mi_nats"),
        F.round(h_x, 6).alias("h_x"),
        F.round(h_y, 6).alias("h_y"),
        F.round(mi / F.least(h_x, h_y), 6).alias("nmi"),
    )


@query(
    "timeseries-granger-1lag",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS DOUBLE) AS c,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS DOUBLE) AS v
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        lagged AS (
            SELECT c AS y, lag(c) OVER (ORDER BY day) AS x1,
                   lag(v) OVER (ORDER BY day) AS x2
            FROM daily
        ),
        cc AS (SELECT * FROM lagged WHERE x1 IS NOT NULL),
        ctr AS (
            SELECT y - avg(y) OVER () AS yc,
                   x1 - avg(x1) OVER () AS x1c,
                   x2 - avg(x2) OVER () AS x2c
            FROM cc
        ),
        s AS (
            SELECT count(*) AS n,
                   sum(yc * yc) AS syy, sum(x1c * x1c) AS s11,
                   sum(x2c * x2c) AS s22, sum(x1c * x2c) AS s12,
                   sum(x1c * yc) AS s1y, sum(x2c * yc) AS s2y
            FROM ctr
        )
        SELECT CAST(n AS BIGINT) AS n,
               round((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6)
                   AS beta_own_lag,
               round((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6)
                   AS beta_cross_lag,
               round(((syy - s1y * s1y / s11)
                      - (syy - (s22 * s1y - s12 * s2y)
                               / (s11 * s22 - s12 * s12) * s1y
                             - (s11 * s2y - s12 * s1y)
                               / (s11 * s22 - s12 * s12) * s2y))
                     / ((syy - (s22 * s1y - s12 * s2y)
                               / (s11 * s22 - s12 * s12) * s1y
                             - (s11 * s2y - s12 * s1y)
                               / (s11 * s22 - s12 * s12) * s2y)
                        / (n - 3)), 6) AS granger_f
        FROM s
    """,
    doc="Granger causality test (1 lag): does yesterday's view count "
    "help predict today's click count beyond yesterday's clicks? "
    "OLS solved in CLOSED FORM from the 2x2 normal equations on "
    "mean-centered sums (beta = inv([[S11,S12],[S12,S22]]) * "
    "[S1y,S2y]) — no ML library, no iteration: one fact-table hash "
    "agg to the daily series, lag + centering windows over the "
    "~30-row summary, then a single-row moment aggregation carries "
    "everything the F-statistic needs. F = (RSS_restricted - "
    "RSS_unrestricted) / (RSS_u / (n-3)). The template for pushing "
    "ANY small-k regression to 100 TB: stream the k x k moment "
    "matrix (map-side combinable sums), solve on the summary.",
    tags=("stats", "timeseries"),
)
def timeseries_granger_1lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("c"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("v"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        F.col("c").alias("y"),
        F.lag("c").over(w).alias("x1"),
        F.lag("v").over(w).alias("x2"),
    ).filter(F.col("x1").isNotNull())
    w_all = Window.partitionBy()
    ctr = lagged.select(
        (F.col("y") - F.avg("y").over(w_all)).alias("yc"),
        (F.col("x1") - F.avg("x1").over(w_all)).alias("x1c"),
        (F.col("x2") - F.avg("x2").over(w_all)).alias("x2c"),
    )
    s = ctr.agg(
        F.count("*").alias("n"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
        F.sum(F.col("x1c") * F.col("x1c")).alias("s11"),
        F.sum(F.col("x2c") * F.col("x2c")).alias("s22"),
        F.sum(F.col("x1c") * F.col("x2c")).alias("s12"),
        F.sum(F.col("x1c") * F.col("yc")).alias("s1y"),
        F.sum(F.col("x2c") * F.col("yc")).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    rss_u = F.col("syy") - b1 * F.col("s1y") - b2 * F.col("s2y")
    rss_r = F.col("syy") - F.col("s1y") * F.col("s1y") / F.col("s11")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(b1, 6).alias("beta_own_lag"),
        F.round(b2, 6).alias("beta_cross_lag"),
        F.round((rss_r - rss_u) / (rss_u / (F.col("n") - 3)), 6).alias(
            "granger_f"
        ),
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
    "stats-runs-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, count(*) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        moves AS (
            SELECT day,
                   CASE WHEN x > lag(x) OVER (ORDER BY day) THEN 1
                        WHEN x < lag(x) OVER (ORDER BY day) THEN 0
                        END AS up
            FROM daily
        ),
        runs AS (
            SELECT up,
                   CASE WHEN lag(up) OVER (ORDER BY day) IS NULL
                             OR up <> lag(up) OVER (ORDER BY day)
                        THEN 1 ELSE 0 END AS new_run
            FROM moves WHERE up IS NOT NULL
        ),
        s AS (
            SELECT CAST(sum(up) AS DOUBLE) AS n1,
                   CAST(sum(1 - up) AS DOUBLE) AS n2,
                   CAST(sum(new_run) AS DOUBLE) AS r
            FROM runs
        )
        SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down,
               CAST(r AS BIGINT) AS n_runs,
               round(2 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
               round((r - (2 * n1 * n2 / (n1 + n2) + 1))
                     / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                            / (power(n1 + n2, 2) * (n1 + n2 - 1))), 6)
                   AS z
        FROM s
    """,
    doc="Wald-Wolfowitz runs test for randomness of the daily volume's "
    "up/down moves: consecutive same-direction moves collapse into "
    "runs (a lag()-equality flag summed — the gaps-and-islands "
    "counter), and the observed run count is z-scored against the "
    "E[R] = 2*n1*n2/(n1+n2)+1 null of an exchangeable sequence. "
    "Too few runs = trending, too many = oscillating. Facts "
    "collapse in one hash agg; every window runs over the ~30-row "
    "daily summary. Ties (x equal to previous) drop out as NULL "
    "moves, the standard treatment. Integer counts make tie days "
    "possible but rare; they shrink n, not correctness.",
    tags=("stats", "timeseries"),
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    w = Window.orderBy("day")
    moves = daily.select(
        "day",
        F.when(F.col("x") > F.lag("x").over(w), 1)
        .when(F.col("x") < F.lag("x").over(w), 0)
        .alias("up"),
    )
    runs = moves.filter(F.col("up").isNotNull()).select(
        "day",
        "up",
        F.when(
            F.lag("up").over(w).isNull()
            | (F.col("up") != F.lag("up").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    s = runs.agg(
        F.sum("up").cast("double").alias("n1"),
        F.sum(1 - F.col("up")).cast("double").alias("n2"),
        F.sum("new_run").cast("double").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 2 * n1 * n2 / (n1 + n2) + 1
    vr = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / (F.pow(n1 + n2, 2) * (n1 + n2 - 1))
    )
    return s.select(
        n1.cast("long").alias("n_up"),
        n2.cast("long").alias("n_down"),
        r.cast("long").alias("n_runs"),
        F.round(er, 6).alias("expected_runs"),
        F.round((r - er) / F.sqrt(vr), 6).alias("z"),
    )


_CRONBACH_ITEMS = ("click", "error", "purchase", "signup", "view")


@query(
    "stats-cronbach-alpha",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   {", ".join(
                       f"avg(CASE WHEN event_type = '{t}' THEN value END)"
                       f" AS i{n}" for n, t in enumerate(_CRONBACH_ITEMS))}
            FROM events GROUP BY CAST(ts AS DATE)
            HAVING {" AND ".join(
                f"count(CASE WHEN event_type = '{t}' THEN 1 END) > 0"
                for t in _CRONBACH_ITEMS)}
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round({" + ".join(f"var_samp(i{n})"
                                 for n in range(len(_CRONBACH_ITEMS)))}, 6)
                   AS sum_item_var,
               round(var_samp({" + ".join(f"i{n}"
                              for n in range(len(_CRONBACH_ITEMS)))}), 6)
                   AS total_var,
               round({len(_CRONBACH_ITEMS)} / ({len(_CRONBACH_ITEMS)} - 1.0)
                     * (1 - ({" + ".join(f"var_samp(i{n})"
                              for n in range(len(_CRONBACH_ITEMS)))})
                            / var_samp({" + ".join(f"i{n}"
                              for n in range(len(_CRONBACH_ITEMS)))})), 6)
                   AS cronbach_alpha
        FROM daily
    """,
    doc="Cronbach's alpha internal-consistency coefficient treating the "
    "five event types' daily mean values as test items and days as "
    "subjects: alpha = k/(k-1) * (1 - sum(var_item)/var(total)). "
    "One conditional-aggregate pass pivots the facts to the "
    "day x item matrix (complete-case days only), then one "
    "summary aggregation produces every variance — the "
    "psychometric reliability statistic as two hash aggs, the "
    "wide-pivot-then-moment shape any metric-battery consistency "
    "check uses at scale.",
    tags=("stats",),
)
def stats_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs, havings = [], []
    for n, t in enumerate(_CRONBACH_ITEMS):
        item = F.when(F.col("event_type") == t, F.col("value"))
        aggs.append(F.avg(item).alias(f"i{n}"))
        havings.append(F.count(item).alias(f"n{n}"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(*aggs, *havings)
    for n in range(len(_CRONBACH_ITEMS)):
        daily = daily.filter(F.col(f"n{n}") > 0)
    k = len(_CRONBACH_ITEMS)
    sum_var = sum(
        (F.var_samp(f"i{n}") for n in range(1, k)), F.var_samp("i0")
    )
    total = sum((F.col(f"i{n}") for n in range(1, k)), F.col("i0"))
    return daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(sum_var, 6).alias("sum_item_var"),
        F.round(F.var_samp(total), 6).alias("total_var"),
        F.round(
            k / (k - 1.0) * (1 - sum_var / F.var_samp(total)), 6
        ).alias("cronbach_alpha"),
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
    ext = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
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
            FROM events GROUP BY CAST(ts AS DATE)
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
    ev = load_table(spark, sf_dir, "events")
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
    "stats-mahalanobis-outliers",
    oracle="""
        WITH feat AS (
            SELECT o.o_orderkey, o.o_totalprice AS p,
                   CAST(count(l.l_orderkey) AS DOUBLE) AS q
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        m AS (
            SELECT avg(p) AS mp, avg(q) AS mq,
                   var_pop(p) AS vp, var_pop(q) AS vq,
                   covar_pop(p, q) AS c
            FROM feat
        )
        SELECT f.o_orderkey, round(f.p, 2) AS totalprice,
               CAST(f.q AS BIGINT) AS n_items,
               round(((f.p - mp) * (f.p - mp) * vq
                      - 2 * (f.p - mp) * (f.q - mq) * c
                      + (f.q - mq) * (f.q - mq) * vp)
                     / (vp * vq - c * c), 6) AS mahalanobis_sq
        FROM feat f, m
        ORDER BY mahalanobis_sq DESC, f.o_orderkey
        LIMIT 20
    """,
    doc="Multivariate outlier detection: squared Mahalanobis distance "
    "of each order in the (total price, item count) plane, top-20 "
    "most anomalous — catches price/size combinations that neither "
    "univariate z-score would flag (cheap-but-huge, "
    "costly-but-tiny). The 2x2 covariance inverts in CLOSED FORM, "
    "so the plan is: one join+agg builds the feature relation, one "
    "single-row moment aggregation (mean/var/cov — all map-side "
    "combinable), broadcast back, per-row distance in codegen, "
    "TakeOrderedAndProject for the top-k. The k-feature "
    "generalization streams the k x k moment matrix the same way "
    "(timeseries-granger-1lag shows the pattern) and solves on "
    "the driver.",
    tags=("stats",),
)
def stats_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("*").cast("double").alias("q"))
        .select("o_orderkey", F.col("o_totalprice").alias("p"), "q")
    )
    m = feat.agg(
        F.avg("p").alias("mp"),
        F.avg("q").alias("mq"),
        F.var_pop("p").alias("vp"),
        F.var_pop("q").alias("vq"),
        F.covar_pop("p", "q").alias("c"),
    )
    dp = F.col("p") - F.col("mp")
    dq = F.col("q") - F.col("mq")
    d2 = (
        dp * dp * F.col("vq") - 2 * dp * dq * F.col("c") + dq * dq * F.col("vp")
    ) / (F.col("vp") * F.col("vq") - F.col("c") * F.col("c"))
    return (
        feat.crossJoin(F.broadcast(m))
        .select(
            "o_orderkey",
            F.round("p", 2).alias("totalprice"),
            F.col("q").cast("long").alias("n_items"),
            F.round(d2, 6).alias("mahalanobis_sq"),
        )
        .orderBy(F.col("mahalanobis_sq").desc(), "o_orderkey")
        .limit(20)
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "agg-corr-matrix",
    oracle=f"""
        WITH pairs AS (
            {" UNION ALL ".join(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"corr({a}, {b}) AS r, covar_samp({a}, {b}) AS cov "
                f"FROM lineitem"
                for i, a in enumerate(_CORR_COLS)
                for b in _CORR_COLS[i + 1:])}
        )
        SELECT col_a, col_b, round(r, 6) AS pearson_r,
               round(cov, 6) AS covariance
        FROM pairs ORDER BY col_a, col_b
    """,
    doc="Full pairwise Pearson correlation matrix (upper triangle) of "
    "the four lineitem numeric measures in ONE fact scan: all six "
    "corr() and covar_samp() states accumulate side by side in a "
    "single hash-free scalar aggregation — each is a streaming "
    "5-tuple of moments, map-side combinable, so the matrix costs "
    "one pass regardless of how many pairs (k^2 states of O(1) "
    "each, the same trick MLlib's Statistics.corr uses). The "
    "oracle spells it as per-pair scans; Spark's single "
    "multi-aggregate plan must produce identical numbers — that "
    "equivalence (fused scan == per-pair scans) is what the "
    "parity check proves.",
    tags=("stats",),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            aggs.append(F.corr(a, b).alias(f"r_{a}_{b}"))
            aggs.append(F.covar_samp(a, b).alias(f"c_{a}_{b}"))
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', r_{a}_{b}, c_{a}_{b}"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    )
    n_pairs = sum(1 for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:])
    return (
        wide.selectExpr(
            f"stack({n_pairs}, {stack_args}) AS (col_a, col_b, r, cov)"
        )
        .select(
            "col_a",
            "col_b",
            F.round("r", 6).alias("pearson_r"),
            F.round("cov", 6).alias("covariance"),
        )
        .orderBy("col_a", "col_b")
    )


@query(
    "stats-levene-median",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS md
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, abs(e.value - m.md) AS z
            FROM events e JOIN med m ON e.event_type = m.event_type
        ),
        g AS (
            SELECT event_type, count(*) AS n, avg(z) AS mz,
                   var_samp(z) AS s2
            FROM dev GROUP BY event_type
        ),
        grand AS (
            SELECT sum(n * mz) / sum(n) AS gm, sum(n) AS n_tot,
                   count(*) AS k
            FROM g
        )
        SELECT CAST(max(n_tot) AS BIGINT) AS n,
               CAST(max(k) - 1 AS BIGINT) AS dof_between,
               CAST(max(n_tot) - max(k) AS BIGINT) AS dof_within,
               round((sum(n * power(mz - gm, 2)) / (max(k) - 1))
                     / (sum((n - 1) * s2) / (max(n_tot) - max(k))), 6)
                   AS levene_w
        FROM g, grand
    """,
    doc="Brown-Forsythe / Levene test for homogeneity of variances "
    "across event_type groups: a one-way ANOVA on absolute "
    "deviations from each group's MEDIAN (the robust variant — "
    "mean-centered Levene inflates under skew). Two fact passes by "
    "necessity: exact per-group medians (percentile aggregate; "
    "approx_percentile at 100 TB), then deviations re-aggregated "
    "through the SAME group-moment decomposition as "
    "stats-anova-oneway — the median join is a broadcast of 5 "
    "rows, everything else map-side combinable. The test to run "
    "BEFORE trusting stats-anova-oneway, which assumes the "
    "variances this one checks.",
    tags=("stats",),
)
def stats_levene_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("md")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("md")).alias("z")
    )
    g = dev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("z").alias("mz"),
        F.var_samp("z").alias("s2"),
    )
    grand = g.agg(
        (F.sum(F.col("n") * F.col("mz")) / F.sum("n")).alias("gm"),
        F.sum("n").alias("n_tot"),
        F.count("*").alias("k"),
    )
    j = g.crossJoin(F.broadcast(grand))
    msb = F.sum(F.col("n") * F.pow(F.col("mz") - F.col("gm"), 2)) / (
        F.max("k") - 1
    )
    msw = F.sum((F.col("n") - 1) * F.col("s2")) / (
        F.max("n_tot") - F.max("k")
    )
    return j.agg(
        F.max("n_tot").cast("long").alias("n"),
        (F.max("k") - 1).cast("long").alias("dof_between"),
        (F.max("n_tot") - F.max("k")).cast("long").alias("dof_within"),
        F.round(msb / msw, 6).alias("levene_w"),
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
    "stats-power-proportions",
    oracle="""
        WITH base AS (
            SELECT CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS p1
            FROM events
        ),
        params AS (
            SELECT p1, p1 * 1.10 AS p2, 1.959964 AS za, 0.841621 AS zb
            FROM base
        )
        SELECT round(p1, 6) AS baseline_rate,
               round(p2, 6) AS target_rate,
               CAST(ceil(power(za * sqrt(2 * ((p1 + p2) / 2)
                                         * (1 - (p1 + p2) / 2))
                               + zb * sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
                               2)
                         / power(p2 - p1, 2)) AS BIGINT)
                   AS n_per_variant
        FROM params
    """,
    doc="A/B test sample-size calculator for a two-proportion z-test "
    "(alpha=5% two-sided, power=80%, MDE = +10% relative): the "
    "baseline conversion rate comes from ONE fact aggregation "
    "(purchase share of events), and the pooled-variance "
    "formula n = (z_a*sqrt(2*pbar*(1-pbar)) + "
    "z_b*sqrt(p1(1-p1)+p2(1-p2)))^2 / (p2-p1)^2 is scalar algebra "
    "on the 1-row summary. The normal quantiles are literals "
    "(1.959964, 0.841621) — engine-portable without an inverse-"
    "erf, and fixed by the chosen alpha/power, not the data. The "
    "planning query every experimentation platform runs before "
    "launching a test.",
    tags=("stats",),
)
def stats_power_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("double")
            / F.count("*")
        ).alias("p1")
    )
    p1, za, zb = F.col("p1"), F.lit(1.959964), F.lit(0.841621)
    p2 = p1 * 1.10
    pbar = (p1 + p2) / 2
    n = F.ceil(
        F.pow(
            za * F.sqrt(2 * pbar * (1 - pbar))
            + zb * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
            2,
        )
        / F.pow(p2 - p1, 2)
    )
    return base.select(
        F.round(p1, 6).alias("baseline_rate"),
        F.round(p2, 6).alias("target_rate"),
        n.cast("long").alias("n_per_variant"),
    )


@query(
    "stats-delta-method-ci",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN value ELSE 0 END) AS DOUBLE) AS rev,
                   CAST(count(*) AS DOUBLE) AS n_ev
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT count(*) AS n, avg(rev) AS mx, avg(n_ev) AS my,
                   var_samp(rev) AS vx, var_samp(n_ev) AS vy,
                   covar_samp(rev, n_ev) AS cxy
            FROM per_user
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               round(mx / my, 6) AS revenue_per_event,
               round((mx / my) * (mx / my)
                     * (vx / (mx * mx) + vy / (my * my)
                        - 2 * cxy / (mx * my)) / n, 6) AS var_delta,
               round(mx / my - 1.959964
                     * sqrt((mx / my) * (mx / my)
                            * (vx / (mx * mx) + vy / (my * my)
                               - 2 * cxy / (mx * my)) / n), 6) AS ci_lo,
               round(mx / my + 1.959964
                     * sqrt((mx / my) * (mx / my)
                            * (vx / (mx * mx) + vy / (my * my)
                               - 2 * cxy / (mx * my)) / n), 6) AS ci_hi
        FROM m
    """,
    doc="Delta-method confidence interval for a RATIO metric (revenue "
    "per event, unit = user): naive per-event variance is wrong "
    "because events cluster within users — the experimentation-"
    "platform classic. var(X/Y) ~ (mx/my)^2 * (vx/mx^2 + vy/my^2 "
    "- 2*cov/(mx*my)) / n over per-USER aggregates (the "
    "randomization unit). One fact hash agg to user rollups, one "
    "moment aggregation (mean/var/cov all map-side combinable), "
    "scalar algebra on the 1-row summary. The pattern behind "
    "every CUPED/ratio-metric readout at 100 TB.",
    tags=("stats",),
)
def stats_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        )
        .cast("double")
        .alias("rev"),
        F.count("*").cast("double").alias("n_ev"),
    )
    m = per_user.agg(
        F.count("*").alias("n"),
        F.avg("rev").alias("mx"),
        F.avg("n_ev").alias("my"),
        F.var_samp("rev").alias("vx"),
        F.var_samp("n_ev").alias("vy"),
        F.covar_samp("rev", "n_ev").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    var_d = (
        r
        * r
        * (
            F.col("vx") / (F.col("mx") * F.col("mx"))
            + F.col("vy") / (F.col("my") * F.col("my"))
            - 2 * F.col("cxy") / (F.col("mx") * F.col("my"))
        )
        / F.col("n")
    )
    z = F.lit(1.959964)
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(r, 6).alias("revenue_per_event"),
        F.round(var_d, 6).alias("var_delta"),
        F.round(r - z * F.sqrt(var_d), 6).alias("ci_lo"),
        F.round(r + z * F.sqrt(var_d), 6).alias("ci_hi"),
    )


@query(
    "stats-rank-biased-overlap",
    oracle="""
        WITH tok AS (
            SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS grp,
                   unnest(string_split(lower(text), ' ')) AS w
            FROM documents
        ),
        ranked AS (
            SELECT grp, w,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY count(*) DESC, w) AS r
            FROM tok WHERE w <> '' GROUP BY grp, w
        ),
        ra AS (SELECT w, r FROM ranked WHERE grp = 'en' AND r <= 20),
        rb AS (SELECT w, r FROM ranked WHERE grp = 'other' AND r <= 20),
        pairs AS (
            SELECT ra.r AS r1, rb.r AS r2
            FROM ra JOIN rb ON ra.w = rb.w
        ),
        depths AS (SELECT unnest(range(1, 21)) AS d),
        agreement AS (
            SELECT d.d,
                   CAST((SELECT count(*) FROM pairs p
                         WHERE p.r1 <= d.d AND p.r2 <= d.d) AS DOUBLE)
                       / d.d AS a_d
            FROM depths d
        )
        SELECT round((1 - 0.9) * sum(power(0.9, d - 1) * a_d), 6)
                   AS rbo_p09,
               round(max(CASE WHEN d = 20 THEN a_d END), 6)
                   AS overlap_at_20
        FROM agreement
    """,
    doc="Rank-biased overlap (Webber et al.) between the top-20 token "
    "rankings of the English vs non-English sub-corpora: RBO(p=0.9) "
    "= (1-p) * sum_d p^(d-1) * |A_d intersect B_d| / d — the "
    "top-weighted, length-tolerant way to compare two rankings "
    "(Kendall needs identical item sets; RBO doesn't). Heavy "
    "passes: one token count agg per the usual vocabulary-bounded "
    "shape, per-group ranking via WindowGroupLimit-prunable "
    "row_number. The overlap-at-every-depth table comes from a "
    "20-row depth spine range-joined against the matched-rank "
    "pairs — all summary-sized. The ranking-drift monitor for "
    "search/recsys: compare yesterday's top-k to today's.",
    tags=("stats", "text"),
)
def stats_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp"),
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    counted = tok.groupBy("grp", "w").agg(F.count("*").alias("n"))
    wr = Window.partitionBy("grp").orderBy(F.col("n").desc(), "w")
    ranked = counted.select(
        "grp", "w", F.row_number().over(wr).alias("r")
    ).filter(F.col("r") <= 20)
    ra = ranked.filter(F.col("grp") == "en").select(
        "w", F.col("r").alias("r1")
    )
    rb = ranked.filter(F.col("grp") == "other").select(
        "w", F.col("r").alias("r2")
    )
    pairs = ra.join(rb, "w").select("r1", "r2")
    depths = spark.range(1, 21).select(F.col("id").alias("d"))
    agreement = (
        depths.join(
            F.broadcast(pairs),
            (F.col("r1") <= F.col("d")) & (F.col("r2") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(
            (F.count("r1").cast("double") / F.first("d")).alias("a_d")
        )
    )
    return agreement.agg(
        F.round(
            (1 - 0.9)
            * F.sum(F.pow(F.lit(0.9), F.col("d") - 1) * F.col("a_d")),
            6,
        ).alias("rbo_p09"),
        F.round(
            F.max(F.when(F.col("d") == 20, F.col("a_d"))), 6
        ).alias("overlap_at_20"),
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
    s1 = dated.filter(
        (F.col("day") >= F.col("d0"))
        & (F.col("day") <= F.date_add(F.col("d0"), 6))
    ).select("user_id").distinct()
    s2 = dated.filter(
        (F.col("day") >= F.date_add(F.col("d0"), 7))
        & (F.col("day") <= F.date_add(F.col("d0"), 13))
    ).select("user_id").distinct()
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
    "stats-odds-ratio",
    oracle="""
        WITH cells AS (
            SELECT CAST(sum(CASE WHEN user_id % 2 = 0 AND
                                      event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS a,
                   CAST(sum(CASE WHEN user_id % 2 = 0 AND
                                      event_type <> 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS b,
                   CAST(sum(CASE WHEN user_id % 2 = 1 AND
                                      event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS c,
                   CAST(sum(CASE WHEN user_id % 2 = 1 AND
                                      event_type <> 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS d
            FROM events
        )
        SELECT round((a * d) / (b * c), 6) AS odds_ratio,
               round(exp(ln((a * d) / (b * c))
                         - 1.959964 * sqrt(1/a + 1/b + 1/c + 1/d)), 6)
                   AS ci_lo,
               round(exp(ln((a * d) / (b * c))
                         + 1.959964 * sqrt(1/a + 1/b + 1/c + 1/d)), 6)
                   AS ci_hi
        FROM cells
    """,
    doc="Odds ratio of purchasing between the two user-id-parity "
    "segments, with the Woolf log-OR 95% CI (se = sqrt(sum of "
    "reciprocal cell counts)): the 2x2 table collapses out of the "
    "fact scan in ONE conditional aggregation — four sums, "
    "map-side combinable, no groupBy shuffle at all — and the "
    "ratio + CI are scalar algebra on the single summary row. "
    "The epidemiology/risk-analysis companion to "
    "stats-chi-square's r x c independence test; at any scale "
    "the cost is exactly one scan.",
    tags=("stats",),
)
def stats_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    even = F.col("user_id") % 2 == 0
    purch = F.col("event_type") == "purchase"
    cells = ev.agg(
        F.sum(F.when(even & purch, 1).otherwise(0)).cast("double").alias("a"),
        F.sum(F.when(even & ~purch, 1).otherwise(0)).cast("double").alias("b"),
        F.sum(F.when(~even & purch, 1).otherwise(0)).cast("double").alias("c"),
        F.sum(F.when(~even & ~purch, 1).otherwise(0)).cast("double").alias("d"),
    )
    orr = (F.col("a") * F.col("d")) / (F.col("b") * F.col("c"))
    se = F.sqrt(
        1 / F.col("a") + 1 / F.col("b") + 1 / F.col("c") + 1 / F.col("d")
    )
    z = F.lit(1.959964)
    return cells.select(
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - z * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + z * se), 6).alias("ci_hi"),
    )


@query(
    "stats-friedman-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, avg(value) AS m
            FROM events GROUP BY CAST(ts AS DATE), event_type
        ),
        complete AS (
            SELECT day FROM daily GROUP BY day HAVING count(*) = 5
        ),
        ranked AS (
            SELECT d.day, d.event_type,
                   CAST(rank() OVER (PARTITION BY d.day ORDER BY d.m)
                        AS DOUBLE) AS r
            FROM daily d JOIN complete c ON c.day = d.day
        ),
        rsums AS (
            SELECT event_type, sum(r) AS rj,
                   CAST(count(*) AS DOUBLE) AS n
            FROM ranked GROUP BY event_type
        )
        SELECT CAST(max(n) AS BIGINT) AS n_days,
               CAST(count(*) AS BIGINT) AS k_treatments,
               round(12.0 / (max(n) * count(*) * (count(*) + 1))
                     * sum(rj * rj)
                     - 3 * max(n) * (count(*) + 1), 6) AS friedman_chi2
        FROM rsums
    """,
    doc="Friedman test (nonparametric repeated-measures ANOVA): do "
    "the five event types' daily mean values rank consistently "
    "across days? Each complete day is a block; types are ranked "
    "WITHIN the day (a 5-row partition — the ranking is "
    "summary-local, never a global sort) and chi2_F = "
    "12/(n*k*(k+1)) * sum(Rj^2) - 3n(k+1) reduces the per-type "
    "rank sums. One fact hash agg + a per-day window over the "
    "~150-row daily summary. The rank-based complement to "
    "stats-anova-oneway when normality is off the table; "
    "continuous daily means make within-day ties measure-zero so "
    "rank() needs no tie correction.",
    tags=("stats",),
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.avg("value").alias("m"))
    complete = daily.groupBy("day").agg(F.count("*").alias("k")).filter(
        F.col("k") == 5
    ).select("day")
    ranked = daily.join(F.broadcast(complete), "day").select(
        "day",
        "event_type",
        F.rank()
        .over(Window.partitionBy("day").orderBy("m"))
        .cast("double")
        .alias("r"),
    )
    rsums = ranked.groupBy("event_type").agg(
        F.sum("r").alias("rj"), F.count("*").cast("double").alias("n")
    )
    n = F.max("n")
    k = F.count("*")
    return rsums.agg(
        n.cast("long").alias("n_days"),
        k.cast("long").alias("k_treatments"),
        F.round(
            12.0 / (n * k * (k + 1)) * F.sum(F.col("rj") * F.col("rj"))
            - 3 * n * (k + 1),
            6,
        ).alias("friedman_chi2"),
    )


@query(
    "stats-mcnemar",
    oracle="""
        WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        flags AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase'
                            AND CAST(ts AS DATE)
                                BETWEEN d0 AND d0 + INTERVAL 6 DAY
                            THEN 1 ELSE 0 END) AS w1,
                   max(CASE WHEN event_type = 'purchase'
                            AND CAST(ts AS DATE)
                                BETWEEN d0 + INTERVAL 7 DAY
                                    AND d0 + INTERVAL 13 DAY
                            THEN 1 ELSE 0 END) AS w2
            FROM events, span GROUP BY user_id
        ),
        cells AS (
            SELECT CAST(sum(CASE WHEN w1 = 1 AND w2 = 0
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS b,
                   CAST(sum(CASE WHEN w1 = 0 AND w2 = 1
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS c,
                   CAST(count(*) AS BIGINT) AS n
            FROM flags
        )
        SELECT n AS n_users,
               CAST(b AS BIGINT) AS lost_purchasers,
               CAST(c AS BIGINT) AS gained_purchasers,
               round(power(abs(b - c) - 1, 2) / (b + c), 6)
                   AS mcnemar_chi2
        FROM cells WHERE b + c > 0
    """,
    doc="McNemar test for PAIRED proportion change: did the same "
    "users' purchase behavior flip between week 1 and week 2? "
    "Only the discordant cells matter — b (purchased then "
    "stopped) vs c (started purchasing) — and chi2 = "
    "(|b-c|-1)^2/(b+c) with the Edwards continuity correction. "
    "The unpaired stats-odds-ratio would be WRONG here (same "
    "users both periods); pairing happens for free in one "
    "conditional hash agg per user, then a single-row cell "
    "aggregation. The before/after launch readout when the "
    "population is fixed.",
    tags=("stats",),
)
def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    evd = ev.crossJoin(F.broadcast(span)).select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("day"),
        "d0",
    )
    purch = F.col("event_type") == "purchase"
    in_w1 = (F.col("day") >= F.col("d0")) & (
        F.col("day") <= F.date_add(F.col("d0"), 6)
    )
    in_w2 = (F.col("day") >= F.date_add(F.col("d0"), 7)) & (
        F.col("day") <= F.date_add(F.col("d0"), 13)
    )
    flags = evd.groupBy("user_id").agg(
        F.max(F.when(purch & in_w1, 1).otherwise(0)).alias("w1"),
        F.max(F.when(purch & in_w2, 1).otherwise(0)).alias("w2"),
    )
    cells = flags.agg(
        F.sum(F.when((F.col("w1") == 1) & (F.col("w2") == 0), 1).otherwise(0))
        .cast("double")
        .alias("b"),
        F.sum(F.when((F.col("w1") == 0) & (F.col("w2") == 1), 1).otherwise(0))
        .cast("double")
        .alias("c"),
        F.count("*").cast("long").alias("n"),
    )
    return cells.filter(F.col("b") + F.col("c") > 0).select(
        F.col("n").alias("n_users"),
        F.col("b").cast("long").alias("lost_purchasers"),
        F.col("c").cast("long").alias("gained_purchasers"),
        F.round(
            F.pow(F.abs(F.col("b") - F.col("c")) - 1, 2)
            / (F.col("b") + F.col("c")),
            6,
        ).alias("mcnemar_chi2"),
    )


@query(
    "stats-srm-check",
    oracle="""
        WITH assign AS (
            SELECT user_id,
                   (user_id * 2654435761 % 2147483648) % 2 AS variant
            FROM (SELECT DISTINCT user_id FROM events)
        ),
        counts AS (
            SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS n0,
                   CAST(sum(CASE WHEN variant <> 0 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS n1
            FROM assign
        )
        SELECT CAST(n0 AS BIGINT) AS variant_a,
               CAST(n1 AS BIGINT) AS variant_b,
               round(power(n0 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
                     + power(n1 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2), 6)
                   AS srm_chi2,
               (power(n0 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
                + power(n1 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2))
                   > 3.841459 AS srm_flag
        FROM counts
    """,
    doc="Sample-ratio-mismatch guard — the first thing every "
    "experimentation platform checks before reading ANY metric: "
    "users assigned 50/50 by an explicit portable Knuth "
    "multiplicative mix (user_id * 2654435761 mod 2^31, mod 2 — "
    "spelled out rather than relying on either engine's builtin "
    "hash, which differ bit-for-bit), then a 1-dof chi-square of "
    "the observed split against exact 50/50, flagged past the "
    "3.84 alpha=5% critical value. A failed SRM invalidates the "
    "whole experiment regardless of metric lift. One distinct-"
    "user hash agg + one conditional count — two scans of "
    "nothing but user_id.",
    tags=("stats",),
)
def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    variant = (F.col("user_id") * 2654435761 % 2147483648) % 2
    assign = ev.select("user_id").distinct().select(variant.alias("variant"))
    counts = assign.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("double")
        .alias("n0"),
        F.sum(F.when(F.col("variant") != 0, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
    )
    exp = (F.col("n0") + F.col("n1")) / 2
    chi2 = F.pow(F.col("n0") - exp, 2) / exp + F.pow(F.col("n1") - exp, 2) / exp
    return counts.select(
        F.col("n0").cast("long").alias("variant_a"),
        F.col("n1").cast("long").alias("variant_b"),
        F.round(chi2, 6).alias("srm_chi2"),
        (chi2 > 3.841459).alias("srm_flag"),
    )


@query(
    "stats-sprt-monitor",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS x,
                   CAST(count(*) AS DOUBLE) AS n
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        llr AS (
            SELECT day,
                   x * ln(0.22 / 0.20) + (n - x) * ln(0.78 / 0.80)
                       AS llr_day
            FROM daily
        ),
        walk AS (
            SELECT day,
                   sum(llr_day) OVER (ORDER BY day) AS llr_cum
            FROM llr
        )
        SELECT day, round(llr_cum, 6) AS llr_cum,
               CASE WHEN llr_cum >= ln((1 - 0.2) / 0.05) THEN 'accept_h1'
                    WHEN llr_cum <= ln(0.2 / (1 - 0.05)) THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM walk ORDER BY day
    """,
    doc="Sequential probability ratio test (Wald SPRT) monitoring the "
    "daily purchase rate against H0: p=0.20 vs H1: p=0.22 "
    "(alpha=5%, beta=20%): each day contributes a binomial "
    "log-likelihood-ratio increment x*ln(p1/p0) + "
    "(n-x)*ln((1-p1)/(1-p0)); the cumulative LLR random walk "
    "(one window over the daily summary) crosses ln((1-b)/a) to "
    "accept H1 or ln(b/(1-a)) to accept H0 — the always-valid "
    "peeking-safe alternative to fixed-horizon tests. Facts "
    "collapse in one conditional hash agg; the decision sequence "
    "is the whole output so the parity check pins every "
    "intermediate state of the walk, not just the verdict.",
    tags=("stats", "timeseries"),
)
def stats_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("x"),
        F.count("*").cast("double").alias("n"),
    )
    llr_day = F.col("x") * math.log(0.22 / 0.20) + (
        F.col("n") - F.col("x")
    ) * math.log(0.78 / 0.80)
    walk = daily.select(
        "day",
        F.sum(llr_day)
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("llr_cum"),
    )
    hi = math.log((1 - 0.2) / 0.05)
    lo = math.log(0.2 / (1 - 0.05))
    return walk.select(
        "day",
        F.round("llr_cum", 6).alias("llr_cum"),
        F.when(F.col("llr_cum") >= hi, "accept_h1")
        .when(F.col("llr_cum") <= lo, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


@query(
    "stats-pca-2d",
    oracle="""
        WITH m AS (
            SELECT var_pop(l_quantity) AS vx,
                   var_pop(l_extendedprice) AS vy,
                   covar_pop(l_quantity, l_extendedprice) AS c,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
        )
        SELECT n AS n_rows,
               round((vx + vy + sqrt(power(vx - vy, 2) + 4 * c * c)) / 2, 6)
                   AS lambda1,
               round((vx + vy - sqrt(power(vx - vy, 2) + 4 * c * c)) / 2, 6)
                   AS lambda2,
               round((vx + vy + sqrt(power(vx - vy, 2) + 4 * c * c))
                     / (2 * (vx + vy)), 6) AS explained_ratio,
               round(degrees(atan2(
                   (vy - vx + sqrt(power(vx - vy, 2) + 4 * c * c)) / 2,
                   c)), 6) AS pc1_angle_deg
        FROM m
    """,
    doc="Closed-form 2-variable PCA of (quantity, price): the 2x2 "
    "covariance eigendecomposition has an exact formula — "
    "lambda = (vx+vy +/- sqrt((vx-vy)^2 + 4c^2))/2, PC1 direction "
    "atan2(lambda1 - vx, c) — so the whole analysis is ONE "
    "streaming-moment aggregation (var/var/cov, map-side "
    "combinable) plus scalar algebra on the summary row: "
    "distributed PCA with zero linear-algebra library, zero "
    "iteration. The k-dim version streams the k x k moment "
    "matrix the same way and solves on the driver "
    "(embed-power-iteration is the large-k iterative sibling). "
    "Explained-variance ratio is the 'is this 2D cloud really "
    "1D' answer.",
    tags=("stats",),
)
def stats_pca_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.var_pop("l_quantity").alias("vx"),
        F.var_pop("l_extendedprice").alias("vy"),
        F.covar_pop("l_quantity", "l_extendedprice").alias("c"),
        F.count("*").cast("long").alias("n"),
    )
    vx, vy, c = F.col("vx"), F.col("vy"), F.col("c")
    disc = F.sqrt(F.pow(vx - vy, 2) + 4 * c * c)
    l1 = (vx + vy + disc) / 2
    l2 = (vx + vy - disc) / 2
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(l1, 6).alias("lambda1"),
        F.round(l2, 6).alias("lambda2"),
        F.round(l1 / (vx + vy), 6).alias("explained_ratio"),
        F.round(F.degrees(F.atan2((vy - vx + disc) / 2, c)), 6).alias(
            "pc1_angle_deg"
        ),
    )


@query(
    "timeseries-ljung-box",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        ctr AS (
            SELECT day, x - avg(x) OVER () AS xc,
                   CAST(count(*) OVER () AS DOUBLE) AS n
            FROM daily
        ),
        lagged AS (
            SELECT n, xc,
                   lag(xc, 1) OVER (ORDER BY day) AS l1,
                   lag(xc, 2) OVER (ORDER BY day) AS l2,
                   lag(xc, 3) OVER (ORDER BY day) AS l3,
                   lag(xc, 4) OVER (ORDER BY day) AS l4,
                   lag(xc, 5) OVER (ORDER BY day) AS l5
            FROM ctr
        ),
        rho AS (
            SELECT max(n) AS n,
                   sum(xc * l1) / sum(xc * xc) AS r1,
                   sum(xc * l2) / sum(xc * xc) AS r2,
                   sum(xc * l3) / sum(xc * xc) AS r3,
                   sum(xc * l4) / sum(xc * xc) AS r4,
                   sum(xc * l5) / sum(xc * xc) AS r5
            FROM lagged
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(r1, 6) AS rho1,
               round(n * (n + 2) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                     + r3 * r3 / (n - 3) + r4 * r4 / (n - 4)
                     + r5 * r5 / (n - 5)), 6) AS ljung_box_q
        FROM rho
    """,
    doc="Ljung-Box portmanteau test (lags 1-5) for autocorrelation in "
    "the daily volume series: Q = n(n+2) * sum_k rho_k^2/(n-k) ~ "
    "chi2(5) under white noise — the residual-whiteness gate after "
    "any forecast fit (run it on timeseries-stl-naive's residuals "
    "to validate the decomposition). All five lag products come "
    "from one shared window sort of the ~30-row mean-centered "
    "daily summary, then a single moment aggregation; "
    "sum(xc*lag_k)/sum(xc^2) is the standard biased ACF estimator "
    "(denominator over the full series) on both engines. Facts "
    "touched once.",
    tags=("timeseries", "stats"),
)
def timeseries_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w_all = Window.partitionBy()
    ctr = daily.select(
        "day",
        (F.col("x") - F.avg("x").over(w_all)).alias("xc"),
        F.count("*").over(w_all).cast("double").alias("n"),
    )
    w = Window.orderBy("day")
    lagged = ctr.select(
        "n",
        "xc",
        *[F.lag("xc", k).over(w).alias(f"l{k}") for k in range(1, 6)],
    )
    denom = F.sum(F.col("xc") * F.col("xc"))
    rho = lagged.agg(
        F.max("n").alias("n"),
        *[
            (F.sum(F.col("xc") * F.col(f"l{k}")) / denom).alias(f"r{k}")
            for k in range(1, 6)
        ],
    )
    n = F.col("n")
    q = n * (n + 2) * sum(
        F.col(f"r{k}") * F.col(f"r{k}") / (n - k) for k in range(1, 6)
    )
    return rho.select(
        n.cast("long").alias("n_days"),
        F.round(F.col("r1"), 6).alias("rho1"),
        F.round(q, 6).alias("ljung_box_q"),
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
    "stats-roc-auc-binned",
    oracle="""
        WITH s AS (
            SELECT value AS score,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        ext AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
        binned AS (
            SELECT least(255, CAST(floor((score - lo) / (hi - lo) * 256.0)
                                   AS INT)) AS bin,
                   CAST(sum(y) AS DOUBLE) AS pos,
                   CAST(sum(1 - y) AS DOUBLE) AS neg
            FROM s, ext GROUP BY 1
        ),
        rates AS (
            SELECT bin,
                   sum(pos) OVER (ORDER BY bin DESC) / sum(pos) OVER ()
                       AS tpr,
                   sum(neg) OVER (ORDER BY bin DESC) / sum(neg) OVER ()
                       AS fpr
            FROM binned
        ),
        curve AS (
            SELECT bin, tpr, fpr,
                   lag(tpr, 1, 0.0) OVER (ORDER BY bin DESC) AS tpr_prev,
                   lag(fpr, 1, 0.0) OVER (ORDER BY bin DESC) AS fpr_prev
            FROM rates
        )
        SELECT CAST(count(*) AS BIGINT) AS n_thresholds,
               round(sum((fpr - fpr_prev) * (tpr + tpr_prev) / 2), 6)
                   AS roc_auc
        FROM curve
    """,
    doc="Binned ROC-AUC for `value` as a purchase classifier score: "
    "descending-threshold sweep over 256 equi-width score bins "
    "(the distributed-safe ROC — exact AUC needs a global rank of "
    "raw scores, i.e. the single-partition sort every rank "
    "statistic here refuses), cumulative TPR/FPR per threshold "
    "via windows over the 256-row bin summary, area by the "
    "trapezoid rule. The binned estimate converges to exact AUC "
    "at bin-width resolution — the same tradeoff "
    "stats-ks-binned makes, and exactly how Spark MLlib's "
    "BinaryClassificationMetrics(numBins) works. One fact hash "
    "agg after a broadcast min/max pre-pass.",
    tags=("stats",),
)
def stats_roc_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    ext = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = (
        s.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("score") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 256.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(
            F.sum("y").cast("double").alias("pos"),
            F.sum(1 - F.col("y")).cast("double").alias("neg"),
        )
    )
    w_desc = Window.orderBy(F.col("bin").desc())
    w_all = Window.partitionBy()
    curve = binned.select(
        "bin",
        (F.sum("pos").over(w_desc) / F.sum("pos").over(w_all)).alias("tpr"),
        (F.sum("neg").over(w_desc) / F.sum("neg").over(w_all)).alias("fpr"),
    ).select(
        "bin",
        "tpr",
        "fpr",
        F.lag("tpr", 1, 0.0).over(w_desc).alias("tpr_prev"),
        F.lag("fpr", 1, 0.0).over(w_desc).alias("fpr_prev"),
    )
    return curve.agg(
        F.count("*").cast("long").alias("n_thresholds"),
        F.round(
            F.sum(
                (F.col("fpr") - F.col("fpr_prev"))
                * (F.col("tpr") + F.col("tpr_prev"))
                / 2
            ),
            6,
        ).alias("roc_auc"),
    )


@query(
    "stats-calibration-curve",
    oracle="""
        WITH s AS (
            SELECT value AS score,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        ext AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
        scaled AS (
            SELECT (score - lo) / (hi - lo) AS conf, y FROM s, ext
        ),
        bins AS (
            SELECT least(9, CAST(floor(conf * 10) AS INT)) AS bin,
                   avg(conf) AS mean_conf,
                   avg(CAST(y AS DOUBLE)) AS obs_rate,
                   CAST(count(*) AS DOUBLE) AS n
            FROM scaled GROUP BY 1
        )
        , tot AS (SELECT sum(n) AS tn FROM bins)
        SELECT CAST(bin AS BIGINT) AS bin,
               round(mean_conf, 6) AS mean_confidence,
               round(obs_rate, 6) AS observed_rate,
               CAST(n AS BIGINT) AS n,
               round(sum(abs(obs_rate - mean_conf) * n / tn) OVER (), 6)
                   AS ece
        FROM bins, tot ORDER BY bin
    """,
    doc="Reliability diagram + expected calibration error, treating "
    "min-max-scaled `value` as a purchase-probability prediction: "
    "10 confidence bins, each reporting mean predicted confidence "
    "vs observed positive rate, with ECE = sum(|obs - conf| * "
    "n_b/n) repeated on every row via a window over the 10-bin "
    "summary (so the single-number verdict and the curve travel "
    "together). The is-my-model-honest check that AUC cannot "
    "answer — a perfectly-ranked model can still be badly "
    "calibrated. One broadcast min/max pre-pass + one hash agg; "
    "at 100 TB identical, ECE is algebra over 10 rows.",
    tags=("stats",),
)
def stats_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    ext = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    scaled = s.crossJoin(F.broadcast(ext)).select(
        (
            (F.col("score") - F.col("lo")) / (F.col("hi") - F.col("lo"))
        ).alias("conf"),
        "y",
    )
    bins = scaled.groupBy(
        F.least(F.lit(9), F.floor(F.col("conf") * 10).cast("int")).alias(
            "bin"
        )
    ).agg(
        F.avg("conf").alias("mean_conf"),
        F.avg(F.col("y").cast("double")).alias("obs_rate"),
        F.count("*").cast("double").alias("n"),
    )
    w_all = Window.partitionBy()
    with_tot = bins.withColumn("tn", F.sum("n").over(w_all))
    return with_tot.select(
        F.col("bin").cast("long").alias("bin"),
        F.round("mean_conf", 6).alias("mean_confidence"),
        F.round("obs_rate", 6).alias("observed_rate"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.sum(
                F.abs(F.col("obs_rate") - F.col("mean_conf"))
                * F.col("n")
                / F.col("tn")
            ).over(w_all),
            6,
        ).alias("ece"),
    ).orderBy("bin")


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
    "stats-eb-shrinkage",
    oracle="""
        WITH rates AS (
            SELECT c.c_nationkey,
                   CAST(sum(CASE WHEN o.o_orderstatus = 'F'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS conv,
                   CAST(count(*) AS DOUBLE) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        ),
        mom AS (
            SELECT avg(conv / n) AS mu, var_samp(conv / n) AS v,
                   avg(n) AS nbar
            FROM rates
        ),
        prior AS (
            SELECT mu,
                   mu * (mu * (1 - mu) / v - 1) AS alpha,
                   (1 - mu) * (mu * (1 - mu) / v - 1) AS beta
            FROM mom
        )
        SELECT r.c_nationkey,
               CAST(r.n AS BIGINT) AS n_orders,
               round(r.conv / r.n, 6) AS raw_rate,
               round((r.conv + p.alpha) / (r.n + p.alpha + p.beta), 6)
                   AS shrunk_rate,
               round(p.mu, 6) AS prior_mean
        FROM rates r, prior p
        ORDER BY r.c_nationkey
    """,
    doc="Empirical-Bayes beta-binomial shrinkage of per-nation "
    "order-completion rates: method-of-moments fits the Beta prior "
    "from the BETWEEN-nation rate distribution (alpha+beta = "
    "mu(1-mu)/var - 1), then every nation's raw rate shrinks "
    "toward the prior mean by exactly as much as its sample size "
    "fails to earn — small nations move a lot, big ones barely. "
    "The fix for 'tiny segment tops the leaderboard' in every "
    "rate ranking. One fact join+agg to the 25-nation summary, "
    "one moment aggregation, one broadcast prior join: the "
    "borrowing-strength pattern at any scale.",
    tags=("stats",),
)
def stats_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rates = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("double")
            .alias("conv"),
            F.count("*").cast("double").alias("n"),
        )
    )
    r = F.col("conv") / F.col("n")
    mom = rates.agg(
        F.avg(r).alias("mu"), F.var_samp(r).alias("v")
    )
    strength = F.col("mu") * (1 - F.col("mu")) / F.col("v") - 1
    prior = mom.select(
        "mu",
        (F.col("mu") * strength).alias("alpha"),
        ((1 - F.col("mu")) * strength).alias("beta"),
    )
    return (
        rates.crossJoin(F.broadcast(prior))
        .select(
            "c_nationkey",
            F.col("n").cast("long").alias("n_orders"),
            F.round(r, 6).alias("raw_rate"),
            F.round(
                (F.col("conv") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("shrunk_rate"),
            F.round("mu", 6).alias("prior_mean"),
        )
        .orderBy("c_nationkey")
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
    "stats-durbin-watson",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT y, CAST(row_number() OVER (ORDER BY day) AS DOUBLE)
                       AS t, day
            FROM daily
        ),
        fit AS (
            SELECT (sum(t * y) - sum(t) * sum(y) / count(*))
                   / (sum(t * t) - sum(t) * sum(t) / count(*)) AS b,
                   avg(y) AS my, avg(t) AS mt
            FROM idx
        ),
        resid AS (
            SELECT i.day, i.y - (f.my + f.b * (i.t - f.mt)) AS r
            FROM idx i, fit f
        ),
        seq AS (
            SELECT r, lag(r) OVER (ORDER BY day) AS rp FROM resid
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(sum(CASE WHEN rp IS NOT NULL
                              THEN power(r - rp, 2) ELSE 0 END)
                     / sum(r * r), 6) AS durbin_watson
        FROM seq
    """,
    doc="Durbin-Watson test for serial correlation in the residuals "
    "of a linear trend fit to daily mean value: DW = "
    "sum((r_t - r_(t-1))^2) / sum(r_t^2), ~2 when residuals are "
    "independent, ->0 under positive autocorrelation (meaning "
    "the trend-line's standard errors are lies — THE check "
    "before trusting any regression on a time series). The OLS "
    "slope comes from the closed-form moment aggregation "
    "(timeseries-granger-1lag's pattern, k=1), residuals from a "
    "broadcast of the 1-row fit, DW from one lag window over "
    "the ~30-row summary. Facts aggregated exactly once.",
    tags=("stats", "timeseries"),
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("y")
    )
    idx = daily.select(
        "day",
        "y",
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
    )
    n = F.count("*")
    b = (F.sum(F.col("t") * F.col("y")) - F.sum("t") * F.sum("y") / n) / (
        F.sum(F.col("t") * F.col("t")) - F.sum("t") * F.sum("t") / n
    )
    fit = idx.agg(
        b.alias("b"), F.avg("y").alias("my"), F.avg("t").alias("mt")
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "day",
        (
            F.col("y")
            - (F.col("my") + F.col("b") * (F.col("t") - F.col("mt")))
        ).alias("r"),
    )
    seq = resid.select(
        "r", F.lag("r").over(Window.orderBy("day")).alias("rp")
    )
    return seq.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum(
                F.when(
                    F.col("rp").isNotNull(),
                    F.pow(F.col("r") - F.col("rp"), 2),
                ).otherwise(0.0)
            )
            / F.sum(F.col("r") * F.col("r")),
            6,
        ).alias("durbin_watson"),
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
    "stats-partial-corr",
    oracle="""
        WITH m AS (
            SELECT corr(l_quantity, l_extendedprice) AS rxy,
                   corr(l_quantity, l_discount) AS rxz,
                   corr(l_extendedprice, l_discount) AS ryz,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
        )
        SELECT n AS n_rows,
               round(rxy, 6) AS corr_qty_price,
               round((rxy - rxz * ryz)
                     / (sqrt(1 - rxz * rxz) * sqrt(1 - ryz * ryz)), 6)
                   AS partial_corr_given_discount
        FROM m
    """,
    doc="First-order partial correlation of quantity and price "
    "CONTROLLING for discount: r_xy.z = (r_xy - r_xz*r_yz) / "
    "sqrt((1-r_xz^2)(1-r_yz^2)) — does the quantity-price "
    "relationship survive once the shared driver is removed, the "
    "one-line confounder check that separates 'correlated' from "
    "'correlated only through z'. All three pairwise "
    "correlations accumulate side by side in ONE streaming-"
    "moment scan (the agg-corr-matrix fused-scan shape), and "
    "the partial is scalar algebra on the summary row. The "
    "k-confounder generalization inverts the k x k correlation "
    "matrix driver-side from the same one-pass moments.",
    tags=("stats",),
)
def stats_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("rxy"),
        F.corr("l_quantity", "l_discount").alias("rxz"),
        F.corr("l_extendedprice", "l_discount").alias("ryz"),
        F.count("*").cast("long").alias("n"),
    )
    rxy, rxz, ryz = F.col("rxy"), F.col("rxz"), F.col("ryz")
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(rxy, 6).alias("corr_qty_price"),
        F.round(
            (rxy - rxz * ryz)
            / (F.sqrt(1 - rxz * rxz) * F.sqrt(1 - ryz * ryz)),
            6,
        ).alias("partial_corr_given_discount"),
    )


@query(
    "stats-sign-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS x,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS y
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY CAST(ts AS DATE)
            HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
               AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0
        ),
        s AS (
            SELECT CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END) AS DOUBLE)
                       AS plus,
                   CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END) AS DOUBLE)
                       AS minus
            FROM daily
        )
        SELECT CAST(plus AS BIGINT) AS days_click_higher,
               CAST(minus AS BIGINT) AS days_view_higher,
               round((plus - (plus + minus) / 2)
                     / sqrt((plus + minus) / 4), 6) AS sign_z
        FROM s
    """,
    doc="Paired sign test: on how many days does the click mean exceed "
    "the view mean, z-scored against the fair-coin null "
    "(median difference = 0)? The assumption-free-est paired test "
    "there is — no normality, no symmetry, just exchangeability — "
    "and the right first look when stats-welch-ttest's variance "
    "assumptions are suspect. Pairing by day happens in the one "
    "conditional daily hash agg (complete days only, ties drop "
    "out as neither plus nor minus); the binomial z is algebra on "
    "a 1-row summary. Wilcoxon signed-rank is the power upgrade "
    "— rank over the same ~30-row summary if needed.",
    tags=("stats",),
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(click).alias("x"),
            F.avg(view).alias("y"),
            F.count(click).alias("nx"),
            F.count(view).alias("ny"),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
    )
    s = daily.agg(
        F.sum(F.when(F.col("x") > F.col("y"), 1).otherwise(0))
        .cast("double")
        .alias("plus"),
        F.sum(F.when(F.col("x") < F.col("y"), 1).otherwise(0))
        .cast("double")
        .alias("minus"),
    )
    plus, minus = F.col("plus"), F.col("minus")
    return s.select(
        plus.cast("long").alias("days_click_higher"),
        minus.cast("long").alias("days_view_higher"),
        F.round(
            (plus - (plus + minus) / 2) / F.sqrt((plus + minus) / 4), 6
        ).alias("sign_z"),
    )


@query(
    "stats-cochran-q",
    oracle="""
        WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        flags AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' AND
                            CAST(ts AS DATE) BETWEEN d0 AND
                                d0 + INTERVAL 6 DAY
                            THEN 1 ELSE 0 END) AS w1,
                   max(CASE WHEN event_type = 'purchase' AND
                            CAST(ts AS DATE) BETWEEN d0 + INTERVAL 7 DAY
                                AND d0 + INTERVAL 13 DAY
                            THEN 1 ELSE 0 END) AS w2,
                   max(CASE WHEN event_type = 'purchase' AND
                            CAST(ts AS DATE) BETWEEN d0 + INTERVAL 14 DAY
                                AND d0 + INTERVAL 20 DAY
                            THEN 1 ELSE 0 END) AS w3
            FROM events, span GROUP BY user_id
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(w1) AS DOUBLE) AS c1,
                   CAST(sum(w2) AS DOUBLE) AS c2,
                   CAST(sum(w3) AS DOUBLE) AS c3,
                   CAST(sum(w1 + w2 + w3) AS DOUBLE) AS sr,
                   CAST(sum(power(w1 + w2 + w3, 2)) AS DOUBLE) AS sr2
            FROM flags
        )
        SELECT n AS n_users,
               CAST(c1 AS BIGINT) AS week1_purchasers,
               CAST(c2 AS BIGINT) AS week2_purchasers,
               CAST(c3 AS BIGINT) AS week3_purchasers,
               round(3 * 2 * (power(c1 - sr / 3, 2) + power(c2 - sr / 3, 2)
                              + power(c3 - sr / 3, 2))
                     / (3 * sr - sr2), 6) AS cochran_q
        FROM s
    """,
    doc="Cochran's Q test — the k-treatment generalization of "
    "stats-mcnemar: did the same users' weekly purchase incidence "
    "change across three weeks? Q = k(k-1) * sum_j(C_j - "
    "Cbar)^2 / (k*sum(R_i) - sum(R_i^2)) ~ chi2(k-1), where "
    "column totals C_j and per-user row totals R_i both fall out "
    "of ONE conditional per-user aggregation (the paired "
    "structure — each user is their own control — costs nothing "
    "extra in the plan). Under k=2 this algebraically reduces to "
    "McNemar without the continuity correction; the parity check "
    "pins all the intermediate column totals so a regression in "
    "the window logic can't hide in the final scalar.",
    tags=("stats",),
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    evd = ev.crossJoin(F.broadcast(span)).select(
        "user_id", "event_type", F.to_date("ts").alias("day"), "d0"
    )
    purch = F.col("event_type") == "purchase"

    def wk(lo: int, hi: int):
        return F.max(
            F.when(
                purch
                & (F.col("day") >= F.date_add(F.col("d0"), lo))
                & (F.col("day") <= F.date_add(F.col("d0"), hi)),
                1,
            ).otherwise(0)
        )

    flags = evd.groupBy("user_id").agg(
        wk(0, 6).alias("w1"), wk(7, 13).alias("w2"), wk(14, 20).alias("w3")
    )
    r = F.col("w1") + F.col("w2") + F.col("w3")
    s = flags.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("w1").cast("double").alias("c1"),
        F.sum("w2").cast("double").alias("c2"),
        F.sum("w3").cast("double").alias("c3"),
        F.sum(r).cast("double").alias("sr"),
        F.sum(F.pow(r, 2)).cast("double").alias("sr2"),
    )
    c1, c2, c3 = F.col("c1"), F.col("c2"), F.col("c3")
    sr, sr2 = F.col("sr"), F.col("sr2")
    cbar = sr / 3
    q = (
        3
        * 2
        * (F.pow(c1 - cbar, 2) + F.pow(c2 - cbar, 2) + F.pow(c3 - cbar, 2))
        / (3 * sr - sr2)
    )
    return s.select(
        F.col("n").alias("n_users"),
        c1.cast("long").alias("week1_purchasers"),
        c2.cast("long").alias("week2_purchasers"),
        c3.cast("long").alias("week3_purchasers"),
        F.round(q, 6).alias("cochran_q"),
    )


@query(
    "stats-breusch-pagan",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT y, CAST(row_number() OVER (ORDER BY day) AS DOUBLE) AS t
            FROM daily
        ),
        fit AS (
            SELECT (sum(t * y) - sum(t) * sum(y) / count(*))
                   / (sum(t * t) - sum(t) * sum(t) / count(*)) AS b,
                   avg(y) AS my, avg(t) AS mt
            FROM idx
        ),
        r2aux AS (
            SELECT count(*) AS n,
                   power(corr(power(i.y - (f.my + f.b * (i.t - f.mt)), 2),
                              i.t), 2) AS r2
            FROM idx i, fit f
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(r2, 6) AS aux_r2,
               round(n * r2, 6) AS breusch_pagan_lm
        FROM r2aux
    """,
    doc="Breusch-Pagan heteroskedasticity test on the daily-mean "
    "trend fit: regress SQUARED residuals on time — for one "
    "regressor the auxiliary R^2 is just corr(e^2, t)^2 — and "
    "LM = n*R^2 ~ chi2(1) under constant variance. Fanning "
    "residuals mean the trend's confidence bands are wrong in "
    "opposite directions at the two ends, the partner pathology "
    "to the serial correlation stats-durbin-watson catches on "
    "the same fit. Same closed-form-OLS + broadcast-fit "
    "pipeline; the extra test costs one more moment "
    "aggregation over the ~30-row summary.",
    tags=("stats", "timeseries"),
)
def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("y")
    )
    idx = daily.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
    )
    n = F.count("*")
    b = (F.sum(F.col("t") * F.col("y")) - F.sum("t") * F.sum("y") / n) / (
        F.sum(F.col("t") * F.col("t")) - F.sum("t") * F.sum("t") / n
    )
    fit = idx.agg(
        b.alias("b"), F.avg("y").alias("my"), F.avg("t").alias("mt")
    )
    joined = idx.crossJoin(F.broadcast(fit))
    e2 = F.pow(
        F.col("y") - (F.col("my") + F.col("b") * (F.col("t") - F.col("mt"))),
        2,
    )
    r2aux = joined.agg(
        F.count("*").alias("n"),
        F.pow(F.corr(e2, F.col("t")), 2).alias("r2"),
    )
    return r2aux.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("r2", 6).alias("aux_r2"),
        F.round(F.col("n") * F.col("r2"), 6).alias("breusch_pagan_lm"),
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
    "stats-wilcoxon-signed-rank",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END)
                   - avg(CASE WHEN event_type = 'view' THEN value END)
                       AS d
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY CAST(ts AS DATE)
            HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
               AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0
        ),
        ranked AS (
            SELECT d,
                   CAST(row_number() OVER (ORDER BY abs(d), day)
                        AS DOUBLE) AS r
            FROM daily WHERE d <> 0
        ),
        s AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS w_plus
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(w_plus, 2) AS w_plus,
               round((w_plus - n * (n + 1) / 4)
                     / sqrt(n * (n + 1) * (2 * n + 1) / 24), 6)
                   AS wilcoxon_z
        FROM s
    """,
    doc="Wilcoxon signed-rank test on daily click-minus-view mean "
    "differences: |d| is ranked (over the ~30-row daily summary "
    "ONLY — rank the aggregate, the house discipline), W+ sums "
    "the ranks of positive differences, and the normal "
    "approximation z = (W+ - n(n+1)/4)/sqrt(n(n+1)(2n+1)/24) "
    "judges symmetry around zero. Strictly more powerful than "
    "stats-sign-test (which ignores magnitudes) while still "
    "normality-free — the standard escalation path when a paired "
    "design needs more sensitivity. Zero differences drop per "
    "the classic treatment; continuous daily means make "
    "|d|-ties measure-zero, so the deterministic (|d|, day) "
    "tie-break changes nothing statistically but keeps both "
    "engines bit-identical.",
    tags=("stats",),
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (F.avg(click) - F.avg(view)).alias("d"),
            F.count(click).alias("nx"),
            F.count(view).alias("ny"),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
    )
    ranked = daily.filter(F.col("d") != 0).select(
        "d",
        F.row_number()
        .over(Window.orderBy(F.abs("d"), "day"))
        .cast("double")
        .alias("r"),
    )
    s = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r")).otherwise(0.0)).alias(
            "w_plus"
        ),
    )
    n, wp = F.col("n"), F.col("w_plus")
    return s.select(
        n.cast("long").alias("n_days"),
        F.round(wp, 2).alias("w_plus"),
        F.round(
            (wp - n * (n + 1) / 4)
            / F.sqrt(n * (n + 1) * (2 * n + 1) / 24),
            6,
        ).alias("wilcoxon_z"),
    )


@query(
    "stats-holm-bonferroni",
    oracle="""
        WITH grand AS (
            SELECT avg(value) AS gm, var_samp(value) AS gv FROM events
        ),
        g AS (
            SELECT event_type, count(*) AS n, avg(value) AS m
            FROM events GROUP BY event_type
        ),
        tests AS (
            SELECT event_type,
                   exp(-power(abs(m - gm) / sqrt(gv / n), 2) / 2) AS p
            FROM g, grand
        ),
        ranked AS (
            SELECT event_type, p,
                   row_number() OVER (ORDER BY p, event_type) AS k,
                   count(*) OVER () AS m_tests
            FROM tests
        ),
        flagged AS (
            SELECT *,
                   min(CASE WHEN p > 0.05 / (m_tests - k + 1)
                            THEN k ELSE m_tests + 1 END)
                       OVER () AS first_fail
            FROM ranked
        )
        SELECT event_type, round(p, 6) AS p,
               CAST(k AS BIGINT) AS k,
               round(0.05 / (m_tests - k + 1), 6) AS holm_threshold,
               k < first_fail AS rejected
        FROM flagged ORDER BY k
    """,
    doc="Holm-Bonferroni step-DOWN multiple-testing correction over "
    "the same per-segment test family as stats-benjamini-hochberg "
    "(deliberately paired: BH steps UP controlling FDR, Holm "
    "steps DOWN controlling family-wise error — strictly fewer "
    "rejections, zero false-positive tolerance): sort p "
    "ascending, compare p_(k) to alpha/(m-k+1), reject "
    "everything BEFORE the first failure (a min over the ranked "
    "summary — once one test fails, all later ones fail by "
    "construction). Same one-fact-pass shape: the whole "
    "correction runs on the 5-row test summary.",
    tags=("stats",),
)
def stats_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grand = ev.agg(
        F.avg("value").alias("gm"), F.var_samp("value").alias("gv")
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.avg("value").alias("m")
    )
    z = F.abs(F.col("m") - F.col("gm")) / F.sqrt(F.col("gv") / F.col("n"))
    tests = g.crossJoin(F.broadcast(grand)).select(
        "event_type", F.exp(-F.pow(z, 2) / 2).alias("p")
    )
    w_all = Window.partitionBy()
    ranked = tests.select(
        "event_type",
        "p",
        F.row_number().over(Window.orderBy("p", "event_type")).alias("k"),
        F.count("*").over(w_all).alias("m_tests"),
    )
    thresh = 0.05 / (F.col("m_tests") - F.col("k") + 1)
    first_fail = ranked.withColumn(
        "fail_k",
        F.when(F.col("p") > thresh, F.col("k")).otherwise(
            F.col("m_tests") + 1
        ),
    ).withColumn("first_fail", F.min("fail_k").over(w_all))
    return first_fail.select(
        "event_type",
        F.round("p", 6).alias("p"),
        F.col("k").cast("long").alias("k"),
        F.round(thresh, 6).alias("holm_threshold"),
        (F.col("k") < F.col("first_fail")).alias("rejected"),
    ).orderBy("k")


@query(
    "stats-tost-equivalence",
    oracle="""
        WITH g AS (
            SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS n1,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS n2,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS m1,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS m2,
                   var_samp(CASE WHEN event_type = 'click' THEN value END)
                       AS v1,
                   var_samp(CASE WHEN event_type = 'view' THEN value END)
                       AS v2
            FROM events WHERE event_type IN ('click', 'view')
        )
        SELECT round(m1 - m2, 6) AS mean_diff,
               round((m1 - m2 + 5.0) / sqrt(v1 / n1 + v2 / n2), 6)
                   AS t_lower,
               round((m1 - m2 - 5.0) / sqrt(v1 / n1 + v2 / n2), 6)
                   AS t_upper,
               ((m1 - m2 + 5.0) / sqrt(v1 / n1 + v2 / n2) > 1.644854
                AND (m1 - m2 - 5.0) / sqrt(v1 / n1 + v2 / n2) < -1.644854)
                   AS equivalent
        FROM g
    """,
    doc="TOST equivalence test (two one-sided tests, margin +/-5.0): "
    "rejects BOTH 'diff <= -delta' AND 'diff >= +delta' to "
    "positively conclude the click and view means are "
    "equivalent — the statistically honest way to claim 'no "
    "difference', which a non-significant Welch t (stats-welch-"
    "ttest on the same summary) can never do. Both one-sided t "
    "statistics come from the IDENTICAL single conditional-"
    "aggregate scan; the 1.645 threshold is the one-sided "
    "alpha=5% normal quantile literal. The do-no-harm launch "
    "gate: ship when equivalent=true, not when p>0.05.",
    tags=("stats",),
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    g = ev.agg(
        F.count(click).alias("n1"),
        F.count(view).alias("n2"),
        F.avg(click).alias("m1"),
        F.avg(view).alias("m2"),
        F.var_samp(click).alias("v1"),
        F.var_samp(view).alias("v2"),
    )
    se = F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2"))
    diff = F.col("m1") - F.col("m2")
    t_lo = (diff + 5.0) / se
    t_hi = (diff - 5.0) / se
    return g.select(
        F.round(diff, 6).alias("mean_diff"),
        F.round(t_lo, 6).alias("t_lower"),
        F.round(t_hi, 6).alias("t_upper"),
        ((t_lo > 1.644854) & (t_hi < -1.644854)).alias("equivalent"),
    )


@query(
    "stats-cuped-adjustment",
    oracle="""
        WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        per_user AS (
            SELECT user_id,
                   avg(CASE WHEN CAST(ts AS DATE) < d0 + INTERVAL 14 DAY
                            THEN value END) AS x_pre,
                   avg(CASE WHEN CAST(ts AS DATE) >= d0 + INTERVAL 14 DAY
                            THEN value END) AS y_post
            FROM events, span GROUP BY user_id
        ),
        cc AS (
            SELECT x_pre, y_post FROM per_user
            WHERE x_pre IS NOT NULL AND y_post IS NOT NULL
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   covar_samp(y_post, x_pre) / var_samp(x_pre) AS theta,
                   var_samp(y_post) AS vy,
                   power(corr(y_post, x_pre), 2) AS rho2
            FROM cc
        )
        SELECT n AS n_users,
               round(theta, 6) AS theta,
               round(vy, 6) AS var_raw,
               round(vy * (1 - rho2), 6) AS var_cuped,
               round(rho2, 6) AS variance_reduction
        FROM m
    """,
    doc="CUPED (controlled-experiment using pre-experiment data) "
    "variance reduction: each user's pre-period mean value is the "
    "covariate, theta = cov(Y,X)/var(X) is the optimal adjustment "
    "coefficient, and the adjusted metric Y - theta*(X - mean(X)) "
    "has variance var(Y)*(1 - rho^2) — every percentage point of "
    "rho^2 is experiment runtime you don't need. The single most "
    "valuable trick in large-scale experimentation, and it is "
    "ONE conditional per-user aggregation plus ONE moment "
    "aggregation (cov/var/corr accumulate together, map-side "
    "combinable) — complete-case users only, since first-session "
    "users have no pre-period. Pairs with stats-delta-method-ci "
    "(ratio metrics) and stats-srm-check (validity) as the "
    "experimentation readout stack.",
    tags=("stats",),
)
def stats_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cutoff = F.date_add(F.col("d0"), 14)
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.avg(
                F.when(F.to_date("ts") < cutoff, F.col("value"))
            ).alias("x_pre"),
            F.avg(
                F.when(F.to_date("ts") >= cutoff, F.col("value"))
            ).alias("y_post"),
        )
    )
    cc = per_user.filter(
        F.col("x_pre").isNotNull() & F.col("y_post").isNotNull()
    )
    m = cc.agg(
        F.count("*").cast("long").alias("n"),
        (
            F.covar_samp("y_post", "x_pre") / F.var_samp("x_pre")
        ).alias("theta"),
        F.var_samp("y_post").alias("vy"),
        F.pow(F.corr("y_post", "x_pre"), 2).alias("rho2"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.round("theta", 6).alias("theta"),
        F.round("vy", 6).alias("var_raw"),
        F.round(F.col("vy") * (1 - F.col("rho2")), 6).alias("var_cuped"),
        F.round("rho2", 6).alias("variance_reduction"),
    )


@query(
    "stats-meta-analysis",
    oracle="""
        WITH seg AS (
            SELECT (isodow(CAST(ts AS DATE)) - 1) % 7 AS dow,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS n1,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS n2,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS m1,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS m2,
                   var_samp(CASE WHEN event_type = 'click' THEN value END)
                       AS v1,
                   var_samp(CASE WHEN event_type = 'view' THEN value END)
                       AS v2
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY 1
        ),
        effects AS (
            SELECT dow, m1 - m2 AS d,
                   v1 / n1 + v2 / n2 AS var_d
            FROM seg WHERE n1 > 1 AND n2 > 1
        ),
        pooled AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   sum(d / var_d) / sum(1 / var_d) AS d_pooled,
                   1 / sum(1 / var_d) AS var_pooled,
                   sum(power(d, 2) / var_d)
                   - power(sum(d / var_d), 2) / sum(1 / var_d) AS q
            FROM effects
        )
        SELECT k AS n_strata,
               round(d_pooled, 6) AS pooled_effect,
               round(sqrt(var_pooled), 6) AS pooled_se,
               round(q, 6) AS cochran_q_het,
               round(greatest(0, (q - (k - 1)) / q), 6) AS i_squared
        FROM pooled
    """,
    doc="Fixed-effect (inverse-variance) meta-analysis pooling the "
    "click-vs-view mean difference across day-of-week strata: "
    "pooled effect = sum(d_i/v_i)/sum(1/v_i), its SE, Cochran's Q "
    "heterogeneity statistic, and I^2 = (Q-(k-1))/Q — the fraction "
    "of between-stratum variance that is real signal rather than "
    "noise (high I^2 says one pooled number is hiding "
    "effect-modification and a random-effects model or per-"
    "stratum report is owed). ONE conditional hash agg builds "
    "every stratum's moments; the pooling identities, including "
    "Q in its computational one-pass form, reduce the 7-row "
    "summary. The pattern for combining per-region/per-platform "
    "experiment readouts at fleet scale.",
    tags=("stats",),
)
def stats_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    seg = ev.groupBy(F.weekday(F.to_date("ts")).alias("dow")).agg(
        F.count(click).alias("n1"),
        F.count(view).alias("n2"),
        F.avg(click).alias("m1"),
        F.avg(view).alias("m2"),
        F.var_samp(click).alias("v1"),
        F.var_samp(view).alias("v2"),
    )
    effects = seg.filter((F.col("n1") > 1) & (F.col("n2") > 1)).select(
        (F.col("m1") - F.col("m2")).alias("d"),
        (F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")).alias(
            "var_d"
        ),
    )
    k = F.count("*")
    w_sum = F.sum(1 / F.col("var_d"))
    dw_sum = F.sum(F.col("d") / F.col("var_d"))
    q = F.sum(F.pow(F.col("d"), 2) / F.col("var_d")) - F.pow(dw_sum, 2) / w_sum
    pooled = effects.agg(
        k.cast("long").alias("k"),
        (dw_sum / w_sum).alias("d_pooled"),
        (1 / w_sum).alias("var_pooled"),
        q.alias("q"),
    )
    return pooled.select(
        F.col("k").alias("n_strata"),
        F.round("d_pooled", 6).alias("pooled_effect"),
        F.round(F.sqrt("var_pooled"), 6).alias("pooled_se"),
        F.round("q", 6).alias("cochran_q_het"),
        F.round(
            F.greatest(
                F.lit(0.0), (F.col("q") - (F.col("k") - 1)) / F.col("q")
            ),
            6,
        ).alias("i_squared"),
    )


@query(
    "stats-cmh-pooled-or",
    oracle="""
        WITH counts AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS k
            FROM events GROUP BY user_id
        ),
        thr AS (SELECT avg(k) AS kbar FROM counts),
        strata AS (
            SELECT user_id,
                   CAST(user_id % 5 AS BIGINT) AS stratum,
                   user_id % 2 = 0 AS treated,
                   CASE WHEN k > kbar THEN 1 ELSE 0 END AS converted
            FROM counts, thr
        ),
        cells AS (
            SELECT stratum,
                   CAST(sum(CASE WHEN treated AND converted = 1
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS a,
                   CAST(sum(CASE WHEN treated AND converted = 0
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS b,
                   CAST(sum(CASE WHEN NOT treated AND converted = 1
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS c,
                   CAST(sum(CASE WHEN NOT treated AND converted = 0
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS d,
                   CAST(count(*) AS DOUBLE) AS n
            FROM strata GROUP BY stratum
        )
        SELECT CAST(count(*) AS BIGINT) AS n_strata,
               round(sum(a * d / n) / sum(b * c / n), 6) AS cmh_odds_ratio,
               round(sum(a), 0) AS treated_converters,
               round(sum(c), 0) AS control_converters
        FROM cells
    """,
    doc="Cochran-Mantel-Haenszel pooled odds ratio: the treatment-vs-"
    "conversion odds ratio POOLED ACROSS STRATA as OR_cmh = "
    "sum(a_i*d_i/n_i) / sum(b_i*c_i/n_i) — the confounder-"
    "adjusted upgrade of stats-odds-ratio (a crude 2x2 collapsed "
    "over heterogeneous strata can reverse sign: Simpson's "
    "paradox; CMH can't). Converted = above-average purchase count (a median-split-style "
    "outcome that stays non-degenerate at every SF); strata are "
    "deterministic user buckets standing in for the covariate bands a real analysis "
    "would stratify on. One per-user conditional agg, one "
    "per-stratum cell agg (5x4 summary), one pooling reduce — "
    "the entire adjusted analysis is three map-side-combinable "
    "aggregations.",
    tags=("stats",),
)
def stats_cmh_pooled_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k")
    )
    thr = counts.agg(F.avg("k").alias("kbar"))
    strata = counts.crossJoin(F.broadcast(thr)).select(
        (F.col("user_id") % 5).cast("long").alias("stratum"),
        (F.col("user_id") % 2 == 0).alias("treated"),
        F.when(F.col("k") > F.col("kbar"), 1).otherwise(0).alias("converted"),
    )
    t, cv = F.col("treated"), F.col("converted")
    cells = strata.groupBy("stratum").agg(
        F.sum(F.when(t & (cv == 1), 1).otherwise(0)).cast("double").alias("a"),
        F.sum(F.when(t & (cv == 0), 1).otherwise(0)).cast("double").alias("b"),
        F.sum(F.when(~t & (cv == 1), 1).otherwise(0)).cast("double").alias("c"),
        F.sum(F.when(~t & (cv == 0), 1).otherwise(0)).cast("double").alias("d"),
        F.count("*").cast("double").alias("n"),
    )
    return cells.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.round(
            F.sum(F.col("a") * F.col("d") / F.col("n"))
            / F.sum(F.col("b") * F.col("c") / F.col("n")),
            6,
        ).alias("cmh_odds_ratio"),
        F.round(F.sum("a"), 0).alias("treated_converters"),
        F.round(F.sum("c"), 0).alias("control_converters"),
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
    "stats-var-backtest",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        rets AS (
            SELECT day, ln(rev / lag(rev) OVER (ORDER BY day)) AS r
            FROM daily
        ),
        var_ AS (
            SELECT quantile_cont(r, 0.05) AS var05 FROM rets
            WHERE r IS NOT NULL
        ),
        viol AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CASE WHEN r < var05 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS x
            FROM rets, var_ WHERE r IS NOT NULL
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST(x AS BIGINT) AS n_violations,
               round(x / n, 6) AS violation_rate,
               round(-2 * ((n - x) * ln(0.95) + x * ln(0.05)
                           - (n - x) * ln(1 - x / n) - x * ln(x / n)),
                     6) AS kupiec_lr
        FROM viol WHERE x > 0 AND x < n
    """,
    doc="Value-at-Risk backtest on daily revenue log-changes: the "
    "empirical 5% VaR (exact interpolated quantile; the t-digest "
    "sketch at 100 TB), violation counting, and the Kupiec "
    "proportion-of-failures likelihood ratio -2*ln[L(p0)/L(p-"
    "hat)] ~ chi2(1) — does the model's claimed 5% tail actually "
    "fire 5% of the time? In-sample here (the quantile and the "
    "violations share the window) which biases the LR low; the "
    "production variant computes VaR on a trailing window and "
    "tests out-of-sample — same plan plus one lag. The "
    "risk-engine counterpart of stats-calibration-curve: both "
    "ask 'are your claimed probabilities real'.",
    tags=("stats", "timeseries"),
)
def stats_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    rets = daily.select(
        "day",
        F.log(F.col("rev") / F.lag("rev").over(Window.orderBy("day"))).alias(
            "r"
        ),
    ).filter(F.col("r").isNotNull())
    var_ = rets.agg(F.expr("percentile(r, 0.05)").alias("var05"))
    viol = rets.crossJoin(F.broadcast(var_)).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col("r") < F.col("var05"), 1).otherwise(0))
        .cast("double")
        .alias("x"),
    )
    n, x = F.col("n"), F.col("x")
    import math

    lr = -2 * (
        (n - x) * math.log(0.95)
        + x * math.log(0.05)
        - (n - x) * F.log(1 - x / n)
        - x * F.log(x / n)
    )
    return viol.filter((x > 0) & (x < n)).select(
        n.cast("long").alias("n_days"),
        x.cast("long").alias("n_violations"),
        F.round(x / n, 6).alias("violation_rate"),
        F.round(lr, 6).alias("kupiec_lr"),
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
    idx = daily.select(
        "x",
        F.lead("x").over(w).alias("x1"),
        F.row_number().over(w).alias("i"),
        (0.2 * F.stddev_samp("x").over(w_all)).alias("r"),
        F.count("*").over(w_all).alias("n"),
    )
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
    "timeseries-turning-points",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        ctx AS (
            SELECT x, lag(x) OVER (ORDER BY day) AS p,
                   lead(x) OVER (ORDER BY day) AS nx,
                   CAST(count(*) OVER () AS DOUBLE) AS n
            FROM daily
        ),
        s AS (
            SELECT max(n) AS n,
                   CAST(sum(CASE WHEN (x > p AND x > nx)
                                   OR (x < p AND x < nx)
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS tp
            FROM ctx WHERE p IS NOT NULL AND nx IS NOT NULL
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST(tp AS BIGINT) AS turning_points,
               round(2 * (n - 2) / 3, 6) AS expected_tp,
               round((tp - 2 * (n - 2) / 3)
                     / sqrt((16 * n - 29) / 90), 6) AS z
        FROM s
    """,
    doc="Turning-points test for serial independence: count strict "
    "local extrema in the daily series and z-score against the "
    "i.i.d. expectation E[T] = 2(n-2)/3, Var = (16n-29)/90 — too "
    "FEW turning points means trending, too MANY means "
    "oscillation/overdifferencing. The third member of the "
    "randomness triad with stats-runs-test (signs of changes) "
    "and timeseries-variance-ratio (magnitude scaling): all "
    "three window the same ~30-row daily summary after one fact "
    "hash agg, and together they triangulate WHY a series fails "
    "randomness, not just that it does. Interior days only via "
    "lag+lead null guards.",
    tags=("timeseries", "stats"),
)
def timeseries_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    w = Window.orderBy("day")
    w_all = Window.partitionBy()
    ctx = daily.select(
        "x",
        F.lag("x").over(w).alias("p"),
        F.lead("x").over(w).alias("nx"),
        F.count("*").over(w_all).cast("double").alias("n"),
    ).filter(F.col("p").isNotNull() & F.col("nx").isNotNull())
    is_tp = (
        ((F.col("x") > F.col("p")) & (F.col("x") > F.col("nx")))
        | ((F.col("x") < F.col("p")) & (F.col("x") < F.col("nx")))
    )
    s = ctx.agg(
        F.max("n").alias("n"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("double").alias("tp"),
    )
    n, tp = F.col("n"), F.col("tp")
    et = 2 * (n - 2) / 3
    return s.select(
        n.cast("long").alias("n_days"),
        tp.cast("long").alias("turning_points"),
        F.round(et, 6).alias("expected_tp"),
        F.round((tp - et) / F.sqrt((16 * n - 29) / 90), 6).alias("z"),
    )


@query(
    "stats-youden-threshold",
    oracle="""
        WITH s AS (
            SELECT value AS score,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        ext AS (SELECT min(score) AS lo, max(score) AS hi FROM s),
        binned AS (
            SELECT least(255, CAST(floor((score - lo) / (hi - lo) * 256.0)
                                   AS INT)) AS bin,
                   CAST(sum(y) AS DOUBLE) AS pos,
                   CAST(sum(1 - y) AS DOUBLE) AS neg,
                   max(lo) AS lo, max(hi) AS hi
            FROM s, ext GROUP BY 1
        ),
        curve AS (
            SELECT bin, lo, hi,
                   sum(pos) OVER (ORDER BY bin DESC) / sum(pos) OVER ()
                       AS tpr,
                   sum(neg) OVER (ORDER BY bin DESC) / sum(neg) OVER ()
                       AS fpr
            FROM binned
        )
        SELECT round(lo + bin * (hi - lo) / 256.0, 6) AS threshold,
               round(tpr, 6) AS tpr,
               round(fpr, 6) AS fpr,
               round(tpr - fpr, 6) AS youden_j
        FROM curve
        ORDER BY youden_j DESC, bin
        LIMIT 1
    """,
    doc="Optimal classification threshold by Youden's J = TPR - FPR, "
    "maximized over the same 256-bin descending-threshold sweep as "
    "stats-roc-auc-binned (shared machinery, different question: "
    "AUC scores the ranking, J picks the OPERATING POINT — the "
    "threshold a deployed alert/filter actually needs). J's "
    "maximum is also the KS statistic of score separation, "
    "closing the loop with stats-ks-binned. Argmax via "
    "deterministic (J desc, bin) ordering + LIMIT 1 over the "
    "256-row summary; one fact hash agg after the broadcast "
    "min/max pre-pass.",
    tags=("stats",),
)
def stats_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    ext = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = (
        s.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("score") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 256.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(
            F.sum("y").cast("double").alias("pos"),
            F.sum(1 - F.col("y")).cast("double").alias("neg"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )
    w_desc = Window.orderBy(F.col("bin").desc())
    w_all = Window.partitionBy()
    curve = binned.select(
        "bin",
        "lo",
        "hi",
        (F.sum("pos").over(w_desc) / F.sum("pos").over(w_all)).alias("tpr"),
        (F.sum("neg").over(w_desc) / F.sum("neg").over(w_all)).alias("fpr"),
    )
    return (
        curve.select(
            F.round(
                F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / 256.0,
                6,
            ).alias("threshold"),
            F.round("tpr", 6).alias("tpr"),
            F.round("fpr", 6).alias("fpr"),
            F.round(F.col("tpr") - F.col("fpr"), 6).alias("youden_j"),
            F.col("bin"),
        )
        .orderBy(F.col("youden_j").desc(), "bin")
        .limit(1)
        .drop("bin")
    )


@query(
    "stats-bic-trend-select",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        idx AS (
            SELECT y, CAST(row_number() OVER (ORDER BY day) AS DOUBLE) AS t
            FROM daily
        ),
        ctr AS (
            SELECT y - avg(y) OVER () AS yc,
                   t - avg(t) OVER () AS t1,
                   t * t - avg(t * t) OVER () AS t2
            FROM idx
        ),
        s AS (
            SELECT count(*) AS n,
                   sum(yc * yc) AS syy,
                   sum(t1 * t1) AS s11, sum(t2 * t2) AS s22,
                   sum(t1 * t2) AS s12,
                   sum(t1 * yc) AS s1y, sum(t2 * yc) AS s2y
            FROM ctr
        ),
        rss AS (
            SELECT n, syy AS rss0,
                   syy - s1y * s1y / s11 AS rss1,
                   syy - ((s22 * s1y - s12 * s2y) * s1y
                          + (s11 * s2y - s12 * s1y) * s2y)
                         / (s11 * s22 - s12 * s12) AS rss2
            FROM s
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(n * ln(rss0 / n) + 1 * ln(n), 6) AS bic_constant,
               round(n * ln(rss1 / n) + 2 * ln(n), 6) AS bic_linear,
               round(n * ln(rss2 / n) + 3 * ln(n), 6) AS bic_quadratic,
               CASE
                   WHEN n * ln(rss0 / n) + 1 * ln(n)
                        <= least(n * ln(rss1 / n) + 2 * ln(n),
                                 n * ln(rss2 / n) + 3 * ln(n))
                       THEN 'constant'
                   WHEN n * ln(rss1 / n) + 2 * ln(n)
                        <= n * ln(rss2 / n) + 3 * ln(n)
                       THEN 'linear'
                   ELSE 'quadratic' END AS best_model
        FROM rss
    """,
    doc="BIC model selection for the daily trend: constant vs linear "
    "vs quadratic fits, each RSS in CLOSED FORM from one moment "
    "aggregation (the quadratic uses the same centered 2x2 "
    "normal-equation solve as timeseries-granger-1lag with "
    "regressors t and t^2), then BIC = n*ln(RSS/n) + k*ln(n) "
    "picks the model — the principled is-there-even-a-trend "
    "gate to run before quoting timeseries-slope-change or any "
    "forecast. All three models share ONE fact hash agg and ONE "
    "summary moment pass; adding models costs columns, not "
    "scans. Ties break toward fewer parameters (the <= "
    "ordering), as parsimony demands.",
    tags=("stats", "timeseries"),
)
def stats_bic_trend_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("y")
    )
    idx = daily.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
    )
    w_all = Window.partitionBy()
    ctr = idx.select(
        (F.col("y") - F.avg("y").over(w_all)).alias("yc"),
        (F.col("t") - F.avg("t").over(w_all)).alias("t1"),
        (
            F.col("t") * F.col("t")
            - F.avg(F.col("t") * F.col("t")).over(w_all)
        ).alias("t2"),
    )
    s = ctr.agg(
        F.count("*").alias("n"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
        F.sum(F.col("t1") * F.col("t1")).alias("s11"),
        F.sum(F.col("t2") * F.col("t2")).alias("s22"),
        F.sum(F.col("t1") * F.col("t2")).alias("s12"),
        F.sum(F.col("t1") * F.col("yc")).alias("s1y"),
        F.sum(F.col("t2") * F.col("yc")).alias("s2y"),
    )
    n = F.col("n")
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    rss0 = F.col("syy")
    rss1 = F.col("syy") - F.col("s1y") * F.col("s1y") / F.col("s11")
    rss2 = F.col("syy") - (
        (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y"))
        * F.col("s1y")
        + (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y"))
        * F.col("s2y")
    ) / det
    bic0 = n * F.log(rss0 / n) + 1 * F.log(n)
    bic1 = n * F.log(rss1 / n) + 2 * F.log(n)
    bic2 = n * F.log(rss2 / n) + 3 * F.log(n)
    return s.select(
        n.cast("long").alias("n_days"),
        F.round(bic0, 6).alias("bic_constant"),
        F.round(bic1, 6).alias("bic_linear"),
        F.round(bic2, 6).alias("bic_quadratic"),
        F.when(bic0 <= F.least(bic1, bic2), "constant")
        .when(bic1 <= bic2, "linear")
        .otherwise("quadratic")
        .alias("best_model"),
    )


@query(
    "stats-xbar-control-chart",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS xbar,
                   var_samp(value) AS s2, count(*) AS n
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        pooled AS (
            SELECT sum(xbar * n) / sum(n) AS gm,
                   sqrt(sum((n - 1) * s2) / sum(n - 1)) AS sw
            FROM daily
        )
        SELECT day, round(xbar, 6) AS xbar,
               round(gm - 3 * sw / sqrt(n), 6) AS lcl,
               round(gm + 3 * sw / sqrt(n), 6) AS ucl,
               (xbar < gm - 3 * sw / sqrt(n)
                OR xbar > gm + 3 * sw / sqrt(n)) AS out_of_control
        FROM daily, pooled
        ORDER BY day
    """,
    doc="X-bar control chart (Shewhart SPC): each day's mean value "
    "against 3-sigma control limits derived from the POOLED "
    "WITHIN-day standard deviation — the SPC insight that "
    "between-day z-scores (anomaly-zscore) get backwards: "
    "limits must come from common-cause (within-subgroup) "
    "variation, so a day can be flagged even when between-day "
    "variance is huge, and vice versa. Variable subgroup sizes "
    "handled exactly via sw/sqrt(n_day) per-day limits rather "
    "than tabulated A-constants. One fact hash agg (mean, var, "
    "n per day), one pooled reduce broadcast back over the "
    "~30-row summary.",
    tags=("stats", "timeseries"),
)
def stats_xbar_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("xbar"),
        F.var_samp("value").alias("s2"),
        F.count("*").alias("n"),
    )
    pooled = daily.agg(
        (F.sum(F.col("xbar") * F.col("n")) / F.sum("n")).alias("gm"),
        F.sqrt(
            F.sum((F.col("n") - 1) * F.col("s2")) / F.sum(F.col("n") - 1)
        ).alias("sw"),
    )
    j = daily.crossJoin(F.broadcast(pooled))
    lcl = F.col("gm") - 3 * F.col("sw") / F.sqrt(F.col("n"))
    ucl = F.col("gm") + 3 * F.col("sw") / F.sqrt(F.col("n"))
    return j.select(
        "day",
        F.round("xbar", 6).alias("xbar"),
        F.round(lcl, 6).alias("lcl"),
        F.round(ucl, 6).alias("ucl"),
        ((F.col("xbar") < lcl) | (F.col("xbar") > ucl)).alias(
            "out_of_control"
        ),
    ).orderBy("day")


@query(
    "stats-uniformity-hours",
    oracle="""
        WITH hours AS (
            SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                   CAST(count(*) AS DOUBLE) AS c
            FROM events GROUP BY 1
        ),
        tot AS (SELECT sum(c) AS n, count(*) AS k FROM hours)
        SELECT CAST(max(n) AS BIGINT) AS n_events,
               CAST(max(k) AS BIGINT) AS n_hours_present,
               round(sum(power(c - n / 24, 2) / (n / 24)), 6)
                   AS chi2_uniform,
               round(max(c) / min(c), 6) AS peak_to_trough
        FROM hours, tot
    """,
    doc="Hour-of-day uniformity chi-square: are events uniformly "
    "spread over the 24 clock hours (expected n/24 each) or is "
    "there diurnal structure? Large chi2 vs chi2(23) plus the "
    "peak-to-trough ratio quantify how much hourly capacity "
    "planning matters; near-uniform says the synthetic load has "
    "no diurnal cycle worth modeling (and on real traffic this "
    "statistic is the first feature of load forecasting). ONE "
    "hash agg to <=24 cells — expected counts derive from the "
    "cell sums themselves, no second scan. Timezone note: "
    "hour() reads session-local time in both engines over the "
    "same NTZ-normalized timestamps, so parity pins the "
    "timezone handling too.",
    tags=("stats", "timeseries"),
)
def stats_uniformity_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(
        F.hour("ts").cast("long").alias("hr")
    ).agg(F.count("*").cast("double").alias("c"))
    w_all = Window.partitionBy()
    j = hours.withColumn("n", F.sum("c").over(w_all)).withColumn(
        "k", F.count("*").over(w_all)
    )
    exp = F.col("n") / 24
    return j.agg(
        F.max("n").cast("long").alias("n_events"),
        F.max("k").cast("long").alias("n_hours_present"),
        F.round(F.sum(F.pow(F.col("c") - exp, 2) / exp), 6).alias(
            "chi2_uniform"
        ),
        F.round(F.max("c") / F.min("c"), 6).alias("peak_to_trough"),
    )


@query(
    "stats-kendall-tau",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS x,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS y
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY CAST(ts AS DATE)
            HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
               AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0
        ),
        pairs AS (
            SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1
                        ELSE 0 END AS concordant,
                   CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1
                        ELSE 0 END AS discordant
            FROM daily a JOIN daily b ON a.day < b.day
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(concordant) AS BIGINT) AS concordant,
               CAST(sum(discordant) AS BIGINT) AS discordant,
               round(CAST(sum(concordant) - sum(discordant) AS DOUBLE)
                     / count(*), 6) AS kendall_tau
        FROM pairs
    """,
    doc="Kendall's tau rank correlation between daily click and view "
    "mean values: concordant-minus-discordant pair fraction over "
    "all C(n,2) day pairs. The O(n^2) pair join runs on the "
    "~30-ROW DAILY SUMMARY (the Theil-Sen discipline — quadratic "
    "in the summary, linear in the facts; for raw-row tau at "
    "scale you'd use the O(n log n) merge-sort inversion count "
    "instead). Continuous daily means make ties measure-zero so "
    "tau-a == tau-b here. Completes the correlation triple with "
    "stats-spearman-corr (rank-linear) and agg-corr-matrix "
    "(Pearson): tau's pairwise-agreement semantics is the most "
    "robust of the three to outliers and the natural one for "
    "agreement-between-rankings questions.",
    tags=("stats",),
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(click).alias("x"),
            F.avg(view).alias("y"),
            F.count(click).alias("nx"),
            F.count(view).alias("ny"),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
        .select("day", "x", "y")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.when(prod > 0, 1).otherwise(0).alias("concordant"),
        F.when(prod < 0, 1).otherwise(0).alias("discordant"),
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("concordant").cast("long").alias("concordant"),
        F.sum("discordant").cast("long").alias("discordant"),
        F.round(
            (F.sum("concordant") - F.sum("discordant")).cast("double")
            / F.count("*"),
            6,
        ).alias("kendall_tau"),
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
    "stats-runs-median",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        med AS (SELECT quantile_cont(x, 0.5) AS md FROM daily),
        side AS (
            SELECT day, CASE WHEN x > md THEN 1
                             WHEN x < md THEN 0 END AS above
            FROM daily, med
        ),
        runs AS (
            SELECT above,
                   CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                             OR above <> lag(above) OVER (ORDER BY day)
                        THEN 1 ELSE 0 END AS new_run
            FROM side WHERE above IS NOT NULL
        ),
        s AS (
            SELECT CAST(sum(above) AS DOUBLE) AS n1,
                   CAST(sum(1 - above) AS DOUBLE) AS n2,
                   CAST(sum(new_run) AS DOUBLE) AS r
            FROM runs
        )
        SELECT CAST(n1 AS BIGINT) AS n_above,
               CAST(n2 AS BIGINT) AS n_below,
               CAST(r AS BIGINT) AS n_runs,
               round((r - (2 * n1 * n2 / (n1 + n2) + 1))
                     / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                            / (power(n1 + n2, 2) * (n1 + n2 - 1))), 6)
                   AS z
        FROM s
    """,
    doc="Runs-above-median test: dichotomize the daily series at its "
    "median and count runs of consecutive same-side days — the "
    "LEVEL-persistence complement to stats-runs-test (which "
    "dichotomizes day-over-day CHANGES): a slow sinusoid passes "
    "the up/down runs test but fails this one, because its "
    "level stays above median for long stretches. Same "
    "E[R] = 2*n1*n2/(n1+n2)+1 null machinery; median from an "
    "exact interpolated percentile over the daily summary; "
    "exactly-median days drop as neither side. One fact hash "
    "agg, everything else windows over ~30 rows.",
    tags=("stats", "timeseries"),
)
def stats_runs_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("x")
    )
    med = daily.agg(F.expr("percentile(x, 0.5)").alias("md"))
    side = daily.crossJoin(F.broadcast(med)).select(
        "day",
        F.when(F.col("x") > F.col("md"), 1)
        .when(F.col("x") < F.col("md"), 0)
        .alias("above"),
    ).filter(F.col("above").isNotNull())
    w = Window.orderBy("day")
    runs = side.select(
        "above",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.col("above") != F.lag("above").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    s = runs.agg(
        F.sum("above").cast("double").alias("n1"),
        F.sum(1 - F.col("above")).cast("double").alias("n2"),
        F.sum("new_run").cast("double").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 2 * n1 * n2 / (n1 + n2) + 1
    vr = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / (F.pow(n1 + n2, 2) * (n1 + n2 - 1))
    )
    return s.select(
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        F.round((r - er) / F.sqrt(vr), 6).alias("z"),
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
    "stats-process-capability",
    oracle="""
        WITH m AS (
            SELECT avg(value) AS mu, stddev_samp(value) AS sd,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
        ),
        spec AS (SELECT 0.0 AS lsl, 200.0 AS usl)
        SELECT n AS n_rows,
               round((usl - lsl) / (6 * sd), 6) AS cp,
               round(least(usl - mu, mu - lsl) / (3 * sd), 6) AS cpk,
               round((mu - (usl + lsl) / 2) / ((usl - lsl) / 2), 6)
                   AS centering_k
        FROM m, spec
    """,
    doc="Process capability indices against spec limits [0, 200]: "
    "Cp = tolerance/(6 sigma) is what the process COULD hit if "
    "centered, Cpk = min-side margin/(3 sigma) what it actually "
    "does, and k the centering error — Cpk >= 1.33 is the "
    "classic four-sigma capability bar. The acceptance "
    "companion to stats-xbar-control-chart: the chart asks 'is "
    "the process stable', capability asks 'is stable good "
    "enough for the spec'. One moment aggregation joined to a "
    "literal spec row; swap the spec for a config table in "
    "production, same broadcast shape.",
    tags=("stats",),
)
def stats_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
        F.count("*").cast("long").alias("n"),
    )
    lsl, usl = 0.0, 200.0
    mu, sd = F.col("mu"), F.col("sd")
    return m.select(
        F.col("n").alias("n_rows"),
        F.round((usl - lsl) / (6 * sd), 6).alias("cp"),
        F.round(F.least(usl - mu, mu - lsl) / (3 * sd), 6).alias("cpk"),
        F.round((mu - (usl + lsl) / 2) / ((usl - lsl) / 2), 6).alias(
            "centering_k"
        ),
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
    "stats-kruskal-wallis",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS m
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        ranked AS (
            SELECT event_type,
                   CAST(row_number() OVER (ORDER BY m, event_type, day)
                        AS DOUBLE) AS r
            FROM daily
        ),
        per_group AS (
            SELECT event_type, count(*) AS ni, sum(r) AS ri
            FROM ranked GROUP BY event_type
        )
        SELECT CAST(count(*) AS BIGINT) AS k_groups,
               CAST(sum(ni) AS BIGINT) AS n_total,
               CAST(count(*) - 1 AS BIGINT) AS dof,
               round(12.0 / (sum(ni) * (sum(ni) + 1.0))
                     * sum(ri * ri / ni) - 3 * (sum(ni) + 1.0), 6) AS h_stat,
               round((12.0 / (sum(ni) * (sum(ni) + 1.0))
                      * sum(ri * ri / ni) - 3 * (sum(ni) + 1.0)
                      - count(*) + 1) / (sum(ni) - count(*)), 6)
                   AS epsilon_sq
        FROM per_group
    """,
    doc="Kruskal-Wallis H test across ALL event types (the k-group "
    "generalization of stats-mann-whitney): daily mean values per "
    "(type, day) come from ONE hash aggregation over the fact table; "
    "ranking then runs over the summary (~5 types x ~60 days), never "
    "the raw events. H = 12/(N(N+1)) * sum(R_i^2/n_i) - 3(N+1) and "
    "epsilon-squared effect size (H - k + 1)/(N - k). Deterministic "
    "(m, type, day) rank order keeps both engines bit-identical; "
    "continuous daily means make ties measure-zero so the tie "
    "correction is deliberately omitted (same contract as "
    "stats-mann-whitney).",
    tags=("stats",),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("m")
    )
    ranked = daily.select(
        "event_type",
        F.row_number()
        .over(Window.orderBy("m", "event_type", "day"))
        .cast("double")
        .alias("r"),
    )
    per_group = ranked.groupBy("event_type").agg(
        F.count("*").alias("ni"), F.sum("r").alias("ri")
    )
    k = F.count("*")
    n = F.sum("ni")
    h = (
        12.0 / (n * (n + 1.0)) * F.sum(F.col("ri") * F.col("ri") / F.col("ni"))
        - 3 * (n + 1.0)
    )
    return per_group.agg(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n_total"),
        (k - 1).cast("long").alias("dof"),
        F.round(h, 6).alias("h_stat"),
        F.round((h - k + 1) / (n - k), 6).alias("epsilon_sq"),
    )


@query(
    "stats-cramers-v",
    oracle="""
        WITH cells AS (
            SELECT o_orderstatus AS s, o_orderpriority AS p,
                   CAST(count(*) AS DOUBLE) AS obs
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        ),
        marg AS (
            SELECT s, p, obs,
                   sum(obs) OVER (PARTITION BY s) AS row_tot,
                   sum(obs) OVER (PARTITION BY p) AS col_tot,
                   sum(obs) OVER () AS n
            FROM cells
        ),
        stat AS (
            SELECT max(n) AS n,
                   count(DISTINCT s) AS r,
                   count(DISTINCT p) AS c,
                   sum(power(obs - row_tot * col_tot / n, 2)
                       / (row_tot * col_tot / n)) AS chi2
            FROM marg
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               round(chi2, 6) AS chi2,
               round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v,
               round(sqrt(
                   greatest(0.0, chi2 / n - (r - 1.0) * (c - 1.0) / (n - 1))
                   / least(r - (r - 1.0) * (r - 1.0) / (n - 1) - 1,
                           c - (c - 1.0) * (c - 1.0) / (n - 1) - 1) ), 6)
                   AS cramers_v_corrected
        FROM stat
    """,
    doc="Bias-corrected Cramer's V effect size for the orderstatus x "
    "orderpriority association (the effect-size companion to "
    "stats-chi-square, which only tests significance): chi2 from the "
    "15-cell contingency table (one hash aggregation over orders; "
    "margins via windows over the 15-row summary), V = "
    "sqrt(chi2/(N*min(r-1,c-1))), and the Bergsma bias correction "
    "V+ = sqrt(phi2+ / min(r~-1, c~-1)) with phi2+ = max(0, phi2 - "
    "(r-1)(c-1)/(N-1)) and r~ = r - (r-1)^2/(N-1) (note the -1 in "
    "the denominator per Bergsma 2013 — fixed in r5; both sides "
    "previously divided by min(r~, c~)). "
    "Effect sizes, unlike p-values, stay interpretable at 100 TB row "
    "counts where every test is 'significant'.",
    tags=("stats",),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cells = od.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count("*").cast("double").alias("obs"))
    marg = cells.select(
        "s",
        "p",
        "obs",
        F.sum("obs").over(Window.partitionBy("s")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("p")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    stat = marg.agg(
        F.max("n").alias("n"),
        F.count_distinct("s").cast("double").alias("r"),
        F.count_distinct("p").cast("double").alias("c"),
        F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi2"),
    )
    n, r, c = F.col("n"), F.col("r"), F.col("c")
    phi2_plus = F.greatest(
        F.lit(0.0), F.col("chi2") / n - (r - 1) * (c - 1) / (n - 1)
    )
    return stat.select(
        n.cast("long").alias("n_rows"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (n * F.least(r - 1, c - 1))), 6
        ).alias("cramers_v"),
        F.round(
            F.sqrt(
                phi2_plus
                / F.least(
                    r - (r - 1) * (r - 1) / (n - 1) - 1,
                    c - (c - 1) * (c - 1) / (n - 1) - 1,
                )
            ),
            6,
        ).alias("cramers_v_corrected"),
    )


@query(
    "stats-grubbs-outlier",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        s AS (
            SELECT count(*) AS n, avg(rev) AS mu, stddev_samp(rev) AS sd
            FROM daily
        ),
        dev AS (
            SELECT d.day, d.rev, s.n, abs(d.rev - s.mu) / s.sd AS g
            FROM daily d, s
        )
        SELECT CAST(n AS BIGINT) AS n_days, day AS outlier_day,
               round(rev, 4) AS outlier_rev, round(g, 6) AS g_stat
        FROM dev
        ORDER BY g DESC, day
        LIMIT 1
    """,
    doc="Grubbs' maximum-studentized-deviate outlier test on daily "
    "revenue: G = max|x - mean|/sd with the argmax day attached. The "
    "fact pass is one hash aggregation to ~2.4k daily sums; the "
    "1-row summary stats broadcast back over the daily relation "
    "(scalar-summary pattern) and TakeOrderedAndProject keeps the "
    "winner — no global sort materializes. Deterministic (g desc, "
    "day) tie-break. The single-outlier complement to "
    "anomaly-zscore's per-row flags and anomaly-iqr-fence's robust "
    "fences.",
    tags=("stats",),
)
def stats_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    s = daily.agg(
        F.count("*").alias("n"),
        F.avg("rev").alias("mu"),
        F.stddev_samp("rev").alias("sd"),
    )
    dev = daily.join(F.broadcast(s)).select(
        "day",
        "rev",
        "n",
        (F.abs(F.col("rev") - F.col("mu")) / F.col("sd")).alias("g"),
    )
    return (
        dev.orderBy(F.col("g").desc(), "day")
        .limit(1)
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("day").alias("outlier_day"),
            F.round("rev", 4).alias("outlier_rev"),
            F.round("g", 6).alias("g_stat"),
        )
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
    "stats-bartlett-test",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   count(*) AS ni,
                   var_samp(value) AS vi
            FROM events GROUP BY event_type
        ),
        s AS (
            SELECT count(*) AS k,
                   sum(ni) AS n,
                   sum((ni - 1) * vi) / sum(ni - 1) AS sp2,
                   sum((ni - 1) * ln(vi)) AS sum_lnv,
                   sum(1.0 / (ni - 1)) AS sum_inv
            FROM g
        )
        SELECT CAST(k AS BIGINT) AS k_groups,
               CAST(n AS BIGINT) AS n_total,
               CAST(k - 1 AS BIGINT) AS dof,
               round(sp2, 6) AS pooled_var,
               round(((n - k) * ln(sp2) - sum_lnv)
                     / (1 + (sum_inv - 1.0 / (n - k)) / (3 * (k - 1))), 6)
                   AS bartlett_stat
        FROM s
    """,
    doc="Bartlett's test for homogeneity of variances across event "
    "types: T = ((N-k) ln s_p^2 - sum (n_i-1) ln s_i^2) / C with the "
    "Bartlett correction C — the parametric, normality-assuming "
    "counterpart to stats-levene-median (which is robust to "
    "non-normality; running both brackets the assumption). One hash "
    "aggregation to k per-group (count, variance) rows, then scalar "
    "math on the k-row summary — variance homogeneity is the "
    "precondition gate for pooled-variance tests like "
    "stats-anova-oneway at any scale.",
    tags=("stats",),
)
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("ni"), F.var_samp("value").alias("vi")
    )
    ni, vi = F.col("ni"), F.col("vi")
    s = g.agg(
        F.count("*").alias("k"),
        F.sum(ni).alias("n"),
        (F.sum((ni - 1) * vi) / F.sum(ni - 1)).alias("sp2"),
        F.sum((ni - 1) * F.log(vi)).alias("sum_lnv"),
        F.sum(1.0 / (ni - 1)).alias("sum_inv"),
    )
    k, n = F.col("k"), F.col("n")
    t = ((n - k) * F.log(F.col("sp2")) - F.col("sum_lnv")) / (
        1 + (F.col("sum_inv") - 1.0 / (n - k)) / (3 * (k - 1))
    )
    return s.select(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n_total"),
        (k - 1).cast("long").alias("dof"),
        F.round("sp2", 6).alias("pooled_var"),
        F.round(t, 6).alias("bartlett_stat"),
    )


@query(
    "stats-cohens-d-battery",
    oracle="""
        WITH g AS (
            SELECT event_type, count(*) AS n, avg(value) AS m,
                   var_samp(value) AS v
            FROM events GROUP BY event_type
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               round((a.m - b.m)
                     / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
                            / (a.n + b.n - 2)), 6) AS cohens_d,
               round((a.m - b.m)
                     / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
                            / (a.n + b.n - 2))
                     * (1 - 3.0 / (4 * (a.n + b.n) - 9)), 6) AS hedges_g
        FROM g a JOIN g b ON a.event_type < b.event_type
    """,
    doc="Pairwise standardized effect sizes between all event-type "
    "pairs: Cohen's d with pooled sd and the Hedges small-sample "
    "bias correction g = d*(1 - 3/(4n-9)). One hash aggregation to "
    "k per-group (n, mean, var) rows, then a k x k self-join on the "
    "TINY summary (10 pairs from 5 types) — the multiple-comparison "
    "companion to stats-welch-ttest (significance) and the input "
    "stats-holm-bonferroni's step-down expects. Effect sizes stay "
    "meaningful at 100 TB where p-values saturate.",
    tags=("stats",),
)
def stats_cohens_d_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.avg("value").alias("m"), F.var_samp("value").alias("v")
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    j = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    na, nb = F.col("na"), F.col("nb")
    d = (F.col("ma") - F.col("mb")) / F.sqrt(
        ((na - 1) * F.col("va") + (nb - 1) * F.col("vb")) / (na + nb - 2)
    )
    return j.select(
        "type_a",
        "type_b",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1 - 3.0 / (4 * (na + nb) - 9)), 6).alias("hedges_g"),
    )


@query(
    "stats-poisson-two-rate",
    oracle="""
        WITH counts AS (
            SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS k1,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k2,
                   count(DISTINCT CAST(ts AS DATE)) AS t_days
            FROM events WHERE event_type IN ('click', 'purchase')
        )
        SELECT CAST(k1 AS BIGINT) AS k1, CAST(k2 AS BIGINT) AS k2,
               CAST(t_days AS BIGINT) AS t_days,
               round(CAST(k1 AS DOUBLE) / t_days, 6) AS rate1,
               round(CAST(k2 AS DOUBLE) / t_days, 6) AS rate2,
               round((k1 - k2) / sqrt(CAST(k1 + k2 AS DOUBLE)), 6)
                   AS z_unconditional,
               round((CAST(k1 AS DOUBLE) / (k1 + k2) - 0.5)
                     / sqrt(0.25 / (k1 + k2)), 6) AS z_conditional
        FROM counts
    """,
    doc="Two-sample Poisson rate comparison over a shared exposure "
    "window: unconditional z = (k1-k2)/sqrt(k1+k2) and the "
    "conditional (binomial) form — given k1+k2 total events, k1 ~ "
    "Bin(k1+k2, 1/2) under H0 of equal rates — which is the exact-"
    "test-backed version. One conditional-count aggregation over "
    "the fact table; the test statistic is scalar math on a 1-row "
    "summary. The counting-process companion to stats-welch-ttest "
    "(means) and stats-srm-check (fixed expected ratio).",
    tags=("stats",),
)
def stats_poisson_two_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    c = ev.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("k2"),
        F.count_distinct(F.to_date("ts")).alias("t_days"),
    )
    k1, k2, t = F.col("k1"), F.col("k2"), F.col("t_days")
    return c.select(
        k1.cast("long").alias("k1"),
        k2.cast("long").alias("k2"),
        t.cast("long").alias("t_days"),
        F.round(k1.cast("double") / t, 6).alias("rate1"),
        F.round(k2.cast("double") / t, 6).alias("rate2"),
        F.round((k1 - k2) / F.sqrt((k1 + k2).cast("double")), 6).alias(
            "z_unconditional"
        ),
        F.round(
            (k1.cast("double") / (k1 + k2) - 0.5) / F.sqrt(0.25 / (k1 + k2)), 6
        ).alias("z_conditional"),
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
    "stats-welch-anova",
    oracle="""
        WITH g AS (
            SELECT event_type, count(*) AS n, avg(value) AS m,
                   var_samp(value) AS v
            FROM events GROUP BY event_type
        ),
        wsum AS (
            SELECT count(*) AS k,
                   sum(n / v) AS sw,
                   sum((n / v) * m) AS swm
            FROM g
        ),
        num AS (
            SELECT max(wsum.k) AS k, max(wsum.sw) AS sw,
                   sum((g.n / g.v) * power(g.m - wsum.swm / wsum.sw, 2))
                       / (max(wsum.k) - 1) AS numerator,
                   sum(power(1 - (g.n / g.v) / wsum.sw, 2) / (g.n - 1))
                       AS lambda_sum
            FROM g, wsum GROUP BY ALL
        )
        SELECT CAST(k AS BIGINT) AS k_groups,
               CAST(k - 1 AS BIGINT) AS df1,
               round((k * k - 1.0) / (3 * lambda_sum), 6) AS df2,
               round(numerator
                     / (1 + 2.0 * (k - 2) / (k * k - 1) * lambda_sum), 6)
                   AS welch_f
        FROM num
    """,
    doc="Welch's heteroscedastic one-way ANOVA across event types: "
    "weights w_i = n_i/s_i^2, grand weighted mean, F* = "
    "sum(w_i(m_i - mbar_w)^2)/(k-1) / (1 + 2(k-2)/(k^2-1) * Lambda) "
    "with Satterthwaite df2 = (k^2-1)/(3*Lambda) — the version of "
    "stats-anova-oneway that does NOT assume equal variances, which "
    "is exactly what stats-bartlett-test / stats-levene-median "
    "decide between (the three ops form the variance-aware testing "
    "chain). Same shape: one hash aggregation to k rows, scalar "
    "math after.",
    tags=("stats",),
)
def stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.avg("value").alias("m"), F.var_samp("value").alias("v")
    )
    wsum = g.agg(
        F.count("*").alias("k"),
        F.sum(F.col("n") / F.col("v")).alias("sw"),
        F.sum((F.col("n") / F.col("v")) * F.col("m")).alias("swm"),
    )
    j = g.join(F.broadcast(wsum))
    wi = F.col("n") / F.col("v")
    mbar = F.col("swm") / F.col("sw")
    num = j.agg(
        F.max("k").alias("k"),
        (F.sum(wi * F.pow(F.col("m") - mbar, 2)) / (F.max("k") - 1)).alias(
            "numerator"
        ),
        F.sum(F.pow(1 - wi / F.col("sw"), 2) / (F.col("n") - 1)).alias(
            "lambda_sum"
        ),
    )
    k = F.col("k")
    return num.select(
        k.cast("long").alias("k_groups"),
        (k - 1).cast("long").alias("df1"),
        F.round((k * k - 1.0) / (3 * F.col("lambda_sum")), 6).alias("df2"),
        F.round(
            F.col("numerator")
            / (1 + 2.0 * (k - 2) / (k * k - 1) * F.col("lambda_sum")),
            6,
        ).alias("welch_f"),
    )


@query(
    "stats-stratified-ate",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   count(*) AS n_events,
                   max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS treated,
                   sum(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END) AS outcome
            FROM events GROUP BY user_id
        ),
        strat AS (
            SELECT treated, outcome,
                   ntile(5) OVER (ORDER BY n_events, user_id) AS stratum
            FROM per_user
        ),
        cell AS (
            SELECT stratum,
                   count(*) AS ns,
                   avg(CASE WHEN treated = 1 THEN outcome END) AS mt,
                   avg(CASE WHEN treated = 0 THEN outcome END) AS mc,
                   sum(treated) AS nt
            FROM strat GROUP BY stratum
        ),
        naive AS (
            SELECT avg(CASE WHEN treated = 1 THEN outcome END)
                   - avg(CASE WHEN treated = 0 THEN outcome END) AS ate_naive,
                   sum(treated) AS n_treated,
                   sum(1 - treated) AS n_control
            FROM per_user
        )
        SELECT CAST(max(naive.n_treated) AS BIGINT) AS n_treated,
               CAST(max(naive.n_control) AS BIGINT) AS n_control,
               round(max(naive.ate_naive), 6) AS ate_naive,
               round(sum((cell.mt - cell.mc) * cell.ns)
                     / sum(cell.ns), 6) AS ate_stratified
        FROM cell, naive
        WHERE cell.mt IS NOT NULL AND cell.mc IS NOT NULL
        GROUP BY ALL
    """,
    doc="Stratified average-treatment-effect adjustment: treatment = "
    "user ever signed up, outcome = total purchase value, "
    "confounder = activity level (total events) cut into quintiles "
    "by a deterministic ntile. ATE_strat = sum_s w_s (mean_t,s - "
    "mean_c,s) weights each stratum's within-stratum contrast by "
    "its size — the design-based deconfounder that needs no fitted "
    "propensity model (strata WITH both arms only; dropped cells "
    "reported implicitly via naive-vs-stratified divergence). The "
    "causal-inference step up from stats-cuped-adjustment "
    "(variance) toward effect identification. Two hash "
    "aggregations + one 5-row summary pass.",
    tags=("stats",),
)
def stats_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.ranking import (
        exact_ntile,
        with_global_order,
    )

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("treated"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("outcome"),
    )
    # quintile strata via the two-phase bucketed rank
    # (operators/ranking.py): the per-user frame grows with the data,
    # so no ntile global window; exact_ntile reproduces ANSI ntile.
    g = with_global_order(
        per_user, "n_events", tiebreakers=("user_id",), rn="__rn",
        total_count="__n",
    )
    strat = g.select(
        "treated",
        "outcome",
        exact_ntile(F.col("__rn"), F.col("__n"), 5).alias("stratum"),
    )
    cell = strat.groupBy("stratum").agg(
        F.count("*").alias("ns"),
        F.avg(F.when(F.col("treated") == 1, F.col("outcome"))).alias("mt"),
        F.avg(F.when(F.col("treated") == 0, F.col("outcome"))).alias("mc"),
        F.sum("treated").alias("nt"),
    )
    naive = per_user.agg(
        (
            F.avg(F.when(F.col("treated") == 1, F.col("outcome")))
            - F.avg(F.when(F.col("treated") == 0, F.col("outcome")))
        ).alias("ate_naive"),
        F.sum("treated").alias("n_treated"),
        F.sum(1 - F.col("treated")).alias("n_control"),
    )
    j = cell.filter(F.col("mt").isNotNull() & F.col("mc").isNotNull()).join(
        F.broadcast(naive)
    )
    return j.agg(
        F.max("n_treated").cast("long").alias("n_treated"),
        F.max("n_control").cast("long").alias("n_control"),
        F.round(F.max("ate_naive"), 6).alias("ate_naive"),
        F.round(
            F.sum((F.col("mt") - F.col("mc")) * F.col("ns")) / F.sum("ns"), 6
        ).alias("ate_stratified"),
    )


@query(
    "stats-mann-kendall",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, avg(value) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        pairs AS (
            SELECT sign(b.x - a.x) AS s
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        agg AS (
            SELECT (SELECT count(*) FROM daily) AS n, sum(s) AS s_stat
            FROM pairs
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(s_stat, 1) AS s_stat,
               round(n * (n - 1) * (2 * n + 5) / 18.0, 4) AS var_s,
               round((s_stat - sign(s_stat))
                     / sqrt(n * (n - 1) * (2 * n + 5) / 18.0), 6) AS z
        FROM agg
    """,
    doc="Mann-Kendall trend test on daily mean values: S = sum of "
    "sign(x_j - x_i) over all i<j day pairs, Var(S) = "
    "n(n-1)(2n+5)/18 (no tie correction — continuous daily means), "
    "continuity-corrected z. The SIGNIFICANCE test that pairs with "
    "timeseries-theil-sen's slope ESTIMATE (the standard "
    "nonparametric trend duo: MK decides, Theil-Sen sizes). The "
    "pairwise join runs on the day-count summary (~30 rows -> ~450 "
    "pairs), never the fact table — day count grows with calendar "
    "time, not data volume, so the quadratic is bounded at any "
    "corpus scale.",
    tags=("stats",),
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        F.signum(F.col("xb") - F.col("xa")).alias("s")
    )
    nd = daily.agg(F.count("*").alias("n"))
    agg = pairs.agg(F.sum("s").alias("s_stat")).join(F.broadcast(nd))
    n, s = F.col("n"), F.col("s_stat")
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    return agg.select(
        n.cast("long").alias("n_days"),
        F.round(s, 1).alias("s_stat"),
        F.round(var_s, 4).alias("var_s"),
        F.round((s - F.signum(s)) / F.sqrt(var_s), 6).alias("z"),
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
    "stats-cochran-armitage",
    oracle="""
        WITH seg AS (
            SELECT user_id,
                   CAST(user_id % 4 AS DOUBLE) AS dose,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS resp
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ),
        g AS (
            SELECT dose, count(*) AS n, sum(resp) AS r
            FROM seg GROUP BY dose
        ),
        tot AS (
            SELECT sum(n) AS nn, sum(r) AS rr,
                   sum(n * dose) AS snt, sum(n * dose * dose) AS snt2
            FROM g
        )
        SELECT CAST(max(tot.nn) AS BIGINT) AS n_user_days,
               round(max(CAST(tot.rr AS DOUBLE) / tot.nn), 6) AS pooled_rate,
               round(sum(g.dose * (g.r - g.n * CAST(tot.rr AS DOUBLE) / tot.nn))
                     / sqrt((CAST(max(tot.rr) AS DOUBLE) / max(tot.nn))
                            * (1 - CAST(max(tot.rr) AS DOUBLE) / max(tot.nn))
                            * (max(tot.snt2)
                               - max(tot.snt) * max(tot.snt) / max(tot.nn))),
                     6) AS ca_trend_z
        FROM g, tot GROUP BY ALL
    """,
    doc="Cochran-Armitage trend test for a DOSE-RESPONSE in "
    "proportions: daily purchase response on USER-DAY units (the "
    "per-user response saturates at 1 here, which would zero both "
    "pbar*qbar and the numerator) across the 4 ordered "
    "user segments (scores t = 0..3), z = sum t_i (r_i - n_i pbar) "
    "/ sqrt(pbar qbar (sum n_i t_i^2 - (sum n_i t_i)^2 / N)). One "
    "df against the ORDERED alternative, which stats-chi-square's "
    "(k-1) df omnibus wastes power on — the standard choice for "
    "monotone-exposure questions (tier -> conversion, dose -> "
    "response). Two hash aggregations to a 4-row table, scalar "
    "math after.",
    tags=("stats",),
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seg = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("resp")
    ).select(
        (F.col("user_id") % 4).cast("double").alias("dose"), "resp"
    )
    g = seg.groupBy("dose").agg(F.count("*").alias("n"), F.sum("resp").alias("r"))
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("r").alias("rr"),
        F.sum(F.col("n") * F.col("dose")).alias("snt"),
        F.sum(F.col("n") * F.col("dose") * F.col("dose")).alias("snt2"),
    )
    j = g.join(F.broadcast(tot))
    pbar = F.max("rr").cast("double") / F.max("nn")
    num = F.sum(
        F.col("dose")
        * (F.col("r") - F.col("n") * F.col("rr").cast("double") / F.col("nn"))
    )
    den = F.sqrt(
        pbar
        * (1 - pbar)
        * (F.max("snt2") - F.max("snt") * F.max("snt") / F.max("nn"))
    )
    return j.agg(
        F.max("nn").cast("long").alias("n_user_days"),
        F.round(pbar, 6).alias("pooled_rate"),
        F.round(num / den, 6).alias("ca_trend_z"),
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
    "sample-fixed-k-per-group",
    oracle=f"""
        WITH hashed AS (
            SELECT event_type, event_id,
                   {sql_string_hash("CAST(event_id AS VARCHAR) || ':fixk'")}
                       AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, event_id, h,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h, event_id) AS rn
            FROM hashed
        )
        SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
               CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= 50
    """,
    doc="Fixed-size k=50 sample PER GROUP via hash-order ranking: the "
    "k rows with the smallest salted key hash per event type are a "
    "uniform random sample of the group, yet fully DETERMINISTIC "
    "across reruns, engines, and partitionings — the distributed "
    "equivalent of per-group reservoir sampling without reservoir "
    "state (the k-minimum-values idea applied to sampling; "
    "agg-kmv-sketch uses the same order statistic for F0). "
    "Complements sample-stratified (fraction-based, group sizes "
    "vary) when downstream needs EQUAL-size per-stratum samples "
    "(eval panels, human review batches). One hash projection + "
    "one rank window per group; at scale the window's sort is "
    "bounded per group by pushing a partial top-k before the "
    "shuffle (TakeOrderedAndProject per partition).",
    tags=("sample",),
)
def sample_fixed_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from transit_scrape_spark.operators.dedup import string_hash

    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        "event_id",
        string_hash(
            F.concat(F.col("event_id").cast("string"), F.lit(":fixk"))
        ).alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 50)
        .select("event_type", F.col("event_id").cast("long").alias("event_id"), "rn")
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
    "stats-jackknife-cv",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS x
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        tot AS (
            SELECT count(*) AS n, sum(x) AS s, sum(x * x) AS ss
            FROM daily
        ),
        loo AS (
            SELECT tot.n,
                   (tot.s - d.x) / (tot.n - 1) AS mu_i,
                   ((tot.ss - d.x * d.x)
                    - (tot.n - 1) * power((tot.s - d.x) / (tot.n - 1), 2))
                       / (tot.n - 2) AS var_i
            FROM daily d, tot
        ),
        cvs AS (
            SELECT n, sqrt(var_i) / mu_i AS cv_i FROM loo
        ),
        full_cv AS (
            SELECT sqrt((ss - n * power(s / n, 2)) / (n - 1)) / (s / n) AS cv
            FROM tot
        )
        SELECT CAST(max(cvs.n) AS BIGINT) AS n_days,
               round(max(full_cv.cv), 6) AS cv_full,
               round(avg(cv_i), 6) AS cv_jack_mean,
               round(sqrt((max(cvs.n) - 1.0) / max(cvs.n)
                          * sum(power(cv_i - (SELECT avg(cv_i) FROM cvs), 2))),
                     6) AS se_jackknife,
               round(max(cvs.n) * max(full_cv.cv)
                     - (max(cvs.n) - 1) * avg(cv_i), 6) AS cv_bias_corrected
        FROM cvs, full_cv
        GROUP BY ALL
    """,
    doc="Delete-1 jackknife inference for the coefficient of "
    "variation of daily revenue — a NONLINEAR statistic with no "
    "closed-form SE: every leave-one-out CV comes from the global "
    "(n, sum, sum-of-squares) totals minus the held-out day "
    "(loo_var via the sums identity), so the n resamples cost ONE "
    "broadcast join over the day summary, not n passes — the "
    "algebraic trick that makes jackknifes free at any scale when "
    "the statistic is a smooth function of moments. Reports the "
    "jackknife SE and the bias-corrected estimate n*cv - "
    "(n-1)*mean(loo cv). The deterministic cousin of "
    "sample-poisson-bootstrap (which needs pseudo-randomness).",
    tags=("stats",),
)
def stats_jackknife_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("x")
    )
    tot = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    loo = daily.join(F.broadcast(tot)).select(
        "n",
        ((s - F.col("x")) / (n - 1)).alias("mu_i"),
        (
            (
                (ss - F.col("x") * F.col("x"))
                - (n - 1) * F.pow((s - F.col("x")) / (n - 1), 2)
            )
            / (n - 2)
        ).alias("var_i"),
    )
    cvs = loo.select("n", (F.sqrt("var_i") / F.col("mu_i")).alias("cv_i"))
    full_cv = tot.select(
        (F.sqrt((ss - n * F.pow(s / n, 2)) / (n - 1)) / (s / n)).alias("cv")
    )
    cbar = cvs.agg(F.avg("cv_i").alias("cbar"))
    j = cvs.join(F.broadcast(full_cv)).join(F.broadcast(cbar))
    return j.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max("cv"), 6).alias("cv_full"),
        F.round(F.avg("cv_i"), 6).alias("cv_jack_mean"),
        F.round(
            F.sqrt(
                (F.max("n") - 1.0)
                / F.max("n")
                * F.sum(F.pow(F.col("cv_i") - F.col("cbar"), 2))
            ),
            6,
        ).alias("se_jackknife"),
        F.round(
            F.max("n") * F.max("cv") - (F.max("n") - 1) * F.avg("cv_i"), 6
        ).alias("cv_bias_corrected"),
    )


@query(
    "stats-mood-median",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS m
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        med AS (SELECT median(m) AS gm FROM daily),
        cells AS (
            SELECT d.event_type,
                   count(*) AS ni,
                   sum(CASE WHEN d.m > med.gm THEN 1 ELSE 0 END) AS ai
            FROM daily d, med GROUP BY d.event_type
        ),
        tot AS (
            SELECT sum(ni) AS n, sum(ai) AS a, count(*) AS k FROM cells
        )
        SELECT CAST(max(tot.k) AS BIGINT) AS k_groups,
               CAST(max(tot.n) AS BIGINT) AS n_total,
               CAST(max(tot.k) - 1 AS BIGINT) AS dof,
               round(sum(power(cells.ai - cells.ni * CAST(tot.a AS DOUBLE)
                                             / tot.n, 2)
                         / (cells.ni * CAST(tot.a AS DOUBLE) / tot.n
                            * (1 - CAST(tot.a AS DOUBLE) / tot.n))), 6)
                   AS mood_chi2
        FROM cells, tot GROUP BY ALL
    """,
    doc="Mood's median test across event types: count daily means "
    "above the GRAND median per group, chi-square against the "
    "expected n_i * (a/N) split — the coarsest but most "
    "outlier-immune of the k-group location tests (only signs "
    "relative to one order statistic matter; "
    "stats-kruskal-wallis uses full ranks and more power, "
    "stats-anova-oneway uses means and assumes normality — the "
    "three escalate in assumptions). Exact median on the day "
    "summary, then a k-cell contingency chi-square; both engines "
    "share the same interpolated-median definition.",
    tags=("stats",),
)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("m")
    )
    med = daily.agg(F.median("m").alias("gm"))
    cells = daily.join(F.broadcast(med)).groupBy("event_type").agg(
        F.count("*").alias("ni"),
        F.sum(F.when(F.col("m") > F.col("gm"), 1).otherwise(0)).alias("ai"),
    )
    tot = cells.agg(
        F.sum("ni").alias("n"), F.sum("ai").alias("a"), F.count("*").alias("k")
    )
    j = cells.join(F.broadcast(tot))
    p = F.col("a").cast("double") / F.col("n")
    exp = F.col("ni") * p
    return j.agg(
        F.max("k").cast("long").alias("k_groups"),
        F.max("n").cast("long").alias("n_total"),
        (F.max("k") - 1).cast("long").alias("dof"),
        F.round(
            F.sum(F.pow(F.col("ai") - exp, 2) / (exp * (1 - p))), 6
        ).alias("mood_chi2"),
    )


# Wilson z-constants shared by the Spark plan AND the oracle SQL below:
# the SQL literals are emitted from these exact Python floats (f-string)
# so both engines compute with bit-identical constants — a hand-rounded
# oracle literal (0.960397 vs z2/4 = 0.9603965) caused ~1e-7 pre-round
# drift that could flake a round(6) boundary (ADVICE r4).
_PDC_Z = 1.959964
_PDC_Z2 = 3.841586


@query(
    "stats-prop-diff-ci",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS grp,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT grp, count(*) AS n, sum(conv) AS x
            FROM per_user GROUP BY grp
        ),
        wilson AS (
            SELECT grp, n, x,
                   CAST(x AS DOUBLE) / n AS p,
                   (x + CAST({_PDC_Z2 / 2!r} AS DOUBLE)) / (n + CAST({_PDC_Z2!r} AS DOUBLE))
                       - CAST({_PDC_Z!r} AS DOUBLE) * sqrt(n) / (n + CAST({_PDC_Z2!r} AS DOUBLE))
                       * sqrt(CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
                              + CAST({_PDC_Z2 / 4!r} AS DOUBLE) / n) AS lo,
                   (x + CAST({_PDC_Z2 / 2!r} AS DOUBLE)) / (n + CAST({_PDC_Z2!r} AS DOUBLE))
                       + CAST({_PDC_Z!r} AS DOUBLE) * sqrt(n) / (n + CAST({_PDC_Z2!r} AS DOUBLE))
                       * sqrt(CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
                              + CAST({_PDC_Z2 / 4!r} AS DOUBLE) / n) AS hi
            FROM arms
        ),
        piv AS (
            SELECT max(CASE WHEN grp = 1 THEN p END) AS p1,
                   max(CASE WHEN grp = 1 THEN lo END) AS l1,
                   max(CASE WHEN grp = 1 THEN hi END) AS u1,
                   max(CASE WHEN grp = 0 THEN p END) AS p2,
                   max(CASE WHEN grp = 0 THEN lo END) AS l2,
                   max(CASE WHEN grp = 0 THEN hi END) AS u2,
                   CAST(max(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS n1,
                   CAST(max(CASE WHEN grp = 0 THEN n END) AS BIGINT) AS n2
            FROM wilson
        )
        SELECT n1, n2,
               round(p1, 6) AS p_clickers,
               round(p2, 6) AS p_nonclickers,
               round(p1 - p2, 6) AS diff,
               round(p1 - p2 - sqrt(power(p1 - l1, 2)
                                    + power(u2 - p2, 2)), 6) AS ci_lo,
               round(p1 - p2 + sqrt(power(u1 - p1, 2)
                                    + power(p2 - l2, 2)), 6) AS ci_hi
        FROM piv
    """,
    doc="Newcombe hybrid-Wilson 95% CI for a DIFFERENCE of "
    "proportions (purchase rate of clickers vs non-clickers): "
    "Wilson score bounds per arm, then Newcombe's square-and-add "
    "of the one-sided margins — the interval that stays honest at "
    "extreme rates and small arms where the Wald difference CI "
    "collapses or exits [-1, 1] (analytics-conversion-ci covers "
    "the single-arm Wilson; this is the two-arm comparison every "
    "A/B readout actually reports). One per-user aggregation, a "
    "2-row arm summary, literal z-constants shared by both "
    "engines.",
    tags=("stats",),
)
def stats_prop_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("grp"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    arms = per_user.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("conv").alias("x")
    )
    n, x = F.col("n"), F.col("x")
    p = x.cast("double") / n
    z, z2 = _PDC_Z, _PDC_Z2
    half = z * F.sqrt(n) / (n + z2) * F.sqrt(p * (1 - p) + z2 / 4 / n)
    center = (x + z2 / 2) / (n + z2)
    wilson = arms.select(
        "grp", "n", p.alias("p"), (center - half).alias("lo"), (center + half).alias("hi")
    )
    pick = lambda g, c: F.max(F.when(F.col("grp") == g, F.col(c)))  # noqa: E731
    piv = wilson.agg(
        pick(1, "p").alias("p1"), pick(1, "lo").alias("l1"), pick(1, "hi").alias("u1"),
        pick(0, "p").alias("p2"), pick(0, "lo").alias("l2"), pick(0, "hi").alias("u2"),
        pick(1, "n").cast("long").alias("n1"),
        pick(0, "n").cast("long").alias("n2"),
    )
    p1, p2 = F.col("p1"), F.col("p2")
    return piv.select(
        "n1",
        "n2",
        F.round(p1, 6).alias("p_clickers"),
        F.round(p2, 6).alias("p_nonclickers"),
        F.round(p1 - p2, 6).alias("diff"),
        F.round(
            p1 - p2
            - F.sqrt(F.pow(p1 - F.col("l1"), 2) + F.pow(F.col("u2") - p2, 2)),
            6,
        ).alias("ci_lo"),
        F.round(
            p1 - p2
            + F.sqrt(F.pow(F.col("u1") - p1, 2) + F.pow(p2 - F.col("l2"), 2)),
            6,
        ).alias("ci_hi"),
    )


@query(
    "stats-diff-in-diff",
    oracle="""
        WITH treated AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS tr
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT t.tr,
                   CASE WHEN CAST(e.ts AS DATE) >= DATE '2024-01-16'
                        THEN 1 ELSE 0 END AS post,
                   avg(e.value) AS m,
                   count(*) AS n
            FROM events e JOIN treated t ON e.user_id = t.user_id
            WHERE e.event_type = 'purchase'
            GROUP BY ALL
        ),
        piv AS (
            SELECT max(CASE WHEN tr = 1 AND post = 1 THEN m END) AS t_post,
                   max(CASE WHEN tr = 1 AND post = 0 THEN m END) AS t_pre,
                   max(CASE WHEN tr = 0 AND post = 1 THEN m END) AS c_post,
                   max(CASE WHEN tr = 0 AND post = 0 THEN m END) AS c_pre,
                   CAST(sum(n) AS BIGINT) AS n_obs
            FROM cells
        )
        SELECT n_obs,
               round(t_pre, 6) AS treated_pre,
               round(t_post, 6) AS treated_post,
               round(c_pre, 6) AS control_pre,
               round(c_post, 6) AS control_post,
               round((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate
        FROM piv
    """,
    doc="Difference-in-differences: treated = users who ever signed "
    "up, period split at mid-window, outcome = purchase value; DiD "
    "= (treated post - pre) - (control post - pre) cancels both "
    "the level difference between groups AND the common time "
    "trend — the workhorse quasi-experimental estimator when "
    "randomization (stats-srm-check's world) is unavailable. "
    "Parallel-trends is the identifying assumption; the four cell "
    "means are printed so a reader can eyeball it. Two hash "
    "aggregations (treatment flags per user, 2x2 cell means) and "
    "a 4-cell pivot.",
    tags=("stats",),
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    treated = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("tr")
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    cells = (
        purchases.join(F.broadcast(treated), "user_id")
        .groupBy(
            "tr",
            F.when(F.to_date("ts") >= F.lit("2024-01-16"), 1)
            .otherwise(0)
            .alias("post"),
        )
        .agg(F.avg("value").alias("m"), F.count("*").alias("n"))
    )
    pick = lambda tr, post: F.max(  # noqa: E731
        F.when((F.col("tr") == tr) & (F.col("post") == post), F.col("m"))
    )
    piv = cells.agg(
        pick(1, 1).alias("t_post"),
        pick(1, 0).alias("t_pre"),
        pick(0, 1).alias("c_post"),
        pick(0, 0).alias("c_pre"),
        F.sum("n").cast("long").alias("n_obs"),
    )
    return piv.select(
        "n_obs",
        F.round("t_pre", 6).alias("treated_pre"),
        F.round("t_post", 6).alias("treated_post"),
        F.round("c_pre", 6).alias("control_pre"),
        F.round("c_post", 6).alias("control_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            6,
        ).alias("did_estimate"),
    )


@query(
    "sample-neyman-allocation",
    oracle="""
        WITH strat AS (
            SELECT doc_id, n_chars,
                   ntile(5) OVER (ORDER BY n_chars, doc_id) AS stratum
            FROM documents
        ),
        per AS (
            SELECT stratum, count(*) AS nh, stddev_samp(n_chars) AS sh,
                   avg(n_chars) AS mh
            FROM strat GROUP BY stratum
        ),
        tot AS (SELECT sum(nh * sh) AS z FROM per)
        SELECT CAST(per.stratum AS BIGINT) AS stratum,
               CAST(per.nh AS BIGINT) AS stratum_size,
               round(per.mh, 4) AS stratum_mean,
               round(per.sh, 4) AS stratum_sd,
               CAST(round(100.0 * per.nh * per.sh / tot.z, 0) AS BIGINT)
                   AS neyman_n,
               CAST(round(100.0 * per.nh
                          / (SELECT sum(nh) FROM per), 0) AS BIGINT)
                   AS proportional_n
        FROM per, tot
    """,
    doc="Neyman-optimal stratified sampling allocation: strata = "
    "document-length quintiles (deterministic ntile), budget 100 "
    "split as n_h proportional to N_h * S_h — high-variance strata "
    "get oversampled, which minimizes the variance of the "
    "estimated mean at fixed budget; the proportional allocation "
    "is printed beside it so the efficiency gap is visible. This "
    "is the PLANNING step before sample-stratified executes a "
    "draw (and the reason eval-panel budgets should not be split "
    "proportionally). One ntile window + one per-stratum moment "
    "aggregation; allocation math on the 5-row summary.",
    tags=("sample", "stats"),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.ranking import (
        exact_ntile,
        with_global_order,
    )

    d = load_table(spark, sf_dir, "documents")
    # quintile strata via the two-phase bucketed rank
    # (operators/ranking.py) — document frame grows with the corpus,
    # so no ntile global window.
    g = with_global_order(
        d.select("doc_id", "n_chars"), "n_chars", tiebreakers=("doc_id",),
        rn="__rn", total_count="__n",
    )
    strat = g.select(
        "n_chars",
        exact_ntile(F.col("__rn"), F.col("__n"), 5).alias("stratum"),
    )
    per = strat.groupBy("stratum").agg(
        F.count("*").alias("nh"),
        F.stddev_samp("n_chars").alias("sh"),
        F.avg("n_chars").alias("mh"),
    )
    tot = per.agg(
        F.sum(F.col("nh") * F.col("sh")).alias("z"), F.sum("nh").alias("n")
    )
    j = per.join(F.broadcast(tot))
    return j.select(
        F.col("stratum").cast("long").alias("stratum"),
        F.col("nh").cast("long").alias("stratum_size"),
        F.round("mh", 4).alias("stratum_mean"),
        F.round("sh", 4).alias("stratum_sd"),
        F.round(100.0 * F.col("nh") * F.col("sh") / F.col("z"), 0)
        .cast("long")
        .alias("neyman_n"),
        F.round(100.0 * F.col("nh") / F.col("n"), 0)
        .cast("long")
        .alias("proportional_n"),
    )


@query(
    "stats-lin-concordance",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS x,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS y
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY CAST(ts AS DATE)
        ),
        m AS (
            SELECT count(*) AS n,
                   avg(x) AS mx, avg(y) AS my,
                   var_pop(x) AS vx, var_pop(y) AS vy,
                   covar_pop(x, y) AS cxy,
                   corr(x, y) AS r
            FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               round(r, 6) AS pearson_r,
               round(2 * cxy / (vx + vy + power(mx - my, 2)), 6) AS lin_ccc,
               round(2 * cxy / (vx + vy + power(mx - my, 2)) / r, 6)
                   AS bias_correction_factor
        FROM m
    """,
    doc="Lin's concordance correlation between click and view daily "
    "mean values: CCC = 2*cov / (vx + vy + (mx - my)^2) penalizes "
    "LOCATION and SCALE disagreement that Pearson r ignores (two "
    "instruments can correlate at 0.99 while one reads 2x high — "
    "r says interchangeable, CCC says broken), so CCC is the "
    "method-agreement statistic for validating a cheap metric "
    "against an expensive one. The ratio CCC/r is the "
    "bias-correction factor isolating pure calibration error. "
    "Population moments in one aggregation over the paired daily "
    "summary.",
    tags=("stats",),
)
def stats_lin_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))).alias("x"),
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    m = daily.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
        F.covar_pop("x", "y").alias("cxy"),
        F.corr("x", "y").alias("r"),
    )
    ccc = (
        2
        * F.col("cxy")
        / (F.col("vx") + F.col("vy") + F.pow(F.col("mx") - F.col("my"), 2))
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("r", 6).alias("pearson_r"),
        F.round(ccc, 6).alias("lin_ccc"),
        F.round(ccc / F.col("r"), 6).alias("bias_correction_factor"),
    )


_EWMA_L = 0.2  # smoothing weight; 15-lag unroll truncates at 0.8^15 ~ 3.5%


@query(
    "stats-ewma-control-chart",
    # lag weights below are emitted from the SAME Python floats the
    # Spark plan computes ((1-lam)**k differs from hand-rounded decimal
    # literals by 1 ulp for several k — ADVICE r4)
    oracle=f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        base AS (
            SELECT avg(rev) AS mu, stddev_samp(rev) AS sd FROM daily
        ),
        ew AS (
            SELECT d.day, d.rev, b.mu, b.sd,
                   row_number() OVER (ORDER BY d.day) AS rn,
                   CAST({_EWMA_L!r} AS DOUBLE) * (rev
                     + CAST({(1 - _EWMA_L) ** 1!r} AS DOUBLE) * lag(rev, 1) OVER w
                     + CAST({(1 - _EWMA_L) ** 2!r} AS DOUBLE) * lag(rev, 2) OVER w
                     + CAST({(1 - _EWMA_L) ** 3!r} AS DOUBLE) * lag(rev, 3) OVER w
                     + CAST({(1 - _EWMA_L) ** 4!r} AS DOUBLE) * lag(rev, 4) OVER w
                     + CAST({(1 - _EWMA_L) ** 5!r} AS DOUBLE) * lag(rev, 5) OVER w
                     + CAST({(1 - _EWMA_L) ** 6!r} AS DOUBLE) * lag(rev, 6) OVER w
                     + CAST({(1 - _EWMA_L) ** 7!r} AS DOUBLE) * lag(rev, 7) OVER w
                     + CAST({(1 - _EWMA_L) ** 8!r} AS DOUBLE) * lag(rev, 8) OVER w
                     + CAST({(1 - _EWMA_L) ** 9!r} AS DOUBLE) * lag(rev, 9) OVER w
                     + CAST({(1 - _EWMA_L) ** 10!r} AS DOUBLE) * lag(rev, 10) OVER w
                     + CAST({(1 - _EWMA_L) ** 11!r} AS DOUBLE) * lag(rev, 11) OVER w
                     + CAST({(1 - _EWMA_L) ** 12!r} AS DOUBLE) * lag(rev, 12) OVER w
                     + CAST({(1 - _EWMA_L) ** 13!r} AS DOUBLE) * lag(rev, 13) OVER w
                     + CAST({(1 - _EWMA_L) ** 14!r} AS DOUBLE) * lag(rev, 14) OVER w
                     )
                   + CAST({(1 - _EWMA_L) ** 15!r} AS DOUBLE) * b.mu AS z
            FROM daily d, base b
            WINDOW w AS (ORDER BY d.day)
        )
        SELECT day, round(rev, 4) AS rev, round(z, 4) AS ewma,
               round(mu + 3 * sd * sqrt(CAST({_EWMA_L / (2 - _EWMA_L)!r} AS DOUBLE)), 4) AS ucl,
               round(mu - 3 * sd * sqrt(CAST({_EWMA_L / (2 - _EWMA_L)!r} AS DOUBLE)), 4) AS lcl,
               CAST(CASE WHEN z > mu + 3 * sd * sqrt(CAST({_EWMA_L / (2 - _EWMA_L)!r} AS DOUBLE))
                          OR z < mu - 3 * sd * sqrt(CAST({_EWMA_L / (2 - _EWMA_L)!r} AS DOUBLE))
                         THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
        FROM ew WHERE rn >= 15
    """,
    doc="EWMA control chart on daily revenue (lambda = 0.2): the "
    "geometric recursion unrolled to 15 lag terms with the "
    "truncated tail replaced by its expectation (0.8^15 * mu, "
    "3.5% weight — documented, deterministic), asymptotic 3-sigma "
    "limits mu +/- 3 sd sqrt(lambda/(2-lambda)). EWMA charts "
    "catch SMALL sustained shifts (0.5-1.5 sd) far sooner than "
    "the Shewhart chart's per-point rule — with "
    "stats-xbar-control-chart (big shifts) and timeseries-cusum "
    "(cumulative drift) this completes the SPC trio. Warm-up rows "
    "dropped; one window sort over the day summary.",
    tags=("stats", "timeseries"),
)
def stats_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    base = daily.agg(F.avg("rev").alias("mu"), F.stddev_samp("rev").alias("sd"))
    w = Window.orderBy("day")
    lam = _EWMA_L
    z = lam * (
        F.col("rev")
        + sum(((1 - lam) ** k) * F.lag("rev", k).over(w) for k in range(1, 15))
    ) + ((1 - lam) ** 15) * F.col("mu")
    ew = daily.join(F.broadcast(base)).select(
        "day",
        "rev",
        "mu",
        "sd",
        F.row_number().over(w).alias("rn"),
        z.alias("z"),
    )
    half = 3 * F.col("sd") * F.sqrt(F.lit(lam / (2 - lam)))
    ucl, lcl = F.col("mu") + half, F.col("mu") - half
    return ew.filter(F.col("rn") >= 15).select(
        "day",
        F.round("rev", 4).alias("rev"),
        F.round("z", 4).alias("ewma"),
        F.round(ucl, 4).alias("ucl"),
        F.round(lcl, 4).alias("lcl"),
        F.when((F.col("z") > ucl) | (F.col("z") < lcl), 1)
        .otherwise(0)
        .cast("long")
        .alias("out_of_control"),
    )


@query(
    "stats-binary-confusion-battery",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS pred,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS actual
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ),
        cm AS (
            SELECT CAST(sum(pred * actual) AS DOUBLE) AS tp,
                   CAST(sum(pred * (1 - actual)) AS DOUBLE) AS fp,
                   CAST(sum((1 - pred) * actual) AS DOUBLE) AS fn,
                   CAST(sum((1 - pred) * (1 - actual)) AS DOUBLE) AS tn
            FROM per_user
        )
        SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
               round((tp * tn - fp * fn)
                     / sqrt((tp + fp) * (tp + fn)
                            * (tn + fp) * (tn + fn)), 6) AS mcc,
               round(0.5 * (tp / (tp + fn) + tn / (tn + fp)), 6)
                   AS balanced_accuracy,
               round(tp / (tp + fn) + tn / (tn + fp) - 1, 6)
                   AS youden_informedness,
               round(2 * tp / (2 * tp + fp + fn), 6) AS f1
        FROM cm
    """,
    doc="Binary confusion battery for 'clicking predicts purchasing, "
    "same day' on user-day units (per-USER both flags saturate to "
    "1 -- every cell but TP empties and MCC divides by zero): "
    "MCC (the only single number that stays honest under class "
    "imbalance — it is the phi correlation of the 2x2 table), "
    "balanced accuracy, Youden informedness, F1, plus the raw "
    "cells so any other metric is recomputable. Accuracy and F1 "
    "both look fine on a 99:1 class split where MCC ~ 0 exposes a "
    "useless predictor — the reason imbalanced-data evals lead "
    "with it (stats-roc-auc-binned ranks scores; this scores one "
    "hard threshold). One per-user aggregation, one 4-cell "
    "summary.",
    tags=("stats",),
)
def stats_binary_confusion_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("pred"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "actual"
        ),
    )
    cm = per_user.agg(
        F.sum(F.col("pred") * F.col("actual")).cast("double").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("actual"))).cast("double").alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("actual")).cast("double").alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("actual")))
        .cast("double")
        .alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    sens, spec = tp / (tp + fn), tn / (tn + fp)
    return cm.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(
            (tp * tn - fp * fn)
            / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
            6,
        ).alias("mcc"),
        F.round(0.5 * (sens + spec), 6).alias("balanced_accuracy"),
        F.round(sens + spec - 1, 6).alias("youden_informedness"),
        F.round(2 * tp / (2 * tp + fp + fn), 6).alias("f1"),
    )


_PERM_B = 20
_PERM_SALT = ":perm-salt-r5"


@query(
    "stats-permutation-test",
    oracle=f"""
        WITH obs AS (
            SELECT avg(CASE WHEN event_type = 'click' THEN value END)
                   - avg(CASE WHEN event_type = 'view' THEN value END)
                       AS diff
            FROM events WHERE event_type IN ('click', 'view')
        ),
        reps AS (
            SELECT e.value, t.b,
                   ({sql_string_hash(
                       "CAST(e.event_id AS VARCHAR) || ':' || CAST(t.b AS VARCHAR)"
                       " || '" + _PERM_SALT + "'"
                   )}) % 2 AS g
            FROM events e
            CROSS JOIN (SELECT unnest(range({_PERM_B})) AS b) t
            WHERE e.event_type IN ('click', 'view')
        ),
        perm AS (
            SELECT b,
                   avg(CASE WHEN g = 1 THEN value END)
                   - avg(CASE WHEN g = 0 THEN value END) AS diff
            FROM reps GROUP BY b
        )
        SELECT CAST({_PERM_B} AS BIGINT) AS n_permutations,
               round(max(o.diff), 6) AS observed_diff,
               round(avg(abs(p.diff)), 6) AS mean_null_abs_diff,
               round((1.0 + sum(CASE WHEN abs(p.diff) >= abs(o.diff)
                                     THEN 1 ELSE 0 END))
                     / ({_PERM_B} + 1.0), 6) AS p_value
        FROM perm p CROSS JOIN obs o
    """,
    doc="Randomization (permutation) test for the click-vs-view mean "
    "value difference: B=20 pseudo-permutations reassign each row's "
    "group by a deterministic md5 hash of (event_id, b) — the "
    "distribution-free significance test that needs no normality or "
    "equal-variance assumption (the exact complement to stats-welch-"
    "ttest on the same contrast), with the add-one p-value (Phipson-"
    "Smyth) that never reports 0. The hash makes every replicate "
    "reproducible across engines and retries — rand()-based "
    "permutation tests are neither — and the B-fold fan-out is an "
    "explicit constant multiplier (B x one hash-agg), embarrassingly "
    "parallel at 100 TB; raise B for finer p resolution, cost is "
    "linear.",
    tags=("stats",),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.dedup import string_hash

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    obs = ev.agg(
        (
            F.avg(F.when(F.col("event_type") == "click", F.col("value")))
            - F.avg(F.when(F.col("event_type") == "view", F.col("value")))
        ).alias("diff")
    )
    reps = ev.select(
        "value",
        F.explode(
            F.array(*[F.lit(b) for b in range(_PERM_B)])
        ).alias("b"),
        "event_id",
    ).select(
        "value",
        "b",
        (
            string_hash(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                    F.lit(_PERM_SALT),
                )
            )
            % 2
        ).alias("g"),
    )
    perm = reps.groupBy("b").agg(
        (
            F.avg(F.when(F.col("g") == 1, F.col("value")))
            - F.avg(F.when(F.col("g") == 0, F.col("value")))
        ).alias("diff")
    )
    return perm.crossJoin(F.broadcast(obs.select(F.col("diff").alias("odiff")))).agg(
        F.lit(_PERM_B).cast("long").alias("n_permutations"),
        F.round(F.max("odiff"), 6).alias("observed_diff"),
        F.round(F.avg(F.abs(F.col("diff"))), 6).alias("mean_null_abs_diff"),
        F.round(
            (
                1.0
                + F.sum(
                    F.when(
                        F.abs(F.col("diff")) >= F.abs(F.col("odiff")), 1
                    ).otherwise(0)
                )
            )
            / (_PERM_B + 1.0),
            6,
        ).alias("p_value"),
    )


_FK_SALT = ":fleiss-salt-r5"


@query(
    "eval-fleiss-kappa",
    oracle=f"""
        WITH ratings AS (
            SELECT e.event_id,
                   CASE WHEN ({sql_string_hash(
                       "CAST(e.event_id AS VARCHAR) || ':' ||"
                       " CAST(t.r AS VARCHAR) || '" + _FK_SALT + "'"
                   )}) % 4 = 0
                        THEN (least(CAST(floor(e.value / 34) AS BIGINT), 2)
                              + 1
                              + ({sql_string_hash(
                       "CAST(e.event_id AS VARCHAR) || ':n:' ||"
                       " CAST(t.r AS VARCHAR) || '" + _FK_SALT + "'"
                   )}) % 2) % 3
                        ELSE least(CAST(floor(e.value / 34) AS BIGINT), 2)
                   END AS cat
            FROM events e
            CROSS JOIN (SELECT unnest(range(3)) AS r) t
        ),
        cell AS (
            SELECT event_id, cat, CAST(count(*) AS DOUBLE) AS nij
            FROM ratings GROUP BY event_id, cat
        ),
        per_subj AS (
            SELECT event_id,
                   (sum(nij * nij) - 3) / (3.0 * 2.0) AS p_i
            FROM cell GROUP BY event_id
        ),
        pj AS (
            SELECT cat, sum(nij) AS nj FROM cell GROUP BY cat
        ),
        pe AS (
            SELECT sum((nj / (SELECT sum(nj) FROM pj))
                       * (nj / (SELECT sum(nj) FROM pj))) AS pe
            FROM pj
        )
        SELECT CAST(count(*) AS BIGINT) AS n_subjects,
               round(avg(p_i), 6) AS p_bar,
               round(max(pe.pe), 6) AS p_e,
               round((avg(p_i) - max(pe.pe)) / (1 - max(pe.pe)), 6)
                   AS fleiss_kappa
        FROM per_subj CROSS JOIN pe
    """,
    doc="Fleiss' kappa inter-annotator agreement for 3 raters x 3 "
    "categories (raters are deterministic hash-perturbed copies of a "
    "value-band label — ~25% noise rate — so the statistic exercises "
    "real disagreement): P_i per subject from category count squares, "
    "chance agreement P_e from squared marginals, kappa = "
    "(P_bar - P_e)/(1 - P_e). THE quality gate for human-labeled "
    "training data — a labeling pipeline whose kappa is near chance "
    "produces noise, not signal, and rater-subset kappas localize "
    "the problem. Plan: rater fan-out is an explicit 3x constant, "
    "then two hash aggregations (per-subject, per-category) and a "
    "1-row chance term — no windows at all.",
    tags=("eval", "stats"),
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.dedup import string_hash

    ev = load_table(spark, sf_dir, "events")
    base = F.least(F.floor(F.col("value") / 34).cast("long"), F.lit(2))
    r = ev.select("event_id", "value").select(
        "event_id",
        "value",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"),
    )
    noisy = (
        string_hash(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("r").cast("string"),
                F.lit(_FK_SALT),
            )
        )
        % 4
        == 0
    )
    shift = (
        string_hash(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit(":n:"),
                F.col("r").cast("string"),
                F.lit(_FK_SALT),
            )
        )
        % 2
    )
    ratings = r.select(
        "event_id",
        F.when(noisy, (base + 1 + shift) % 3).otherwise(base).alias("cat"),
    )
    cell = ratings.groupBy("event_id", "cat").agg(
        F.count("*").cast("double").alias("nij")
    )
    per_subj = cell.groupBy("event_id").agg(
        ((F.sum(F.col("nij") * F.col("nij")) - 3) / (3.0 * 2.0)).alias("p_i")
    )
    pj = cell.groupBy("cat").agg(F.sum("nij").alias("nj"))
    tot = pj.agg(F.sum("nj").alias("tot"))
    pe = (
        pj.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("nj") / F.col("tot")) * (F.col("nj") / F.col("tot"))
            ).alias("pe")
        )
    )
    return per_subj.crossJoin(F.broadcast(pe)).agg(
        F.count("*").cast("long").alias("n_subjects"),
        F.round(F.avg("p_i"), 6).alias("p_bar"),
        F.round(F.max("pe"), 6).alias("p_e"),
        F.round(
            (F.avg("p_i") - F.max("pe")) / (1 - F.max("pe")), 6
        ).alias("fleiss_kappa"),
    )


@query(
    "stats-copula-tail-dependence",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   avg(CASE WHEN event_type = 'click' THEN value END) AS x,
                   avg(CASE WHEN event_type = 'view' THEN value END) AS y
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
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))).alias("x"),
            F.avg(F.when(F.col("event_type") == "view", F.col("value"))).alias("y"),
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
