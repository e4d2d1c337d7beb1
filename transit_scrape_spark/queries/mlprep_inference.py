"""Survival analysis and econometric inference ops shipped with the
round-5 mlprep wave. Split from mlprep.py in round 6. Same
@query/oracle discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash, string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.session import cache_width
from transit_scrape_spark.sources.tables import load_table


@query(
    "timeseries-intervention-its",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        bounds AS (
            SELECT min(d) AS d0,
                   CAST(date_diff('day', min(d), max(d)) / 2 AS BIGINT) AS t0
            FROM daily
        ),
        pts AS (
            SELECT CAST(date_diff('day', b.d0, d) AS DOUBLE) AS t, y,
                   CASE WHEN date_diff('day', b.d0, d) >= b.t0
                        THEN 1 ELSE 0 END AS post,
                   b.t0
            FROM daily CROSS JOIN bounds b
        ),
        seg AS (
            SELECT post, max(t0) AS t0,
                   CAST(count(*) AS BIGINT) AS n,
                   regr_slope(y, t) AS slope,
                   regr_intercept(y, t) AS icept
            FROM pts GROUP BY post
        )
        SELECT max(t0) AS t0_day,
               max(CASE WHEN post = 0 THEN n END) AS n_pre,
               max(CASE WHEN post = 1 THEN n END) AS n_post,
               round(max(CASE WHEN post = 0 THEN slope END), 6) AS slope_pre,
               round(max(CASE WHEN post = 1 THEN slope END), 6) AS slope_post,
               round(max(CASE WHEN post = 1 THEN slope END)
                   - max(CASE WHEN post = 0 THEN slope END), 6) AS slope_change,
               round((max(CASE WHEN post = 1 THEN icept END)
                      + max(CASE WHEN post = 1 THEN slope END) * max(t0))
                   - (max(CASE WHEN post = 0 THEN icept END)
                      + max(CASE WHEN post = 0 THEN slope END) * max(t0)),
                   6) AS level_jump
        FROM seg
    """,
    doc="Interrupted-time-series (segmented regression) on the daily "
    "event-volume series with the breakpoint at mid-span: fit "
    "independent OLS lines pre and post via regr_slope/regr_intercept "
    "and report the slope change and the level jump at the "
    "breakpoint (counterfactual pre-trend extrapolated to t0 vs the "
    "post line's value there) — the standard quasi-experimental "
    "read-out when a launch/policy lands at a known date and no "
    "control group exists (complements analytics-diff-in-diff, which "
    "needs one, and analytics-event-study, which reads day-level "
    "abnormal deltas rather than trend breaks). Daily rollup is "
    "bounded by the calendar, the regressions are built-in "
    "partial-aggregable regr_* — one shuffle total at any scale.",
    tags=("timeseries", "stats"),
)
def timeseries_intervention_its(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    bounds = daily.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) / 2)
        .cast("long")
        .alias("t0"),
    )
    pts = daily.crossJoin(F.broadcast(bounds)).select(
        F.datediff("d", "d0").cast("double").alias("t"),
        "y",
        (F.datediff("d", "d0") >= F.col("t0")).cast("int").alias("post"),
        "t0",
    )
    seg = pts.groupBy("post").agg(
        F.max("t0").alias("t0"),
        F.count("*").cast("long").alias("n"),
        F.regr_slope("y", "t").alias("slope"),
        F.regr_intercept("y", "t").alias("icept"),
    )

    def seg_max(col: str, post: int):
        return F.max(F.when(F.col("post") == post, F.col(col)))

    return seg.agg(
        F.max("t0").alias("t0_day"),
        seg_max("n", 0).alias("n_pre"),
        seg_max("n", 1).alias("n_post"),
        F.round(seg_max("slope", 0), 6).alias("slope_pre"),
        F.round(seg_max("slope", 1), 6).alias("slope_post"),
        F.round(seg_max("slope", 1) - seg_max("slope", 0), 6).alias(
            "slope_change"
        ),
        F.round(
            (seg_max("icept", 1) + seg_max("slope", 1) * F.max("t0"))
            - (seg_max("icept", 0) + seg_max("slope", 0) * F.max("t0")),
            6,
        ).alias("level_jump"),
    )


@query(
    "stats-anova-two-way",
    oracle="""
        WITH obs AS (
            SELECT event_type AS a,
                   CAST(floor(extract(hour FROM ts) / 6) AS INT) AS b,
                   value AS y
            FROM events
        ),
        g AS (SELECT avg(y) AS gm, CAST(count(*) AS DOUBLE) AS n FROM obs),
        ma AS (SELECT a, avg(y) AS am, CAST(count(*) AS DOUBLE) AS na
               FROM obs GROUP BY a),
        mb AS (SELECT b, avg(y) AS bm, CAST(count(*) AS DOUBLE) AS nb
               FROM obs GROUP BY b),
        mc AS (SELECT a, b, avg(y) AS cm, CAST(count(*) AS DOUBLE) AS nc
               FROM obs GROUP BY a, b),
        sse AS (
            SELECT sum((o.y - c.cm) * (o.y - c.cm)) AS ss_err
            FROM obs o JOIN mc c ON o.a = c.a AND o.b = c.b
        ),
        ssa AS (SELECT sum(na * (am - g.gm) * (am - g.gm)) AS ss_a,
                       CAST(count(*) AS DOUBLE) - 1 AS df_a
                FROM ma CROSS JOIN g GROUP BY g.gm),
        ssb AS (SELECT sum(nb * (bm - g.gm) * (bm - g.gm)) AS ss_b,
                       CAST(count(*) AS DOUBLE) - 1 AS df_b
                FROM mb CROSS JOIN g GROUP BY g.gm),
        ssab AS (
            SELECT sum(nc * (cm - am - bm + g.gm) * (cm - am - bm + g.gm))
                       AS ss_ab,
                   CAST(count(*) AS DOUBLE) AS n_cells
            FROM mc c
            JOIN ma ON c.a = ma.a
            JOIN mb ON c.b = mb.b
            CROSS JOIN g
            GROUP BY g.gm
        )
        SELECT src, round(ss, 4) AS sum_sq, CAST(df AS BIGINT) AS df,
               round(ss / df, 6) AS mean_sq,
               round((ss / df) / (e.ss_err / (g.n - ab.n_cells)), 4) AS f_stat
        FROM (
            SELECT 'event_type' AS src, ss_a AS ss, df_a AS df FROM ssa
            UNION ALL
            SELECT 'hour_quadrant', ss_b, df_b FROM ssb
            UNION ALL
            SELECT 'interaction', ss_ab,
                   (SELECT df_a FROM ssa) * (SELECT df_b FROM ssb)
            FROM ssab
        ) t
        CROSS JOIN sse e CROSS JOIN g CROSS JOIN ssab ab
    """,
    doc="Two-way ANOVA with interaction on event value by event_type x "
    "hour-of-day quadrant: cell-mean decomposition SS_A (weighted "
    "main effect), SS_B, SS_AB (interaction contrast "
    "cm - am - bm + gm), SSE from the full-cell model, each with its "
    "F against MSE — the factorial extension of stats-anova-oneway / "
    "stats-welch-anova that tests whether the hour effect DIFFERS by "
    "event type, not merely whether either margin moves. Unbalanced "
    "cells use the weighted (Type-I-style) decomposition; documented "
    "rather than hidden, the statistic is exactly mirrored in the "
    "oracle. Shape: three bounded groupBys (5, 4, 20 rows) + one "
    "fact-side join to cell means — one wide shuffle at any scale.",
    tags=("stats",),
)
def stats_anova_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # persist the 3-column observation projection: g/ma/mb/mc/ss_err all
    # aggregate over it and each re-planned its own events scan (5 fact
    # scans in the r11 before-plan even with the summary persists below).
    # One scan + one narrow cache; release_caches() reclaims it. At
    # cluster scale the projection is a fraction of the table width and
    # DataFrame persist spills to disk, so the shape survives 100 TB.
    obs = ev.select(
        F.col("event_type").alias("a"),
        F.floor(F.hour("ts") / 6).cast("int").alias("b"),
        F.col("value").alias("y"),
    ).persist()
    g = obs.agg(
        F.avg("y").alias("gm"), F.count("*").cast("double").alias("n")
    ).persist()
    # persist the bounded marginal/cell summaries (5/4/20 rows): the
    # SS branches reference them repeatedly, and uncached every
    # reference re-scans the fact table (19 scans in the executed plan
    # — rfm-class fan-out). release_caches() cleans up.
    ma = obs.groupBy("a").agg(
        F.avg("y").alias("am"), F.count("*").cast("double").alias("na")
    ).persist()
    mb = obs.groupBy("b").agg(
        F.avg("y").alias("bm"), F.count("*").cast("double").alias("nb")
    ).persist()
    mc = obs.groupBy("a", "b").agg(
        F.avg("y").alias("cm"), F.count("*").cast("double").alias("nc")
    ).persist()
    ss_err = (
        obs.join(F.broadcast(mc.select("a", "b", "cm")), ["a", "b"])
        .agg(
            F.sum(
                (F.col("y") - F.col("cm")) * (F.col("y") - F.col("cm"))
            ).alias("ss_err")
        )
    )
    ssa = (
        ma.crossJoin(F.broadcast(g))
        .groupBy("gm")
        .agg(
            F.sum(
                F.col("na") * (F.col("am") - F.col("gm")) * (F.col("am") - F.col("gm"))
            ).alias("ss_a"),
            (F.count("*").cast("double") - 1).alias("df_a"),
        )
        .select("ss_a", "df_a")
    )
    ssb = (
        mb.crossJoin(F.broadcast(g))
        .groupBy("gm")
        .agg(
            F.sum(
                F.col("nb") * (F.col("bm") - F.col("gm")) * (F.col("bm") - F.col("gm"))
            ).alias("ss_b"),
            (F.count("*").cast("double") - 1).alias("df_b"),
        )
        .select("ss_b", "df_b")
    )
    inter = (
        mc.join(F.broadcast(ma.select("a", "am")), "a")
        .join(F.broadcast(mb.select("b", "bm")), "b")
        .crossJoin(F.broadcast(g))
    )
    dev = F.col("cm") - F.col("am") - F.col("bm") + F.col("gm")
    ssab = inter.groupBy("gm").agg(
        F.sum(F.col("nc") * dev * dev).alias("ss_ab"),
        F.count("*").cast("double").alias("n_cells"),
    ).select("ss_ab", "n_cells")
    rows = (
        ssa.select(
            F.lit("event_type").alias("src"),
            F.col("ss_a").alias("ss"),
            F.col("df_a").alias("df"),
        )
        .unionByName(
            ssb.select(
                F.lit("hour_quadrant").alias("src"),
                F.col("ss_b").alias("ss"),
                F.col("df_b").alias("df"),
            )
        )
        .unionByName(
            ssab.crossJoin(F.broadcast(ssa.select("df_a")))
            .crossJoin(F.broadcast(ssb.select("df_b")))
            .select(
                F.lit("interaction").alias("src"),
                F.col("ss_ab").alias("ss"),
                (F.col("df_a") * F.col("df_b")).alias("df"),
            )
        )
    )
    return (
        rows.crossJoin(F.broadcast(ss_err))
        .crossJoin(F.broadcast(g.select("n")))
        .crossJoin(F.broadcast(ssab.select("n_cells")))
        .select(
            "src",
            F.round("ss", 4).alias("sum_sq"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("ss") / F.col("df"), 6).alias("mean_sq"),
            F.round(
                (F.col("ss") / F.col("df"))
                / (F.col("ss_err") / (F.col("n") - F.col("n_cells"))),
                4,
            ).alias("f_stat"),
        )
    )


@query(
    "timeseries-croston",
    oracle="""
        WITH demand AS (
            SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
                   sum(l_quantity) AS z
            FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2
        ),
        seq AS (
            SELECT l_partkey, d, z,
                   row_number() OVER w AS rn,
                   count(*) OVER (PARTITION BY l_partkey) AS n,
                   CAST(date_diff('day',
                        lag(d) OVER w, d) AS DOUBLE) AS iv
            FROM demand
            WINDOW w AS (PARTITION BY l_partkey ORDER BY d)
        ),
        eligible AS (SELECT * FROM seq WHERE n >= 4),
        zhat AS (
            SELECT l_partkey, max(n) AS n_demands,
                   sum(CASE WHEN rn = 1 THEN power(0.9, n - 1) * z
                            ELSE 0.1 * power(0.9, n - rn) * z END) AS z_hat,
                   sum(CASE WHEN rn = 2 THEN power(0.9, n - 2) * iv
                            WHEN rn > 2 THEN 0.1 * power(0.9, n - rn) * iv
                            ELSE 0 END) AS p_hat
            FROM eligible GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(n_demands AS BIGINT) AS n_demands,
               round(z_hat, 6) AS size_ses,
               round(p_hat, 6) AS interval_ses,
               round(z_hat / p_hat, 6) AS croston_forecast
        FROM zhat
        ORDER BY croston_forecast DESC, l_partkey
        LIMIT 20
    """,
    doc="Croston's method for intermittent demand — the standard "
    "forecaster when most periods have ZERO demand and plain "
    "SES/Holt (timeseries-ses-grid, -holt-linear) smear the zeros "
    "into a biased level: SES(alpha=0.1) separately on the non-zero "
    "demand SIZES and on the inter-demand INTERVALS, forecast per "
    "period = z_hat/p_hat. The recursive SES is unrolled into its "
    "closed weighted form (alpha(1-alpha)^(n-k), first term "
    "(1-alpha)^(n-1)) so both engines compute an identical "
    "windowless-per-row sum; windows partition BY PART over that "
    "part's demand dates — bounded per key, parallel across the part "
    "dimension, exactly how 100 TB of sparse SKU series shards. "
    "Top-20 via global sort on the tiny per-part summary.",
    tags=("timeseries",),
)
def timeseries_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    demand = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(F.sum("l_quantity").alias("z"))
    w = Window.partitionBy("l_partkey").orderBy("d")
    seq = demand.select(
        "l_partkey",
        "d",
        "z",
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("l_partkey"))
        .alias("n"),
        F.datediff("d", F.lag("d").over(w)).cast("double").alias("iv"),
    ).filter(F.col("n") >= 4)
    rn, n, z, iv = F.col("rn"), F.col("n"), F.col("z"), F.col("iv")
    a = F.lit(0.1)
    zhat = seq.groupBy("l_partkey").agg(
        F.max("n").cast("long").alias("n_demands"),
        F.sum(
            F.when(rn == 1, F.pow(1 - a, n - 1) * z).otherwise(
                a * F.pow(1 - a, n - rn) * z
            )
        ).alias("z_hat"),
        F.sum(
            F.when(rn == 2, F.pow(1 - a, n - 2) * iv)
            .when(rn > 2, a * F.pow(1 - a, n - rn) * iv)
            .otherwise(0.0)
        ).alias("p_hat"),
    )
    return (
        zhat.select(
            "l_partkey",
            "n_demands",
            F.round("z_hat", 6).alias("size_ses"),
            F.round("p_hat", 6).alias("interval_ses"),
            F.round(F.col("z_hat") / F.col("p_hat"), 6).alias(
                "croston_forecast"
            ),
        )
        .orderBy(F.col("croston_forecast").desc(), "l_partkey")
        .limit(20)
    )


@query(
    "stats-g-test",
    oracle="""
        WITH cells AS (
            SELECT lang, source, CAST(count(*) AS DOUBLE) AS obs
            FROM documents GROUP BY lang, source
        ),
        tot AS (
            SELECT lang, source, obs,
                   sum(obs) OVER (PARTITION BY lang) AS row_tot,
                   sum(obs) OVER (PARTITION BY source) AS col_tot,
                   sum(obs) OVER () AS n
            FROM cells
        ),
        g AS (
            SELECT max(n) AS n,
                   CAST(count(DISTINCT lang) AS DOUBLE) AS r,
                   CAST(count(DISTINCT source) AS DOUBLE) AS c,
                   2 * sum(CASE WHEN obs > 0
                                THEN obs * ln(obs / (row_tot * col_tot / n))
                                ELSE 0 END) AS g_stat
            FROM tot
        ),
        marg AS (
            -- marginal reciprocal sums over DISTINCT rows/cols: summing
            -- 1/row_tot over present cells divided by c only works for a
            -- DENSE table; empty (lang, source) cells made that form
            -- understate q (caught by tests/test_golden_stats.py).
            SELECT (SELECT sum(1.0 / rt) FROM (
                        SELECT sum(obs) AS rt FROM cells GROUP BY lang))
                       AS inv_rows,
                   (SELECT sum(1.0 / ct) FROM (
                        SELECT sum(obs) AS ct FROM cells GROUP BY source))
                       AS inv_cols
        )
        SELECT CAST(g.n AS BIGINT) AS n_docs,
               CAST((g.r - 1) * (g.c - 1) AS BIGINT) AS dof,
               round(g.g_stat, 6) AS g_stat,
               round(1 + (g.n * m.inv_rows - 1) * (g.n * m.inv_cols - 1)
                         / (6 * g.n * (g.r - 1) * (g.c - 1)), 6) AS williams_q,
               round(g.g_stat / (1 + (g.n * m.inv_rows - 1)
                                     * (g.n * m.inv_cols - 1)
                                     / (6 * g.n * (g.r - 1) * (g.c - 1))), 6)
                   AS g_adj
        FROM g CROSS JOIN marg m
    """,
    doc="G-test (log-likelihood-ratio independence test) on the lang x "
    "source contingency table with Williams' small-sample correction "
    "q = 1 + (N*sum(1/row)-1)(N*sum(1/col)-1) / (6N(r-1)(c-1)): "
    "G = 2*sum O ln(O/E) is additive across partitions of the table "
    "(chi-square is not) and is the test the chi2 approximates — "
    "stats-chi-square's companion for sparse cells, on a DIFFERENT "
    "pair of factors so the two ops cross-check distinct fixture "
    "margins. Cell counts, marginal windows over the bounded "
    "(lang x source) grid, one scalar combine — the same "
    "contingency shape at any data volume.",
    tags=("stats",),
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    # persist the BOUNDED contingency cells (<= #langs x #sources rows
    # at any scale): the margin windows and both reciprocal-margin
    # rollups re-consumed them (3 documents scans -> 1)
    cells = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("obs")
    ).coalesce(1).persist()
    tot = cells.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    g = tot.agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").cast("double").alias("r"),
        F.countDistinct("source").cast("double").alias("c"),
        (
            2
            * F.sum(
                F.when(
                    F.col("obs") > 0,
                    F.col("obs")
                    * F.log(
                        F.col("obs")
                        / (F.col("row_tot") * F.col("col_tot") / F.col("n"))
                    ),
                ).otherwise(0.0)
            )
        ).alias("g_stat"),
    )
    # marginal reciprocal sums over DISTINCT rows/cols, not present cells:
    # with empty (lang, source) cells the per-cell form understated q
    # (caught by tests/test_golden_stats.py).
    rmarg = (
        cells.groupBy("lang")
        .agg(F.sum("obs").alias("rt"))
        .agg(F.sum(1.0 / F.col("rt")).alias("inv_rows"))
    )
    cmarg = (
        cells.groupBy("source")
        .agg(F.sum("obs").alias("ct"))
        .agg(F.sum(1.0 / F.col("ct")).alias("inv_cols"))
    )
    marg = rmarg.crossJoin(F.broadcast(cmarg))
    q = 1 + (F.col("n") * F.col("inv_rows") - 1) * (
        F.col("n") * F.col("inv_cols") - 1
    ) / (6 * F.col("n") * (F.col("r") - 1) * (F.col("c") - 1))
    return (
        g.crossJoin(F.broadcast(marg))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            ((F.col("r") - 1) * (F.col("c") - 1))
            .cast("long")
            .alias("dof"),
            F.round("g_stat", 6).alias("g_stat"),
            F.round(q, 6).alias("williams_q"),
            F.round(F.col("g_stat") / q, 6).alias("g_adj"),
        )
    )


@query(
    "stats-ancova",
    oracle="""
        WITH obs AS (
            SELECT event_type AS g,
                   CAST(extract(hour FROM ts) AS DOUBLE) AS x,
                   value AS y
            FROM events
        ),
        per_g AS (
            SELECT g, CAST(count(*) AS DOUBLE) AS n_g,
                   avg(x) AS xbar_g, avg(y) AS ybar_g,
                   (count(*) - 1) * var_samp(x) AS sxx_g,
                   (count(*) - 1) * covar_samp(x, y) AS sxy_g,
                   (count(*) - 1) * var_samp(y) AS syy_g
            FROM obs GROUP BY g
        ),
        pooled AS (
            SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS k,
                   sum(sxx_g) AS sxx_w, sum(sxy_g) AS sxy_w,
                   sum(syy_g) AS syy_w,
                   sum(n_g * xbar_g) / sum(n_g) AS xbar
            FROM per_g
        ),
        total AS (
            SELECT (count(*) - 1) * var_samp(x) AS sxx_t,
                   (count(*) - 1) * covar_samp(x, y) AS sxy_t,
                   (count(*) - 1) * var_samp(y) AS syy_t
            FROM obs
        ),
        fit AS (
            SELECT p.n, p.k, p.xbar,
                   p.sxy_w / p.sxx_w AS b_w,
                   p.syy_w - p.sxy_w * p.sxy_w / p.sxx_w AS sse_full,
                   t.syy_t - t.sxy_t * t.sxy_t / t.sxx_t AS sse_reduced
            FROM pooled p CROSS JOIN total t
        )
        SELECT g.g AS grp, CAST(g.n_g AS BIGINT) AS n,
               round(g.ybar_g, 6) AS raw_mean,
               round(g.ybar_g - f.b_w * (g.xbar_g - f.xbar), 6)
                   AS adjusted_mean,
               round(f.b_w, 6) AS common_slope,
               round(((f.sse_reduced - f.sse_full) / (f.k - 1))
                     / (f.sse_full / (f.n - f.k - 1)), 4) AS f_group
        FROM per_g g CROSS JOIN fit f
    """,
    doc="One-way ANCOVA — group effect on event value ADJUSTED for the "
    "hour-of-day covariate: pooled within-group slope b_w = "
    "Sxy_w/Sxx_w, covariate-adjusted group means "
    "ybar_g - b_w(xbar_g - xbar), and the group F comparing the "
    "common-slope model's SSE against the no-groups reduced model — "
    "the analysis stats-anova-oneway gets WRONG whenever groups "
    "differ in covariate mix (confounded margins). All from per-group "
    "var/covar sums: one bounded groupBy plus one global moment "
    "aggregate, scalar algebra after — no residual materialization, "
    "no second pass over the fact table.",
    tags=("stats",),
)
def stats_ancova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        F.col("event_type").alias("g"),
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    # persist the BOUNDED per-group moments (<= #event_types rows at
    # any scale): the pooled rollup and the per-group output both
    # re-consumed them, re-planning the events scan (3 scans -> 2; the
    # total-moments pass keeps its own scan — deriving it from group
    # moments would change the float path under the 4-dp F statistic)
    per_g = obs.groupBy("g").agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("x").alias("xbar_g"),
        F.avg("y").alias("ybar_g"),
        ((F.count("*") - 1) * F.var_samp("x")).alias("sxx_g"),
        ((F.count("*") - 1) * F.covar_samp("x", "y")).alias("sxy_g"),
        ((F.count("*") - 1) * F.var_samp("y")).alias("syy_g"),
    ).coalesce(1).persist()
    pooled = per_g.agg(
        F.sum("n_g").alias("n"),
        F.count("*").cast("double").alias("k"),
        F.sum("sxx_g").alias("sxx_w"),
        F.sum("sxy_g").alias("sxy_w"),
        F.sum("syy_g").alias("syy_w"),
        (F.sum(F.col("n_g") * F.col("xbar_g")) / F.sum("n_g")).alias(
            "xbar"
        ),
    )
    total = obs.agg(
        ((F.count("*") - 1) * F.var_samp("x")).alias("sxx_t"),
        ((F.count("*") - 1) * F.covar_samp("x", "y")).alias("sxy_t"),
        ((F.count("*") - 1) * F.var_samp("y")).alias("syy_t"),
    )
    fit = (
        pooled.crossJoin(F.broadcast(total))
        .select(
            "n",
            "k",
            "xbar",
            (F.col("sxy_w") / F.col("sxx_w")).alias("b_w"),
            (
                F.col("syy_w")
                - F.col("sxy_w") * F.col("sxy_w") / F.col("sxx_w")
            ).alias("sse_full"),
            (
                F.col("syy_t")
                - F.col("sxy_t") * F.col("sxy_t") / F.col("sxx_t")
            ).alias("sse_reduced"),
        )
    )
    f_group = (
        (F.col("sse_reduced") - F.col("sse_full")) / (F.col("k") - 1)
    ) / (F.col("sse_full") / (F.col("n") - F.col("k") - 1))
    return per_g.crossJoin(F.broadcast(fit)).select(
        F.col("g").alias("grp"),
        F.col("n_g").cast("long").alias("n"),
        F.round("ybar_g", 6).alias("raw_mean"),
        F.round(
            F.col("ybar_g") - F.col("b_w") * (F.col("xbar_g") - F.col("xbar")),
            6,
        ).alias("adjusted_mean"),
        F.round("b_w", 6).alias("common_slope"),
        F.round(f_group, 4).alias("f_group"),
    )


@query(
    "stats-tukey-hsd",
    oracle="""
        WITH grp AS (
            SELECT event_type AS g, CAST(count(*) AS DOUBLE) AS n_g,
                   avg(value) AS m_g,
                   (count(*) - 1) * var_samp(value) AS ss_g
            FROM events GROUP BY event_type
        ),
        mse AS (
            SELECT sum(ss_g) / (sum(n_g) - count(*)) AS mse,
                   sum(n_g) - count(*) AS df_err
            FROM grp
        )
        SELECT a.g AS group_a, b.g AS group_b,
               round(a.m_g - b.m_g, 6) AS mean_diff,
               round(sqrt(m.mse / 2 * (1 / a.n_g + 1 / b.n_g)), 6) AS se,
               round(abs(a.m_g - b.m_g)
                     / sqrt(m.mse / 2 * (1 / a.n_g + 1 / b.n_g)), 4)
                   AS q_stat,
               CAST(m.df_err AS BIGINT) AS df_err
        FROM grp a JOIN grp b ON a.g < b.g CROSS JOIN mse m
    """,
    doc="Tukey-Kramer HSD post-hoc pairwise comparisons after one-way "
    "ANOVA (the follow-up stats-anova-oneway stops short of): for "
    "every group pair the studentized-range statistic q = |m_i - m_j| "
    "/ sqrt(MSE/2 (1/n_i + 1/n_j)) with the pooled within-group MSE "
    "— Kramer's harmonic correction handles the unbalanced cells. "
    "Compare q against q_crit(k, df) offline; emitting the statistic "
    "keeps the op table-free and engine-pure like stats-welch-ttest. "
    "The pair join is over the 5-row GROUP SUMMARY (k(k-1)/2 rows), "
    "never the fact table — post-hoc analysis costs one groupBy at "
    "any scale.",
    tags=("stats",),
)
def stats_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # persist the BOUNDED per-group summary (<= #event_types rows at
    # any scale): the MSE rollup and both sides of the pairwise
    # broadcast join re-consumed it (3 events scans -> 1)
    grp = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("value").alias("m_g"),
        ((F.count("*") - 1) * F.var_samp("value")).alias("ss_g"),
    ).coalesce(1).persist()
    mse = grp.agg(
        (F.sum("ss_g") / (F.sum("n_g") - F.count("*"))).alias("mse"),
        (F.sum("n_g") - F.count("*")).alias("df_err"),
    )
    a = grp.select(
        F.col("g").alias("group_a"),
        F.col("n_g").alias("n_a"),
        F.col("m_g").alias("m_a"),
    )
    b = grp.select(
        F.col("g").alias("group_b"),
        F.col("n_g").alias("n_b"),
        F.col("m_g").alias("m_b"),
    )
    se = F.sqrt(
        F.col("mse") / 2 * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "group_a",
            "group_b",
            F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
            F.round(se, 6).alias("se"),
            F.round(F.abs(F.col("m_a") - F.col("m_b")) / se, 4).alias(
                "q_stat"
            ),
            F.col("df_err").cast("long").alias("df_err"),
        )
    )


@query(
    "timeseries-time-decay-avg",
    oracle="""
        WITH w AS (
            SELECT user_id, value,
                   power(0.5,
                         CAST(date_diff('second', ts,
                              max(ts) OVER (PARTITION BY user_id))
                              AS DOUBLE) / (7 * 86400.0)) AS wt
            FROM events
        ),
        pu AS (
            SELECT user_id, sum(wt * value) / sum(wt) AS decayed_avg
            FROM w GROUP BY user_id
        )
        SELECT CAST(floor(decayed_avg / 10) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_users,
               round(avg(decayed_avg), 6) AS mean_decayed
        FROM pu GROUP BY 1
    """,
    doc="Irregular-spacing time-decayed average (half-life 7 days, "
    "anchored at each user's LAST event): weight = 0.5^(dt/halflife) "
    "— the time-aware recency metric row-based EWMA "
    "(timeseries-ewma, window-ewma) gets wrong whenever events "
    "arrive unevenly, because a row-decay treats a 1-minute gap and "
    "a 1-month gap identically. The closed weighted-sum form needs "
    "no recursion: one per-user max-ts window (PARTITIONED — "
    "per-key, parallel across users) and one groupBy ratio; "
    "histogram of the per-user result keeps output bounded. This is "
    "the standard freshness feature in feature stores at any scale.",
    tags=("timeseries", "ml"),
)
def timeseries_time_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    max_ts = F.max("ts").over(Window.partitionBy("user_id"))
    wt = F.pow(
        0.5,
        (F.unix_timestamp(max_ts) - F.unix_timestamp("ts")).cast("double")
        / (7 * 86400.0),
    )
    w = ev.select("user_id", "value", wt.alias("wt"))
    pu = w.groupBy("user_id").agg(
        (F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias(
            "decayed_avg"
        )
    )
    return pu.groupBy(
        F.floor(F.col("decayed_avg") / 10).cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("decayed_avg"), 6).alias("mean_decayed"),
    )


@query(
    "stats-icc",
    oracle="""
        WITH grp AS (
            SELECT user_id, CAST(count(*) AS DOUBLE) AS n_g,
                   avg(value) AS m_g,
                   (count(*) - 1) * var_samp(value) AS ssw_g
            FROM events GROUP BY user_id
        ),
        g AS (
            SELECT sum(n_g) AS n, CAST(count(*) AS DOUBLE) AS grps,
                   sum(n_g * m_g) / sum(n_g) AS gm,
                   sum(ssw_g) AS ssw, sum(n_g * n_g) AS sum_n2
            FROM grp
        ),
        ms AS (
            SELECT g.n, g.grps,
                   sum(grp.n_g * (grp.m_g - g.gm) * (grp.m_g - g.gm))
                       / (g.grps - 1) AS msb,
                   g.ssw / (g.n - g.grps) AS msw,
                   (g.n - g.sum_n2 / g.n) / (g.grps - 1) AS k0
            FROM grp CROSS JOIN g
            GROUP BY g.n, g.grps, g.ssw, g.sum_n2
        )
        SELECT CAST(n AS BIGINT) AS n_obs, CAST(grps AS BIGINT) AS n_groups,
               round(msb, 6) AS ms_between,
               round(msw, 6) AS ms_within,
               round(k0, 6) AS k0,
               round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
        FROM ms
    """,
    doc="Intraclass correlation ICC(1,1) — one-way random-effects "
    "reliability of event value within user: (MSB - MSW)/(MSB + "
    "(k0-1) MSW) with Searle's average-group-size correction "
    "k0 = (N - sum(n_g^2)/N)/(G-1) for unbalanced groups. The "
    "clustered-data diagnostic that decides whether per-user "
    "aggregation (and design-effect inflation ~1+(k0-1)ICC of every "
    "naive CI the repo's A/B ops compute) matters; complements "
    "stats-cronbach-alpha (item consistency) and stats-eb-shrinkage "
    "(which needs exactly this variance partition). Two bounded "
    "aggregates over the per-user summary — the fact table is read "
    "once.",
    tags=("stats",),
)
def stats_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n_g"),
        F.avg("value").alias("m_g"),
        ((F.count("*") - 1) * F.var_samp("value")).alias("ssw_g"),
    )
    g = grp.agg(
        F.sum("n_g").alias("n"),
        F.count("*").cast("double").alias("grps"),
        (F.sum(F.col("n_g") * F.col("m_g")) / F.sum("n_g")).alias("gm"),
        F.sum("ssw_g").alias("ssw"),
        F.sum(F.col("n_g") * F.col("n_g")).alias("sum_n2"),
    )
    ms = (
        grp.crossJoin(F.broadcast(g))
        .groupBy("n", "grps", "ssw", "sum_n2")
        .agg(
            (
                F.sum(
                    F.col("n_g")
                    * (F.col("m_g") - F.col("gm"))
                    * (F.col("m_g") - F.col("gm"))
                )
                / (F.max("grps") - 1)
            ).alias("msb"),
            (F.max("ssw") / (F.max("n") - F.max("grps"))).alias("msw"),
            (
                (F.max("n") - F.max("sum_n2") / F.max("n"))
                / (F.max("grps") - 1)
            ).alias("k0"),
        )
    )
    return ms.select(
        F.col("n").cast("long").alias("n_obs"),
        F.col("grps").cast("long").alias("n_groups"),
        F.round("msb", 6).alias("ms_between"),
        F.round("msw", 6).alias("ms_within"),
        F.round("k0", 6).alias("k0"),
        F.round(
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("k0") - 1) * F.col("msw")),
            6,
        ).alias("icc1"),
    )


@query(
    "stats-bland-altman",
    oracle="""
        WITH paired AS (
            SELECT l.l_extendedprice / l.l_quantity AS m1,
                   p.p_retailprice AS m2
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        d AS (
            SELECT m1 - m2 AS diff FROM paired
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   avg(diff) AS bias, stddev_samp(diff) AS sd
            FROM d
        )
        SELECT s.n, round(s.bias, 6) AS bias,
               round(s.sd, 6) AS sd_diff,
               round(s.bias - 1.959964 * s.sd, 6) AS loa_lo,
               round(s.bias + 1.959964 * s.sd, 6) AS loa_hi,
               round(avg(CASE WHEN abs(d.diff - s.bias) > 1.959964 * s.sd
                              THEN 1.0 ELSE 0.0 END), 6) AS frac_outside
        FROM d CROSS JOIN s
        GROUP BY s.n, s.bias, s.sd
    """,
    doc="Bland-Altman agreement analysis between two measures of the "
    "same quantity — realized unit price (extendedprice/quantity) vs "
    "catalog retail price: bias (mean difference), SD of differences, "
    "95%% limits of agreement bias +/- 1.96 SD, and the observed "
    "fraction outside them (~5%% if differences are normal) — the "
    "method-comparison analysis a correlation coefficient famously "
    "CANNOT do (two methods can correlate at 0.99 and still disagree "
    "by a constant 20%%). Fact-to-dim join left to AQE (broadcast at "
    "small SF, shuffle-hash beyond), one moment pass, one re-scan of "
    "the 1-column diff relation against the broadcast scalars.",
    tags=("stats",),
)
def stats_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    d = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(
            # try_divide: hostile zero quantities -> NULL unit price on both
            # engines; avg/stddev skip it, count(*) still counts the row.
            (
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
                - F.col("p_retailprice")
            ).alias("diff")
        )
    )
    s = d.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("diff").alias("bias"),
        F.stddev_samp("diff").alias("sd"),
    )
    return (
        d.crossJoin(F.broadcast(s))
        .groupBy("n", "bias", "sd")
        .agg(
            F.round(
                F.avg(
                    F.when(
                        F.abs(F.col("diff") - F.col("bias"))
                        > 1.959964 * F.col("sd"),
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("frac_outside")
        )
        .select(
            "n",
            F.round("bias", 6).alias("bias"),
            F.round("sd", 6).alias("sd_diff"),
            F.round(F.col("bias") - 1.959964 * F.col("sd"), 6).alias(
                "loa_lo"
            ),
            F.round(F.col("bias") + 1.959964 * F.col("sd"), 6).alias(
                "loa_hi"
            ),
            "frac_outside",
        )
    )


@query(
    "timeseries-cochrane-orcutt",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        pts AS (
            SELECT CAST(date_diff('day', (SELECT min(d) FROM daily), d)
                        AS DOUBLE) AS t, y
            FROM daily
        ),
        ols AS (
            SELECT regr_slope(y, t) AS b, regr_intercept(y, t) AS a,
                   CAST(count(*) AS BIGINT) AS n
            FROM pts
        ),
        res AS (
            SELECT t, y, y - (o.a + o.b * t) AS e,
                   lag(y - (o.a + o.b * t)) OVER (ORDER BY t) AS e1,
                   lag(y) OVER (ORDER BY t) AS y1,
                   lag(t) OVER (ORDER BY t) AS t1
            FROM pts CROSS JOIN ols o
        ),
        rho_c AS (
            SELECT sum(e * e1) / sum(e1 * e1) AS rho
            FROM res WHERE e1 IS NOT NULL
        ),
        star AS (
            SELECT y - r.rho * y1 AS ys, t - r.rho * t1 AS ts_
            FROM res CROSS JOIN rho_c r WHERE y1 IS NOT NULL
        ),
        fit2 AS (
            SELECT regr_slope(ys, ts_) AS b2, regr_intercept(ys, ts_) AS a2
            FROM star
        )
        SELECT o.n AS n_days,
               round(r.rho, 6) AS rho,
               round(o.b, 6) AS slope_ols,
               round(f.b2, 6) AS slope_co,
               round(f.a2 / (1 - r.rho), 6) AS intercept_co
        FROM ols o CROSS JOIN rho_c r CROSS JOIN fit2 f
    """,
    doc="Cochrane-Orcutt AR(1)-corrected trend regression on the daily "
    "event-volume series: OLS residuals give rho = sum(e_t e_{t-1}) / "
    "sum(e_{t-1}^2), quasi-difference y* = y_t - rho*y_{t-1} (and x*) "
    "removes the serial correlation, and the re-fit slope is the one "
    "whose standard errors you may actually trust — naive OLS on an "
    "autocorrelated series (what timeseries-mom-growth-style trend "
    "reads imply, and what stats-durbin-watson DETECTS) understates "
    "SEs by ~sqrt((1+rho)/(1-rho)). Intercept rescaled by 1/(1-rho) "
    "back to original units. Everything after the daily rollup runs "
    "on the calendar-bounded summary: two regr_* fits, one lag "
    "window, three scalar broadcasts.",
    tags=("timeseries", "stats"),
)
def timeseries_cochrane_orcutt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # persist the CALENDAR-BOUNDED daily rollup (<= ~3650 rows at any
    # scale) as ONE cached partition: every downstream stage (OLS fit,
    # residual window, rho, the transformed re-fit) re-consumed it, so
    # unpersisted the plan scanned events 14 times. r11 tried persisting
    # pts/res at the session's static 32-partition cache width and
    # measured the cache machinery LOSING (+23% ABBA); coalesce(1)
    # removes that width drag — the relation is a bounded summary, so a
    # single partition is the scale-correct cache shape (r12 ABBA -47%).
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
        .coalesce(1)
        .persist()
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    pts = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("d", "d0").cast("double").alias("t"), "y"
    )
    ols = pts.agg(
        F.regr_slope("y", "t").alias("b"),
        F.regr_intercept("y", "t").alias("a"),
        F.count("*").cast("long").alias("n"),
    )
    w = Window.orderBy("t")
    e = F.col("y") - (F.col("a") + F.col("b") * F.col("t"))
    res = pts.crossJoin(F.broadcast(ols)).select(
        "t",
        "y",
        e.alias("e"),
        F.lag(e).over(w).alias("e1"),
        F.lag("y").over(w).alias("y1"),
        F.lag("t").over(w).alias("t1"),
    )
    rho_c = res.filter(F.col("e1").isNotNull()).agg(
        (
            F.sum(F.col("e") * F.col("e1"))
            / F.sum(F.col("e1") * F.col("e1"))
        ).alias("rho")
    )
    star = (
        res.crossJoin(F.broadcast(rho_c))
        .filter(F.col("y1").isNotNull())
        .select(
            (F.col("y") - F.col("rho") * F.col("y1")).alias("ys"),
            (F.col("t") - F.col("rho") * F.col("t1")).alias("ts_"),
        )
    )
    fit2 = star.agg(
        F.regr_slope("ys", "ts_").alias("b2"),
        F.regr_intercept("ys", "ts_").alias("a2"),
    )
    return (
        ols.crossJoin(F.broadcast(rho_c))
        .crossJoin(F.broadcast(fit2))
        .select(
            F.col("n").alias("n_days"),
            F.round("rho", 6).alias("rho"),
            F.round("b", 6).alias("slope_ols"),
            F.round("b2", 6).alias("slope_co"),
            F.round(F.col("a2") / (1 - F.col("rho")), 6).alias(
                "intercept_co"
            ),
        )
    )


@query(
    "stats-cohen-kappa-weighted",
    oracle="""
        WITH rated AS (
            SELECT CASE WHEN n_chars < 220 THEN 0
                        WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,
                   CASE WHEN length(text) - length(replace(text, ' ', ''))
                             < 40 THEN 0
                        WHEN length(text) - length(replace(text, ' ', ''))
                             < 70 THEN 1 ELSE 2 END AS rb
            FROM documents
        ),
        o AS (
            SELECT ra, rb, CAST(count(*) AS DOUBLE) AS n_ij
            FROM rated GROUP BY ra, rb
        ),
        -- densify onto the full k x k grid: empty cells carry the
        -- LARGEST disagreement weights in the chance-agreement sum
        -- (sparse-grid bug caught by tests/test_golden_stats.py)
        grid AS (
            SELECT a.ra, b.rb, coalesce(o.n_ij, 0) AS n_ij
            FROM (SELECT DISTINCT ra FROM o) a
            CROSS JOIN (SELECT DISTINCT rb FROM o) b
            LEFT JOIN o ON o.ra = a.ra AND o.rb = b.rb
        ),
        m AS (
            SELECT ra, rb, n_ij,
                   sum(n_ij) OVER (PARTITION BY ra) AS row_n,
                   sum(n_ij) OVER (PARTITION BY rb) AS col_n,
                   sum(n_ij) OVER () AS n
            FROM grid
        )
        SELECT CAST(max(n) AS BIGINT) AS n_docs,
               round(1 - sum((ra - rb) * (ra - rb) / 4.0 * n_ij / n)
                         / sum((ra - rb) * (ra - rb) / 4.0
                               * (row_n / n) * (col_n / n)), 6)
                   AS kappa_w,
               round(sum(CASE WHEN ra = rb THEN n_ij ELSE 0 END) / max(n), 6)
                   AS raw_agreement
        FROM m
    """,
    doc="Quadratic-weighted Cohen's kappa between two ordinal raters of "
    "document size — the n_chars tercile vs the whitespace-count "
    "tercile: kappa_w = 1 - sum(v_ij O_ij)/sum(v_ij E_ij) with "
    "v_ij = (i-j)^2/(k-1)^2, so near-misses on the ordinal scale "
    "cost less than 2-step disagreements (nominal kappa and "
    "eval-fleiss-kappa treat them identically — wrong for ordered "
    "labels like quality grades, the typical LLM-annotation case). "
    "Chance agreement from the margins of the same 3x3 contingency "
    "grid; everything beyond the one groupBy runs on <=9 rows.",
    tags=("stats", "eval"),
)
def stats_cohen_kappa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    rated = d.select(
        F.when(F.col("n_chars") < 220, 0)
        .when(F.col("n_chars") < 380, 1)
        .otherwise(2)
        .alias("ra"),
        F.when(spaces < 40, 0).when(spaces < 70, 1).otherwise(2).alias("rb"),
    )
    # persist the BOUNDED rating cells (<= 3 x 3 rows at any scale):
    # both densify-universe projections and the grid join re-consumed
    # them (3 documents scans -> 1)
    o = rated.groupBy("ra", "rb").agg(
        F.count("*").cast("double").alias("n_ij")
    ).coalesce(1).persist()
    # densify onto the full k x k grid: the chance-agreement denominator
    # sums v_ij * p_i * p_j over EVERY cell, and empty cells carry the
    # LARGEST weights (the extreme-disagreement corners) — summing over
    # present cells only understated kappa_w on both engines (0.9331 vs
    # the true 0.9773 at sf0.01; caught by tests/test_golden_stats.py,
    # same sparse-grid class as the stats-g-test Williams bug).
    ras = o.select("ra").distinct()
    rbs = o.select("rb").distinct()
    grid = (
        ras.crossJoin(F.broadcast(rbs))
        .join(o, ["ra", "rb"], "left")
        .select(
            "ra", "rb", F.coalesce("n_ij", F.lit(0.0)).alias("n_ij")
        )
    )
    m = grid.select(
        "ra",
        "rb",
        "n_ij",
        F.sum("n_ij").over(Window.partitionBy("ra")).alias("row_n"),
        F.sum("n_ij").over(Window.partitionBy("rb")).alias("col_n"),
        F.sum("n_ij").over(Window.partitionBy()).alias("n"),
    )
    v = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")) / 4.0
    return m.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(
            1
            - F.sum(v * F.col("n_ij") / F.col("n"))
            / F.sum(
                v * (F.col("row_n") / F.col("n")) * (F.col("col_n") / F.col("n"))
            ),
            6,
        ).alias("kappa_w"),
        F.round(
            F.sum(
                F.when(F.col("ra") == F.col("rb"), F.col("n_ij")).otherwise(
                    0.0
                )
            )
            / F.max("n"),
            6,
        ).alias("raw_agreement"),
    )


@query(
    "stats-chow-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        bounds AS (
            SELECT min(d) AS d0,
                   CAST(date_diff('day', min(d), max(d)) / 2 AS BIGINT) AS t0
            FROM daily
        ),
        pts AS (
            SELECT CAST(date_diff('day', b.d0, d) AS DOUBLE) AS t, y,
                   CASE WHEN date_diff('day', b.d0, d) >= b.t0
                        THEN 1 ELSE 0 END AS post
            FROM daily CROSS JOIN bounds b
        ),
        seg AS (
            SELECT post, CAST(count(*) AS DOUBLE) AS n,
                   (count(*) - 1) * (var_samp(y)
                       - covar_samp(t, y) * covar_samp(t, y) / var_samp(t))
                       AS sse
            FROM pts GROUP BY post
        ),
        pooled AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   (count(*) - 1) * (var_samp(y)
                       - covar_samp(t, y) * covar_samp(t, y) / var_samp(t))
                       AS sse
            FROM pts
        )
        SELECT CAST(p.n AS BIGINT) AS n_days,
               CAST(max(CASE WHEN s.post = 0 THEN s.n END) AS BIGINT)
                   AS n_pre,
               CAST(max(CASE WHEN s.post = 1 THEN s.n END) AS BIGINT)
                   AS n_post,
               round(p.sse, 6) AS sse_pooled,
               round(sum(s.sse), 6) AS sse_split,
               round(((p.sse - sum(s.sse)) / 2)
                     / (sum(s.sse) / (p.n - 4)), 4) AS chow_f
        FROM seg s CROSS JOIN pooled p
        GROUP BY p.n, p.sse
    """,
    doc="Chow test for a structural break at the mid-span breakpoint of "
    "the daily event-volume trend: F = ((SSE_pooled - SSE1 - SSE2)/k) "
    "/ ((SSE1+SSE2)/(n-2k)) with k=2 (intercept+slope) — the "
    "hypothesis TEST that timeseries-intervention-its's effect "
    "estimates need behind them (ITS says HOW MUCH the line moved; "
    "Chow says whether a single line would have done). Each segment "
    "SSE comes in closed form from var/covar aggregates "
    "((n-1)(Syy - Sxy^2/Sxx)), so the whole test is one groupBy over "
    "the calendar-bounded daily table plus one global aggregate — "
    "no residual columns materialized, no second fact-table pass.",
    tags=("stats", "timeseries"),
)
def stats_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    bounds = daily.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) / 2).cast("long").alias("t0"),
    )
    # persist the CALENDAR-BOUNDED regression points (<= ~3650 rows at
    # any scale) as ONE cached partition: the per-segment and pooled
    # fits both re-consume them (4 events scans unpersisted). r11 tried
    # this persist at the static 32-partition cache width and reverted
    # (+42%); one bounded-summary partition removes the width drag.
    pts = (
        daily.crossJoin(F.broadcast(bounds))
        .select(
            F.datediff("d", "d0").cast("double").alias("t"),
            "y",
            (F.datediff("d", "d0") >= F.col("t0")).cast("int").alias("post"),
        )
        .coalesce(1)
        .persist()
    )

    def sse_expr():
        return (F.count("*") - 1) * (
            F.var_samp("y")
            - F.covar_samp("t", "y")
            * F.covar_samp("t", "y")
            / F.var_samp("t")
        )

    seg = pts.groupBy("post").agg(
        F.count("*").cast("double").alias("n"), sse_expr().alias("sse")
    )
    pooled = pts.agg(
        F.count("*").cast("double").alias("np"), sse_expr().alias("ssep")
    )
    return (
        seg.crossJoin(F.broadcast(pooled))
        .groupBy("np", "ssep")
        .agg(
            F.max(F.when(F.col("post") == 0, F.col("n")))
            .cast("long")
            .alias("n_pre"),
            F.max(F.when(F.col("post") == 1, F.col("n")))
            .cast("long")
            .alias("n_post"),
            F.round(F.sum("sse"), 6).alias("sse_split"),
            F.round(
                ((F.max("ssep") - F.sum("sse")) / 2)
                / (F.sum("sse") / (F.max("np") - 4)),
                4,
            ).alias("chow_f"),
        )
        .select(
            F.col("np").cast("long").alias("n_days"),
            "n_pre",
            "n_post",
            F.round("ssep", 6).alias("sse_pooled"),
            "sse_split",
            "chow_f",
        )
    )


@query(
    "stats-deming-regression",
    oracle="""
        WITH paired AS (
            SELECT p.p_retailprice AS x,
                   l.l_extendedprice / l.l_quantity AS y
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   avg(x) AS mx, avg(y) AS my,
                   var_samp(x) AS sxx, var_samp(y) AS syy,
                   covar_samp(x, y) AS sxy
            FROM paired
        )
        SELECT n,
               round((syy - sxx + sqrt((syy - sxx) * (syy - sxx)
                                       + 4 * sxy * sxy)) / (2 * sxy), 6)
                   AS slope,
               round(my - (syy - sxx + sqrt((syy - sxx) * (syy - sxx)
                                            + 4 * sxy * sxy))
                          / (2 * sxy) * mx, 6) AS intercept,
               round(sxy / sqrt(sxx * syy), 6) AS pearson_r
        FROM m
    """,
    doc="Deming regression (errors-in-both-variables, lambda=1) between "
    "catalog retail price and realized unit price: slope = (Syy - Sxx "
    "+ sqrt((Syy-Sxx)^2 + 4 Sxy^2)) / (2 Sxy) — the method-comparison "
    "fit where ORDINARY least squares is biased toward zero "
    "(regression dilution) because the x measure is noisy too; the "
    "natural companion to stats-bland-altman on the same pairing "
    "(BA quantifies disagreement, Deming models it). Closed form "
    "from one 5-moment aggregate over the joined fact — the second "
    "cheapest regression in the repo after OLS, and symmetric: "
    "swapping x and y inverts the slope exactly.",
    tags=("stats",),
)
def stats_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    paired = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_retailprice").alias("x"),
        # try_divide: zero quantities -> NULL y; var/covar skip the pair on
        # both engines (count(*) is the one agg that still sees the row —
        # acceptable: n reports observed pairs, the moments define the fit).
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias("y"),
    )
    m = paired.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("sxx"),
        F.var_samp("y").alias("syy"),
        F.covar_samp("x", "y").alias("sxy"),
    )
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (
        syy - sxx + F.sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy)
    ) / (2 * sxy)
    return m.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"),
        F.round(sxy / F.sqrt(sxx * syy), 6).alias("pearson_r"),
    )


@query(
    "stats-fieller-ratio-ci",
    oracle="""
        WITH pu AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS purchases,
                   CAST(sum(CASE WHEN event_type = 'view'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS views
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   avg(purchases) AS ma, avg(views) AS mb,
                   var_samp(purchases) / count(*) AS va,
                   var_samp(views) / count(*) AS vb,
                   covar_samp(purchases, views) / count(*) AS vab
            FROM pu
        ),
        f AS (
            SELECT n, ma, mb, va, vb, vab,
                   ma / mb AS r,
                   1.959964 * 1.959964 * vb / (mb * mb) AS g
            FROM m
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               round(r, 6) AS ratio,
               round(g, 6) AS g_fieller,
               round((r - g * vab / vb
                      - 1.959964 / mb
                        * sqrt(va - 2 * r * vab + r * r * vb
                               - g * (va - vab * vab / vb)))
                     / (1 - g), 6) AS ci_lo,
               round((r - g * vab / vb
                      + 1.959964 / mb
                        * sqrt(va - 2 * r * vab + r * r * vb
                               - g * (va - vab * vab / vb)))
                     / (1 - g), 6) AS ci_hi
        FROM f
    """,
    doc="Fieller's theorem CI for a ratio of correlated means — "
    "purchases-per-view across users: the exact-coverage interval "
    "for mean(A)/mean(B) accounting for cov(A,B), with the g-factor "
    "z^2 Var(B)/B^2 that widens (and warns, as g -> 1, that the "
    "denominator is statistically indistinguishable from zero) — "
    "where the naive delta-method CI (stats-delta-method-ci, its "
    "first-order twin) is symmetric and overconfident for noisy "
    "denominators. Ratio metrics ARE the product metrics "
    "(conversion, CTR, revenue-per-session); this is the "
    "inference-grade version. One per-user rollup, one 6-moment "
    "aggregate, scalar algebra.",
    tags=("stats",),
)
def stats_fieller_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("views"),
    )
    m = pu.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("purchases").alias("ma"),
        F.avg("views").alias("mb"),
        (F.var_samp("purchases") / F.count("*")).alias("va"),
        (F.var_samp("views") / F.count("*")).alias("vb"),
        (F.covar_samp("purchases", "views") / F.count("*")).alias("vab"),
    )
    z = 1.959964
    r = F.col("ma") / F.col("mb")
    g = z * z * F.col("vb") / (F.col("mb") * F.col("mb"))
    rad = F.sqrt(
        F.col("va")
        - 2 * r * F.col("vab")
        + r * r * F.col("vb")
        - g * (F.col("va") - F.col("vab") * F.col("vab") / F.col("vb"))
    )
    adj = r - g * F.col("vab") / F.col("vb")
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(g, 6).alias("g_fieller"),
        F.round((adj - z / F.col("mb") * rad) / (1 - g), 6).alias("ci_lo"),
        F.round((adj + z / F.col("mb") * rad) / (1 - g), 6).alias("ci_hi"),
    )


@query(
    "stats-bowker-symmetry",
    oracle="""
        WITH rated AS (
            SELECT CASE WHEN n_chars < 220 THEN 0
                        WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,
                   CASE WHEN length(text) - length(replace(text, ' ', ''))
                             < 40 THEN 0
                        WHEN length(text) - length(replace(text, ' ', ''))
                             < 70 THEN 1 ELSE 2 END AS rb
            FROM documents
        ),
        o AS (
            SELECT ra, rb, CAST(count(*) AS DOUBLE) AS n_ij
            FROM rated GROUP BY ra, rb
        ),
        pairs AS (
            SELECT least(ra, rb) AS i, greatest(ra, rb) AS j,
                   sum(CASE WHEN ra < rb THEN n_ij ELSE 0 END) AS n_ij,
                   sum(CASE WHEN ra > rb THEN n_ij ELSE 0 END) AS n_ji
            FROM o WHERE ra <> rb GROUP BY 1, 2
        )
        SELECT CAST((SELECT sum(n_ij) FROM o) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS dof,
               round(sum((n_ij - n_ji) * (n_ij - n_ji)
                         / (n_ij + n_ji)), 6) AS bowker_chi2,
               round(sum(n_ij + n_ji) / (SELECT sum(n_ij) FROM o), 6)
                   AS frac_discordant
        FROM pairs
    """,
    doc="Bowker's test of symmetry for a k x k paired-rating table — "
    "the k-category generalization of stats-mcnemar: chi2 = "
    "sum_{i<j} (n_ij - n_ji)^2/(n_ij + n_ji), df = the number of "
    "pairs with any discordance (<= k(k-1)/2 — empty pairs carry no "
    "information and drop from the df, the standard correction), on the "
    "same two ordinal size-raters as stats-cohen-kappa-weighted. "
    "Kappa asks 'do they agree'; Bowker asks the DIRECTIONAL "
    "question — is rater B systematically grading higher — which is "
    "the drift you actually act on when an annotator (or an "
    "LLM-judge version bump) shifts its scale. Everything past one "
    "groupBy runs on a <=9-row grid self-joined on its transpose.",
    tags=("stats", "eval"),
)
def stats_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    rated = d.select(
        F.when(F.col("n_chars") < 220, 0)
        .when(F.col("n_chars") < 380, 1)
        .otherwise(2)
        .alias("ra"),
        F.when(spaces < 40, 0).when(spaces < 70, 1).otherwise(2).alias("rb"),
    )
    # persist the BOUNDED rating cells (<= 3 x 3 rows at any scale):
    # the total and the discordant-pair fold both re-consumed them
    # (2 documents scans -> 1)
    o = rated.groupBy("ra", "rb").agg(
        F.count("*").cast("double").alias("n_ij")
    ).coalesce(1).persist()
    tot = o.agg(F.sum("n_ij").alias("n_docs"))
    pairs = (
        o.filter(F.col("ra") != F.col("rb"))
        .groupBy(
            F.least("ra", "rb").alias("i"),
            F.greatest("ra", "rb").alias("j"),
        )
        .agg(
            F.sum(
                F.when(F.col("ra") < F.col("rb"), F.col("n_ij")).otherwise(
                    0.0
                )
            ).alias("n_ij"),
            F.sum(
                F.when(F.col("ra") > F.col("rb"), F.col("n_ij")).otherwise(
                    0.0
                )
            ).alias("n_ji"),
        )
    )
    return pairs.crossJoin(F.broadcast(tot)).agg(
        F.max("n_docs").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("dof"),
        F.round(
            F.sum(
                (F.col("n_ij") - F.col("n_ji"))
                * (F.col("n_ij") - F.col("n_ji"))
                / (F.col("n_ij") + F.col("n_ji"))
            ),
            6,
        ).alias("bowker_chi2"),
        F.round(
            F.sum(F.col("n_ij") + F.col("n_ji")) / F.max("n_docs"), 6
        ).alias("frac_discordant"),
    )


@query(
    "stats-friedman-nemenyi",
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
        rbar AS (
            SELECT event_type, avg(r) AS rbar,
                   CAST(count(*) AS DOUBLE) AS n
            FROM ranked GROUP BY event_type
        ),
        k AS (SELECT CAST(count(*) AS DOUBLE) AS k, max(n) AS n FROM rbar)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               round(a.rbar, 6) AS rank_a,
               round(b.rbar, 6) AS rank_b,
               round(abs(a.rbar - b.rbar)
                     / sqrt(k.k * (k.k + 1) / (6 * k.n)), 4) AS nemenyi_q,
               round(abs(a.rbar - b.rbar)
                     / sqrt(k.k * (k.k + 1) / (6 * k.n))
                     * sqrt(2.0), 4) AS q_range_scale
        FROM rbar a JOIN rbar b ON a.event_type < b.event_type
        CROSS JOIN k
    """,
    doc="Nemenyi post-hoc after the Friedman test (stats-friedman-test, "
    "same day-blocked rank construction): for every treatment pair "
    "the standardized mean-rank difference |Rbar_i - Rbar_j| / "
    "sqrt(k(k+1)/6N) — the statistic behind critical-difference "
    "diagrams, THE standard way to compare k models over N "
    "datasets/days (Demsar 2006); also emitted on the studentized-"
    "range scale (x sqrt 2) for q_alpha tables. Friedman only says "
    "'the five types do not rank identically'; Nemenyi says WHICH "
    "pairs differ. Within-day ranking is a 5-row partitioned window; "
    "the pair join runs on the 5-row treatment summary.",
    tags=("stats", "eval"),
)
def stats_friedman_nemenyi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.avg("value").alias("m"))
    complete = (
        daily.groupBy("day")
        .agg(F.count("*").alias("k_day"))
        .filter(F.col("k_day") == 5)
        .select("day")
    )
    ranked = daily.join(complete, "day").select(
        "event_type",
        F.rank()
        .over(Window.partitionBy("day").orderBy("m"))
        .cast("double")
        .alias("r"),
    )
    # persist the 5-row mean-rank summary: k and BOTH pair sides consume
    # it — unpersisted each re-planned the daily rollup + completeness
    # filter + rank window (6 events scans / 40 Exchanges in the r11
    # before-plan; conf-off sweep 0.93x)
    rbar = ranked.groupBy("event_type").agg(
        F.avg("r").alias("rbar"), F.count("*").cast("double").alias("n")
    ).persist()
    k = rbar.agg(
        F.count("*").cast("double").alias("k"), F.max("n").alias("n")
    )
    a = rbar.select(
        F.col("event_type").alias("type_a"), F.col("rbar").alias("rank_a")
    )
    b = rbar.select(
        F.col("event_type").alias("type_b"), F.col("rbar").alias("rank_b")
    )
    se = F.sqrt(F.col("k") * (F.col("k") + 1) / (6 * F.col("n")))
    q = F.abs(F.col("rank_a") - F.col("rank_b")) / se
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(k))
        .select(
            "type_a",
            "type_b",
            F.round("rank_a", 6).alias("rank_a"),
            F.round("rank_b", 6).alias("rank_b"),
            F.round(q, 4).alias("nemenyi_q"),
            F.round(q * F.sqrt(F.lit(2.0)), 4).alias("q_range_scale"),
        )
    )


@query(
    "stats-yuen-trimmed-ttest",
    oracle="""
        WITH grp AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 'purchase'
                        ELSE 'other' END AS g,
                   value AS y
            FROM events WHERE event_type IN ('purchase', 'view')
        ),
        cuts AS (
            SELECT g, quantile_cont(y, 0.2) AS lo,
                   quantile_cont(y, 0.8) AS hi
            FROM grp GROUP BY g
        ),
        wins AS (
            SELECT grp.g,
                   CASE WHEN y < lo THEN lo
                        WHEN y > hi THEN hi ELSE y END AS w,
                   CASE WHEN y >= lo AND y <= hi THEN 1 ELSE 0 END
                       AS in_core
            FROM grp JOIN cuts ON grp.g = cuts.g
        ),
        s AS (
            SELECT g, CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(in_core) AS DOUBLE) AS h,
                   avg(CASE WHEN in_core = 1 THEN w END) AS tmean,
                   (count(*) - 1) * var_samp(w) AS ssw
            FROM wins GROUP BY g
        )
        SELECT CAST(max(CASE WHEN g = 'purchase' THEN n END) AS BIGINT)
                   AS n_a,
               CAST(max(CASE WHEN g = 'other' THEN n END) AS BIGINT)
                   AS n_b,
               round(max(CASE WHEN g = 'purchase' THEN tmean END), 6)
                   AS trimmed_mean_a,
               round(max(CASE WHEN g = 'other' THEN tmean END), 6)
                   AS trimmed_mean_b,
               round((max(CASE WHEN g = 'purchase' THEN tmean END)
                      - max(CASE WHEN g = 'other' THEN tmean END))
                     / sqrt(max(CASE WHEN g = 'purchase'
                                     THEN ssw / (h * (h - 1)) END)
                            + max(CASE WHEN g = 'other'
                                       THEN ssw / (h * (h - 1)) END)), 4)
                   AS yuen_t
        FROM s
    """,
    doc="Yuen's trimmed-mean t-test (20%% trim) between purchase and "
    "view event values: compare 20%%-trimmed means with Winsorized "
    "variances, t = (tm_a - tm_b)/sqrt(sw_a^2/(h_a(h_a-1)) + "
    "sw_b^2/(h_b(h_b-1))) where h is the retained count — the "
    "robust two-sample test that keeps ~95%% efficiency under "
    "normality but does not hand a handful of outliers the verdict "
    "the way stats-welch-ttest does. Trim thresholds are exact "
    "linear-interpolated quantiles (Spark percentile == DuckDB "
    "quantile_cont); per-group percentile + winsorize + moments = "
    "two bounded aggregates and one broadcast of the 2-row cut "
    "table.",
    tags=("stats",),
)
def stats_yuen_trimmed_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        F.when(F.col("event_type") == "purchase", "purchase")
        .otherwise("other")
        .alias("g"),
        F.col("value").alias("y"),
    )
    cuts = grp.groupBy("g").agg(
        F.expr("percentile(y, 0.2)").alias("lo"),
        F.expr("percentile(y, 0.8)").alias("hi"),
    )
    wins = grp.join(F.broadcast(cuts), "g").select(
        "g",
        F.when(F.col("y") < F.col("lo"), F.col("lo"))
        .when(F.col("y") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("y"))
        .alias("w"),
        (
            (F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi"))
        )
        .cast("int")
        .alias("in_core"),
    )
    s = wins.groupBy("g").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("in_core").cast("double").alias("h"),
        F.avg(F.when(F.col("in_core") == 1, F.col("w"))).alias("tmean"),
        ((F.count("*") - 1) * F.var_samp("w")).alias("ssw"),
    )

    def pick(col: str, g: str):
        return F.max(F.when(F.col("g") == g, F.col(col)))

    sw_a = pick("ssw", "purchase") / (
        pick("h", "purchase") * (pick("h", "purchase") - 1)
    )
    sw_b = pick("ssw", "other") / (
        pick("h", "other") * (pick("h", "other") - 1)
    )
    return s.agg(
        pick("n", "purchase").cast("long").alias("n_a"),
        pick("n", "other").cast("long").alias("n_b"),
        F.round(pick("tmean", "purchase"), 6).alias("trimmed_mean_a"),
        F.round(pick("tmean", "other"), 6).alias("trimmed_mean_b"),
        F.round(
            (pick("tmean", "purchase") - pick("tmean", "other"))
            / F.sqrt(sw_a + sw_b),
            4,
        ).alias("yuen_t"),
    )


@query(
    "agg-theil-decomposition",
    oracle="""
        WITH pu AS (
            SELECT user_id, CAST(user_id % 4 AS BIGINT) AS seg,
                   sum(value) AS x
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        g AS (SELECT avg(x) AS mu, CAST(count(*) AS DOUBLE) AS n FROM pu),
        within AS (
            SELECT p.seg, CAST(count(*) AS DOUBLE) AS n_s, avg(p.x) AS mu_s,
                   avg((p.x / s.mu_s) * ln(p.x / s.mu_s)) AS t_s
            FROM pu p JOIN (SELECT seg, avg(x) AS mu_s FROM pu GROUP BY seg) s
                 ON p.seg = s.seg
            GROUP BY p.seg
        )
        SELECT CAST(g.n AS BIGINT) AS n_users,
               round(sum((w.n_s / g.n) * (w.mu_s / g.mu) * w.t_s), 6)
                   AS theil_within,
               round(sum((w.n_s / g.n) * (w.mu_s / g.mu)
                         * ln(w.mu_s / g.mu)), 6) AS theil_between,
               round(sum((w.n_s / g.n) * (w.mu_s / g.mu) * w.t_s)
                     + sum((w.n_s / g.n) * (w.mu_s / g.mu)
                           * ln(w.mu_s / g.mu)), 6) AS theil_total
        FROM within w CROSS JOIN g
        GROUP BY g.n
    """,
    doc="Theil T inequality index with exact between/within "
    "decomposition over user segments: T = sum_s (n_s/n)(mu_s/mu) T_s "
    "+ sum_s (n_s/n)(mu_s/mu) ln(mu_s/mu) — the property "
    "agg-gini-coefficient lacks (Gini is not additively decomposable; "
    "its 'between' term carries an overlap residual), so Theil is "
    "what answers 'how much revenue concentration lives INSIDE "
    "segments vs BETWEEN them'. Per-user purchase totals (one "
    "shuffle), per-segment entropy terms against broadcast segment "
    "means, 4-row combine. The decomposition identity is checked "
    "in-plan by emitting total = within + between.",
    tags=("agg", "analytics"),
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("x"))
        .select(
            (F.col("user_id") % 4).cast("long").alias("seg"), "x"
        )
        # persist the per-user spend summary: the grand moments, the
        # per-segment means and the within-segment entropy pass all
        # re-consumed it (3 events scans -> 1); summary cache width
        # per session.cache_width
        .coalesce(cache_width(spark))
        .persist()
    )
    g = pu.agg(
        F.avg("x").alias("mu"), F.count("*").cast("double").alias("n")
    )
    seg_mu = pu.groupBy("seg").agg(F.avg("x").alias("mu_s"))
    within = (
        pu.join(F.broadcast(seg_mu), "seg")
        .groupBy("seg")
        .agg(
            F.count("*").cast("double").alias("n_s"),
            F.max("mu_s").alias("mu_s"),
            F.avg(
                (F.col("x") / F.col("mu_s"))
                * F.log(F.col("x") / F.col("mu_s"))
            ).alias("t_s"),
        )
    )
    share = (F.col("n_s") / F.col("n")) * (F.col("mu_s") / F.col("mu"))
    t_within = F.sum(share * F.col("t_s"))
    t_between = F.sum(share * F.log(F.col("mu_s") / F.col("mu")))
    return (
        within.crossJoin(F.broadcast(g))
        .groupBy("n")
        .agg(
            F.round(t_within, 6).alias("theil_within"),
            F.round(t_between, 6).alias("theil_between"),
            F.round(t_within + t_between, 6).alias("theil_total"),
        )
        .select(
            F.col("n").cast("long").alias("n_users"),
            "theil_within",
            "theil_between",
            "theil_total",
        )
    )


@query(
    "timeseries-seasonal-mann-kendall",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        keyed AS (
            SELECT dayofweek(d) AS dow,
                   CAST(date_diff('week', (SELECT min(d) FROM daily), d)
                        AS BIGINT) AS wk,
                   y
            FROM daily
        ),
        pairs AS (
            SELECT a.dow,
                   CASE WHEN b.y > a.y THEN 1.0
                        WHEN b.y < a.y THEN -1.0 ELSE 0.0 END AS sgn
            FROM keyed a JOIN keyed b
              ON a.dow = b.dow AND a.wk < b.wk
        ),
        per_season AS (
            SELECT k.dow, CAST(count(*) AS DOUBLE) AS n_s,
                   coalesce(max(p.s), 0) AS s_s
            FROM keyed k
            LEFT JOIN (SELECT dow, sum(sgn) AS s FROM pairs GROUP BY dow) p
              ON k.dow = p.dow
            GROUP BY k.dow
        )
        SELECT CAST(sum(n_s) AS BIGINT) AS n_days,
               CAST(count(*) AS BIGINT) AS n_seasons,
               CAST(sum(s_s) AS BIGINT) AS s_stat,
               round(sum(n_s * (n_s - 1) * (2 * n_s + 5)) / 18.0, 6)
                   AS var_s,
               round((sum(s_s) - CASE WHEN sum(s_s) > 0 THEN 1
                                      WHEN sum(s_s) < 0 THEN -1
                                      ELSE 0 END)
                     / sqrt(sum(n_s * (n_s - 1) * (2 * n_s + 5)) / 18.0), 4)
                   AS z_smk
        FROM per_season
    """,
    doc="Seasonal Mann-Kendall trend test (Hirsch-Slack) on daily event "
    "volume with day-of-week seasons: S = sum over seasons of the "
    "pairwise sign statistic computed ONLY between same-weekday "
    "observations, Var = sum n_s(n_s-1)(2n_s+5)/18, z with "
    "continuity correction — the plain MK test "
    "(timeseries-mann-kendall) reads a strong weekly cycle as noise "
    "(or worse, as trend); stratifying by season removes it without "
    "modeling it. The pairwise join is within-season over the "
    "calendar-bounded weekly index (n_s ~ span/7 rows per season) — "
    "quadratic only in WEEKS, constant in event volume.",
    tags=("timeseries", "stats"),
)
def timeseries_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    # persist the CALENDAR-BOUNDED keyed series (<= ~3650 rows at any
    # scale) as ONE cached partition: both sides of the within-season
    # pairwise join and the per-season counts re-consume it (6 events
    # scans unpersisted). r11 tried this persist at the static
    # 32-partition cache width and reverted (+16%); one bounded-summary
    # partition removes the width drag.
    keyed = (
        daily.crossJoin(F.broadcast(d0))
        .select(
            F.dayofweek("d").alias("dow"),
            F.floor(F.datediff("d", "d0") / 7).cast("long").alias("wk"),
            "y",
        )
        .coalesce(1)
        .persist()
    )
    a = keyed.select(
        F.col("dow").alias("a_dow"), F.col("wk").alias("a_wk"),
        F.col("y").alias("a_y"),
    )
    b = keyed.select(
        F.col("dow").alias("b_dow"), F.col("wk").alias("b_wk"),
        F.col("y").alias("b_y"),
    )
    pairs = a.join(
        b,
        (F.col("a_dow") == F.col("b_dow")) & (F.col("a_wk") < F.col("b_wk")),
    ).select(
        F.col("a_dow").alias("dow"),
        F.when(F.col("b_y") > F.col("a_y"), 1.0)
        .when(F.col("b_y") < F.col("a_y"), -1.0)
        .otherwise(0.0)
        .alias("sgn"),
    )
    s_per = pairs.groupBy("dow").agg(F.sum("sgn").alias("s"))
    per_season = (
        keyed.groupBy("dow")
        .agg(F.count("*").cast("double").alias("n_s"))
        .join(s_per, "dow", "left")
        .select(
            "dow",
            "n_s",
            F.coalesce(F.col("s"), F.lit(0.0)).alias("s_s"),
        )
    )
    s_tot = F.sum("s_s")
    var_s = F.sum(
        F.col("n_s") * (F.col("n_s") - 1) * (2 * F.col("n_s") + 5)
    ) / 18.0
    cc = (
        F.when(s_tot > 0, 1.0).when(s_tot < 0, -1.0).otherwise(0.0)
    )
    return per_season.agg(
        F.sum("n_s").cast("long").alias("n_days"),
        F.count("*").cast("long").alias("n_seasons"),
        s_tot.cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round((s_tot - cc) / F.sqrt(var_s), 4).alias("z_smk"),
    )


@query(
    "timeseries-adf-test",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        lagged AS (
            SELECT y - lag(y) OVER (ORDER BY d) AS dy,
                   lag(y) OVER (ORDER BY d) AS y1
            FROM daily
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   covar_samp(dy, y1) / var_samp(y1) AS rho,
                   avg(dy) AS mdy, avg(y1) AS my1,
                   var_samp(dy) AS sdd, var_samp(y1) AS s11,
                   covar_samp(dy, y1) AS sd1
            FROM lagged WHERE y1 IS NOT NULL
        )
        SELECT CAST(n AS BIGINT) AS n_obs,
               round(rho, 6) AS rho_coef,
               round(rho / sqrt(((n - 1) * (sdd - sd1 * sd1 / s11)
                                 / (n - 2))
                                / ((n - 1) * s11)), 4) AS adf_t,
               round(mdy - rho * my1, 6) AS drift
        FROM m
    """,
    doc="Augmented Dickey-Fuller unit-root test (0 lags, constant): "
    "regress the first difference on the lagged level, "
    "dy_t = c + rho*y_{t-1}; the t-statistic of rho (closed form: "
    "rho / sqrt(sigma2/Sxx) with sigma2 = (n-1)(Sdd - Sd1^2/S11)/"
    "(n-2)) against the Dickey-Fuller critical values (~-2.89 at 5%) "
    "decides stationary-vs-random-walk — the complement of "
    "timeseries-kpss-level (KPSS null = stationary, ADF null = unit "
    "root; agreement of the two is the standard pre-modeling check "
    "before trusting any trend regression in this repo, including "
    "timeseries-cochrane-orcutt's AR(1) fix). One lag window over "
    "the calendar-bounded daily series, one moment aggregate.",
    tags=("timeseries", "stats"),
)
def timeseries_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("y1"),
    ).filter(F.col("y1").isNotNull())
    m = lagged.agg(
        F.count("*").cast("double").alias("n"),
        (F.covar_samp("dy", "y1") / F.var_samp("y1")).alias("rho"),
        F.avg("dy").alias("mdy"),
        F.avg("y1").alias("my1"),
        F.var_samp("dy").alias("sdd"),
        F.var_samp("y1").alias("s11"),
        F.covar_samp("dy", "y1").alias("sd1"),
    )
    n = F.col("n")
    sigma2 = (
        (n - 1)
        * (F.col("sdd") - F.col("sd1") * F.col("sd1") / F.col("s11"))
        / (n - 2)
    )
    se = F.sqrt(sigma2 / ((n - 1) * F.col("s11")))
    return m.select(
        n.cast("long").alias("n_obs"),
        F.round("rho", 6).alias("rho_coef"),
        F.round(F.col("rho") / se, 4).alias("adf_t"),
        F.round(F.col("mdy") - F.col("rho") * F.col("my1"), 6).alias(
            "drift"
        ),
    )


@query(
    "stats-page-trend-test",
    oracle="""
        WITH cell AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(floor(extract(hour FROM ts) / 6) AS INT) AS q,
                   avg(value) AS m
            FROM events GROUP BY 1, 2
        ),
        complete AS (
            SELECT day FROM cell GROUP BY day HAVING count(*) = 4
        ),
        ranked AS (
            SELECT c.day, c.q,
                   CAST(rank() OVER (PARTITION BY c.day ORDER BY c.m)
                        AS DOUBLE) AS r
            FROM cell c JOIN complete x ON c.day = x.day
        ),
        rsums AS (
            SELECT q, sum(r) AS rj, CAST(count(*) AS DOUBLE) AS b
            FROM ranked GROUP BY q
        ),
        l AS (
            SELECT sum((q + 1) * rj) AS big_l, max(b) AS b,
                   CAST(count(*) AS DOUBLE) AS k
            FROM rsums
        )
        SELECT CAST(b AS BIGINT) AS n_blocks,
               CAST(k AS BIGINT) AS k_treatments,
               round(big_l, 4) AS page_l,
               round(b * k * (k + 1) * (k + 1) / 4.0, 4) AS expected_l,
               round((12 * big_l - 3 * b * k * (k + 1) * (k + 1))
                     / sqrt(b * k * k * (k + 1) * (k * k - 1)), 4)
                   AS page_z
        FROM l
    """,
    doc="Page's trend test for an ORDERED alternative across repeated "
    "measures: with days as blocks and the four hour-of-day "
    "quadrants as ordered treatments, L = sum_j j*R_j concentrates "
    "power on the monotone hypothesis 'value rises through the day' "
    "— the Friedman test (stats-friedman-test, same block-rank "
    "machinery) spreads power over ALL departures and misses "
    "monotone dose-response patterns this catches; z from the exact "
    "null moments E[L] = bk(k+1)^2/4. Within-day ranking is a 4-row "
    "partitioned window over the calendar-bounded day x quadrant "
    "grid — block count scales with days, never event volume.",
    tags=("stats", "timeseries"),
)
def stats_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.floor(F.hour("ts") / 6).cast("int").alias("q"),
    ).agg(F.avg("value").alias("m"))
    complete = (
        cell.groupBy("day")
        .agg(F.count("*").alias("kq"))
        .filter(F.col("kq") == 4)
        .select("day")
    )
    ranked = cell.join(complete, "day").select(
        "q",
        F.rank()
        .over(Window.partitionBy("day").orderBy("m"))
        .cast("double")
        .alias("r"),
    )
    rsums = ranked.groupBy("q").agg(
        F.sum("r").alias("rj"), F.count("*").cast("double").alias("b")
    )
    l = rsums.agg(
        F.sum((F.col("q") + 1) * F.col("rj")).alias("big_l"),
        F.max("b").alias("b"),
        F.count("*").cast("double").alias("k"),
    )
    b, k, big_l = F.col("b"), F.col("k"), F.col("big_l")
    return l.select(
        b.cast("long").alias("n_blocks"),
        k.cast("long").alias("k_treatments"),
        F.round(big_l, 4).alias("page_l"),
        F.round(b * k * (k + 1) * (k + 1) / 4.0, 4).alias("expected_l"),
        F.round(
            (12 * big_l - 3 * b * k * (k + 1) * (k + 1))
            / F.sqrt(b * k * k * (k + 1) * (k * k - 1)),
            4,
        ).alias("page_z"),
    )


@query(
    "timeseries-sen-slope-seasonal",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ),
        keyed AS (
            SELECT dayofweek(d) AS dow,
                   CAST(date_diff('day', (SELECT min(d) FROM daily), d)
                        AS DOUBLE) AS t,
                   y
            FROM daily
        ),
        slopes AS (
            SELECT (b.y - a.y) / (b.t - a.t) AS m
            FROM keyed a JOIN keyed b
              ON a.dow = b.dow AND a.t < b.t
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               round(quantile_cont(m, 0.5), 6) AS sen_slope_per_day,
               round(quantile_cont(m, 0.05), 6) AS slope_p05,
               round(quantile_cont(m, 0.95), 6) AS slope_p95
        FROM slopes
    """,
    doc="Seasonal Sen's slope — the ESTIMATOR paired with "
    "timeseries-seasonal-mann-kendall's test: the median of pairwise "
    "slopes (y_j - y_i)/(t_j - t_i) computed only between SAME-"
    "weekday days, so the weekly cycle contributes no spurious "
    "pairs; p05/p95 of the slope distribution give a nonparametric "
    "band. Sen's median slope has a 29%% breakdown point where the "
    "OLS trend (timeseries-cochrane-orcutt's first stage) is wrecked "
    "by one outlier day. Pair join is within-season over the "
    "calendar-bounded day summary — quadratic in WEEKS only; the "
    "median runs on that bounded pair set (exact quantile, Spark "
    "percentile == DuckDB quantile_cont).",
    tags=("timeseries", "stats"),
)
def timeseries_sen_slope_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    # persist the CALENDAR-BOUNDED keyed series (<= ~3650 rows at any
    # scale) as ONE cached partition: both pairwise-join sides
    # re-consumed it (4 events scans -> 1)
    keyed = (
        daily.crossJoin(F.broadcast(d0))
        .select(
            F.dayofweek("d").alias("dow"),
            F.datediff("d", "d0").cast("double").alias("t"),
            "y",
        )
        .coalesce(1)
        .persist()
    )
    a = keyed.select(
        F.col("dow").alias("a_dow"), F.col("t").alias("a_t"),
        F.col("y").alias("a_y"),
    )
    b = keyed.select(
        F.col("dow").alias("b_dow"), F.col("t").alias("b_t"),
        F.col("y").alias("b_y"),
    )
    slopes = a.join(
        b,
        (F.col("a_dow") == F.col("b_dow")) & (F.col("a_t") < F.col("b_t")),
    ).select(
        ((F.col("b_y") - F.col("a_y")) / (F.col("b_t") - F.col("a_t"))).alias(
            "m"
        )
    )
    return slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(m, 0.5)"), 6).alias(
            "sen_slope_per_day"
        ),
        F.round(F.expr("percentile(m, 0.05)"), 6).alias("slope_p05"),
        F.round(F.expr("percentile(m, 0.95)"), 6).alias("slope_p95"),
    )


@query(
    "stats-jonckheere-terpstra",
    oracle="""
        WITH obs AS (
            SELECT CAST(floor(extract(hour FROM ts) / 6) AS INT) AS g,
                   round(value, 2) AS v
            FROM events
        ),
        cells AS (
            SELECT g, v, CAST(count(*) AS DOUBLE) AS c
            FROM obs GROUP BY g, v
        ),
        grid AS (
            SELECT gr.g, va.v, coalesce(c.c, 0) AS c
            FROM (SELECT DISTINCT g FROM cells) gr
            CROSS JOIN (SELECT DISTINCT v FROM cells) va
            LEFT JOIN cells c ON c.g = gr.g AND c.v = va.v
        ),
        cum AS (
            SELECT g, v, c,
                   coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS below
            FROM grid
        ),
        u AS (
            SELECT sum(b.c * (a.below + 0.5 * a.c)) AS jt
            FROM cum a JOIN cells b ON a.v = b.v AND a.g < b.g
        ),
        sizes AS (
            SELECT sum(cnt) AS n,
                   sum(cnt * cnt) AS sn2,
                   sum(cnt * cnt * (2 * cnt + 3)) AS sn23
            FROM (SELECT g, CAST(count(*) AS DOUBLE) AS cnt
                  FROM obs GROUP BY g) t
        )
        SELECT CAST(s.n AS BIGINT) AS n_obs,
               round(u.jt, 4) AS jt_stat,
               round((s.n * s.n - s.sn2) / 4.0, 4) AS expected_jt,
               round((u.jt - (s.n * s.n - s.sn2) / 4.0)
                     / sqrt((s.n * s.n * (2 * s.n + 3) - s.sn23) / 72.0), 4)
                   AS jt_z
        FROM u CROSS JOIN sizes s
    """,
    doc="Jonckheere-Terpstra test for an ordered alternative across "
    "independent groups (hour-of-day quadrants on event value): "
    "JT = sum over ordered group pairs of the Mann-Whitney count "
    "#(a < b) + 0.5 #(ties), z from the no-tie null moments "
    "E = (N^2 - sum n_i^2)/4. Kruskal-Wallis (stats-kruskal-wallis) "
    "tests ANY group difference; JT concentrates power on the "
    "MONOTONE ordering — the independent-groups twin of "
    "stats-page-trend-test's blocked design. The pairwise count "
    "never touches row pairs: per-(group, rounded-value) counts are "
    "densified onto the full (group x distinct-value) grid (so the "
    "per-group cumulative 'below' count exists at EVERY value, even "
    "where that group has no observations — a bin with no match in "
    "an earlier group still contributes its below-count term), then "
    "a bin-equi-join on value across the 6 ordered group pairs.",
    tags=("stats",),
)
def stats_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        F.floor(F.hour("ts") / 6).cast("int").alias("g"),
        F.round("value", 2).alias("v"),
    )
    # persist the per-(group, bin) cell counts: the group/value
    # universes, the densified grid and the pairwise b-side all
    # re-consume them (5 events scans unpersisted). r11 tried this
    # persist at the static 32-partition cache width and reverted
    # (+26%); the cached shape now coalesces to summary width
    # (session.cache_width), which removes the width drag.
    cells = (
        obs.groupBy("g", "v")
        .agg(F.count("*").cast("double").alias("c"))
        .coalesce(cache_width(spark))
        .persist()
    )
    # Densify onto the full (group x distinct-value) grid: the cumulative
    # "below" count must exist at every value for every group, or b-cells
    # whose value never occurs in an earlier group silently contribute
    # nothing (they still owe their below-count term). Groups are a
    # 4-row broadcast; the grid is |distinct v| x 4.
    groups = cells.select("g").distinct()
    vals = cells.select("v").distinct()
    grid = (
        vals.crossJoin(F.broadcast(groups))
        .join(cells, ["g", "v"], "left")
        .select("g", "v", F.coalesce("c", F.lit(0.0)).alias("c"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0.0)).alias("below"),
    )
    a = cum.select(
        F.col("g").alias("a_g"), F.col("v").alias("a_v"),
        F.col("c").alias("a_c"), "below",
    )
    b = cells.select(
        F.col("g").alias("b_g"), F.col("v").alias("b_v"),
        F.col("c").alias("b_c"),
    )
    u = a.join(
        b, (F.col("a_v") == F.col("b_v")) & (F.col("a_g") < F.col("b_g"))
    ).agg(
        F.sum(
            F.col("b_c") * (F.col("below") + 0.5 * F.col("a_c"))
        ).alias("jt")
    )
    sizes = (
        obs.groupBy("g")
        .agg(F.count("*").cast("double").alias("cnt"))
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sn2"),
            F.sum(
                F.col("cnt") * F.col("cnt") * (2 * F.col("cnt") + 3)
            ).alias("sn23"),
        )
    )
    n, sn2, sn23 = F.col("n"), F.col("sn2"), F.col("sn23")
    e_jt = (n * n - sn2) / 4.0
    var_jt = (n * n * (2 * n + 3) - sn23) / 72.0
    return u.crossJoin(F.broadcast(sizes)).select(
        n.cast("long").alias("n_obs"),
        F.round("jt", 4).alias("jt_stat"),
        F.round(e_jt, 4).alias("expected_jt"),
        F.round((F.col("jt") - e_jt) / F.sqrt(var_jt), 4).alias("jt_z"),
    )
