"""Survival / recurrent-event analysis ops (Kaplan-Meier,
Nelson-Aalen, competing risks, MCF, logrank). Split from
mlprep.py in round 6. Same @query/oracle discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.dedup import sql_string_hash, string_hash
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.session import cache_width
from transit_scrape_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# survival / sampling
# ---------------------------------------------------------------------------


@query(
    "stats-kaplan-meier",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                       AS fp
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT CASE WHEN fp IS NOT NULL AND fp >= fv
                        THEN date_diff('day', fv, fp) ELSE
                             date_diff('day', fv, e.obs_end) END AS t,
                   CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END
                       AS died
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t, CAST(sum(died) AS DOUBLE) AS d,
                   CAST(count(*) AS DOUBLE) AS total
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d,
                   sum(total) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM per_t
        ),
        km AS (
            SELECT t, d, n_risk,
                   exp(sum(CASE WHEN d > 0 THEN ln(1 - d / n_risk)
                                ELSE 0 END)
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                       AS s
            FROM risk
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               round(s, 6) AS survival
        FROM km WHERE d > 0 ORDER BY t_days
    """,
    doc="Kaplan-Meier product-limit survival curve for first-view -> "
    "first-purchase conversion with right-censoring at the corpus "
    "high-water mark (the estimator analytics-survival-censored's "
    "duration table feeds): S(t) = prod_{u<=t}(1 - d_u/n_u), with "
    "censored users leaving the risk set without contributing an "
    "event — dropping them instead (the naive rate) biases "
    "conversion-time estimates toward fast converters. n_risk is a "
    "reverse-cumulative count and the product is exp-of-summed-logs, "
    "both windows over the DISTINCT-DURATION summary (bounded by the "
    "calendar span, not the user count). Output rows at event times "
    "only, per KM convention.",
    tags=("stats",),
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
    )
    died = (F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))).cast("int")
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            F.when(
                died == 1, F.datediff("fp", "fv")
            ).otherwise(F.datediff("obs_end", "fv")).alias("t"),
            died.alias("died"),
        )
    )
    per_t = dur.groupBy("t").agg(
        F.sum("died").cast("double").alias("d"),
        F.count("*").cast("double").alias("total"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("total").over(w_desc).alias("n_risk")
    )
    km = risk.select(
        "t",
        "d",
        "n_risk",
        F.exp(
            F.sum(
                F.when(
                    F.col("d") > 0, F.log(1 - F.col("d") / F.col("n_risk"))
                ).otherwise(0.0)
            ).over(w_asc)
        ).alias("s"),
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.round("s", 6).alias("survival"),
        )
        .orderBy("t_days")
    )



# ---------------------------------------------------------------------------
# round 5 (cont.): survival hazard, OLS inference, ITS, naive Bayes
# ---------------------------------------------------------------------------


@query(
    "stats-nelson-aalen",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                       AS fp
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT CASE WHEN fp IS NOT NULL AND fp >= fv
                        THEN date_diff('day', fv, fp) ELSE
                             date_diff('day', fv, e.obs_end) END AS t,
                   CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END
                       AS died
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t, CAST(sum(died) AS DOUBLE) AS d,
                   CAST(count(*) AS DOUBLE) AS total
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d,
                   sum(total) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM per_t
        ),
        na AS (
            SELECT t, d, n_risk,
                   sum(d / n_risk) OVER w AS h,
                   sum(d / (n_risk * n_risk)) OVER w AS v
            FROM risk
            WINDOW w AS (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               round(h, 6) AS cum_hazard,
               round(exp(-h), 6) AS breslow_survival,
               round(sqrt(v), 6) AS hazard_se
        FROM na WHERE d > 0 ORDER BY t_days
    """,
    doc="Nelson-Aalen cumulative-hazard estimator on the SAME "
    "first-view -> first-purchase duration table as "
    "stats-kaplan-meier: H(t) = sum_{u<=t} d_u/n_u with variance "
    "sum d_u/n_u^2 (Poisson-type), plus the Breslow/Fleming-"
    "Harrington survival exp(-H) — preferred over KM's product form "
    "for small risk sets because the hazard increments are additive "
    "and the estimator never hits an absorbing zero. The windows run "
    "over the distinct-duration SUMMARY (bounded by the calendar "
    "span), never the user count, so the shape survives 100 TB: one "
    "shuffle to per-user firsts, one to per-duration counts, then "
    "tiny windows.",
    tags=("stats",),
)
def stats_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
    )
    died = (F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))).cast("int")
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            F.when(died == 1, F.datediff("fp", "fv"))
            .otherwise(F.datediff("obs_end", "fv"))
            .alias("t"),
            died.alias("died"),
        )
    )
    per_t = dur.groupBy("t").agg(
        F.sum("died").cast("double").alias("d"),
        F.count("*").cast("double").alias("total"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("total").over(w_desc).alias("n_risk")
    )
    na = risk.select(
        "t",
        "d",
        "n_risk",
        F.sum(F.col("d") / F.col("n_risk")).over(w_asc).alias("h"),
        F.sum(F.col("d") / (F.col("n_risk") * F.col("n_risk")))
        .over(w_asc)
        .alias("v"),
    )
    return (
        na.filter(F.col("d") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.round("h", 6).alias("cum_hazard"),
            F.round(F.exp(-F.col("h")), 6).alias("breslow_survival"),
            F.round(F.sqrt("v"), 6).alias("hazard_se"),
        )
        .orderBy("t_days")
    )


@query(
    "analytics-competing-risks",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) AS fp,
                   min(CASE WHEN event_type = 'error'
                            THEN CAST(ts AS DATE) END) AS fe
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT CASE
                     WHEN fp IS NOT NULL AND fp >= fv
                          AND (fe IS NULL OR fp <= fe)
                       THEN date_diff('day', fv, fp)
                     WHEN fe IS NOT NULL AND fe >= fv
                       THEN date_diff('day', fv, fe)
                     ELSE date_diff('day', fv, e.obs_end)
                   END AS t,
                   CASE
                     WHEN fp IS NOT NULL AND fp >= fv
                          AND (fe IS NULL OR fp <= fe) THEN 1
                     WHEN fe IS NOT NULL AND fe >= fv THEN 2
                     ELSE 0
                   END AS cause
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t,
                   CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d1,
                   CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d2,
                   CAST(count(*) AS DOUBLE) AS total
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d1, d2,
                   sum(total) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_risk
            FROM per_t
        ),
        surv AS (
            SELECT t, d1, d2, n_risk,
                   exp(coalesce(sum(CASE WHEN d1 + d2 > 0
                           THEN ln(1 - (d1 + d2) / n_risk) ELSE 0 END)
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0)) AS s_minus
            FROM risk
        ),
        cif AS (
            SELECT t, d1, d2, n_risk,
                   sum(s_minus * d1 / n_risk) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cif_purchase,
                   sum(s_minus * d2 / n_risk) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cif_error
            FROM surv
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d1 AS BIGINT) AS n_purchase,
               CAST(d2 AS BIGINT) AS n_error,
               round(cif_purchase + 1e-9, 6) AS cif_purchase,
               round(cif_error + 1e-9, 6) AS cif_error
        FROM cif WHERE d1 + d2 > 0 ORDER BY t_days
    """,
    doc="Aalen-Johansen cumulative incidence under competing risks — "
    "first purchase vs first error racing from first view: "
    "CIF_k(t) = sum_{u<=t} S(u-) d_ku/n_u where S(u-) is the "
    "ALL-CAUSE Kaplan-Meier just before u. The estimator "
    "stats-kaplan-meier users reach for here (1 - KM per cause, "
    "censoring the competitor) is BIASED upward — the two '1-KM' "
    "curves can sum past 1; CIFs by construction cannot. Same "
    "scale contract as the KM/Nelson-Aalen twins: per-user firsts "
    "(one shuffle), duration summary bounded by the calendar, "
    "windows only over that summary.",
    tags=("analytics", "stats"),
)
def analytics_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
        F.min(
            F.when(F.col("event_type") == "error", F.to_date("ts"))
        ).alias("fe"),
    )
    fp_wins = (
        F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
        & (F.col("fe").isNull() | (F.col("fp") <= F.col("fe")))
    )
    fe_wins = F.col("fe").isNotNull() & (F.col("fe") >= F.col("fv"))
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            F.when(fp_wins, F.datediff("fp", "fv"))
            .when(fe_wins, F.datediff("fe", "fv"))
            .otherwise(F.datediff("obs_end", "fv"))
            .alias("t"),
            F.when(fp_wins, 1).when(fe_wins, 2).otherwise(0).alias("cause"),
        )
    )
    per_t = dur.groupBy("t").agg(
        F.sum(F.when(F.col("cause") == 1, 1).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.sum(F.when(F.col("cause") == 2, 1).otherwise(0))
        .cast("double")
        .alias("d2"),
        F.count("*").cast("double").alias("total"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d1", "d2", F.sum("total").over(w_desc).alias("n_risk")
    )
    d_all = F.col("d1") + F.col("d2")
    surv = risk.select(
        "t",
        "d1",
        "d2",
        "n_risk",
        F.exp(
            F.coalesce(
                F.sum(
                    F.when(
                        d_all > 0, F.log(1 - d_all / F.col("n_risk"))
                    ).otherwise(0.0)
                ).over(w_prev),
                F.lit(0.0),
            )
        ).alias("s_minus"),
    )
    cif = surv.select(
        "t",
        "d1",
        "d2",
        "n_risk",
        F.sum(F.col("s_minus") * F.col("d1") / F.col("n_risk"))
        .over(w_upto)
        .alias("cif_purchase"),
        F.sum(F.col("s_minus") * F.col("d2") / F.col("n_risk"))
        .over(w_upto)
        .alias("cif_error"),
    )
    return (
        cif.filter(F.col("d1") + F.col("d2") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d1").cast("long").alias("n_purchase"),
            F.col("d2").cast("long").alias("n_error"),
            # +1e-9 on BOTH engines before the 6dp round: a CIF can land
            # exactly on a representable rounding half (0.1421875 on the
            # zipf skew warehouse) where engine last-bit drift flips
            # HALF_UP; the nudge is >> drift (~1e-15) and << the rounding
            # step (1e-6), so it only moves the knife-edge
            F.round(F.col("cif_purchase") + 1e-9, 6).alias("cif_purchase"),
            F.round(F.col("cif_error") + 1e-9, 6).alias("cif_error"),
        )
        .orderBy("t_days")
    )


@query(
    "event-mcf-recurrent",
    oracle="""
        WITH ev0 AS (SELECT * FROM events WHERE ts IS NOT NULL),
        ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM ev0),
        fu AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS enter_d
            FROM ev0 GROUP BY user_id
        ),
        purchases AS (
            SELECT e.user_id,
                   date_diff('day', f.enter_d, CAST(e.ts AS DATE)) AS t
            FROM ev0 e JOIN fu f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase'
        ),
        risk_span AS (
            SELECT f.user_id,
                   date_diff('day', f.enter_d, x.obs_end) AS tau
            FROM fu f CROSS JOIN ends x
        ),
        ev_t AS (
            SELECT t, CAST(count(*) AS DOUBLE) AS d FROM purchases
            GROUP BY t
        ),
        exits AS (
            SELECT tau, CAST(count(*) AS DOUBLE) AS n_exit FROM risk_span
            GROUP BY tau
        ),
        grid AS (
            SELECT t, d, coalesce(x.n_exit, 0) AS n_exit
            FROM ev_t LEFT JOIN exits x ON ev_t.t = x.tau
        ),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_users FROM fu),
        mcf AS (
            SELECT t, d,
                   tot.n_users
                     - coalesce(sum(n_exit) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n_risk,
                   tot.n_users
            FROM grid CROSS JOIN tot
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               round(sum(d / n_risk) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS mcf
        FROM mcf ORDER BY t_days
    """,
    doc="Nelson-Aalen mean cumulative function for RECURRENT events — "
    "expected purchases per user by day t since first activity: "
    "MCF(t) = sum_{u<=t} d_u / n_u with the risk set shrinking as "
    "users' observation windows end (staggered entry -> staggered "
    "administrative censoring at the corpus high-water mark). The "
    "single-event estimators (stats-kaplan-meier and twins) describe "
    "TIME-TO-FIRST; repeat behavior — orders, support tickets, "
    "crashes per device — needs the MCF, and dividing raw cumulative "
    "counts by the day-0 cohort size (the naive curve) understates "
    "late-horizon rates exactly when censoring bites. Purchase "
    "events and exit times roll up to two calendar-bounded "
    "summaries; windows run there.",
    tags=("event", "analytics"),
)
def event_mcf_recurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    # persist the per-user entry dates: the purchase join, the risk-span
    # fan-out and the user count all consume them — unpersisted each
    # re-planned the events rollup (5 fact scans / 24 Exchanges in the
    # r11 before-plan)
    fu = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("enter_d")
    ).persist()
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fu, "user_id")
        .select(F.datediff(F.to_date("ts"), "enter_d").alias("t"))
    )
    risk_span = fu.crossJoin(F.broadcast(ends)).select(
        F.datediff("obs_end", "enter_d").alias("tau")
    )
    ev_t = purchases.groupBy("t").agg(F.count("*").cast("double").alias("d"))
    exits = risk_span.groupBy(F.col("tau").alias("t_exit")).agg(
        F.count("*").cast("double").alias("n_exit")
    )
    grid = ev_t.join(
        exits, ev_t["t"] == exits["t_exit"], "left"
    ).select(
        "t", "d", F.coalesce(F.col("n_exit"), F.lit(0.0)).alias("n_exit")
    )
    tot = fu.agg(F.count("*").cast("double").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mcf = grid.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_exit").over(w_prev), F.lit(0.0))
        ).alias("n_risk"),
    )
    return mcf.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("d") / F.col("n_risk")).over(w_upto), 6
        ).alias("mcf"),
    ).orderBy("t_days")


@query(
    "stats-logrank-test",
    oracle="""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
                   min(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
                       AS fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) AS fp
            FROM events GROUP BY user_id
        ),
        dur AS (
            SELECT grp,
                   CASE WHEN fp IS NOT NULL AND fp >= fv
                        THEN date_diff('day', fv, fp) ELSE
                             date_diff('day', fv, e.obs_end) END AS t,
                   CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END
                       AS died
            FROM pu CROSS JOIN ends e
            WHERE fv IS NOT NULL
        ),
        per_t AS (
            SELECT t,
                   CAST(sum(died) AS DOUBLE) AS d,
                   CAST(sum(CASE WHEN grp = 1 THEN died ELSE 0 END)
                        AS DOUBLE) AS d1,
                   CAST(count(*) AS DOUBLE) AS total,
                   CAST(sum(grp) AS DOUBLE) AS total1
            FROM dur GROUP BY t
        ),
        risk AS (
            SELECT t, d, d1,
                   sum(total) OVER w AS n_risk,
                   sum(total1) OVER w AS n1_risk
            FROM per_t
            WINDOW w AS (ORDER BY t DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        terms AS (
            SELECT sum(d1) AS o1,
                   sum(d * n1_risk / n_risk) AS e1,
                   sum(CASE WHEN n_risk > 1
                            THEN d * (n1_risk / n_risk)
                                 * (1 - n1_risk / n_risk)
                                 * (n_risk - d) / (n_risk - 1)
                            ELSE 0 END) AS v
            FROM risk WHERE d > 0
        )
        SELECT CAST((SELECT count(*) FROM dur) AS BIGINT) AS n_users,
               round(o1, 6) AS observed_g1,
               round(e1, 6) AS expected_g1,
               round((o1 - e1) * (o1 - e1) / v, 4) AS logrank_chi2
        FROM terms
    """,
    doc="Two-group log-rank test on first-view -> first-purchase "
    "conversion (groups = user hash parity): at each event time the "
    "group-1 deaths are compared against the hypergeometric "
    "expectation d * n1/n with variance d(n1/n)(1-n1/n)(n-d)/(n-1), "
    "and chi2 = (O1-E1)^2/V — THE standard test for 'do these two "
    "survival curves differ', weighting every event time equally "
    "(Mantel-Haenszel over the risk-set 2x2 tables; the same "
    "machinery as stats-cmh-pooled-or applied along time). Completes "
    "the survival suite: KM/Nelson-Aalen estimate curves, "
    "competing-risks splits causes, log-rank TESTS group contrast. "
    "Same scale contract: windows only over the calendar-bounded "
    "duration summary.",
    tags=("stats", "analytics"),
)
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ends = ev.agg(F.to_date(F.max("ts")).alias("obs_end"))
    pu = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.to_date("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("fp"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("grp"), "fv", "fp"
    )
    died = (F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))).cast(
        "int"
    )
    dur = (
        pu.crossJoin(F.broadcast(ends))
        .filter(F.col("fv").isNotNull())
        .select(
            "grp",
            F.when(died == 1, F.datediff("fp", "fv"))
            .otherwise(F.datediff("obs_end", "fv"))
            .alias("t"),
            died.alias("died"),
        )
    )
    # persist the per-user duration summary: the user count and the
    # per-time risk rollup both re-consume it (4 events scans
    # unpersisted). r11 tried this persist at the static 32-partition
    # cache width and reverted (+28%); the cached shape now coalesces
    # to summary width (session.cache_width).
    dur = dur.coalesce(cache_width(spark)).persist()
    n_users = dur.agg(F.count("*").cast("long").alias("n_users"))
    per_t = dur.groupBy("t").agg(
        F.sum("died").cast("double").alias("d"),
        F.sum(F.when(F.col("grp") == 1, F.col("died")).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.count("*").cast("double").alias("total"),
        F.sum("grp").cast("double").alias("total1"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t",
        "d",
        "d1",
        F.sum("total").over(w).alias("n_risk"),
        F.sum("total1").over(w).alias("n1_risk"),
    )
    p1 = F.col("n1_risk") / F.col("n_risk")
    terms = risk.filter(F.col("d") > 0).agg(
        F.sum("d1").alias("o1"),
        F.sum(F.col("d") * p1).alias("e1"),
        F.sum(
            F.when(
                F.col("n_risk") > 1,
                F.col("d")
                * p1
                * (1 - p1)
                * (F.col("n_risk") - F.col("d"))
                / (F.col("n_risk") - 1),
            ).otherwise(0.0)
        ).alias("v"),
    )
    return terms.crossJoin(F.broadcast(n_users)).select(
        "n_users",
        F.round("o1", 6).alias("observed_g1"),
        F.round("e1", 6).alias("expected_g1"),
        F.round(
            (F.col("o1") - F.col("e1"))
            * (F.col("o1") - F.col("e1"))
            / F.col("v"),
            4,
        ).alias("logrank_chi2"),
    )


@query(
    "stats-rayleigh-circular",
    oracle="""
        WITH ang AS (
            SELECT event_type,
                   (extract(hour FROM ts) * 3600
                    + extract(minute FROM ts) * 60
                    + extract(second FROM ts))
                   * 2 * pi() / 86400.0 AS theta
            FROM events
        ),
        s AS (
            SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                   avg(cos(theta)) AS c, avg(sin(theta)) AS s
            FROM ang GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_events,
               round(CASE WHEN atan2(s, c) < 0
                          THEN (atan2(s, c) + 2 * pi()) * 86400
                               / (2 * pi()) / 3600
                          ELSE atan2(s, c) * 86400 / (2 * pi()) / 3600
                     END, 4) AS mean_hour,
               round(sqrt(c * c + s * s), 6) AS resultant_r,
               round(n * (c * c + s * s), 4) AS rayleigh_z
        FROM s ORDER BY event_type
    """,
    doc="Circular statistics of event time-of-day per event type: "
    "mean direction (converted back to hours), mean resultant length "
    "R, and the Rayleigh statistic z = n R^2 testing uniformity "
    "around the clock (z > ~3 rejects at 5%%). Clock-time is "
    "CIRCULAR — 23:30 and 00:30 are an hour apart, not 23 — so "
    "linear means/variances (and stats-uniformity-hours' binned "
    "chi2, which discards adjacency entirely) misread peaks that "
    "straddle midnight; the cos/sin resultant is the correct "
    "geometry and costs exactly one aggregation: two trig codegen "
    "columns, five groups, no windows, no joins.",
    tags=("stats", "event"),
)
def stats_rayleigh_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events")
    two_pi = 2 * math.pi
    theta = (
        (
            F.hour("ts") * 3600
            + F.minute("ts") * 60
            + F.second("ts")
        )
        * two_pi
        / 86400.0
    )
    s = ev.select("event_type", theta.alias("theta")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("double").alias("n"),
        F.avg(F.cos("theta")).alias("c"),
        F.avg(F.sin("theta")).alias("s"),
    )
    mean_dir = F.atan2(F.col("s"), F.col("c"))
    mean_hour = (
        F.when(mean_dir < 0, mean_dir + two_pi).otherwise(mean_dir)
        * 86400
        / two_pi
        / 3600
    )
    r2 = F.col("c") * F.col("c") + F.col("s") * F.col("s")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(F.sqrt(r2), 6).alias("resultant_r"),
        F.round(F.col("n") * r2, 4).alias("rayleigh_z"),
    ).orderBy("event_type")
