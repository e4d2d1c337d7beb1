"""Product-analytics workload family over the events stream table:
funnel conversion and cohort retention — the queries an events pipeline
serves all day, shaped as single-shuffle grouped plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "funnel-conversion",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(t_view) AS BIGINT) AS n_viewed,
               CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clicked_after_view,
               CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM per_user
    """,
    doc="Funnel analysis (view -> click -> purchase in time order): one "
    "groupBy(user) with conditional min-timestamps, then a single-row "
    "rollup — no joins, no window, one shuffle; the standard "
    "events-pipeline conversion query.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = lambda typ: F.min(F.when(F.col("event_type") == typ, F.col("ts")))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        t("view").alias("t_view"),
        t("click").alias("t_click"),
        t("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).cast("long").alias("n_clicked_after_view"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_full_funnel"),
    )


@query(
    "retention-cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
                       AS week_n
            FROM events e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT cohort_week, week_n, CAST(count(*) AS BIGINT) AS n_active_users
        FROM activity
        GROUP BY cohort_week, week_n
    """,
    doc="Cohort retention: first-activity week per user, then distinct "
    "(user, weeks-since-cohort) counts — the firsts relation re-joins "
    "the fact on user_id (both sides partition on user_id, AQE reuses "
    "the exchange); distinct bounds the matrix to users x weeks.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp(F.col("cohort_week"))
                    )
                    / (7 * 86400)
                )
            ).alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_n").agg(
        F.count("*").alias("n_active_users")
    )
