"""As-of join (PAPERS.md / guide 'common OLAP patterns' — Spark lacks a
native one). Two scalable strategies implemented:

1. union + window (this module's oracled op): tag both sides, union,
   per-key window ordered by time carries the last-seen right-side row
   forward onto each left row. ONE shuffle on the key, no per-group
   pandas, no range explosion — the preferred 100 TB shape when the
   right side fits the same key partitioning.
2. applyInPandas + pd.merge_asof per key group (guide fallback) — kept
   as a twin for parity testing in tests/, since it exercises the
   grouped-map path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


def asof_join_union_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts within the same key."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_vals],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"_rv_{c}") for c in right_vals],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal timestamps (side 0 < 1),
    # so an equal-ts right row IS visible to the left row (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    keep = [f.name for f in left.schema.fields] + [f"asof_{c}" for c in right_vals]
    return carried.filter(F.col("_side") == 1).select(*keep)


@query(
    "join-asof",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               (SELECT max(o.o_orderdate)
                FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
                   AS asof_o_orderdate
        FROM events e
    """,
    doc="As-of join: each event gets the latest order date at-or-before "
    "its timestamp for the same key (events.user_id ~ orders.o_custkey). "
    "union + per-key window carry-forward: one shuffle, no range "
    "explosion, no pandas. Oracle uses the equivalent correlated max.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join_union_window(
        ev,
        orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_vals=["o_orderdate"],
    )
    return out.select("event_id", "user_id", "ts", "asof_o_orderdate")


def asof_join_pandas(
    left: DataFrame, right: DataFrame, key: str, left_ts: str, right_ts: str,
    right_val: str,
) -> DataFrame:
    """applyInPandas twin using pd.merge_asof per key group (tests only —
    exercises the grouped-map path; the union-window form is the
    production one)."""
    import pandas as pd

    out_schema = f"{left.schema.simpleString()[7:-1]}, asof_{right_val} timestamp"

    l_cols = [f.name for f in left.schema.fields]

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        l = (
            pdf[pdf["_side"] == 1][l_cols + ["_ts"]]
            .sort_values("_ts", kind="mergesort")
        )
        r = (
            pdf[pdf["_side"] == 0][["_ts", right_val]]
            .sort_values("_ts", kind="mergesort")
            .rename(columns={right_val: f"asof_{right_val}"})
        )
        m = pd.merge_asof(l, r, on="_ts", direction="backward")
        return m.drop(columns=["_ts"])

    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_tag = right.select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields
          if f.name != key],
        F.col(key),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        F.col(right_val),
    )
    l_full = l_tag.withColumn(right_val, F.lit(None).cast("timestamp"))
    unioned = l_full.unionByName(r_tag)
    return unioned.groupBy(key).applyInPandas(merge, out_schema)


@query(
    "join-asof-tolerance",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               (SELECT max(o.o_orderdate)
                FROM orders o
                WHERE o.o_custkey = e.user_id
                  AND o.o_orderdate <= e.ts
                  AND o.o_orderdate >= e.ts - INTERVAL 30 DAY)
                   AS asof_o_orderdate,
               ((SELECT max(o.o_orderdate)
                 FROM orders o
                 WHERE o.o_custkey = e.user_id
                   AND o.o_orderdate <= e.ts
                   AND o.o_orderdate >= e.ts - INTERVAL 30 DAY) IS NOT NULL)
                   AS is_fresh
        FROM events e
    """,
    doc="As-of join with a STALENESS TOLERANCE (the feature-store "
    "contract: 'the latest feature value, but never older than 30 "
    "days'): same union + per-key window carry-forward as join-asof — "
    "one shuffle, no range explosion — then the carried value is "
    "nulled when it falls outside the tolerance window (equivalent to "
    "the bounded correlated max, since the unconstrained latest is "
    "the only candidate that could satisfy the bound). The "
    "is_fresh flag is what a training pipeline joins on to drop "
    "stale-feature rows instead of silently learning from them.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join_union_window(
        ev,
        orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_vals=["o_orderdate"],
    )
    fresh = F.col("asof_o_orderdate") >= (
        F.col("ts") - F.expr("INTERVAL 30 DAYS")
    )
    bounded = F.when(fresh, F.col("asof_o_orderdate"))
    return out.select(
        "event_id",
        "user_id",
        "ts",
        bounded.alias("asof_o_orderdate"),
        bounded.isNotNull().alias("is_fresh"),
    )


@query(
    "featurestore-pit-join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               (SELECT max(o.o_orderdate) FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
                   AS f_last_order_date,
               CAST((SELECT count(*) FROM orders o
                     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
                    AS BIGINT) AS f_orders_to_date,
               CAST((SELECT count(*) FROM events p
                     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                       AND p.ts < e.ts) AS BIGINT) AS f_purchases_before
        FROM events e
        WHERE e.event_type = 'view'
    """,
    doc="Feature-store point-in-time join: a training spine (view "
    "events) enriched with THREE as-of features from two sources — "
    "last order date, orders-to-date, purchases-before — all "
    "leakage-free (strictly <= / < the spine timestamp; the oracle "
    "states the textbook correlated form). Plan: ONE union of spine + "
    "both feature streams tagged by kind, ONE per-user window pass "
    "computing every carry-forward/running count together — k "
    "features cost one shuffle, not k joins, because all carries "
    "share the (user, time) order. THE pattern that makes offline "
    "training sets reproduce online serving state at 100 TB.",
)
def featurestore_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    spine = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(2).alias("side"),  # spine: after orders (<=), before purchases (<)
        "event_id",
        F.col("ts").alias("spine_ts"),
        F.lit(None).cast("date").alias("o_date"),
        F.lit(0).alias("is_order"),
        F.lit(0).alias("is_purchase"),
    )
    feat_orders = orders.filter(F.col("o_orderdate").isNotNull()).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("spine_ts"),
        F.col("o_orderdate").alias("o_date"),
        F.lit(1).alias("is_order"),
        F.lit(0).alias("is_purchase"),
    )
    feat_purch = ev.filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    ).select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(3).alias("side"),  # purchases at t == spine ts do NOT count (<)
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("spine_ts"),
        F.lit(None).cast("date").alias("o_date"),
        F.lit(0).alias("is_order"),
        F.lit(1).alias("is_purchase"),
    )
    # Tie discipline is carried by the side tag alone, independent of the
    # fixture: orders (side 0, <= semantics) sort BEFORE the spine (side 2)
    # so an equal-timestamp order counts, while purchases (side 3, strict <)
    # sort AFTER it so an equal-timestamp purchase does not.
    unioned = spine.unionByName(feat_orders).unionByName(feat_purch)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "side",
        "event_id",
        F.col("k").alias("user_id"),
        F.col("spine_ts").alias("ts"),
        F.max("o_date").over(w).alias("f_last_order_date"),
        F.sum("is_order").over(w).cast("long").alias("f_orders_to_date"),
        F.sum("is_purchase").over(w).cast("long").alias("f_purchases_before"),
    )
    return carried.filter(F.col("side") == 2).select(
        "event_id",
        "user_id",
        "ts",
        "f_last_order_date",
        "f_orders_to_date",
        "f_purchases_before",
    )


@query(
    "join-interval-overlap",
    oracle="""
        WITH sessions AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   min(ts) AS s_start, max(ts) AS s_end
            FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
        ),
        campaigns AS (
            SELECT k AS campaign_id,
                   (SELECT min(ts) FROM events) + (k * INTERVAL 40 HOUR) AS c_start,
                   (SELECT min(ts) FROM events) + (k * INTERVAL 40 HOUR)
                       + INTERVAL 12 HOUR AS c_end
            FROM (SELECT unnest(range(0, 8)) AS k)
        )
        SELECT c.campaign_id,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(date_diff('second',
                                  greatest(s.s_start, c.c_start),
                                  least(s.s_end, c.c_end))) AS BIGINT)
                   AS overlap_seconds
        FROM sessions s JOIN campaigns c
          ON s.s_start < c.c_end AND c.c_start < s.s_end
        GROUP BY c.campaign_id
    """,
    doc="Interval-overlap join: per-user-day activity spans against "
    "eight 12-hour campaign windows — pairs where the intervals "
    "genuinely intersect (strict half-open overlap predicate), with "
    "summed overlap duration per campaign. The campaign side is tiny "
    "-> broadcast, so the theta predicate never degenerates to a "
    "shuffled cross join; when BOTH interval sets are large, "
    "bucketize time (join-range-bucketized's construction: intervals "
    "explode to the buckets they touch, equi-join on bucket, exact "
    "predicate re-checked) — overlap joins are the attribution/"
    "exposure primitive of every campaign-measurement pipeline.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    t0 = ev.agg(F.min("ts").alias("t0"))
    campaigns = (
        t0.select(F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"), "t0")
        .select(
            F.col("k").cast("long").alias("campaign_id"),
            (F.col("t0") + F.col("k") * F.expr("INTERVAL 40 HOURS")).alias("c_start"),
            (
                F.col("t0")
                + F.col("k") * F.expr("INTERVAL 40 HOURS")
                + F.expr("INTERVAL 12 HOURS")
            ).alias("c_end"),
        )
    )
    joined = sessions.join(
        F.broadcast(campaigns),
        (F.col("s_start") < F.col("c_end")) & (F.col("c_start") < F.col("s_end")),
    )
    overlap_sec = F.unix_timestamp(
        F.least(F.col("s_end"), F.col("c_end"))
    ) - F.unix_timestamp(F.greatest(F.col("s_start"), F.col("c_start")))
    return joined.groupBy("campaign_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum(overlap_sec).cast("long").alias("overlap_seconds"),
    )


@query(
    "join-asof-nearest",
    oracle="""
        WITH cand AS (
            SELECT e.event_id, e.user_id, e.ts,
                   (SELECT max(o.o_orderdate) FROM orders o
                    WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
                       AS back_ts,
                   (SELECT min(o.o_orderdate) FROM orders o
                    WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
                       AS fwd_ts
            FROM events e
        )
        SELECT event_id, user_id, ts,
               CASE
                   WHEN back_ts IS NULL THEN fwd_ts
                   WHEN fwd_ts IS NULL THEN back_ts
                   WHEN epoch(ts) - epoch(back_ts)
                        <= epoch(fwd_ts) - epoch(ts) THEN back_ts
                   ELSE fwd_ts
               END AS nearest_o_orderdate
        FROM cand
    """,
    doc="As-of join, direction='nearest' (pandas merge_asof's third "
    "direction; join-asof covers backward, join-asof-tolerance bounded "
    "backward): each event gets the order date MINIMIZING |order_ts - "
    "event_ts| for its key, ties to the earlier (backward) side. Same "
    "union + per-key window machinery as join-asof but TWO carries "
    "over one hash partitioning: last right at-or-before (orderBy ts "
    "with right-before-left at equal ts) and first right at-or-after "
    "(orderBy ts with left-before-right), then a codegen CASE picks "
    "the closer. One exchange, two sorts, no range explosion — the "
    "nearest-neighbour-in-time shape at any scale.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    # NULL-date orders satisfy neither <= nor >= in the oracle's
    # correlated form; a NULL-ts event matches nothing (guarded below)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", "o_orderdate")
    )
    l_tag = ev.select(
        F.col("user_id").alias("_k"),
        F.col("ts").alias("_ts"),
        F.lit(1).alias("_side"),
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r_tag = orders.select(
        F.col("o_custkey").alias("_k"),
        F.col("o_orderdate").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderdate").alias("_rts"),
    )
    unioned = l_tag.unionByName(r_tag)
    # backward: right rows (side 0) sort before left at equal _ts, so an
    # equal-ts order is visible to the <= carry
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: order left (side 1) before right (side 0) at equal _ts via
    # descending side, so an equal-ts order is inside the >= frame
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.last("_rts", ignorenulls=True).over(w_back).alias("_back"),
        F.first("_rts", ignorenulls=True).over(w_fwd).alias("_fwd"),
    ).filter(F.col("_side") == 1)
    back_d = F.col("ts").cast("long") - F.col("_back").cast("long")
    fwd_d = F.col("_fwd").cast("long") - F.col("ts").cast("long")
    nearest = (
        F.when(F.col("_back").isNull(), F.col("_fwd"))
        .when(F.col("_fwd").isNull(), F.col("_back"))
        .when(back_d <= fwd_d, F.col("_back"))
        .otherwise(F.col("_fwd"))
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("ts").isNotNull(), nearest).alias("nearest_o_orderdate"),
    )


@query(
    "join-asof-forward",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               (SELECT min(o.o_orderdate)
                FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
                   AS next_o_orderdate
        FROM events e
    """,
    doc="As-of join, direction='forward' (pandas merge_asof's second "
    "direction, completing the family: join-asof backward, "
    "join-asof-nearest, join-asof-tolerance): each event gets the "
    "EARLIEST order date at-or-after its timestamp for the same key — "
    "the next-scheduled-departure / next-replenishment lookup. Same "
    "union machinery as join-asof but the window frame looks FORWARD "
    "(currentRow..unboundedFollowing, first_value ignorenulls), with "
    "left rows sorted before right at equal timestamps so an equal-ts "
    "order satisfies >=. One hash exchange on the key, one sort, no "
    "range explosion — symmetric scale posture to the backward op.",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", "o_orderdate")
    )
    l_tag = ev.select(
        F.col("user_id").alias("_k"),
        F.col("ts").alias("_ts"),
        F.lit(1).alias("_side"),
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r_tag = orders.select(
        F.col("o_custkey").alias("_k"),
        F.col("o_orderdate").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderdate").alias("_rts"),
    )
    unioned = l_tag.unionByName(r_tag)
    # left (side 1) sorts before right (side 0) at equal _ts via
    # descending side, so an equal-ts order is inside the >= frame
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.first("_rts", ignorenulls=True).over(w_fwd).alias("next_o_orderdate"),
    )
    return carried.filter(F.col("_side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("ts").isNotNull(), F.col("next_o_orderdate")).alias(
            "next_o_orderdate"
        ),
    )
