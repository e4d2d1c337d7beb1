"""Structured Streaming surface (SURVEY.md §2.10).

The reference's incremental pattern — scrape to timestamped files, then
sequential append-load (``process_cycle_networks.py:146`` +
``push_to_db.py:87-106``) — re-expressed as Structured Streaming file
sources with availableNow triggers (process-everything-then-stop, the
batch-replay mode).

These ops run a REAL streaming query (readStream -> memory sink) and
return the result table, so they remain oracle-comparable: with a
single availableNow replay over a static fixture no rows are
watermark-dropped, so the streaming result equals the batch aggregate.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


def _run_stream_to_memory(sdf, out_mode: str) -> str:
    """Run a streaming DataFrame to completion into a memory sink;
    returns the sink table name."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.outputMode(out_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def _events_stream(spark: SparkSession, sf_dir: str):
    from transit_scrape_spark.sources.tables import load_events_raw

    raw = load_events_raw(spark, sf_dir)
    # file streams require a directory source: stream the fixture dir with
    # a glob filter selecting just the events table
    sdf = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return sdf


@query(
    "stream-file-source",
    oracle="""
        SELECT event_type, count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    doc="Continuous file-source ingest (reference glob loop "
    "push_to_db.py:77-88) as readStream.parquet + availableNow: "
    "exactly-once per file via checkpointed file tracking; counts must "
    "equal the batch scan.",
)
def stream_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _events_stream(spark, sf_dir).groupBy("event_type").agg(
        F.count("*").alias("n")
    )
    name = _run_stream_to_memory(counts, "complete")
    return spark.table(name)


@query(
    "stream-tumbling-agg",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling-window counts (reference per-load rollup "
    "push_to_db.py:109-111 generalized): watermark + window('1 hour') "
    "groupBy; complete output over an availableNow replay equals the "
    "batch date_trunc aggregate. State is bounded by the watermark in "
    "continuous operation.",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = _run_stream_to_memory(agg, "complete")
    return spark.table(name).select(
        F.col("window.start").alias("window_start"), "event_type", "n", "sum_value"
    )


@query(
    "stream-sliding-agg",
    oracle="""
        WITH slides AS (
            SELECT e.*,
                   CAST(time_bucket(INTERVAL 15 MINUTE, e.ts)
                        - to_minutes(15 * s.i) AS TIMESTAMP) AS window_start
            FROM events e
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) s
        )
        SELECT window_start, count(*) AS n
        FROM slides
        GROUP BY window_start
    """,
    doc="Sliding-window aggregation (1 h window, 15 min slide): each event "
    "lands in the 4 windows starting at floor15(ts) - {0,15,30,45} min; "
    "the oracle reproduces Spark's epoch-aligned window assignment with "
    "time_bucket.",
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
    )
    name = _run_stream_to_memory(agg, "complete")
    return spark.table(name).select(
        F.col("window.start").alias("window_start"), "n"
    )


@query(
    "stream-append-sink",
    oracle="""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    doc="Exactly-once append to a parquet table (reference commit-per-batch "
    "db_helpers.py:181-182 + drop-only-first-file hazard "
    "push_to_db.py:91-92): writeStream.parquet + checkpoint. Re-running "
    "with the same checkpoint appends NOTHING new — the checkpoint "
    "replaces the reference's fragile drop_existing flag.",
)
def stream_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    tag = sf_dir.strip("/").replace("/", "_")
    out_dir = f"/tmp/tss_stream_append_{tag}/data"
    ckpt = f"/tmp/tss_stream_append_{tag}/ckpt"
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    q = (
        _events_stream(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out_dir)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "stream-watermark",
    oracle="""
        WITH on_time AS (
            SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-16'
        ), wm AS (
            SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM on_time
        )
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               count(*) AS n
        FROM on_time
        GROUP BY date_trunc('hour', ts)
        HAVING CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR
               <= (SELECT w FROM wm)
    """,
    doc="Watermark semantics on a staged two-batch replay (late half "
    "arrives after on-time half): append-mode windowed agg drops every "
    "late row (ts < watermark after batch 1) and emits only windows "
    "whose end <= final watermark. Deterministic, so fully oracled — "
    "the SQL reproduces Spark's watermark algebra.",
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from transit_scrape_spark.sources.tables import load_events

    tag = sf_dir.strip("/").replace("/", "_")
    base = f"/tmp/tss_stream_wm_{tag}"
    stage, ckpt, out = f"{base}/stage", f"{base}/ckpt", f"{base}/out"
    split = "2024-01-16"

    def _stage_one(df, name: str) -> None:
        tmp = f"{base}/{name}_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(stage, name))
        shutil.rmtree(tmp)

    def _run_phase() -> None:
        sdf = (
            spark.readStream.schema(load_events(spark, sf_dir).schema)
            .parquet(stage)
        )
        agg = (
            sdf.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
        )
        q = (
            agg.select(F.col("window.start").alias("window_start"), "n")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if not os.path.exists(f"{base}/_DONE"):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        ev = load_events(spark, sf_dir)
        # phase 1: only the on-time (later) half is present
        _stage_one(ev.filter(F.col("ts") >= split), "01_ontime.parquet")
        _run_phase()
        # phase 2: the late (earlier) half arrives after the watermark has
        # already advanced past it -> every late row is dropped, and only
        # on-time windows with end <= final watermark were emitted
        _stage_one(ev.filter(F.col("ts") < split), "02_late.parquet")
        _run_phase()
        open(f"{base}/_DONE", "w").close()

    return spark.read.parquet(out)


@query(
    "stream-dedup",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_unique
        FROM (SELECT DISTINCT event_id FROM events)
    """,
    doc="Streaming dedup per key (reference re-run/drop-existing hazard "
    "push_to_db.py:29-30,91-92): dropDuplicates('event_id') in-stream; "
    "in continuous mode dropDuplicatesWithinWatermark bounds state.",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    dedup = _events_stream(spark, sf_dir).dropDuplicates(["event_id"])
    name = _run_stream_to_memory(dedup, "append")
    return spark.table(name).agg(F.count("*").cast("long").alias("n_unique"))
