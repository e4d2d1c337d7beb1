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
