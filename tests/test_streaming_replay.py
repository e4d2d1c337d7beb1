"""Staged-file streaming replay (SURVEY §5 point 4): a file sequence
arriving across multiple availableNow runs produces exactly-once counts
equal to the batch aggregate — the checkpoint, not drop_existing flags,
carries idempotency."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def test_staged_files_exactly_once(spark, sf_dir, tmp_path):
    from transit_scrape_spark.sources.tables import load_events

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)

    ev = load_events(spark, sf_dir)
    batch_total = ev.count()
    thirds = ["2024-01-11", "2024-01-21"]
    parts = [
        ev.filter(F.col("ts") < thirds[0]),
        ev.filter((F.col("ts") >= thirds[0]) & (F.col("ts") < thirds[1])),
        ev.filter(F.col("ts") >= thirds[1]),
    ]

    def stage_file(df, name):
        tmp = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(stage, name))

    def run_once():
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(stage)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # files arrive one per run; a re-run with no new file adds nothing
    stage_file(parts[0], "01.parquet")
    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # replay with zero new data -> exactly-once holds
    assert spark.read.parquet(out).count() == n1

    stage_file(parts[1], "02.parquet")
    stage_file(parts[2], "03.parquet")
    run_once()
    assert spark.read.parquet(out).count() == batch_total

    # counts per type equal the batch aggregate exactly
    got = {
        (r["event_type"]): r["n"]
        for r in spark.read.parquet(out).groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    want = {
        (r["event_type"]): r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
