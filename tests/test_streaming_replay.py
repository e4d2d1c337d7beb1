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


def test_checkpoint_restart_exactly_once_soak(spark, tmp_path):
    """Soak: sf0.1 events (~100k rows) streamed across TWO separate
    availableNow queries sharing one checkpoint — a mid-stream restart.
    Phase 2 re-delivers every phase-1 row (a new file with duplicate
    event_ids, the reference's re-scrape hazard, push_to_db.py:91-92):
    exactly-once requires the dedup state recovered from the checkpoint
    to suppress all of them. Final parquet output must equal batch
    DISTINCT on event_id."""
    from transit_scrape_spark.sources.tables import load_events

    sf_dir = "/root/testdata/sf0.1"
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)

    ev = load_events(spark, sf_dir)
    n_distinct = ev.select("event_id").distinct().count()
    half = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    p1 = ev.filter(F.col("event_id") <= half)
    p2 = ev.filter(F.col("event_id") > half)

    def stage_file(df, name):
        tmp = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(stage, name))

    def run_query():
        """A fresh streaming query object each call — state comes ONLY
        from the shared checkpoint, exactly like a crashed-and-restarted
        job."""
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)  # force multi-batch runs
            .parquet(stage)
            .dropDuplicates(["event_id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stage_file(p1, "01.parquet")
    run_query()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 == p1.count()

    # mid-stream restart: new files = ALL phase-1 rows again + phase 2
    stage_file(p1, "02_redelivered.parquet")
    stage_file(p2, "03.parquet")
    run_query()

    got = spark.read.parquet(out)
    assert got.count() == n_distinct, (
        f"restart broke exactly-once: {got.count()} rows vs {n_distinct} distinct"
    )
    assert got.select("event_id").distinct().count() == n_distinct


def test_checkpoint_restart_tumbling_agg(spark, tmp_path):
    """Tumbling-window agg (append mode + watermark) across a
    checkpoint restart: windows finalized in phase 1 must not re-emit
    after the restart, and the union of all emitted windows equals the
    batch per-hour aggregate. A far-future sentinel event pushes the
    watermark past every real window so append mode flushes them all."""
    from transit_scrape_spark.sources.tables import load_events

    sf_dir = "/root/testdata/sf0.1"
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)

    ev = load_events(spark, sf_dir)
    row = ev.select(
        F.expr("percentile(cast(ts as double), 0.5)").alias("mid"),
        F.max(F.col("ts").cast("double")).alias("mx"),
    ).collect()[0]
    mid_expr = F.timestamp_seconds(F.lit(row["mid"]))
    p1 = ev.filter(F.col("ts") <= mid_expr)
    p2 = ev.filter(F.col("ts") > mid_expr)
    sentinel = spark.createDataFrame(
        [(10**9, None, 0, "sentinel", 0.0, "{}")], ev.schema
    ).withColumn("ts", F.timestamp_seconds(F.lit(row["mx"] + 7200.0)))

    def stage_file(df, name):
        tmp = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(stage, name))

    def run_query():
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stage_file(p1, "01.parquet")
    run_query()
    stage_file(p2, "02.parquet")
    stage_file(sentinel, "03_sentinel.parquet")
    run_query()

    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
        if r["event_type"] != "sentinel"
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    assert got == want, (
        f"windows diverge after restart: {len(got)} emitted vs {len(want)} batch; "
        f"first diffs: {list(set(got.items()) ^ set(want.items()))[:5]}"
    )


def test_audit_sink_hook(spark, sf_dir):
    """The plan-audit hook (queries/streaming.AUDIT_SINK): dormant by
    default, and when armed it records each streaming query's live
    physical plan + progress — the capture tools/audit_plans.py's
    streaming checks are built on (VERDICT r7 task 1)."""
    from transit_scrape_spark.queries import streaming as sm
    from transit_scrape_spark.queries.registry import registry

    assert sm.AUDIT_SINK is None  # zero-overhead default
    sm.AUDIT_SINK = sink = []
    try:
        registry()["stream-file-source"].fn(spark, sf_dir).collect()
    finally:
        sm.AUDIT_SINK = None
    assert len(sink) == 1
    rec = sink[0]
    plan = rec["plan"].split("== Physical Plan ==")[-1]
    assert "StateStoreSave" in plan  # the live streaming plan, not the batch tail
    assert rec["progress"], "recentProgress must be captured"
    ops = rec["progress"][-1].get("stateOperators") or []
    assert sum(int(s.get("numRowsTotal", 0)) for s in ops) > 0
