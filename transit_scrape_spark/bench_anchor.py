"""Frozen bench calibration anchor (VERDICT r8 ask 1).

Two consecutive rounds produced phantom cross-round "regressions" from
shared-box speed drift (r4: BENCH_REGRESSION_r4.md; r8: a 35% sweep
inflation adjudicated as box degradation — byte-identical code, fresh
rerun reproduced the slow numbers). The anchor separates box speed from
code speed: a PINNED workload — deterministic parquet fixture + scan +
filter + hash-agg + sort + noop write — that NEVER changes across
rounds, timed at the start of every bench run.

    box_factor = anchor_sec / ANCHOR_BASELINE_SEC

box_factor ~1.0 means the box runs at the speed it had when the
baseline was frozen; 1.35 means everything measured today is ~35%
inflated by the environment and per-op numbers should be divided by it
before cross-round comparison. The anchor exercises the sweep's
dominant cost classes (parquet scan, codegen expressions, hash-agg
shuffle, range-partitioned sort) but NO operator code, so repo changes
cannot move it.

FREEZE CONTRACT: ``ANCHOR_ROWS``, ``ANCHOR_VERSION``, the fixture
schema, and the timed workload below must never change. If a change is
ever unavoidable, bump ``ANCHOR_VERSION`` AND re-freeze
``ANCHOR_BASELINE_SEC`` in the same commit, and document the re-freeze
in SCALING.md — cross-version box_factors are not comparable.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ANCHOR_ROWS = 16_000_000
ANCHOR_VERSION = 1
# Frozen 2026-08-15 (round 9 open) on the shared 32-core box: median of
# four fresh-process measurements (0.7124 / 0.737 / 0.731 / 0.8359),
# each a get_spark() session running 2 warm-ups + min of 5 timed runs.
# See SCALING.md "Bench calibration anchor" for the freeze record.
ANCHOR_BASELINE_SEC = 0.734


def fixture_path() -> str:
    return f"/tmp/tss_anchor_v{ANCHOR_VERSION}.parquet"


def ensure_fixture(spark: SparkSession) -> str:
    """Write the deterministic anchor fixture if absent (16 files,
    ~60 MB). Every column is a pure function of ``id`` so the bytes are
    identical across boxes and rounds; /tmp residency means fixture
    write cost is paid once per box boot, never inside the timed loop."""
    path = fixture_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            spark.range(0, ANCHOR_ROWS, 1, 16)
            .select(
                F.col("id"),
                (F.col("id") % 1009).cast("int").alias("k1"),
                F.substring(F.md5(F.col("id").cast("string")), 1, 12).alias("tag"),
                (((F.col("id") * 2654435761) % 1000000000) / 1e6).alias("v"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def _workload(spark: SparkSession, path: str) -> None:
    (
        spark.read.parquet(path)
        .filter(F.col("v") < 700.0)
        .groupBy("k1")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("v"), 3).alias("sv"),
            F.avg(F.length("tag")).alias("al"),
            F.max("id").alias("mx"),
        )
        .orderBy("k1")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def run_anchor(spark: SparkSession, reps: int = 5) -> dict:
    """Time the pinned workload: 1 warm-up + MIN of ``reps``. Min, not
    median: timing noise on a shared box is strictly additive
    (scheduling, GC, page-cache misses), so the minimum is the
    lowest-variance estimator of the box's attainable speed — and a
    systematically degraded box raises the floor too, which is exactly
    the signal box_factor exists to carry (r8's 35% inflation was
    uniform across runs, not a tail effect).
    Returns the anchor block merged into every bench summary.

    Precision note (measured at the r9 freeze, 3×12-run profiles):
    fresh-process mins under this protocol spread ±10% — that is the
    box's intrinsic timing floor, shared by every per-op measurement
    the factor normalizes. box_factor moves of <0.15 are noise; the
    r8-style uniform 1.35× drift this exists to catch is ~3σ out."""
    path = ensure_fixture(spark)
    _workload(spark, path)  # warm-ups, not timed: first-run plan/codegen
    _workload(spark, path)  # compile dominates run 1 and still bleeds into run 2
    runs: list[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _workload(spark, path)
        runs.append(time.perf_counter() - t0)
    best = min(runs)
    return {
        "anchor_sec": round(best, 4),
        "anchor_baseline_sec": ANCHOR_BASELINE_SEC,
        "anchor_version": ANCHOR_VERSION,
        "box_factor": round(best / ANCHOR_BASELINE_SEC, 4),
        "anchor_runs": [round(r, 4) for r in runs],
    }
