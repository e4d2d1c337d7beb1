"""SparkSession factory.

One place to configure the engine for both local testing (local[N]) and a
real cluster. Every knob here is scale-motivated:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast demotion/promotion based on observed sizes).
- shuffle partitions sized to the parallelism actually available locally;
  on a 1000-executor cluster this would be set to ~2-3x total cores (AQE
  coalesces down, it can't split a too-coarse shuffle cheaply).
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  any other engine reading the same parquet.
- Arrow enabled for the few pandas_udf paths (vectorized, not per-row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "transit-scrape-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture events.parquet stores TIMESTAMP(NANOS); read as long and
        # convert (sources.tables truncates to micros, matching SQL engines)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
