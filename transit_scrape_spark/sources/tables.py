"""Parquet fixture tables (the driver's TPC-H-ish star schema).

Replaces the reference's per-file Python loop + SQLAlchemy session
(``/root/reference/src/push_to_db.py:77-106``) with single distributed
scans: one ``spark.read.parquet`` per table; Catalyst handles column
pruning and predicate pushdown into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ensure_nanos_as_long(spark: SparkSession) -> None:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; the legacy flag reads it as a long we convert
    ourselves (runtime-settable, so this also works on a driver-provided
    session)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_nanos_as_long(spark)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as a proper TimestampType (nanos truncated to
    micros — identical to how DuckDB reads the same file)."""
    df = load_events_raw(spark, sf_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
