"""JDBC source/sink (SURVEY.md §2.1 scan-sql / sink-jdbc-batch).

The reference pushes SQL text to Postgres (``app/app.py:52,77``) and
batch-inserts via SQLAlchemy at 64k rows/commit
(``db_helpers.py:148-182``). Spark equivalents, parameterized here:

- read: ``spark.read.jdbc`` with predicate-based partitioning so the
  read itself is distributed (N concurrent connections, one per
  partition range) — the reference reads single-threaded.
- write: ``df.write.option('batchsize', 64000).jdbc`` — the batch size
  is a write option, not a hand-rolled loop.

No JDBC server (or driver jar) exists in this environment, so both
raise a documented error on use; the parquet-native twins are the
tested path (op ``sink-jdbc-batch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH_SIZE = 64000  # reference: push_to_db.py:27-28


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    **options: str,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_batched(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
