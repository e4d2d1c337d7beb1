"""Multimodal column queries (SURVEY.md §2.12): binary payload columns
with typed metadata, and an Arrow-batched mapInPandas decode stage.

The decode stage uses the deterministic fake documented in
operators/multimodal.py (codec libs absent in this container), which
keeps even the mapInPandas plumbing fully oracle-checkable: every
output feature is a pure function of the payload bytes that DuckDB can
recompute from the source text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.operators.multimodal import (
    attach_binary_payload,
    decode_images,
)
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


@query(
    "multimodal-cols",
    oracle="""
        SELECT doc_id,
               'fake/utf8' AS format,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST(doc_id % 640 + 1 AS BIGINT) AS width,
               CAST(doc_id % 480 + 1 AS BIGINT) AS height,
               lower(hex(encode(substring(text, 1, 4)))) AS head_hex
        FROM documents
    """,
    doc="Binary media columns with typed metadata struct: BinaryType "
    "payload + struct<format,byte_len,width,height> — parquet-native, "
    "splittable, no driver involvement.",
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(d)
    return with_bin.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.byte_len").cast("long").alias("byte_len"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("head_hex"),
    )


@query(
    "multimodal-decode",
    oracle="""
        WITH codes AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS blen,
                   list_transform(generate_series(1, length(text)),
                                  j -> ascii(substring(text, j, 1))) AS byte_vals,
                   lower(hex(encode(substring(text, 1, 8)))) AS head_hex
            FROM documents
        )
        SELECT doc_id,
               CAST(blen AS BIGINT) AS byte_len,
               CAST(blen % 7 + 1 AS BIGINT) AS n_frames,
               CAST(list_sum(byte_vals) AS DOUBLE) / blen AS mean_byte,
               head_hex
        FROM codes
    """,
    doc="Arrow-batched mapInPandas decode over the binary column "
    "(deterministic fake standing in for PIL/ffmpeg — real path gated "
    "behind import-try, operators/multimodal.py). Exercises the "
    "production batch shape: iterator of pandas DataFrames per "
    "partition, schema-declared output, zero driver collection.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return decode_images(attach_binary_payload(d))
