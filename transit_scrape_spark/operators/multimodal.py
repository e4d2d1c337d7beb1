"""Multimodal column operators (SURVEY.md §2.12 multimodal-cols).

Design: image/audio/video payloads are opaque ``BinaryType`` columns
with a typed metadata struct alongside (format, width, height,
n_frames, sample_rate ...). Heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched ``mapInPandas``
over the binary column — executors stream batches, nothing is
collected to the driver, and the batch shape (pandas DataFrame per
Arrow batch) is the real production plumbing.

The actual codec calls need PIL/ffmpeg/torchaudio, which are NOT in
this environment — they are gated behind import-try and replaced by a
deterministic fake (documented below) so the Spark-side contract
(schema, partitioning, UDF signature, batch iteration) is fully real
and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len long, n_frames long, mean_byte double, head_hex string"
)


def _real_decode_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary payload -> decoded features.

    Real path (requires PIL, not in this container): Image.open over
    io.BytesIO, extract size/mode/pixel stats. Fake path (deterministic,
    always available): features derived from the raw bytes —
    n_frames = byte_len % 7 + 1, mean_byte = sum(bytes)/len,
    head_hex = first 8 bytes hex — so the full pipeline stays testable
    and oracle-comparable.
    """
    use_real = _real_decode_available()
    for pdf in it:
        payloads = pdf["payload"]
        if use_real:  # pragma: no cover - codec libs absent in this env
            raise NotImplementedError(
                "real image decode path: PIL present but intentionally "
                "unimplemented in v1 — swap in Image.open(BytesIO(b)) here"
            )
        # NULL payloads (failed fetch/decode upstream) are dropped, not
        # a worker crash — pandas would smuggle NaN (not SQL NULL) into
        # the float feature columns otherwise
        keep = payloads.notnull()
        pdf, payloads = pdf[keep], payloads[keep]
        blens = payloads.map(lambda b: len(b) if b is not None else None)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": blens,
                "n_frames": blens % 7 + 1,
                # NULL (not 0.0) for an empty hostile payload: the mean
                # of nothing is undefined, and 0.0 would silently read as
                # "all zero bytes" downstream
                "mean_byte": payloads.map(
                    lambda b: (sum(b) / len(b) if len(b) else None)
                    if b is not None
                    else None
                ),
                "head_hex": payloads.map(
                    lambda b: bytes(b[:8]).hex() if b is not None else None
                ),
            }
        )


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate binary media ingestion: utf-8 payload + metadata struct.

    In production this column comes straight from parquet/a blob store
    manifest; everything downstream (decode, stats) is identical.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.length(payload).alias("byte_len"),
            (F.col("doc_id") % 640 + 1).cast("long").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("long").alias("height"),
        ),
    )


def decode_images(df: DataFrame) -> DataFrame:
    """Distributed decode over the binary column (mapInPandas)."""
    return df.select("doc_id", "payload").mapInPandas(
        decode_image_batches, schema=DECODED_SCHEMA
    )
