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
               -- slice BYTES (2 hex chars per byte), not codepoints:
               -- substring(text, 1, 4) would take 4 CHARACTERS and
               -- encode to >4 bytes on multibyte hostile text while the
               -- Spark side slices the binary payload itself
               substring(lower(hex(encode(text))), 1, 8) AS head_hex
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
    "multimodal-frame-sample",
    oracle="""
        WITH meta AS (
            -- hex-level byte addressing (2 hex chars per byte): offsets
            -- are BYTE offsets into the binary payload, which codepoint
            -- substring(text, ...) would misplace on multibyte hostile
            -- text
            SELECT doc_id, octet_length(encode(text)) AS blen,
                   lower(hex(encode(text))) AS hx
            FROM documents
        )
        SELECT doc_id,
               CAST(unnest(generate_series(0, least(blen % 7 + 1, 4) - 1)) AS BIGINT)
                   AS frame_idx,
               substring(hx,
                   1 + CAST(unnest(generate_series(0, least(blen % 7 + 1, 4) - 1))
                       * floor(blen / least(blen % 7 + 1, 4)) AS INT) * 2, 8)
                   AS frame_head_hex
        FROM meta
    """,
    doc="Frame sampling over binary media (the brief's frame-sample op): "
    "up to 4 evenly-spaced 'frames' per payload via sequence+explode of "
    "computed offsets and byte-slices — pure column ops, the real "
    "plumbing for video keyframe extraction (swap the slice for a "
    "decoder call in the mapInPandas stage at production).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(d)
    n_frames = F.least(F.col("media_meta.byte_len") % 7 + 1, F.lit(4))
    stride = F.floor(F.col("media_meta.byte_len") / n_frames)
    ex = with_bin.select(
        "doc_id",
        "payload",
        stride.alias("stride"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
    return ex.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.lower(
            F.hex(
                F.expr("substring(payload, CAST(1 + frame_idx * stride AS INT), 4)")
            )
        ).alias("frame_head_hex"),
    )


@query(
    "grouped-map-zscore",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber,
               round((l_extendedprice - avg(l_extendedprice) OVER w)
                     / stddev_samp(l_extendedprice) OVER w, 6) AS price_z
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag)
    """,
    doc="Grouped-map applyInPandas (the per-group pandas escape hatch, "
    "guide pattern): per-returnflag z-score normalization — each group "
    "arrives as one pandas DataFrame, vectorized numpy inside. Built-in "
    "window aggs express this too (the oracle does); applyInPandas is "
    "for logic that genuinely needs pandas (rank transforms, model "
    "scoring). Groups must fit one executor's memory — the documented "
    "contract of the API.",
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_extendedprice"].mean()
        sd = pdf["l_extendedprice"].std(ddof=1)
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "price_z": ((pdf["l_extendedprice"] - mu) / sd).round(6),
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        zscore,
        schema="l_returnflag string, l_orderkey long, l_linenumber int, price_z double",
    )


@query(
    "multimodal-decode",
    oracle="""
        WITH codes AS (
            -- per-BYTE values recovered from the hex encoding: ascii()
            -- over substring(text, j, 1) would yield CODEPOINTS (and
            -- length(text) counts them), diverging from the kernel's
            -- raw-byte mean on multibyte hostile text
            SELECT doc_id,
                   octet_length(encode(text)) AS blen,
                   lower(hex(encode(text))) AS hx
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(blen AS BIGINT) AS byte_len,
               CAST(blen % 7 + 1 AS BIGINT) AS n_frames,
               -- NULL mean for an empty payload (mean of nothing), the
               -- kernel masks it the same way
               CASE WHEN blen > 0 THEN
                   CAST(list_sum(list_transform(generate_series(1, blen),
                       j -> (strpos('0123456789abcdef',
                                    substring(hx, 2 * j - 1, 1)) - 1) * 16
                            + strpos('0123456789abcdef',
                                     substring(hx, 2 * j, 1)) - 1))
                        AS DOUBLE) / blen
               END AS mean_byte,
               substring(hx, 1, 16) AS head_hex
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


@query(
    "multimodal-dedup-binary",
    oracle="""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM documents
            WHERE doc_id % 5 = 0
        ),
        grouped AS (
            SELECT sha256(text) AS payload_sha256,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(min(doc_id) AS BIGINT) AS survivor_id
            FROM corpus
            GROUP BY sha256(text)
        )
        SELECT payload_sha256, n_copies, survivor_id
        FROM grouped
        WHERE n_copies > 1
    """,
    doc="Binary-content exact dedup over the media payload column (a "
    "fifth of the corpus re-ingested under new ids, the reference's "
    "re-scrape append hazard in binary form): group on sha2(payload) "
    "with a deterministic min-id survivor, emit the duplicate groups. "
    "The image/audio dedup baseline at 100 TB: the shuffle moves "
    "32-byte digests, never payload bytes — identical plan to "
    "dedup-exact-hash because BinaryType columns hash/compare/group "
    "natively (no decode, no UDF); perceptual near-dup (pHash) slots "
    "into the same blocking shape afterward.",
)
def multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doubled = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    )
    with_bin = attach_binary_payload(doubled)
    return (
        with_bin.groupBy(F.sha2(F.col("payload"), 256).alias("payload_sha256"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("survivor_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "multimodal-shard-balance",
    oracle="""
        WITH sharded AS (
            SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
                   CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
            FROM documents
        ),
        per_shard AS (
            SELECT shard,
                   CAST(count(*) AS BIGINT) AS n_payloads,
                   CAST(sum(payload_bytes) AS BIGINT) AS shard_bytes
            FROM sharded GROUP BY shard
        )
        SELECT shard, n_payloads, shard_bytes,
               round(CAST(shard_bytes AS DOUBLE)
                     / (SELECT avg(shard_bytes) FROM per_shard), 4)
                   AS balance_ratio
        FROM per_shard
    """,
    doc="Shard-balance audit for a binary-payload corpus: hash-assign "
    "payloads to 8 shards, measure per-shard bytes against the mean "
    "(balance_ratio ~ 1.0 everywhere = healthy). The pre-flight check "
    "before distributed media preprocessing — a 10x-oversized shard "
    "IS the straggler that idles the other 999 executors, and with "
    "byte-skewed media (a few 4K videos among thumbnails) hash "
    "assignment alone fails: the fix is weighted assignment on "
    "size-sorted greedy bin packing of the MANIFEST (metadata only, "
    "corpus-size-independent) — this audit tells you when that's "
    "needed.",
)
def multimodal_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(d)
    per_shard = with_bin.groupBy(
        (F.col("doc_id") % 8).cast("long").alias("shard")
    ).agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.length("payload")).cast("long").alias("shard_bytes"),
    )
    mean_bytes = per_shard.agg(
        F.avg("shard_bytes").alias("mean_bytes")
    )
    return (
        per_shard.join(F.broadcast(mean_bytes))
        .withColumn(
            "balance_ratio",
            F.round(F.col("shard_bytes").cast("double") / F.col("mean_bytes"), 4),
        )
        .select("shard", "n_payloads", "shard_bytes", "balance_ratio")
    )


@query(
    "multimodal-clip-score-filter",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                   (CAST(('0x' || substring(md5(text), 1, 8))
                         AS BIGINT) % 1000000) / 1000000.0 AS clip_score
            FROM documents
        )
        SELECT doc_id, lang, byte_len, round(clip_score, 6) AS clip_score
        FROM scored
        WHERE clip_score >= 0.75
        ORDER BY clip_score DESC, doc_id
        LIMIT 25
    """,
    doc="CLIP-style image-text alignment filtering, the LAION curation "
    "shape: score every (media payload, caption) pair, threshold at "
    "0.75, keep the top alignment scores. The scoring model is a "
    "STUB — a deterministic uniform derived from md5 of the payload "
    "bytes (this container has no vision libs; the real scorer is a "
    "Pandas-UDF batch over the BinaryType payload exactly like "
    "operators/multimodal.py decode_images) — but everything the "
    "cluster cares about is real: the score is a per-row codegen/"
    "hash projection, the filter prunes BEFORE any downstream "
    "join, the top-k is TakeOrderedAndProject, and the payload "
    "bytes never shuffle. Swapping the stub for a real "
    "mapInPandas model call changes per-batch CPU, not the plan.",
    tags=("multimodal",),
)
def multimodal_clip_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(d)
    score = (
        F.conv(F.substring(F.md5(F.col("payload")), 1, 8), 16, 10).cast(
            "long"
        )
        % 1000000
    ) / 1000000.0
    scored = with_bin.select(
        "doc_id",
        "lang",
        F.col("media_meta.byte_len").cast("long").alias("byte_len"),
        F.round(score, 6).alias("clip_score"),
    )
    return (
        scored.filter(F.col("clip_score") >= 0.75)
        .orderBy(F.col("clip_score").desc(), "doc_id")
        .limit(25)
    )


@query(
    "multimodal-tile-grid",
    oracle="""
        WITH meta AS (
            SELECT doc_id,
                   CAST(doc_id % 640 + 1 AS BIGINT) AS w,
                   CAST(doc_id % 480 + 1 AS BIGINT) AS h
            FROM documents
        ),
        tx AS (
            SELECT doc_id, w, h,
                   unnest(generate_series(
                       0, CAST(ceil(w / 128.0) AS BIGINT) - 1)) AS tile_x
            FROM meta
        ),
        txy AS (
            SELECT doc_id, w, h, tile_x,
                   unnest(generate_series(
                       0, CAST(ceil(h / 128.0) AS BIGINT) - 1)) AS tile_y
            FROM tx
        )
        SELECT doc_id, CAST(tile_x AS BIGINT) AS tile_x,
               CAST(tile_y AS BIGINT) AS tile_y,
               CAST(tile_x * 128 AS BIGINT) AS x0,
               CAST(tile_y * 128 AS BIGINT) AS y0,
               CAST(least(128, w - tile_x * 128) AS BIGINT) AS tile_w,
               CAST(least(128, h - tile_y * 128) AS BIGINT) AS tile_h
        FROM txy
    """,
    doc="Vision-preprocessing tile plan: explode each image's "
    "(width, height) metadata (multimodal-cols' typed struct) into a "
    "128x128 tile grid with edge clipping — the shard plan a "
    "distributed image decoder consumes so each task crops ONE tile "
    "instead of materializing whole images (the patching pass ViT-"
    "style training data needs). Pure sequence+explode codegen, "
    "linear in image count, no shuffle; at 100 TB the plan rows "
    "partition by doc_id alongside the binary payloads so the "
    "crop stage is a co-partitioned zip, never a wide join.",
    tags=("multimodal",),
)
def multimodal_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    meta = d.select(
        "doc_id",
        (F.col("doc_id") % 640 + 1).alias("w"),
        (F.col("doc_id") % 480 + 1).alias("h"),
    )
    n_tx = F.ceil(F.col("w") / 128.0) - 1
    n_ty = F.ceil(F.col("h") / 128.0) - 1
    txy = meta.select(
        "doc_id",
        "w",
        "h",
        F.explode(F.sequence(F.lit(0).cast("long"), n_tx)).alias("tile_x"),
    ).select(
        "doc_id",
        "w",
        "h",
        "tile_x",
        F.explode(F.sequence(F.lit(0).cast("long"), n_ty)).alias("tile_y"),
    )
    return txy.select(
        "doc_id",
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        (F.col("tile_x") * 128).cast("long").alias("x0"),
        (F.col("tile_y") * 128).cast("long").alias("y0"),
        F.least(F.lit(128), F.col("w") - F.col("tile_x") * 128)
        .cast("long")
        .alias("tile_w"),
        F.least(F.lit(128), F.col("h") - F.col("tile_y") * 128)
        .cast("long")
        .alias("tile_h"),
    )


@query(
    "multimodal-audio-framing",
    oracle="""
        WITH meta AS (
            SELECT doc_id,
                   CAST(doc_id % 32000 + 16000 AS BIGINT) AS n_samples
            FROM documents
        ),
        frames AS (
            SELECT doc_id, n_samples,
                   unnest(generate_series(
                       0, (n_samples - 4000) // 1600)) AS frame_idx
            FROM meta
        )
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(frame_idx * 1600 AS BIGINT) AS start_sample,
               CAST(frame_idx * 1600 + 4000 AS BIGINT) AS end_sample,
               CAST((n_samples - 4000) // 1600 + 1 AS BIGINT) AS n_frames
        FROM frames
    """,
    doc="Audio frame plan: explode each clip's sample-count metadata "
    "(synthetic 16k-48k samples, the multimodal-cols metadata "
    "pattern) into overlapping analysis frames (window 4000, hop "
    "1600 — the 25ms/10ms STFT framing scaled up), emitting "
    "(start, end) sample offsets per frame so a distributed "
    "feature extractor (mapInPandas over the binary payload, as "
    "multimodal-decode stubs) slices ONE frame per row without "
    "materializing whole clips. The audio sibling of "
    "multimodal-tile-grid's image tiling: sequence+explode "
    "codegen, linear in clip count, shuffle-free, co-partitioned "
    "with the payload at scale.",
    tags=("multimodal",),
)
def multimodal_audio_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    meta = d.select(
        "doc_id",
        (F.col("doc_id") % 32000 + 16000).cast("long").alias("n_samples"),
    )
    last = F.floor((F.col("n_samples") - 4000) / 1600)
    frames = meta.select(
        "doc_id",
        "n_samples",
        F.explode(F.sequence(F.lit(0).cast("long"), last)).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * 1600).cast("long").alias("start_sample"),
        (F.col("frame_idx") * 1600 + 4000).cast("long").alias("end_sample"),
        (F.floor((F.col("n_samples") - 4000) / 1600) + 1)
        .cast("long")
        .alias("n_frames"),
    )


@query(
    "multimodal-aspect-bucket",
    oracle="""
        WITH meta AS (
            SELECT doc_id,
                   CAST(doc_id % 640 + 1 AS DOUBLE) AS w,
                   CAST(doc_id % 480 + 1 AS DOUBLE) AS h
            FROM documents
        ),
        assigned AS (
            SELECT doc_id, w, h,
                   CASE WHEN w / h < 0.625 THEN 0.5
                        WHEN w / h < 0.875 THEN 0.75
                        WHEN w / h < 1.165 THEN 1.0
                        WHEN w / h < 1.665 THEN 1.33
                        ELSE 2.0 END AS bucket_ar
            FROM meta
        )
        SELECT bucket_ar,
               CAST(count(*) AS BIGINT) AS n_images,
               round(avg(w / h), 6) AS mean_ar,
               round(avg(1 - least(w / h, bucket_ar)
                             / greatest(w / h, bucket_ar)), 6)
                   AS mean_crop_waste
        FROM assigned GROUP BY bucket_ar ORDER BY bucket_ar
    """,
    doc="Aspect-ratio bucketing for batched multimodal training (the "
    "SDXL/NaViT trick): assign each image's metadata aspect ratio to "
    "the nearest rung of a fixed AR ladder (0.5, 0.75, 1.0, 1.33, "
    "2.0 — boundaries at rung midpoints) so batches can be formed "
    "per bucket with minimal crop/pad waste, reported here as "
    "1 - min(ar, bucket)/max(ar, bucket) per bucket. Square-resizing "
    "everything (the naive loader) destroys composition for the "
    "~60%% of images far from 1:1; bucketing is the standard fix, "
    "and its cost in-engine is nil — metadata-only codegen CASE plus "
    "one 5-row groupBy, the binary payload column is never touched "
    "(column pruning keeps it out of the scan).",
    tags=("multimodal",),
)
def multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = attach_binary_payload(d).select(
        "doc_id",
        F.col("media_meta.width").cast("double").alias("w"),
        F.col("media_meta.height").cast("double").alias("h"),
    )
    ar = F.col("w") / F.col("h")
    bucket = (
        F.when(ar < 0.625, 0.5)
        .when(ar < 0.875, 0.75)
        .when(ar < 1.165, 1.0)
        .when(ar < 1.665, 1.33)
        .otherwise(2.0)
    )
    assigned = m.select("w", "h", bucket.alias("bucket_ar"))
    waste = 1 - F.least(ar, F.col("bucket_ar")) / F.greatest(
        ar, F.col("bucket_ar")
    )
    return (
        assigned.groupBy("bucket_ar")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.round(F.avg(ar), 6).alias("mean_ar"),
            F.round(F.avg(waste), 6).alias("mean_crop_waste"),
        )
        .orderBy("bucket_ar")
    )
