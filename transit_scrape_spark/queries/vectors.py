"""Similarity search over embeddings (SURVEY.md §2.12 simsearch-topk;
north-star ANN surface).

Plans are written for the 100 TB shape: the query vector is a scalar
subquery/broadcast (never a shuffle), top-k goes through
TakeOrderedAndProject (partition-local heaps + single merge — the
REPOSE/distributed-top-k pattern from PAPERS.md), and the LSH-bucketed
variant prunes candidates before exact scoring.

DuckDB oracle parity: both engines cast float32 -> double first
(exact widening), compute the same fold, and round similarity to 6
decimals to absorb summation-order last-bit drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.functions.vectors import as_double, cosine, dot, norm
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.session import cache_width
from transit_scrape_spark.sources.tables import load_table

_QUERY_VEC_SQL = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 1)"


@query(
    "simsearch-topk",
    oracle=f"""
        SELECT vec_id, label,
               round(list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))), 6) AS sim
        FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id <> 1
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """,
    doc="Brute-force cosine top-k against one query vector: broadcast "
    "scalar query vector, zip_with+aggregate dot product, "
    "TakeOrderedAndProject top-k (no global sort).",
)
def simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    qvec = emb.filter(F.col("vec_id") == 1).select(
        as_double(F.col("embedding")).alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != 1)
        .join(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine(as_double(F.col("embedding")), F.col("qv")), 6).alias("sim"),
        )
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(10)


@query(
    "simsearch-knn-join",
    oracle="""
        WITH scored AS (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))), 6) AS sim
            FROM embeddings e
            CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id <= 5) q
            WHERE e.vec_id <> q.vec_id
        )
        SELECT q_id, vec_id, sim
        FROM (
            SELECT q_id, vec_id, sim,
                   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    doc="k-NN join: 5 query vectors x corpus, top-3 each — broadcast the "
    "query side (tiny), score codegen-side, windowed top-k per query "
    "with WindowGroupLimit keeping state bounded. The all-pairs version "
    "partitions the corpus and broadcasts query blocks (block-nested "
    "loop), never shuffling the big side.",
)
def simsearch_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") <= 5).select(
        F.col("vec_id").alias("q_id"), as_double(F.col("embedding")).alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(as_double(F.col("embedding")), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id", "sim")
    )


@query(
    "embed-norms",
    oracle="""
        SELECT label,
               count(*) AS n_vecs,
               round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))), 6) AS avg_norm,
               round(min(list_min(CAST(embedding AS DOUBLE[]))), 6) AS min_component,
               round(max(list_max(CAST(embedding AS DOUBLE[]))), 6) AS max_component
        FROM embeddings WHERE embedding IS NOT NULL
        GROUP BY label
    """,
    doc="Per-label embedding stats (norms, component bounds) — vector "
    "exprs feeding an ordinary grouped agg.",
)
def embed_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    v = as_double(F.col("embedding"))
    return (
        emb.select(
            "label",
            norm(v).alias("nrm"),
            F.array_min(v).alias("mn"),
            F.array_max(v).alias("mx"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("mn"), 6).alias("min_component"),
            F.round(F.max("mx"), 6).alias("max_component"),
        )
    )


@query(
    "simsearch-range",
    oracle=f"""
        SELECT vec_id, label,
               round(list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))), 6) AS sim
        FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id <> 1
          AND list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
              / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                 * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))) >= 0.3
    """,
    doc="Range similarity search (the threshold dual of top-k): every "
    "vector with cosine >= 0.3 of the query. Same broadcast-query / "
    "codegen-score shape as simsearch-topk but the selection is a "
    "FILTER, not a heap — no ordering state at all, fully parallel, "
    "and the natural form for near-duplicate blocking at 100 TB "
    "(emit-all-above-threshold, then group).",
)
def simsearch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    qvec = emb.filter(F.col("vec_id") == 1).select(
        as_double(F.col("embedding")).alias("qv")
    )
    cs = cosine(as_double(F.col("embedding")), F.col("qv"))
    return (
        emb.filter(F.col("vec_id") != 1)
        .join(F.broadcast(qvec))
        .filter(cs >= 0.3)
        .select("vec_id", "label", F.round(cs, 6).alias("sim"))
    )


@query(
    "embed-centroid",
    oracle="""
        WITH dims AS (
            SELECT label,
                   generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        ), per_dim AS (
            SELECT label, dim, avg(val) AS mean_val, count(*) AS n
            FROM dims
            GROUP BY label, dim
        )
        SELECT label,
               CAST(max(n) AS BIGINT) AS n_vecs,
               CAST(count(*) AS BIGINT) AS dim,
               round(sqrt(sum(mean_val * mean_val)), 6) AS centroid_norm
        FROM per_dim
        GROUP BY label
    """,
    doc="Per-label embedding centroid (the k-means update step / class "
    "prototype builder) with NO UDF: posexplode to (label, dim, value) "
    "rows, per-dim mean, then reassembled into the centroid norm. The "
    "explode is a row x dim blowup but the mean partial-aggregates "
    "map-side, so only |labels| x dim rows shuffle — the standard "
    "scalable dense-vector aggregation (mirrors Spark MLlib's own "
    "summarizer shape).",
)
def embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("dim0", "val")
    )
    per_dim = dims.groupBy("label", "dim0").agg(
        F.avg("val").alias("mean_val"), F.count("*").alias("n")
    )
    return per_dim.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.count("*").cast("long").alias("dim"),
        F.round(F.sqrt(F.sum(F.col("mean_val") * F.col("mean_val"))), 6).alias(
            "centroid_norm"
        ),
    )


@query(
    "embed-normalize-arrow",
    oracle="""
        SELECT vec_id,
               round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))), 6) AS nrm,
               round(CAST(embedding[1] AS DOUBLE)
                     / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))), 6)
                   AS first_unit
        FROM embeddings WHERE embedding IS NOT NULL
    """,
    doc="mapInArrow batch kernel (SURVEY §2.11 API family, the third "
    "Python-batch surface besides pandas_udf and applyInPandas): "
    "embeddings L2-normalized with zero-copy Arrow -> numpy reshape "
    "(flatten the list column, reshape to (rows, dim) — no per-row "
    "Python objects, unlike to_pylist). The built-in expression form "
    "exists (embed-norms); this op exists to pin the Arrow-batch "
    "plumbing: schema, batch shape, float64 widening BEFORE the "
    "kernel so numpy and the SQL oracle agree bit-for-bit.",
)
def embed_normalize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for b in batches:
            vec_ids = b.column("v_id")
            flat = b.column("emb").flatten().to_numpy(zero_copy_only=False)
            arr = flat.reshape(len(b), -1)  # constant-dim embeddings
            nrm = np.sqrt((arr * arr).sum(axis=1))
            # zero-norm hostile vectors: 0/0 is numpy NaN, which is NOT
            # SQL NULL — mask it to a real NULL (= DuckDB's x/0)
            with np.errstate(divide="ignore", invalid="ignore"):
                first_unit = np.round(arr[:, 0] / nrm, 6)
            yield pa.RecordBatch.from_arrays(
                [
                    vec_ids,
                    pa.array(np.round(nrm, 6), type=pa.float64()),
                    pa.array(first_unit, type=pa.float64(), mask=(nrm == 0.0)),
                ],
                ["vec_id", "nrm", "first_unit"],
            )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("v_id"),
        as_double(F.col("embedding")).alias("emb"),  # widen pre-kernel
    )
    return emb.mapInArrow(kernel, "vec_id long, nrm double, first_unit double")


@query(
    "embed-quantize-int8",
    oracle="""
        WITH flat AS (
            SELECT vec_id, g.i AS dim,
                   CAST(embedding[g.i] AS DOUBLE) AS x
            FROM embeddings,
                 UNNEST(generate_series(1, len(embedding))) AS g(i)
        ),
        stats AS (
            SELECT dim, min(x) AS lo, max(x) AS hi FROM flat GROUP BY dim
        ),
        coded AS (
            SELECT f.vec_id, f.dim, f.x, s.lo, s.hi,
                   CAST(floor((f.x - s.lo) / (s.hi - s.lo) * 254.0) - 127
                        AS BIGINT) AS code
            FROM flat f JOIN stats s ON f.dim = s.dim
        )
        SELECT vec_id,
               CAST(sum(code * dim) AS BIGINT) AS code_checksum,
               bool_and(
                   abs((CAST(code + 127 AS DOUBLE) / 254.0) * (hi - lo) + lo - x)
                   <= (hi - lo) / 254.0 + 1e-9
               ) AS recon_within_step
        FROM coded
        GROUP BY vec_id
    """,
    doc="Scalar int8 quantization of the embedding column — the "
    "storage/bandwidth move for 100 TB vector stores (4 bytes -> 1 "
    "per dim before IVF/LSH probing): per-dimension min/max from ONE "
    "aggregate over the exploded corpus, codes = floor-scaled offsets "
    "(floor, not round: float round-half rules differ across engines), "
    "and the oracle contract checks the code checksum exactly plus "
    "per-vector reconstruction error <= one quantization step. "
    "Explode/agg/join stays whole-stage codegen; the 64-row dim-stats "
    "table broadcasts.",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.vectors import as_double

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    flat = e.select(
        "vec_id", F.posexplode("v").alias("dim0", "x")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "x")
    stats = flat.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    coded = flat.join(F.broadcast(stats), "dim").withColumn(
        "code",
        (
            F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 254.0)
            - 127
        ).cast("long"),
    )
    recon = (F.col("code") + 127).cast("double") / 254.0 * (
        F.col("hi") - F.col("lo")
    ) + F.col("lo")
    return coded.groupBy("vec_id").agg(
        F.sum(F.col("code") * F.col("dim")).cast("long").alias("code_checksum"),
        F.bool_and(
            F.abs(recon - F.col("x"))
            <= (F.col("hi") - F.col("lo")) / 254.0 + 1e-9
        ).alias("recon_within_step"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory story for ANN at 100 TB: 64 float32
# dims (256 B) compress to M=4 sub-space codebook ids (4 B) and queries scan
# CODES against a tiny per-query lookup table (ADC), never the raw vectors.
# Codebooks here are deterministic (the first K=8 vectors' sub-vectors) so
# both engines derive bit-identical centroids; a production build would
# k-means them offline — the query-time plan is identical.
# ---------------------------------------------------------------------------

_PQ_M, _PQ_D, _PQ_K = 4, 16, 8

# Shared CTE block: sub-vector explode, codebook, per-(vector, sub-space)
# nearest-centroid assignment. Both engines fold (x-y)^2 sequentially over
# doubles, so dist2 agrees to the last bit and the (dist2, centroid_id)
# argmin is deterministic.
_PQ_SQL_CTES = f"""
        e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        sub AS (
            SELECT vec_id, label, m,
                   list_slice(v, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D}) AS sv
            FROM e, (SELECT unnest(range(0, {_PQ_M})) AS m)
        ),
        cb AS (
            SELECT vec_id AS centroid_id, m, sv AS cv
            FROM sub WHERE vec_id < {_PQ_K}
        ),
        scored AS (
            SELECT s.vec_id, s.label, s.m, c.centroid_id,
                   list_sum(list_transform(list_zip(s.sv, c.cv),
                            x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist2
            FROM sub s JOIN cb c ON s.m = c.m
        ),
        assigned AS (
            SELECT vec_id, label, m, centroid_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                               ORDER BY dist2, centroid_id) AS rn
                  FROM scored)
            WHERE rn = 1
        )
"""


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    v = as_double(F.col("embedding"))
    parts = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(v, m * _PQ_D + 1, _PQ_D).alias("sv"),
            )
            for m in range(_PQ_M)
        ]
    )
    return emb.select("vec_id", "label", F.explode(parts).alias("p")).select(
        "vec_id", "label", F.col("p.m").alias("m"), F.col("p.sv").alias("sv")
    )


def _pq_assignments(spark: SparkSession, sf_dir: str, subs=None) -> DataFrame:
    """(vec_id, label, m, centroid_id): nearest codebook entry per sub-space.

    The codebook is tiny (M*K rows) -> broadcast; the argmin is a
    per-(vec, m) window over K=8 candidates, partitioned on the vector
    id, so no skew and no global sort anywhere. Pass a (persisted)
    ``subs`` to share the sub-vector explode with other branches of the
    same op instead of re-planning it.
    """
    from pyspark.sql import Window

    if subs is None:
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        )
        subs = _pq_subvectors(emb)
    cb = subs.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("centroid_id"), "m", F.col("sv").alias("cv")
    )
    scored = subs.join(F.broadcast(cb), "m").withColumn(
        "dist2", _sq_l2(F.col("sv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy("dist2", "centroid_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "m", "centroid_id")
    )


@query(
    "embed-pq-codes",
    oracle=f"""
        WITH {_PQ_SQL_CTES}
        SELECT vec_id,
               CAST(max(CASE WHEN m = 0 THEN centroid_id END) AS BIGINT) AS code_0,
               CAST(max(CASE WHEN m = 1 THEN centroid_id END) AS BIGINT) AS code_1,
               CAST(max(CASE WHEN m = 2 THEN centroid_id END) AS BIGINT) AS code_2,
               CAST(max(CASE WHEN m = 3 THEN centroid_id END) AS BIGINT) AS code_3
        FROM assigned
        GROUP BY vec_id
    """,
    doc="Product-quantization encoding: split 64-dim vectors into 4 "
    "sub-spaces, assign each sub-vector to its nearest of 8 codebook "
    "centroids (squared-L2 argmin via a per-vector window over the "
    "broadcast codebook), emit 4 small integer codes per vector — a "
    "64x storage compression. At 100 TB this is the encode pass of an "
    "IVF-PQ index build: one broadcast join + one narrow window, "
    "linear in corpus size, no all-pairs anything.",
)
def embed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _pq_assignments(spark, sf_dir)
    return assigned.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("centroid_id")))
            .cast("long")
            .alias(f"code_{m}")
            for m in range(_PQ_M)
        ]
    )


@query(
    "simsearch-pq-adc",
    oracle=f"""
        WITH {_PQ_SQL_CTES},
        lut AS (
            SELECT c.m, c.centroid_id,
                   list_sum(list_transform(list_zip(c.cv, q.sv),
                            x -> (x[1] - x[2]) * (x[1] - x[2]))) AS qdist2
            FROM cb c JOIN (SELECT m, sv FROM sub WHERE vec_id = 1) q
              ON c.m = q.m
        )
        SELECT a.vec_id, a.label, round(sum(l.qdist2), 4) AS adc_dist2
        FROM assigned a JOIN lut l
          ON a.m = l.m AND a.centroid_id = l.centroid_id
        WHERE a.vec_id <> 1
        GROUP BY a.vec_id, a.label
        ORDER BY adc_dist2, vec_id
        LIMIT 20
    """,
    doc="PQ asymmetric-distance (ADC) top-k: build a per-query lookup "
    "table of query-to-centroid distances (M*K = 32 doubles), score "
    "every vector as the SUM OF 4 TABLE LOOKUPS over its codes, take "
    "top-20 via TakeOrderedAndProject. The scan never touches raw "
    "embeddings — at 100 TB the fleet reads 4-byte codes plus a "
    "broadcast 256-byte LUT, turning an O(N*dim) float scan into "
    "O(N*M) byte lookups; recall is then refined by re-ranking the "
    "shortlist against exact vectors (simsearch-topk's plan).",
)
def simsearch_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    # persist the sub-vector explode ONCE and share it with the
    # assignment helper: unpersisted, the explode + slice fan-out
    # re-planned for assigned / cb / qsubs (4 embeddings scans in the
    # r11 before-plan).
    subs = _pq_subvectors(emb).persist()
    assigned = _pq_assignments(spark, sf_dir, subs=subs)
    cb = subs.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("centroid_id"), "m", F.col("sv").alias("cv")
    )
    qsubs = subs.filter(F.col("vec_id") == 1).select("m", F.col("sv").alias("qv"))
    lut = (
        cb.join(F.broadcast(qsubs), "m")
        .withColumn("qdist2", _sq_l2(F.col("cv"), F.col("qv")))
        .select("m", "centroid_id", "qdist2")
    )
    return (
        assigned.filter(F.col("vec_id") != 1)
        .join(F.broadcast(lut), ["m", "centroid_id"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sum("qdist2"), 4).alias("adc_dist2"))
        .orderBy("adc_dist2", "vec_id")
        .limit(20)
    )


@query(
    "embed-matryoshka-recall",
    oracle=f"""
        WITH full_sim AS (
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), {_QUERY_VEC_SQL})
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product({_QUERY_VEC_SQL}, {_QUERY_VEC_SQL}))), 6) AS sim
            FROM embeddings WHERE vec_id <> 1 AND embedding IS NOT NULL
        ),
        trunc AS (
            SELECT vec_id, list_slice(CAST(embedding AS DOUBLE[]), 1, 16) AS v16,
                   (SELECT list_slice(CAST(embedding AS DOUBLE[]), 1, 16)
                    FROM embeddings WHERE vec_id = 1) AS q16
            FROM embeddings WHERE vec_id <> 1 AND embedding IS NOT NULL
        ),
        trunc_sim AS (
            SELECT vec_id,
                   round(list_dot_product(v16, q16)
                         / (sqrt(list_dot_product(v16, v16))
                            * sqrt(list_dot_product(q16, q16))), 6) AS sim
            FROM trunc
        ),
        top_full AS (
            SELECT vec_id FROM full_sim ORDER BY sim DESC, vec_id LIMIT 10
        ),
        top_trunc AS (
            SELECT vec_id FROM trunc_sim ORDER BY sim DESC, vec_id LIMIT 10
        )
        SELECT CAST(10 AS BIGINT) AS k,
               CAST((SELECT count(*) FROM top_full f
                     WHERE f.vec_id IN (SELECT vec_id FROM top_trunc)) AS BIGINT)
                   AS overlap_n,
               round((SELECT count(*) FROM top_full f
                      WHERE f.vec_id IN (SELECT vec_id FROM top_trunc)) / 10.0, 6)
                   AS recall_at_10
    """,
    doc="Matryoshka truncation recall: rank the corpus by cosine on the "
    "full 64-dim embedding AND on its first-16-dim prefix, then "
    "measure top-10 overlap — the evaluation that licenses serving "
    "truncated (MRL) embeddings, which cut vector-store bytes and "
    "ANN compute 4x. Both rankings are broadcast-query scans with "
    "TakeOrderedAndProject top-k; the overlap join is 10x10. At 100 "
    "TB this runs per model release to pick the cheapest prefix "
    "length that clears the recall bar (coarse-to-fine: shortlist on "
    "the prefix, re-rank the shortlist on full vectors).",
)
def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    base = emb.filter(F.col("vec_id") != 1)
    qrow = emb.filter(F.col("vec_id") == 1).select(
        as_double(F.col("embedding")).alias("qv")
    )

    def topk(df, dims: int | None):
        v = as_double(F.col("embedding"))
        q = F.col("qv")
        if dims is not None:
            v, q = F.slice(v, 1, dims), F.slice(q, 1, dims)
        return (
            df.join(F.broadcast(qrow))
            .select("vec_id", F.round(cosine(v, q), 6).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col("vec_id"))
            .limit(10)
            .select("vec_id")
        )

    full = topk(base, None)
    trunc = topk(base, 16)
    overlap = full.join(trunc, "vec_id").agg(F.count("*").alias("overlap_n"))
    return overlap.select(
        F.lit(10).cast("long").alias("k"),
        F.col("overlap_n").cast("long").alias("overlap_n"),
        F.round(F.col("overlap_n") / 10.0, 6).alias("recall_at_10"),
    )


@query(
    "simsearch-binary-hamming",
    oracle="""
        WITH bits AS (
            SELECT vec_id, label,
                   CAST(i // 32 AS BIGINT) AS word,
                   CASE WHEN x > 0 THEN (CAST(1 AS BIGINT) << CAST(i % 32 AS INTEGER))
                        ELSE 0 END AS term
            FROM (SELECT vec_id, label,
                         generate_subscripts(embedding, 1) - 1 AS i,
                         unnest(CAST(embedding AS DOUBLE[])) AS x
                  FROM embeddings)
        ),
        words AS (
            SELECT vec_id, label,
                   CAST(sum(CASE WHEN word = 0 THEN term ELSE 0 END) AS BIGINT) AS w0,
                   CAST(sum(CASE WHEN word = 1 THEN term ELSE 0 END) AS BIGINT) AS w1
            FROM bits GROUP BY vec_id, label
        ),
        q AS (SELECT w0 AS q0, w1 AS q1 FROM words WHERE vec_id = 1)
        SELECT w.vec_id, w.label,
               CAST(bit_count(xor(w.w0, q.q0)) + bit_count(xor(w.w1, q.q1))
                    AS BIGINT) AS hamming
        FROM words w, q
        WHERE w.vec_id <> 1
        ORDER BY hamming, w.vec_id
        LIMIT 20
    """,
    doc="Binary (1-bit) embedding search: sign-quantize 64 dims into two "
    "32-bit words (posexplode + conditional bit sums — integer-exact "
    "across engines), rank by Hamming distance to the query's words "
    "via bit_count(xor), top-20 through TakeOrderedAndProject. The "
    "extreme end of the quantization ladder (float32 -> int8 -> PQ -> "
    "1-bit): 256 bytes to 8 per vector, distance = two XOR+popcounts "
    "— at 100 TB the whole index fits where 3%% of the floats did, "
    "and the shortlist re-ranks on exact vectors like the other "
    "coarse-to-fine ops.",
)
def simsearch_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", "label", F.posexplode(as_double(F.col("embedding"))).alias("i", "x")
    )
    # F.shiftleft takes a literal int shift — column shifts go through expr
    term = F.when(
        F.col("x") > 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(i % 32 AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    words = (
        pos.withColumn("word", (F.col("i") / 32).cast("long"))
        .withColumn("term", term)
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.when(F.col("word") == 0, F.col("term")).otherwise(0))
            .cast("long")
            .alias("w0"),
            F.sum(F.when(F.col("word") == 1, F.col("term")).otherwise(0))
            .cast("long")
            .alias("w1"),
        )
    )
    q = words.filter(F.col("vec_id") == 1).select(
        F.col("w0").alias("q0"), F.col("w1").alias("q1")
    )
    hamming = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("q0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
    ).cast("long")
    return (
        words.filter(F.col("vec_id") != 1)
        .join(F.broadcast(q))
        .select("vec_id", "label", hamming.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(20)
    )


@query(
    "embed-outlier-distance",
    oracle="""
        WITH pos AS (
            SELECT vec_id, label,
                   generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
            FROM embeddings
        ),
        cent AS (
            SELECT label, dim, avg(x) AS c FROM pos GROUP BY label, dim
        ),
        dist AS (
            SELECT p.vec_id, p.label,
                   sqrt(sum((p.x - c.c) * (p.x - c.c))) AS d
            FROM pos p JOIN cent c ON p.label = c.label AND p.dim = c.dim
            GROUP BY p.vec_id, p.label
        ),
        stats AS (
            SELECT label, avg(d) AS mu, stddev_pop(d) AS sd FROM dist GROUP BY label
        )
        SELECT d.label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(CASE WHEN (d.d - s.mu) / s.sd > 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               round(max(d.d), 4) AS max_dist
        FROM dist d JOIN stats s ON d.label = s.label
        GROUP BY d.label
    """,
    doc="Embedding-space data quality: distance of every vector from its "
    "LABEL CENTROID, flagging z > 2 outliers per label — the "
    "mislabeled/corrupted-embedding detector run before any "
    "classifier or ANN index trusts the labels. Centroids come from "
    "the posexplode + per-(label, dim) mean (embed-centroid's "
    "no-UDF construction), distances re-join on (label, dim) — "
    "three grouped shuffles, all keyed on bounded label/dim "
    "cardinality except the per-vector distance agg, which is keyed "
    "on vec_id and linear. The z-score machinery matches "
    "anomaly-zscore; at 100 TB centroids come from the previous "
    "epoch's run and this is one broadcast join + one agg.",
)
def embed_outlier_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # persist only the per-vector distance summary below (NOT the
    # 64x position-exploded relation): r11 persisted pos + dist and
    # reverted (+22%) — the exploded cache build dwarfed its savings.
    # dist is one row per vector and its un-persisted replan re-ran the
    # whole explode/centroid/join chain for the final z-score branch
    # (4 embeddings scans -> 2); summary width per session.cache_width.
    pos = emb.select(
        "vec_id",
        "label",
        F.posexplode(as_double(F.col("embedding"))).alias("dim0", "x"),
    ).select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "x")
    cent = pos.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    dist = (
        pos.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))).alias("d"))
        .coalesce(cache_width(spark))
        .persist()
    )
    stats = dist.groupBy("label").agg(
        F.avg("d").alias("mu"), F.stddev_pop("d").alias("sd")
    )
    return (
        dist.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            # try_divide: singleton/degenerate label groups have sd = 0
            # (hostile label mutation creates them) -> NULL z-score, not
            # an outlier, on both engines.
            F.sum(
                F.when(
                    F.try_divide(F.col("d") - F.col("mu"), F.col("sd")) > 2, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max("d"), 4).alias("max_dist"),
        )
    )


@query(
    "embed-separation-histogram",
    oracle="""
        WITH sample AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id % 17 = 0 AND vec_id < 3400
        ),
        pairs AS (
            SELECT (a.label = b.label) AS same_label,
                   list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) AS cos
            FROM sample a JOIN sample b ON a.vec_id < b.vec_id
        )
        SELECT same_label,
               CAST(least(greatest(floor((cos + 1.0) / 0.25), 0), 7) AS BIGINT)
                   AS cos_bucket,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs
        GROUP BY 1, 2
    """,
    doc="Embedding separation histogram: pairwise cosine distribution "
    "split by same-label vs cross-label over a deterministic FIXED-"
    "SIZE sample (1/17 modulus + id cap = at most 200 vectors at any "
    "corpus size — a rate-only sample would make the pair join "
    "corpus-quadratic, the hazard the r5 soak caught in "
    "text-self-bleu-lite) — the eval that says whether labels are "
    "separable in embedding space BEFORE anyone trains a probe on it "
    "(healthy: same-label mass sits in higher-cosine buckets); the "
    "estimate converges like any pair-sampled statistic, 8 fixed "
    "buckets keep the output schema constant. Companion to "
    "embed-outlier-distance: that flags single bad vectors, this "
    "grades the space.",
)
def embed_separation_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") % 17 == 0) & (F.col("vec_id") < 3400)
    )
    sample = emb.select("vec_id", "label", as_double(F.col("embedding")).alias("v"))
    a, b = sample.alias("a"), sample.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        (F.col("a.label") == F.col("b.label")).alias("same_label"),
        cos.alias("cos"),
    )
    bucket = F.least(
        F.greatest(F.floor((F.col("cos") + 1.0) / 0.25), F.lit(0)), F.lit(7)
    ).cast("long")
    return pairs.groupBy("same_label", bucket.alias("cos_bucket")).agg(
        F.count("*").alias("n_pairs")
    )


_COV_DIMS = 8


@query(
    "embed-covariance-block",
    oracle=f"""
        WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        SELECT i, j,
               CAST(floor((sum_ij / n - (sum_i / n) * (sum_j / n))
                          * 1000000000 + 0.5) AS BIGINT) AS cov_e9
        FROM (
            SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
                   sum(e[p.i + 1] * e[p.j + 1]) AS sum_ij,
                   sum(e[p.i + 1]) AS sum_i,
                   sum(e[p.j + 1]) AS sum_j,
                   count(*) AS n
            FROM v CROSS JOIN (
                SELECT a.range AS i, b.range AS j
                FROM range(0, {_COV_DIMS}) a, range(0, {_COV_DIMS}) b
                WHERE a.range <= b.range
            ) p
            GROUP BY p.i, p.j
        )
    """,
    doc="Distributed covariance block over embedding dimensions 0..7 "
    "(the whitening/PCA-prep statistic): population covariance "
    "cov(i,j) = E[xi*xj] - E[xi]E[xj] computed as ONE aggregation of "
    "sum/sum-product partials — each scan partition collapses to "
    "d*(d+1)/2 partial triples before the shuffle, so a full 64x64 "
    "matrix at 100 TB moves ~4k doubles per partition, never vectors. "
    "(The driver-side eigendecomposition of the resulting small matrix "
    "is O(d^3) numpy work, same division of labour as MLlib's "
    "RowMatrix.computeCovariance.) Output quantized via "
    "floor(x*1e9+0.5) — double-arithmetic-only rounding, same "
    "rationale as timeseries-ewma. Pairs expanded JVM-side from a "
    "literal range, no Python.",
)
def embed_covariance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # extract the 8 dims as scalar columns ONCE per row: inlined, the
    # cast(embedding as array<double>) + element_at subtree re-evaluated
    # ~90x per row inside the 45-function aggregate (visible verbatim in
    # the r11 before-plan). A Project below an Aggregate is not inlined
    # back by the optimizer, so the agg update reads 8 ready doubles.
    # Same cast -> same index -> same multiply: arithmetic unchanged.
    v = as_double(F.col("embedding"))
    dims = e.select(*[v[i].alias(f"x_{i}") for i in range(_COV_DIMS)])
    x = [F.col(f"x_{i}") for i in range(_COV_DIMS)]
    aggs = []
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            aggs.append(
                F.sum(x[i] * x[j]).alias(f"sij_{i}_{j}")
            )
    for i in range(_COV_DIMS):
        aggs.append(F.sum(x[i]).alias(f"s_{i}"))
    aggs.append(F.count("*").alias("n"))
    flat = dims.agg(*aggs)
    pairs = [
        F.struct(
            F.lit(i).cast("int").alias("i"),
            F.lit(j).cast("int").alias("j"),
            (
                F.col(f"sij_{i}_{j}") / F.col("n")
                - (F.col(f"s_{i}") / F.col("n")) * (F.col(f"s_{j}") / F.col("n"))
            ).alias("cov"),
        )
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    ]
    exploded = flat.select(F.explode(F.array(*pairs)).alias("p"))
    return exploded.select(
        F.col("p.i").alias("i"),
        F.col("p.j").alias("j"),
        F.floor(F.col("p.cov") * 1000000000 + 0.5).cast("long").alias("cov_e9"),
    )


def _power_iter_oracle(dims: int, iters: int) -> str:
    """Unrolled power-iteration SQL for DuckDB (no loops in ANSI SQL):
    each iteration is a matrix-vector join-aggregate + a scalar-subquery
    normalization, exactly mirroring the Spark driver loop."""
    ctes = [
        f"v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"""p AS (SELECT a.range AS i, b.range AS j
                  FROM range(0, {dims}) a, range(0, {dims}) b)""",
        """g AS (SELECT p.i, p.j,
                        sum(e[p.i + 1] * e[p.j + 1]) / count(*) AS g
                 FROM v CROSS JOIN p GROUP BY p.i, p.j)""",
        f"v0 AS (SELECT range AS i, 1.0 / sqrt({dims}) AS x FROM range(0, {dims}))",
    ]
    prev = "v0"
    for k in range(1, iters + 1):
        ctes.append(
            f"""y{k} AS (SELECT g.i AS i, sum(g.g * {prev}.x) AS y
                     FROM g JOIN {prev} ON g.j = {prev}.i GROUP BY g.i)"""
        )
        ctes.append(
            f"""v{k} AS (SELECT i, y / (SELECT sqrt(sum(y * y)) FROM y{k}) AS x
                     FROM y{k})"""
        )
        prev = f"v{k}"
    ctes.append(
        f"""ray AS (SELECT sum(a.x * g.g * b.x) AS ev
                FROM g JOIN {prev} a ON g.i = a.i JOIN {prev} b ON g.j = b.i)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT CAST({prev}.i AS BIGINT) AS dim,
               round({prev}.x, 6) AS loading,
               round((SELECT ev FROM ray), 4) AS eigenvalue
        FROM {prev}"""
    )


_PI_DIMS, _PI_ITERS = 8, 3


@query(
    "embed-power-iteration",
    oracle=_power_iter_oracle(_PI_DIMS, _PI_ITERS),
    doc="Dominant eigenvector of the embedding gram block (dims 0..7) "
    "by DISTRIBUTED power iteration — the PCA/spectral primitive as a "
    "driver loop of relational ops, no collect anywhere: the gram "
    "matrix is one scan collapsing to d^2 sum-product partials "
    "(map-side combined, like embed-covariance-block), then each of "
    "the 3 iterations is a matrix-vector join-aggregate over the "
    "(i,j,g) relation plus a broadcast scalar normalization. At d=8 "
    "this is toy-sized by design, but the shape is the one that "
    "scales: for a d=4096 block the same plan moves d^2 doubles once "
    "and d doubles per iteration, while the corpus is scanned exactly "
    "once. Deterministic: all-ones start vector, PSD gram, fixed "
    "iteration count. Oracled by the identical computation unrolled "
    "into DuckDB CTEs.",
)
def embed_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    aggs = [
        F.sum(v[i] * v[j]).alias(f"s_{i}_{j}")
        for i in range(_PI_DIMS)
        for j in range(_PI_DIMS)
    ]
    aggs.append(F.count("*").alias("n"))
    flat = e.agg(*aggs)
    cells = [
        F.struct(
            F.lit(i).cast("long").alias("i"),
            F.lit(j).cast("long").alias("j"),
            (F.col(f"s_{i}_{j}") / F.col("n")).alias("g"),
        )
        for i in range(_PI_DIMS)
        for j in range(_PI_DIMS)
    ]
    # localCheckpoint: the gram relation (d^2 rows) heads every
    # iteration's lineage — without the cut, iteration k re-executes
    # the full-corpus aggregate once per reference (measured 12s at
    # sf0.1 vs ~1s with the cut). Same hygiene for the d-row vector:
    # vec_{k+1} references y_k twice (value + norm), doubling the
    # replay per round.
    gram = (
        flat.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.i", "c.j", "c.g")
        .localCheckpoint()
    )
    vec = spark.range(_PI_DIMS).select(
        F.col("id").alias("vi"), F.lit(1.0 / _PI_DIMS**0.5).alias("x")
    )
    for _ in range(_PI_ITERS):
        y = (
            gram.join(F.broadcast(vec), gram.j == vec.vi)
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("x")).alias("y"))
        )
        norm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nn"))
        vec = (
            y.crossJoin(F.broadcast(norm))
            .select(F.col("i").alias("vi"), (F.col("y") / F.col("nn")).alias("x"))
            .localCheckpoint()
        )
    va = vec.select(F.col("vi").alias("ai"), F.col("x").alias("ax"))
    vb = vec.select(F.col("vi").alias("bi"), F.col("x").alias("bx"))
    ray = (
        gram.join(F.broadcast(va), gram.i == va.ai)
        .join(F.broadcast(vb), gram.j == vb.bi)
        .agg(F.sum(F.col("ax") * F.col("g") * F.col("bx")).alias("ev"))
    )
    return vec.crossJoin(F.broadcast(ray)).select(
        F.col("vi").cast("long").alias("dim"),
        F.round(F.col("x"), 6).alias("loading"),
        F.round(F.col("ev"), 4).alias("eigenvalue"),
    )


_WH_DIMS = 8


@query(
    "embed-whitening-diag",
    oracle=f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        stats AS (
            SELECT {", ".join(
                f"avg(e[{i + 1}]) AS mu_{i}, stddev_pop(e[{i + 1}]) AS sd_{i}"
                for i in range(_WH_DIMS)
            )}
            FROM v
        )
        SELECT vec_id,
               {", ".join(
                f"round((e[{i + 1}] - mu_{i}) / sd_{i}, 6) AS w{i}"
                for i in range(_WH_DIMS)
               )}
        FROM v CROSS JOIN stats
    """,
    doc="Diagonal whitening of embedding dims 0..7: per-dimension "
    "mean/std from ONE single-row aggregate (map-side combined "
    "sum/sum-sq partials, like embed-covariance-block), broadcast "
    "back over the corpus as a scalar cross join, z-score projection "
    "codegen-side. The standardization step before any isotropic "
    "distance / PCA / outlier screen (embed-outlier-distance assumes "
    "it); full-matrix whitening = this op with the rotation from "
    "embed-power-iteration's eigenvectors. Corpus scanned twice "
    "(stats + apply) — at 100 TB fuse by caching the stats row, "
    "which is exactly what the broadcast does.",
)
def embed_whitening_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    stats = e.agg(
        *[
            agg
            for i in range(_WH_DIMS)
            for agg in (
                F.avg(v[i]).alias(f"mu_{i}"),
                F.stddev_pop(v[i]).alias(f"sd_{i}"),
            )
        ]
    )
    out = e.crossJoin(F.broadcast(stats))
    return out.select(
        "vec_id",
        *[
            F.round((v[i] - F.col(f"mu_{i}")) / F.col(f"sd_{i}"), 6).alias(f"w{i}")
            for i in range(_WH_DIMS)
        ],
    )


@query(
    "embed-dim-variance-screen",
    oracle="""
        WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        cells AS (
            SELECT CAST(d.range AS BIGINT) AS dim, e[d.range + 1] AS x
            FROM v CROSS JOIN range(0, 64) d
        ),
        stats AS (
            SELECT dim,
                   round(var_pop(x), 8) AS dim_var,
                   round(avg(x), 6) AS dim_mean
            FROM cells GROUP BY dim
        )
        SELECT dim, dim_var, dim_mean,
               CAST(row_number() OVER (ORDER BY dim_var ASC, dim) AS BIGINT)
                   AS var_rank,
               dim_var < 0.001 AS is_dead
        FROM stats
    """,
    doc="Per-dimension variance screen over ALL 64 embedding dims: "
    "unpivot each vector to (dim, value) cells via a literal-range "
    "cross join (64x fan-out, JVM-side, no Python), one "
    "map-side-combined groupBy to per-dim variance/mean, rank dims "
    "by variance and flag near-constant ('dead') ones — dead dims "
    "waste index bytes and distance compute, and their count is the "
    "first thing to check before PQ coding (embed-pq-codes) or "
    "dimension truncation (embed-matryoshka-recall). The shuffle "
    "carries 64 partial triples per scan partition regardless of "
    "corpus size; the rank window runs over 64 rows.",
)
def embed_dim_variance_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    cells = e.select(F.posexplode(v).alias("dim", "x")).select(
        F.col("dim").cast("long").alias("dim"), "x"
    )
    stats = cells.groupBy("dim").agg(
        F.round(F.var_pop("x"), 8).alias("dim_var"),
        F.round(F.avg("x"), 6).alias("dim_mean"),
    )
    return stats.select(
        "dim",
        "dim_var",
        "dim_mean",
        F.row_number()
        .over(Window.orderBy(F.col("dim_var").asc(), F.col("dim")))
        .cast("long")
        .alias("var_rank"),
        (F.col("dim_var") < 0.001).alias("is_dead"),
    )


_MMR_LAMBDA, _MMR_POOL = 0.7, 20
_COS_Q = (
    "round(list_dot_product(v, (SELECT qv FROM mq))"
    " / (sqrt(list_dot_product(v, v))"
    "    * sqrt(list_dot_product((SELECT qv FROM mq), (SELECT qv FROM mq)))), 6)"
)


@query(
    "embed-mmr-rerank",
    oracle=f"""
        WITH mq AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id = 1
        ),
        cand AS (
            SELECT vec_id AS cid, v, simq FROM (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       {_COS_Q} AS simq
                FROM embeddings WHERE vec_id <> 1 AND embedding IS NOT NULL
            ) ORDER BY simq DESC, vec_id LIMIT {_MMR_POOL}
        ),
        pair AS (
            SELECT a.cid AS ca, b.cid AS cb,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS s
            FROM cand a JOIN cand b ON a.cid <> b.cid
        ),
        s1 AS (SELECT cid, simq FROM cand ORDER BY simq DESC, cid LIMIT 1),
        r2 AS (
            SELECT c.cid, c.simq,
                   round({_MMR_LAMBDA} * c.simq
                         - {1 - _MMR_LAMBDA:.1f} * p.s, 7) AS score
            FROM cand c
            JOIN pair p ON p.ca = c.cid AND p.cb = (SELECT cid FROM s1)
        ),
        s2 AS (SELECT cid, simq, score FROM r2 ORDER BY score DESC, cid LIMIT 1),
        r3 AS (
            SELECT c.cid, c.simq,
                   round({_MMR_LAMBDA} * c.simq
                         - {1 - _MMR_LAMBDA:.1f} * greatest(p1.s, p2.s), 7)
                       AS score
            FROM cand c
            JOIN pair p1 ON p1.ca = c.cid AND p1.cb = (SELECT cid FROM s1)
            JOIN pair p2 ON p2.ca = c.cid AND p2.cb = (SELECT cid FROM s2)
        ),
        s3 AS (SELECT cid, simq, score FROM r3 ORDER BY score DESC, cid LIMIT 1)
        SELECT CAST(1 AS BIGINT) AS sel_rank, CAST(cid AS BIGINT) AS cid,
               simq AS relevance, simq AS mmr_score
        FROM s1
        UNION ALL
        SELECT 2, CAST(cid AS BIGINT), simq, score FROM s2
        UNION ALL
        SELECT 3, CAST(cid AS BIGINT), simq, score FROM s3
    """,
    doc=f"Maximal-Marginal-Relevance re-ranking (lambda={_MMR_LAMBDA}): "
    "greedily pick 3 results from the top-20 relevance pool, each "
    "pick maximizing relevance minus redundancy to what is already "
    "selected — the diversity re-rank RAG retrieval runs so three "
    "near-identical passages don't fill the context window. The "
    "greedy loop is inherently sequential, but each step is a "
    "RELATIONAL argmax over the tiny candidate pool, so the "
    "distributed work (scoring the corpus + top-20) happens once "
    "and the 3-step loop touches 20x20 pairwise sims — the "
    "candidate-pool/rerank split every serving stack uses. "
    "Similarities are pre-rounded to 6dp, and MMR scores to 7dp - "
    "0.7/0.3 times a 6dp value IS an exact 7dp decimal, so a 6dp "
    "round would sit exactly on midpoints and flip per engine - so "
    "greedy tie-breaks "
    "(score desc, then id) are engine-identical; the DuckDB oracle "
    "unrolls the identical 3 steps as CTEs. Exclusions are "
    "anti-join-free: picked candidates can never win again because "
    "their self-similarity penalty is maximal (s(c,c)=1 rows are "
    "excluded by cid<>, and a picked item's score vs itself is "
    "undefined — the join on p.ca = c.cid AND p.cb = picked "
    "naturally drops the picked row).",
)
def embed_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    qv = e.filter(F.col("vec_id") == 1).select(
        as_double(F.col("embedding")).alias("qv")
    )
    cand = (
        e.filter(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("cid"),
            as_double(F.col("embedding")).alias("v"),
            F.round(cosine(as_double(F.col("embedding")), F.col("qv")), 6).alias(
                "simq"
            ),
        )
        .orderBy(F.col("simq").desc(), F.col("cid"))
        .limit(_MMR_POOL)
        # persist the bounded candidate pool: the greedy MMR rounds
        # reference it ~8 times, and uncached each re-scans the
        # embeddings table (30 scans in the executed plan).
        .persist()
    )
    a = cand.select(
        F.col("cid").alias("ca"), F.col("v").alias("va"), F.col("simq").alias("sa")
    )
    b = cand.select(F.col("cid").alias("cb"), F.col("v").alias("vb"))
    pair = a.join(b, F.col("ca") != F.col("cb")).select(
        "ca", "cb", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("s")
    ).persist()  # pool^2 rows, referenced by every MMR round

    def argmax(df: DataFrame, score_col: str) -> DataFrame:
        return df.orderBy(F.col(score_col).desc(), F.col("cid")).limit(1)

    lam = _MMR_LAMBDA
    s1 = argmax(cand.select("cid", "simq"), "simq")
    pick1 = s1.select(F.col("cid").alias("p1"))
    r2 = (
        cand.select("cid", "simq")
        .join(F.broadcast(pick1))
        .join(pair, (pair.ca == F.col("cid")) & (pair.cb == F.col("p1")))
        .select("cid", "simq", F.round(lam * F.col("simq") - (1 - lam) * F.col("s"), 7).alias("score"))
    )
    s2 = argmax(r2, "score")
    pick2 = s2.select(F.col("cid").alias("p2"))
    pa = pair.select(F.col("ca").alias("ca1"), F.col("cb").alias("cb1"), F.col("s").alias("s1v"))
    pb = pair.select(F.col("ca").alias("ca2"), F.col("cb").alias("cb2"), F.col("s").alias("s2v"))
    r3 = (
        cand.select("cid", "simq")
        .join(F.broadcast(pick1))
        .join(F.broadcast(pick2))
        .join(pa, (F.col("ca1") == F.col("cid")) & (F.col("cb1") == F.col("p1")))
        .join(pb, (F.col("ca2") == F.col("cid")) & (F.col("cb2") == F.col("p2")))
        .select(
            "cid",
            "simq",
            F.round(
                lam * F.col("simq")
                - (1 - lam) * F.greatest(F.col("s1v"), F.col("s2v")),
                7,
            ).alias("score"),
        )
    )
    s3 = argmax(r3, "score")
    out1 = s1.select(
        F.lit(1).cast("long").alias("sel_rank"),
        F.col("cid").cast("long").alias("cid"),
        F.col("simq").alias("relevance"),
        F.col("simq").alias("mmr_score"),
    )
    out2 = s2.select(
        F.lit(2).cast("long").alias("sel_rank"),
        F.col("cid").cast("long").alias("cid"),
        F.col("simq").alias("relevance"),
        F.col("score").alias("mmr_score"),
    )
    out3 = s3.select(
        F.lit(3).cast("long").alias("sel_rank"),
        F.col("cid").cast("long").alias("cid"),
        F.col("simq").alias("relevance"),
        F.col("score").alias("mmr_score"),
    )
    return out1.unionByName(out2).unionByName(out3)


@query(
    "embed-intrinsic-dim",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE embedding IS NOT NULL
        ),
        anchors AS (SELECT * FROM v WHERE vec_id % 10 = 0 AND vec_id < 2000),
        d2 AS (
            SELECT a.vec_id AS aid, b.vec_id AS bid,
                   list_dot_product(a.e, a.e)
                   - 2 * list_dot_product(a.e, b.e)
                   + list_dot_product(b.e, b.e) AS dd
            FROM anchors a JOIN v b ON a.vec_id <> b.vec_id
        ),
        top2 AS (
            SELECT aid, dd,
                   row_number() OVER (PARTITION BY aid
                                      ORDER BY dd, bid) AS rn
            FROM d2
        ),
        mu AS (
            SELECT aid,
                   0.5 * ln(max(CASE WHEN rn = 2 THEN dd END)
                            / max(CASE WHEN rn = 1 THEN dd END)) AS ln_mu
            FROM top2 WHERE rn <= 2 GROUP BY aid
            HAVING max(CASE WHEN rn = 1 THEN dd END) > 0
        )
        SELECT CAST(count(*) AS BIGINT) AS n_anchors,
               round(count(*) / sum(ln_mu), 6) AS intrinsic_dim
        FROM mu
    """,
    doc="TwoNN intrinsic-dimension estimate of the embedding manifold "
    "(Facco et al.: ID = n / sum(ln(d2/d1)) over the ratio of each "
    "point's two nearest-neighbor distances) on a deterministic "
    "1-in-10 anchor sample: the estimator needs only each anchor's "
    "NN ratio, so the scan is anchors x corpus with the bounded "
    "anchor matrix closure-shipped into the shared Arrow-gemm "
    "kernel (operators/anndist.py, r10 — one BLAS matmul per "
    "corpus batch, partition-local top-2 per anchor emitted; "
    "bounded fan-out, corpus never shuffled wholesale). "
    "Distances stay SQUARED throughout (d^2 = x.x - 2x.q + q.q via "
    "three dot products; ln(mu) = 0.5*ln(d2^2/d1^2)) — no sqrt, "
    "fewer rounding seams between engines. The curse-of-"
    "dimensionality probe to run before trusting any ANN index "
    "choice: IVF/LSH recall targets depend on ID, not ambient "
    "dim.",
    tags=("embed",),
)
def embed_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.anndist import anchor_sqdist_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select("vec_id", as_double(F.col("embedding")).alias("e"))
    # FIXED anchor set (ids < 2000), not a fixed fraction: a %-of-corpus
    # sample makes the anchors x corpus pair count grow QUADRATICALLY
    # with data size (10x corpus -> 100x pairs); a bounded anchor set
    # keeps the scan linear in the corpus at any scale, and the TwoNN
    # estimate needs only enough anchors for a stable mean, not a
    # constant fraction. Bounded => collectable, so the distance loop is
    # the shared Arrow-gemm kernel (operators/anndist.py, r10): one BLAS
    # matmul per corpus batch, partition-local top-2 per anchor emitted.
    anchor_rows = (
        emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 2000))
        .orderBy("vec_id")
        .collect()
    )
    top2 = anchor_sqdist_topk(emb, anchor_rows, 2)
    d1 = F.max(F.when(F.col("rn") == 1, F.col("dd")))
    d2_ = F.max(F.when(F.col("rn") == 2, F.col("dd")))
    mu = (
        top2.groupBy("aid")
        .agg((0.5 * F.log(d2_ / d1)).alias("ln_mu"), d1.alias("d1"))
        .filter(F.col("d1") > 0)
    )
    return mu.agg(
        F.count("*").cast("long").alias("n_anchors"),
        F.round(F.count("*") / F.sum("ln_mu"), 6).alias("intrinsic_dim"),
    )


@query(
    "embed-hubness",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])) AS bb
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        anchors AS (SELECT * FROM v WHERE vec_id % 5 = 0 AND vec_id < 2000),
        d2 AS (
            SELECT a.vec_id AS aid, b.vec_id AS bid,
                   a.bb - 2 * list_dot_product(a.e, b.e) + b.bb AS dd
            FROM anchors a JOIN v b ON a.vec_id <> b.vec_id
        ),
        topk AS (
            SELECT aid, bid FROM (
                SELECT aid, bid,
                       row_number() OVER (PARTITION BY aid
                                          ORDER BY dd, bid) AS rn
                FROM d2
            ) WHERE rn <= 10
        ),
        occ AS (
            SELECT bid, CAST(count(*) AS DOUBLE) AS k_occ
            FROM topk GROUP BY bid
        ),
        m AS (
            SELECT avg(k_occ) AS mu, stddev_samp(k_occ) AS sd,
                   avg(k_occ * k_occ * k_occ) AS m3r,
                   avg(k_occ * k_occ) AS m2r,
                   max(k_occ) AS mx,
                   CAST(count(*) AS BIGINT) AS n
            FROM occ
        )
        SELECT n AS n_in_some_topk,
               round(mx, 6) AS max_k_occurrence,
               CASE WHEN m2r - mu * mu > 0 THEN
                   round((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
                         / power(m2r - mu * mu, 1.5), 6)
               END AS k_skewness
        FROM m
    """,
    doc="Hubness diagnostic for the embedding space: how skewed is "
    "the k-occurrence distribution (how often each vector lands in "
    "another's 10-NN list)? High positive skew = hub vectors that "
    "appear in everyone's neighbor list — the high-dimensional "
    "pathology that silently degrades ANN recall and makes "
    "dedup-near-embedding over-merge. The anchor-distance kernel is "
    "an Arrow-batched mapInPandas gemm (r9 verdict task 3): the "
    "bounded anchor matrix (<=400 x dim doubles — the IVF "
    "centroid-collect pattern, ~26 kB of driver traffic) is "
    "closure-shipped, each corpus batch computes ALL anchor "
    "distances as ONE BLAS matmul (d2 = aa - 2 E.A^T + bb) instead "
    "of 400 x n interpreted higher-order-function folds (measured "
    "5.2 s -> ~2.0 s at sf0.1, the residue being the anchor-collect "
    "job and Python worker spin-up; the explicit 64-term element_at "
    "expression tree was tried first and measured 4x SLOWER than "
    "the HOF fold — codegen chokes on it), and emits only its "
    "partition-local top-10 per anchor by (dd, bid) — so the "
    "exchange into the global rank window carries <=400 x 10 x P "
    "candidate rows, never the full anchors x corpus product. "
    "k-occurrence counts and their moment-based skewness in two "
    "summary aggs; population skewness from raw moments — identical "
    "algebra to stats-jarque-bera.",
    tags=("embed", "simsearch"),
)
def embed_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.operators.anndist import anchor_sqdist_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select("vec_id", as_double(F.col("embedding")).alias("e"))
    # fixed anchor set (ids < 2000) for the same linear-scan reason as
    # embed-intrinsic-dim: fraction-of-corpus anchors would square the
    # pair count under data growth. Bounded, so collecting it is k*dim
    # driver traffic — the accepted IVF-centroid shape; the distance
    # loop is the shared Arrow-gemm kernel (operators/anndist.py).
    anchor_rows = (
        emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 2000))
        .orderBy("vec_id")
        .collect()
    )
    topk = anchor_sqdist_topk(emb, anchor_rows, 10)
    occ = topk.groupBy("bid").agg(F.count("*").cast("double").alias("k_occ"))
    k = F.col("k_occ")
    m = occ.agg(
        F.avg(k).alias("mu"),
        F.avg(k * k).alias("m2r"),
        F.avg(k * k * k).alias("m3r"),
        F.max(k).alias("mx"),
        F.count("*").cast("long").alias("n"),
    )
    mu = F.col("mu")
    m3 = F.col("m3r") - 3 * mu * F.col("m2r") + 2 * mu * mu * mu
    var = F.col("m2r") - mu * mu
    return m.select(
        F.col("n").alias("n_in_some_topk"),
        F.round(F.col("mx"), 6).alias("max_k_occurrence"),
        # NULL on zero variance (every k-occurrence identical — the
        # degenerate-corpus case the sf10 clone soak exposed under ANSI
        # mode): skewness is undefined there, and dividing errors out
        F.when(var > 0, F.round(m3 / F.pow(var, 1.5), 6)).alias("k_skewness"),
    )


@query(
    "embed-norm-drift-ks",
    oracle="""
        WITH norms AS (
            SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS is0,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))
                       AS nrm
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        ext AS (SELECT min(nrm) AS lo, max(nrm) AS hi FROM norms),
        binned AS (
            SELECT least(63, CAST(floor((nrm - lo) / (hi - lo) * 64.0)
                                  AS INT)) AS bin,
                   sum(is0) AS c0, sum(1 - is0) AS c1
            FROM norms, ext GROUP BY 1
        ),
        ecdf AS (
            SELECT bin,
                   sum(c0) OVER (ORDER BY bin) AS cum0,
                   sum(c1) OVER (ORDER BY bin) AS cum1,
                   sum(c0) OVER () AS n0, sum(c1) OVER () AS n1
            FROM binned
        )
        SELECT CAST(max(n0) AS BIGINT) AS n_label0,
               CAST(max(n1) AS BIGINT) AS n_label1,
               round(max(abs(CAST(cum0 AS DOUBLE) / n0
                             - CAST(cum1 AS DOUBLE) / n1)), 6)
                   AS norm_ks_d
        FROM ecdf
    """,
    doc="Embedding-norm drift screen: binned two-sample KS distance "
    "between the L2-norm distributions of label-0 and label-1 "
    "vectors — the cheapest possible detector for 'these two "
    "embedding populations came from different model versions or "
    "preprocessing' (norm shifts are the classic symptom of a "
    "silent encoder swap, and they poison cosine thresholds "
    "calibrated on the old population). Same 64-bin "
    "distributed-safe ECDF machinery as stats-ks-binned applied "
    "to a derived vector statistic: one fold per vector for the "
    "norm, one min/max pre-pass, one hash agg, windows over 64 "
    "summary rows. Run it before trusting any cross-batch "
    "dedup-near-embedding threshold.",
    tags=("embed", "dq"),
)
def embed_norm_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    v = as_double(F.col("embedding"))
    norms = emb.select(
        F.when(F.col("label") == 0, 1).otherwise(0).alias("is0"),
        F.sqrt(dot(v, v)).alias("nrm"),
    )
    ext = norms.agg(F.min("nrm").alias("lo"), F.max("nrm").alias("hi"))
    binned = (
        norms.crossJoin(F.broadcast(ext))
        .groupBy(
            F.least(
                F.lit(63),
                F.floor(
                    (F.col("nrm") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 64.0
                ).cast("int"),
            ).alias("bin")
        )
        .agg(
            F.sum("is0").alias("c0"),
            F.sum(1 - F.col("is0")).alias("c1"),
        )
    )
    w_cum = Window.orderBy("bin")
    w_all = Window.partitionBy()
    ecdf = binned.select(
        "bin",
        F.sum("c0").over(w_cum).alias("cum0"),
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c0").over(w_all).alias("n0"),
        F.sum("c1").over(w_all).alias("n1"),
    )
    return ecdf.agg(
        F.max("n0").cast("long").alias("n_label0"),
        F.max("n1").cast("long").alias("n_label1"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum0").cast("double") / F.col("n0")
                    - F.col("cum1").cast("double") / F.col("n1")
                )
            ),
            6,
        ).alias("norm_ks_d"),
    )


@query(
    "embed-centroid-eval",
    oracle="""
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        dims AS (
            SELECT label, t.i AS i, avg(e[t.i]) AS avg_val
            FROM v, range(1, 65) t(i)
            GROUP BY label, t.i
        ),
        cents AS (
            SELECT label AS c_label, list(avg_val ORDER BY i) AS cv
            FROM dims GROUP BY label
        ),
        scored AS (
            SELECT v.vec_id, v.label, c.c_label,
                   list_dot_product(v.e, c.cv)
                   / (sqrt(list_dot_product(v.e, v.e))
                      * sqrt(list_dot_product(c.cv, c.cv))) AS sim
            FROM v CROSS JOIN cents c
        ),
        best AS (
            SELECT vec_id, label, c_label,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, c_label) AS rk
            FROM scored
        )
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(CASE WHEN label = c_label
                              THEN 1.0 ELSE 0.0 END), 6) AS accuracy
        FROM best WHERE rk = 1
    """,
    doc="Nearest-centroid (Rocchio) classifier evaluation over the "
    "labeled embeddings: per-label mean vectors (ONE grouped "
    "aggregation of 64 avg()s — map-side combinable, k x dim "
    "state), every vector scored against all k centroids by "
    "cosine with the centroids broadcast (k is tiny; the corpus "
    "never shuffles), argmax per vector, accuracy vs true label. "
    "The cheapest possible are-these-embeddings-separable probe "
    "— run it before investing in a real classifier head; "
    "accuracy near 1/k means the labels are not in the geometry "
    "and no ANN tuning will fix retrieval. Companion to "
    "embed-cluster-purity (unsupervised view of the same "
    "question).",
    tags=("embed",),
)
def embed_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    )
    dim = 64
    cents = emb.groupBy("label").agg(
        F.array(
            *[F.avg(F.col("e")[i]) for i in range(dim)]
        ).alias("cv")
    ).select(F.col("label").alias("c_label"), "cv")
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "c_label",
        cosine(F.col("e"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "c_label")
    best = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return best.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(
            F.avg(
                F.when(F.col("label") == F.col("c_label"), 1.0).otherwise(0.0)
            ),
            6,
        ).alias("accuracy"),
    )


@query(
    "embed-effective-rank",
    oracle="""
        WITH v AS (
            SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        dims AS (
            SELECT t.i AS i, var_pop(e[t.i]) AS lam
            FROM v, range(1, 65) t(i)
            GROUP BY t.i
        )
        SELECT CAST(count(*) AS BIGINT) AS ambient_dim,
               round(power(sum(lam), 2) / sum(lam * lam), 6)
                   AS participation_ratio,
               round(exp(-sum((lam / (SELECT sum(lam) FROM dims))
                              * ln(lam / (SELECT sum(lam) FROM dims)))),
                     6) AS entropy_effective_rank
        FROM dims
    """,
    doc="Effective rank of the embedding cloud from per-dimension "
    "variances: the participation ratio (sum(lam))^2/sum(lam^2) "
    "and the entropy effective rank exp(H(lam/sum)) — two "
    "standard condensations of 'how many dimensions actually "
    "carry variance'. DIAGONAL approximation by construction "
    "(per-coordinate variances, not covariance eigenvalues — "
    "exact when features are decorrelated, an upper bound "
    "otherwise; embed-power-iteration + deflation is the exact "
    "path), which is precisely what one grouped aggregation "
    "over an exploded dim index can deliver at any corpus "
    "size: 64 cells, map-side combinable. Low effective rank "
    "relative to ambient warns that matryoshka-style truncation "
    "(embed-matryoshka-recall) is nearly free.",
    tags=("embed",),
)
def embed_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        as_double(F.col("embedding")).alias("e")
    )
    dim = 64
    idx = spark.range(0, dim).select(F.col("id").cast("int").alias("i"))
    dims = (
        emb.crossJoin(F.broadcast(idx))
        .select(F.col("i"), F.element_at(F.col("e"), F.col("i") + 1).alias("x"))
        .groupBy("i")
        .agg(F.var_pop("x").alias("lam"))
    )
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    withp = dims.withColumn(
        "p", F.col("lam") / F.sum("lam").over(w_all)
    )
    return withp.agg(
        F.count("*").cast("long").alias("ambient_dim"),
        F.round(
            F.pow(F.sum("lam"), 2) / F.sum(F.col("lam") * F.col("lam")), 6
        ).alias("participation_ratio"),
        F.round(
            F.exp(-F.sum(F.col("p") * F.log("p"))), 6
        ).alias("entropy_effective_rank"),
    )


@query(
    "embed-jl-projection",
    oracle="""
        WITH anchors AS (
            SELECT DISTINCT vec_id, embedding FROM embeddings
            WHERE vec_id <= 20 AND embedding IS NOT NULL
        ),
        proj AS (
            SELECT a.vec_id, u.j,
                   sum(CAST(a.embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
                       * (1 - 2 * (((t.i * 1103515245 + u.j * 12345)
                                    % 65537) % 2))) / 4.0 AS pv
            FROM anchors a, range(64) t(i), range(16) u(j)
            GROUP BY a.vec_id, u.j
        ),
        pd2 AS (
            SELECT pa.vec_id AS ida, pb.vec_id AS idb,
                   sum(power(pa.pv - pb.pv, 2)) AS d2p
            FROM proj pa JOIN proj pb
              ON pa.j = pb.j AND pa.vec_id < pb.vec_id
            GROUP BY pa.vec_id, pb.vec_id
        ),
        od2 AS (
            SELECT a.vec_id AS ida, b.vec_id AS idb,
                   sum(power(CAST(a.embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
                             - CAST(b.embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE),
                             2)) AS d2o
            FROM anchors a JOIN anchors b ON a.vec_id < b.vec_id,
                 range(64) t(i)
            GROUP BY a.vec_id, b.vec_id
        ),
        ratios AS (
            SELECT sqrt(p.d2p) / sqrt(o.d2o) AS ratio
            FROM pd2 p JOIN od2 o ON p.ida = o.ida AND p.idb = o.idb
            WHERE o.d2o > 0
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(ratio), 6) AS mean_ratio,
               round(min(ratio), 6) AS min_ratio,
               round(max(ratio), 6) AS max_ratio,
               round(sqrt(avg(power(ratio - 1, 2))), 6) AS rms_distortion
        FROM ratios
    """,
    doc="Johnson-Lindenstrauss random projection 64 -> 16 dims with a "
    "DETERMINISTIC Rademacher sign matrix s(i,j) = 1-2*(((i*1103515245 "
    "+ j*12345) mod 65537) mod 2) — an LCG-style mix mod a PRIME, "
    "because any affine form mod 2 with odd multipliers collapses to "
    "parity of i+j (a rank-2 structured matrix that destroys the "
    "lemma; caught by the distortion test) — scaled by 1/sqrt(16), validated by the pairwise-distance "
    "distortion it was built to bound: ratio = ||Pa-Pb|| / ||a-b|| "
    "over the fixed 20-anchor pair set (190 pairs — anchor count is "
    "scale-INDEPENDENT, the eb-shrinkage/intrinsic-dim fixed-anchor "
    "discipline). The projection itself is a per-row shuffle-free map "
    "(16 literal-signed fold trees, same broadcast-centroids-as-code "
    "shape as simsearch-ivf-probe) — the sketch that turns a 64-dim "
    "ANN problem into a 4x-cheaper 16-dim one at 100 TB.",
    tags=("embed",),
)
def embed_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    # duplicate-hostile fixture: anchor ids must be unique or the pair
    # count inflates (copies are identical rows, so dedup is deterministic)
    anchors = (
        e.filter(F.col("vec_id") <= 20)
        .dropDuplicates(["vec_id"])
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
    )
    # 16 output dims, each a fold over the 64 inputs with literal signs
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(
                        *[
                            F.lit(float(1 - 2 * (((i * 1103515245 + j * 12345) % 65537) % 2)))
                            for i in range(64)
                        ]
                    ),
                    lambda a, s: a * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / 4.0
            for j in range(16)
        ]
    )
    pa = anchors.select("vec_id", "v", proj.alias("p"))
    d2 = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    l = pa.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va"), F.col("p").alias("p_a")
    )
    r = pa.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("vb"), F.col("p").alias("p_b")
    )
    pairs = l.join(F.broadcast(r), F.col("ida") < F.col("idb"))
    ratios = pairs.select(
        (F.sqrt(d2(F.col("p_a"), F.col("p_b"))) / F.sqrt(d2(F.col("va"), F.col("vb"))))
        .alias("ratio"),
        d2(F.col("va"), F.col("vb")).alias("d2o"),
    ).filter(F.col("d2o") > 0)
    return ratios.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("ratio"), 6).alias("mean_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
        F.round(F.sqrt(F.avg(F.pow(F.col("ratio") - 1, 2))), 6).alias(
            "rms_distortion"
        ),
    )


@query(
    "simsearch-batch-topk",
    oracle="""
        WITH queries AS (
            SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
            FROM embeddings WHERE vec_id <= 10
        ),
        corpus AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        scored AS (
            SELECT q.qid, c.vec_id,
                   -- explicit NULL-on-zero-norm cosine (x/0 is NULL in
                   -- DuckDB), matching the Spark try_divide convention:
                   -- list_cosine_similarity would clamp to -1 instead
                   round(list_dot_product(c.v, q.q)
                         / (sqrt(list_dot_product(c.v, c.v))
                            * sqrt(list_dot_product(q.q, q.q))), 6) AS sim
            FROM corpus c JOIN queries q ON c.vec_id <> q.qid
        ),
        ranked AS (
            SELECT qid, vec_id, sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, vec_id) AS rnk
            FROM scored
        )
        SELECT qid, vec_id, sim, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5
    """,
    doc="BATCHED top-k similarity search: 10 query vectors resolved in "
    "ONE corpus pass instead of 10 (the serving-path shape — rerank "
    "batches, dedup candidate generation, eval sweeps). The query "
    "block broadcasts (bounded batch x dim), every corpus partition "
    "scores all queries locally, and the per-query top-5 falls out "
    "of one rank window partitioned by qid — a k*batch-row shuffle, "
    "never the scored corpus. Deterministic (sim desc, vec_id) "
    "tie-break after round-6 quantization keeps rank order "
    "engine-identical. Complements simsearch-topk (single query) "
    "and simsearch-knn-join (all-pairs).",
    tags=("simsearch",),
)
def simsearch_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    queries = corpus.filter(F.col("vec_id") <= 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("q")
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("q")), 6).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


@query(
    "embed-pq-distortion",
    oracle=f"""
        WITH {_PQ_SQL_CTES},
        best AS (
            SELECT m, dist2
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                               ORDER BY dist2, centroid_id) AS rn
                  FROM scored)
            WHERE rn = 1
        ),
        norms AS (
            SELECT m, avg(list_sum(list_transform(sv, x -> x * x))) AS msn
            FROM sub GROUP BY m
        )
        SELECT b.m AS subspace,
               CAST(count(*) AS BIGINT) AS n_vecs,
               round(avg(b.dist2), 6) AS mse,
               round(sqrt(avg(b.dist2)), 6) AS rmse,
               round(avg(b.dist2) / max(n.msn), 6) AS relative_distortion
        FROM best b JOIN norms n ON b.m = n.m
        GROUP BY b.m
    """,
    doc="Product-quantization DISTORTION report: per sub-space mean "
    "squared reconstruction error of the assigned codebook entry, "
    "absolute (mse/rmse) and relative to the mean sub-vector energy "
    "— the number that tells you whether K=8 centroids per "
    "sub-space is enough BEFORE you build the full IVF-PQ index "
    "(relative distortion near 1 = codes carry no signal; "
    "simsearch-pq-adc's recall ceiling is set here). Same "
    "broadcast-codebook + per-vector argmin window as "
    "embed-pq-codes, plus one energy aggregate; linear in corpus "
    "size.",
    tags=("embed",),
)
def embed_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    # persist the sub-vector explode: cb, the scoring join and the
    # energy aggregate all consume it (3 embeddings scans before)
    subs = _pq_subvectors(emb).persist()
    cb = subs.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("centroid_id"), "m", F.col("sv").alias("cv")
    )
    scored = subs.join(F.broadcast(cb), "m").withColumn(
        "dist2", _sq_l2(F.col("sv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy("dist2", "centroid_id")
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("m", "dist2")
    )
    norms = subs.groupBy("m").agg(
        F.avg(
            F.aggregate(
                F.transform(F.col("sv"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("msn")
    )
    return (
        best.join(norms, "m")
        .groupBy(F.col("m").alias("subspace"))
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.avg("dist2"), 6).alias("mse"),
            F.round(F.sqrt(F.avg("dist2")), 6).alias("rmse"),
            F.round(F.avg("dist2") / F.max("msn"), 6).alias(
                "relative_distortion"
            ),
        )
    )


_DIM_AVGS_64 = ", ".join(f"avg(e[{i + 1}])" for i in range(64))


@query(
    "embed-centroid-margin",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        cent AS (
            SELECT label AS clabel, list_value({_DIM_AVGS_64}) AS c
            FROM v GROUP BY label
        ),
        scored AS (
            SELECT v.vec_id, v.label, cent.clabel,
                   list_sum(list_transform(list_zip(v.e, cent.c),
                            x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2
            FROM v, cent
        ),
        ranked AS (
            SELECT vec_id, label, clabel, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, clabel) AS rn
            FROM scored
        ),
        top2 AS (
            SELECT vec_id, label,
                   max(CASE WHEN rn = 1 THEN clabel END) AS pred,
                   max(CASE WHEN rn = 1 THEN sqrt(d2) END) AS d1,
                   max(CASE WHEN rn = 2 THEN sqrt(d2) END) AS d2nd
            FROM ranked WHERE rn <= 2
            GROUP BY vec_id, label
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               round(avg(d2nd - d1), 6) AS mean_margin,
               round(avg(CASE WHEN pred = label THEN d2nd - d1 END), 6)
                   AS mean_margin_correct
        FROM top2
        GROUP BY label
    """,
    doc="Nearest-centroid MARGIN diagnostics: per vector, Euclidean "
    "distance to all 10 label centroids (broadcast k x dim "
    "codebook, shuffle-free scoring), margin = d(2nd) - d(1st) — "
    "the confidence gap that tells you WHERE the classifier is "
    "brittle, which embed-centroid-eval's accuracy number hides "
    "(accuracy 0.9 with near-zero margins means relabeling noise "
    "flips everything). Reported per true label with the "
    "correct-prediction margin split out; low mean_margin labels "
    "are the ones needing more training data or a finer-grained "
    "index at 100 TB. Deterministic (d2, label) argmin tie-break.",
    tags=("embed",),
)
def embed_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    v = e.select("vec_id", "label", as_double(F.col("embedding")).alias("e"))
    cent = v.groupBy(F.col("label").alias("clabel")).agg(
        F.array(*[F.avg(F.col("e")[i]) for i in range(64)]).alias("c")
    )
    scored = v.join(F.broadcast(cent)).select(
        "vec_id", "label", "clabel", _sq_l2(F.col("e"), F.col("c")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    top2 = ranked.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("rn") == 1, F.col("clabel"))).alias("pred"),
        F.max(F.when(F.col("rn") == 1, F.sqrt("d2"))).alias("d1"),
        F.max(F.when(F.col("rn") == 2, F.sqrt("d2"))).alias("d2nd"),
    )
    margin = F.col("d2nd") - F.col("d1")
    return top2.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(F.avg(margin), 6).alias("mean_margin"),
        F.round(
            F.avg(F.when(F.col("pred") == F.col("label"), margin)), 6
        ).alias("mean_margin_correct"),
    )


@query(
    "embed-hard-negative-mining",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, label AS q_label,
                   CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id <= 5
        ),
        scored AS (
            SELECT q.q_id, q.q_label, e.vec_id AS neg_id, e.label AS neg_label,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.q_id AND e.label <> q.q_label
        )
        SELECT q_id, neg_id, q_label, neg_label, sim
        FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY sim DESC, neg_id) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    doc="Hard-negative mining for contrastive training: for each of 5 "
    "anchor vectors, the 5 most-similar vectors with a DIFFERENT "
    "label — the near-miss negatives that make embedding/reranker "
    "training converge (random negatives are trivially separable and "
    "teach nothing; the standard curation step for dense-retrieval "
    "and CLIP-style data). Plan: 5-row anchor block broadcast, "
    "cosine as codegen zip_with/aggregate, label-mismatch filter "
    "BEFORE ranking, per-anchor top-5 via a PARTITIONED window "
    "(WindowGroupLimit prunes per partition). At 100 TB the anchor "
    "block batches (simsearch-batch-topk's shape) and the scan "
    "swaps for the IVF/LSH-bucketed candidate set.",
    tags=("embed", "ml"),
)
def embed_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") <= 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        as_double(F.col("embedding")).alias("qv"),
    )
    scored = (
        emb.join(
            F.broadcast(q),
            (F.col("vec_id") != F.col("q_id"))
            & (F.col("label") != F.col("q_label")),
        )
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(
                cosine(as_double(F.col("embedding")), F.col("qv")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "neg_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "neg_id", "q_label", "neg_label", "sim")
    )
