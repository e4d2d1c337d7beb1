"""Anchor-distance kernel: bounded-anchor exact k-NN over an embedding
corpus (the embed-hubness / embed-intrinsic-dim scan shape).

Design (r10, VERDICT r9 task 3): the anchor set is BOUNDED by
construction (fixed id cap, never a corpus fraction — a %-sample makes
the pair count quadratic under growth), so collecting it is k*dim
driver traffic, the accepted IVF-centroid pattern. The distance loop is
an Arrow-batched ``mapInPandas`` gemm: each corpus batch computes ALL
anchor squared distances as one BLAS matmul

    d2 = aa[None, :] - 2 * E @ A.T + bb[:, None]

instead of anchors x rows interpreted higher-order-function folds
(measured 2.5x end-to-end, 6x on the kernel; an explicit per-dimension
element_at expression tree was tried and measured 4x SLOWER than the
HOF fold — codegen chokes on wide scalar trees). Each partition emits
only its local top-k per anchor by (dd, bid) — the exchange into the
global rank window carries <= anchors * k * partitions candidate rows,
never the full anchors x corpus product. Declared Python surface:
PYTHON_SURFACE_OPS in tools/audit_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anchor_sqdist_topk(emb: DataFrame, anchor_rows, k: int) -> DataFrame:
    """(vec_id, e: array<double>) + collected anchor rows (vec_id, e)
    -> (aid, bid, dd, rn): the global top-k nearest corpus vectors per
    anchor by squared euclidean distance, rn = 1..k ordered by
    (dd, bid) — bid tie-break matches ANSI ``row_number() OVER
    (PARTITION BY aid ORDER BY dd, bid)`` exactly, including on the
    exact-duplicate-vector ties the hostility axes inject. Self-pairs
    (aid == bid) are excluded. Empty anchor set -> empty result."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window

    spark = emb.sparkSession
    if not anchor_rows:
        return spark.createDataFrame([], "aid long, bid long, dd double, rn int")
    aid = np.array([r.vec_id for r in anchor_rows], dtype=np.int64)
    A = np.vstack([np.asarray(r.e, dtype=np.float64) for r in anchor_rows])
    aa = (A * A).sum(axis=1)

    def partial_topk(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["e"]])
            bid = pdf["vec_id"].to_numpy(dtype=np.int64)
            bb = (E * E).sum(axis=1)
            dd = aa[None, :] - 2.0 * (E @ A.T) + bb[:, None]  # (B, m)
            cand = pd.DataFrame(
                {
                    "aid": np.repeat(aid, len(bid)),
                    "bid": np.tile(bid, len(aid)),
                    "dd": dd.T.reshape(-1),
                }
            )
            cand = cand[cand["aid"] != cand["bid"]]
            if best is not None:
                cand = pd.concat([best, cand], ignore_index=True)
            best = (
                cand.sort_values(["aid", "dd", "bid"], kind="mergesort")
                .groupby("aid", sort=False)
                .head(k)
            )
        if best is not None:
            yield best

    pairs = emb.mapInPandas(partial_topk, schema="aid long, bid long, dd double")
    w = Window.partitionBy("aid").orderBy("dd", "bid")
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
