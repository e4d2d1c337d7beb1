"""Invariant tests for the late round-4 operator wave.

Oracle parity (tests/test_oracle_parity.py) already proves each op
matches DuckDB; these tests pin the MATHEMATICAL contracts that parity
alone cannot see — axioms (Shapley efficiency), exactness identities
(tile areas), and theory-backed bounds (JL distortion) — so a future
refactor that changes semantics while staying self-consistent across
both engines still fails loudly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from transit_scrape_spark.queries.registry import registry


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_jl_projection_distortion_bounded(spark, sf_dir, reg):
    """JL with k=16: pairwise distance ratios concentrate around 1.
    Loose bounds — the lemma gives eps ~ sqrt(8 ln n / k) ~ 1.2 at
    n=20, k=16; in practice ratios sit far inside. A broken sign
    matrix or scaling bug lands far outside."""
    row = reg["embed-jl-projection"].fn(spark, sf_dir).collect()[0]
    assert row["n_pairs"] > 0
    assert 0.6 <= row["mean_ratio"] <= 1.4
    assert row["min_ratio"] > 0.2
    assert row["max_ratio"] < 2.5
    assert row["rms_distortion"] < 0.6


def test_tile_grid_covers_image_exactly(spark, sf_dir, reg):
    """Clipped tiles tile the image: sum of tile areas == w * h."""
    df = reg["multimodal-tile-grid"].fn(spark, sf_dir)
    per_doc = df.groupBy("doc_id").agg(
        F.sum(F.col("tile_w") * F.col("tile_h")).alias("area")
    )
    bad = per_doc.filter(
        F.col("area")
        != (F.col("doc_id") % 640 + 1) * (F.col("doc_id") % 480 + 1)
    ).count()
    assert bad == 0


def test_audio_frames_stay_in_bounds(spark, sf_dir, reg):
    df = reg["multimodal-audio-framing"].fn(spark, sf_dir)
    n_samples = F.col("doc_id") % 32000 + 16000
    assert df.filter(F.col("end_sample") > n_samples).count() == 0
    assert df.filter(F.col("start_sample") < 0).count() == 0


def test_shapley_efficiency_axiom(spark, sf_dir, reg):
    """sum_i shapley_i == v(grand coalition) - v(empty) exactly (the
    efficiency axiom) — with v(S) = conversion rate of exact-set S."""
    shap = {
        r["channel"]: r["shapley"]
        for r in reg["attribution-shapley"].fn(spark, sf_dir).collect()
    }
    from transit_scrape_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    tflag = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    per_user = ev.groupBy("user_id").agg(
        tflag("click").alias("c"),
        tflag("view").alias("v"),
        tflag("signup").alias("s"),
        tflag("purchase").alias("conv"),
    )
    rates = {
        (r["c"], r["v"], r["s"]): r["rate"]
        for r in per_user.groupBy("c", "v", "s")
        .agg(F.avg(F.col("conv").cast("double")).alias("rate"))
        .collect()
    }
    v_grand = rates.get((1, 1, 1), 0.0)
    v_empty = rates.get((0, 0, 0), 0.0)
    assert sum(shap.values()) == pytest.approx(v_grand - v_empty, abs=5e-6)


def test_semdedup_removal_consistency(spark, sf_dir, reg):
    rows = reg["dedup-semdedup-bucket"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_removed"] <= r["n_dup_pairs"] or r["n_dup_pairs"] == 0
        assert r["n_removed"] < max(r["n_vecs"], 1)


def test_drawdown_episodes_disjoint(spark, sf_dir, reg):
    rows = sorted(
        reg["timeseries-drawdown-episodes"].fn(spark, sf_dir).collect(),
        key=lambda r: r["start_day"],
    )
    for r in rows:
        assert r["start_day"] <= r["end_day"]
        assert 0 < r["worst_ratio"] < 0.5  # inside a <50%-of-peak episode
    for a, b in zip(rows, rows[1:]):
        assert a["end_day"] < b["start_day"]


def test_span_coverage_fractions_valid(spark, sf_dir, reg):
    df = reg["dedup-span-coverage"].fn(spark, sf_dir)
    assert (
        df.filter(
            (F.col("dup_coverage") < 0)
            | (F.col("dup_coverage") > 1)
            | (F.col("n_dup_spans") > F.col("n_spans"))
        ).count()
        == 0
    )


def test_language_balance_weights_flatten(spark, sf_dir, reg):
    """Temperature sampling must flatten: the largest language's
    weight <= 1 (downsampled) and the smallest's >= 1 (upsampled);
    temp shares still sum to 1."""
    rows = reg["corpus-language-balance-sampler"].fn(spark, sf_dir).collect()
    big = max(rows, key=lambda r: r["n_docs"])
    small = min(rows, key=lambda r: r["n_docs"])
    assert big["sample_weight"] <= 1.0 + 1e-6
    assert small["sample_weight"] >= 1.0 - 1e-6
    assert sum(r["temp_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
