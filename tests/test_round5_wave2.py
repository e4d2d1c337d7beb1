"""Semantic invariants for the round-5 continuation ops.

Oracle parity (tests/test_oracle_parity.py) proves Spark == DuckDB;
these tests prove both are RIGHT — estimator-level invariants that a
shared formula bug would violate on both sides simultaneously, which
hash parity can never catch.
"""

from __future__ import annotations

import math

import pytest

from transit_scrape_spark.queries.registry import registry


def _run(spark, sf_dir, op_id):
    return registry()[op_id].fn(spark, sf_dir).collect()


def test_nelson_aalen_monotone_and_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "stats-nelson-aalen")
    assert rows, "no event-time rows"
    prev_h, prev_s = -1.0, 2.0
    for r in rows:
        # cumulative hazard non-decreasing, Breslow survival in (0, 1]
        # and non-increasing, se non-negative
        assert r.cum_hazard >= prev_h
        assert 0.0 < r.breslow_survival <= 1.0
        assert r.breslow_survival <= prev_s + 1e-9
        assert r.hazard_se >= 0.0
        prev_h, prev_s = r.cum_hazard, r.breslow_survival


def test_competing_risks_cifs_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "analytics-competing-risks")
    assert rows
    prev1 = prev2 = -1.0
    for r in rows:
        # each CIF monotone non-decreasing; total incidence <= 1
        assert r.cif_purchase >= prev1 - 1e-9
        assert r.cif_error >= prev2 - 1e-9
        assert r.cif_purchase + r.cif_error <= 1.0 + 1e-6
        prev1, prev2 = r.cif_purchase, r.cif_error


def test_mcf_monotone(spark, sf_dir):
    rows = _run(spark, sf_dir, "event-mcf-recurrent")
    assert rows
    prev = -1.0
    for r in rows:
        assert r.mcf >= prev - 1e-9
        assert r.n_risk > 0
        prev = r.mcf


def test_brier_murphy_identity(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "eval-brier-decomposition")
    # the decomposition must reconstruct the Brier score exactly
    # (bins == distinct forecast values)
    assert abs(row.identity_residual) <= 1e-5
    assert 0.0 <= row.brier <= 1.0
    assert row.reliability >= 0.0 and row.resolution >= 0.0
    assert 0.0 <= row.uncertainty <= 0.25 + 1e-9


def test_delong_ci_brackets_auc(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "eval-auc-delong-ci")
    assert 0.0 <= row.auc <= 1.0
    assert row.se > 0.0
    assert row.ci_lo <= row.auc <= row.ci_hi


def test_ols_inference_matches_numpy(spark, sf_dir):
    """Cross-check coefficients and SEs against numpy lstsq on the
    same per-user design matrix."""
    import numpy as np
    from pyspark.sql import functions as F

    from transit_scrape_spark.sources.tables import load_table

    rows = {r.term: r for r in _run(spark, sf_dir, "ml-ols-inference")}
    ev = load_table(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") != "purchase", 1).otherwise(0)
            ).alias("npc"),
            F.avg(
                F.when(F.col("event_type") != "purchase", F.col("value"))
            ).alias("x2"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("double")
            .alias("y"),
        )
        .filter(F.col("npc") > 0)
        .collect()
    )
    x1 = np.log1p(np.array([r.npc for r in pu], dtype=float))
    x2 = np.array([r.x2 for r in pu], dtype=float)
    y = np.array([r.y for r in pu], dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    n, k = X.shape
    sigma2 = float(resid @ resid) / (n - k)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    se = np.sqrt(np.diag(cov))
    for i, term in enumerate(["intercept", "x1_log_nonpurchase", "x2_mean_value"]):
        assert rows[term].estimate == pytest.approx(beta[i], abs=5e-6)
        assert rows[term].std_err == pytest.approx(se[i], abs=5e-6)


def test_learning_curve_nested_sizes(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "ml-learning-curve"),
        key=lambda r: r.train_pct_of_pool,
    )
    assert [r.train_pct_of_pool for r in rows] == [16, 32, 48, 64, 80]
    # nested splits: train size strictly grows, test size fixed
    sizes = [r.n_train for r in rows]
    assert sizes == sorted(sizes) and sizes[0] < sizes[-1]
    assert len({r.n_test for r in rows}) == 1
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0


def test_naive_bayes_beats_coin_logloss(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "ml-naive-bayes")
    assert row.n_train > 0 and row.n_test > 0
    assert 0.0 <= row.accuracy <= 1.0
    # log-loss of a fair coin is ln 2; a fitted prior must not exceed
    # it by much (smoothing slack on a tiny test split)
    assert row.log_loss <= math.log(2.0) + 0.35


def test_tukey_pairs_complete(spark, sf_dir):
    rows = _run(spark, sf_dir, "stats-tukey-hsd")
    # 5 event types -> C(5,2) pairs, each ordered a < b
    assert len(rows) == 10
    for r in rows:
        assert r.group_a < r.group_b
        assert r.se > 0 and r.q_stat >= 0
        assert r.q_stat == pytest.approx(abs(r.mean_diff) / r.se, rel=5e-3)


def test_cost_threshold_monotone_in_fn_cost(spark, sf_dir):
    rows = {r.fn_cost: r for r in _run(spark, sf_dir, "ml-cost-threshold")}
    assert set(rows) == {1, 5, 10}
    # costlier misses -> threshold can only move DOWN (flag more) and
    # expected cost can only grow
    assert rows[1].best_threshold >= rows[5].best_threshold >= rows[10].best_threshold
    assert rows[1].expected_cost <= rows[5].expected_cost <= rows[10].expected_cost


def test_deming_symmetric_slope(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "stats-deming-regression")
    # lambda=1 Deming slope magnitude must exceed |OLS slope| =
    # |r|*sd_y/sd_x only in the attenuation sense; minimally: finite,
    # same sign as the correlation
    assert math.isfinite(row.slope)
    assert (row.slope > 0) == (row.pearson_r > 0)


def test_fieller_ci_brackets_ratio(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "stats-fieller-ratio-ci")
    assert 0.0 <= row.g_fieller < 1.0, "denominator must be well-resolved"
    assert row.ci_lo <= row.ratio <= row.ci_hi


def test_chow_components_consistent(spark, sf_dir):
    (row,) = _run(spark, sf_dir, "stats-chow-test")
    # split model can never fit worse than pooled
    assert row.sse_split <= row.sse_pooled + 1e-6
    assert row.chow_f >= 0.0
    assert row.n_pre + row.n_post == row.n_days


def test_kappa_and_bowker_same_grid(spark, sf_dir):
    (kap,) = _run(spark, sf_dir, "stats-cohen-kappa-weighted")
    (bow,) = _run(spark, sf_dir, "stats-bowker-symmetry")
    assert kap.n_docs == bow.n_docs
    assert -1.0 <= kap.kappa_w <= 1.0
    # the two size raters genuinely agree (correlated by construction)
    assert kap.kappa_w > 0.3
    assert 1 <= bow.dof <= 3  # observed discordant pairs, <= k(k-1)/2


def test_class_balance_hits_minority(spark, sf_dir):
    rows = _run(spark, sf_dir, "sample-class-balance")
    m = min(r.n_before for r in rows)
    for r in rows:
        assert r.n_kept <= r.n_before
        # Bernoulli thresholding lands near the minority size
        assert abs(r.n_kept - m) <= max(10, int(0.25 * m))


def test_watermark_null_distribution(spark, sf_dir):
    rows = _run(spark, sf_dir, "text-watermark-detect")
    # un-watermarked corpus: per-language mean z near 0, flag rate
    # near the 2.3% one-sided tail
    for r in rows:
        assert abs(r.mean_z) < 1.0
        assert r.frac_flagged < 0.30


def test_interpolated_lm_dominates_pure_bigram_floor(spark, sf_dir):
    rows = _run(spark, sf_dir, "text-lm-interpolated")
    assert rows
    for r in rows[:50]:
        # interpolation keeps every log-prob finite and above the pure
        # unigram floor times the bigram weight
        assert math.isfinite(r.avg_interp_logprob)
        assert r.avg_interp_logprob < 0.0


def test_jonckheere_terpstra_vs_brute_force(spark, sf_dir):
    """JT statistic must equal the brute-force pairwise Mann-Whitney sum.

    Regression for the r5 bin-intersection bug: the old equi-join on
    (a.v = b.v) dropped every later-group bin whose value never occurs
    in the earlier group, losing its below-count term (-85% on sf0.01).
    The grid-densified form must match an O(n log n) searchsorted
    recount of JT = sum over ordered group pairs of #(a<b) + 0.5#(a=b).
    """
    import numpy as np

    (row,) = _run(spark, sf_dir, "stats-jonckheere-terpstra")

    from transit_scrape_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    obs = (
        load_table(spark, sf_dir, "events")
        .select(
            F.floor(F.hour("ts") / 6).cast("int").alias("g"),
            F.round("value", 2).alias("v"),
        )
        .toPandas()  # test-only materialization, sf0.01
    )
    groups = sorted(obs.g.unique())
    arrs = {g: np.sort(obs.v[obs.g == g].values) for g in groups}
    jt = 0.0
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            a, b = arrs[ga], arrs[gb]
            lt = np.searchsorted(a, b, side="left")
            le = np.searchsorted(a, b, side="right")
            jt += float(lt.sum()) + 0.5 * float((le - lt).sum())

    assert abs(row.jt_stat - jt) <= 0.5 + 1e-6 * abs(jt)

    # no-tie null moments, recomputed independently (the op's documented
    # variance deliberately omits the tie correction — assert THAT form)
    n = float(len(obs))
    sn2 = sum(float(len(a)) ** 2 for a in arrs.values())
    sn23 = sum(
        float(len(a)) ** 2 * (2.0 * len(a) + 3.0) for a in arrs.values()
    )
    e_jt = (n * n - sn2) / 4.0
    var_jt = (n * n * (2.0 * n + 3.0) - sn23) / 72.0
    assert abs(row.expected_jt - e_jt) <= 1e-3
    assert abs(row.jt_z - (jt - e_jt) / math.sqrt(var_jt)) <= 1e-3
