"""Structural invariants of the relational sketch / quantization ops —
the guarantees their docstrings claim, asserted on real output (the
oracle parity test proves cross-engine equality; these prove the MATH
holds, which equality alone would not: two engines could agree on a
wrong sketch).
"""

from __future__ import annotations

from transit_scrape_spark.queries.registry import registry


def _rows(spark, sf_dir, op_id):
    return registry()[op_id].fn(spark, sf_dir).collect()


def test_count_min_never_underestimates(spark, sf_dir):
    rows = _rows(spark, sf_dir, "agg-count-min-sketch")
    assert rows, "no heavy tokens sampled"
    for r in rows:
        assert r["never_underestimates"] is True
        assert r["cms_est"] >= r["exact_n"]


def test_bloom_has_no_false_negatives(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "join-bloom-prefilter")
    assert r["no_false_negatives"] is True
    # the filter must actually pass every member
    assert r["n_pass"] >= r["n_members"]
    assert r["n_false_pos"] == r["n_pass"] - r["n_members"]


def test_pq_codes_within_codebook(spark, sf_dir):
    rows = _rows(spark, sf_dir, "embed-pq-codes")
    assert rows
    for r in rows:
        for m in range(4):
            assert 0 <= r[f"code_{m}"] < 8
    # codebook vectors must encode to themselves (distance 0 to own centroid)
    own = {r["vec_id"]: r for r in rows if r["vec_id"] < 8}
    for vid, r in own.items():
        for m in range(4):
            assert r[f"code_{m}"] == vid, "codebook vector not self-coded"


def test_matryoshka_recall_bounded(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "embed-matryoshka-recall")
    assert 0 <= r["overlap_n"] <= 10
    assert abs(r["recall_at_10"] - r["overlap_n"] / 10.0) < 1e-9


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from transit_scrape_spark.sources.tables import load_table

    got = {
        r["day"]: r["n_distinct_users"]
        for r in _rows(spark, sf_dir, "agg-bitmap-distinct")
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_lsh_tuning_recall_monotone_in_band_count(spark, sf_dir):
    """More, shorter bands can only add candidate collisions: the 6x2
    config's candidate set is a superset-in-expectation — on the planted
    corpus its recall must be >= the 4x3 config's."""
    rows = {r["config"]: r for r in _rows(spark, sf_dir, "dedup-lsh-tuning")}
    assert set(rows) == {"6x2", "4x3"}
    assert rows["6x2"]["recall"] >= rows["4x3"]["recall"]
    for r in rows.values():
        assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0


# ---------------------------------------------------------------------------
# Meta-tests of the gate itself: the r1 postmortem was a harness that
# PASSED ops the external comparator crashes on. These prove the local
# harness rejects each canonicalizer hazard class.
# ---------------------------------------------------------------------------


def test_gate_rejects_array_output(spark):
    import pytest
    from pyspark.sql import functions as F

    from tests.oracle_harness import assert_driver_safe_schema

    df = spark.range(1).select(F.array(F.lit(1), F.lit(2)).alias("xs"))
    with pytest.raises(AssertionError, match="complex types"):
        assert_driver_safe_schema(df, "meta-test")


def test_gate_rejects_map_and_struct_output(spark):
    import pytest
    from pyspark.sql import functions as F

    from tests.oracle_harness import assert_driver_safe_schema

    for col in (
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("s"),
    ):
        with pytest.raises(AssertionError, match="complex types"):
            assert_driver_safe_schema(spark.range(1).select(col), "meta-test")


def test_gate_rejects_out_of_pandas_range_timestamp():
    import pytest

    from tests.oracle_harness import _norm

    from datetime import datetime

    _norm(datetime(2200, 1, 1), "meta-test")  # in range: fine
    with pytest.raises(AssertionError, match="pandas ns range"):
        _norm(datetime(9999, 12, 31), "meta-test")


def test_gate_rejects_list_cell():
    import pytest

    from tests.oracle_harness import _norm

    with pytest.raises(AssertionError, match="unhashable"):
        _norm([1, 2, 3], "meta-test")
