"""Operator-level unit tests beyond the oracle harness: as-of join twin
parity, LSH probe vs brute force recall sanity, multimodal stub, WFS URL."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_asof_pandas_twin_matches_union_window(spark, sf_dir):
    """The applyInPandas merge_asof twin must agree with the union+window
    production implementation."""
    from transit_scrape_spark.queries.asof import (
        asof_join_pandas,
        asof_join_union_window,
    )
    from transit_scrape_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts").limit(
        2000
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate")
    )
    a = asof_join_union_window(
        ev, orders, "user_id", "ts", "o_orderdate", ["o_orderdate"]
    )
    b = asof_join_pandas(ev, orders, "user_id", "ts", "o_orderdate", "o_orderdate")
    ra = {(r["event_id"], r["asof_o_orderdate"]) for r in a.collect()}
    rb = {(r["event_id"], r["asof_o_orderdate"]) for r in b.collect()}
    assert ra == rb


def test_lsh_probe_scores_match_exact_cosine(spark, sf_dir):
    """Probed hits must carry the exact cosine the brute-force path would
    compute for the same ids (the probe approximates RECALL, never the
    score)."""
    from transit_scrape_spark.functions.vectors import as_double, cosine
    from transit_scrape_spark.queries.registry import registry
    from transit_scrape_spark.sources.tables import load_table

    r = registry()
    probe = {
        row["vec_id"]: row["sim"]
        for row in r["simsearch-lsh-probe"].fn(spark, sf_dir).collect()
    }
    assert 0 < len(probe) <= 5
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 1).select(as_double(F.col("embedding")).alias("qv"))
    exact = {
        row["vec_id"]: row["sim"]
        for row in emb.filter(F.col("vec_id").isin(list(probe)))
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(as_double(F.col("embedding")), F.col("qv")), 6).alias("sim"),
        )
        .collect()
    }
    assert probe == exact


def test_multimodal_real_decode_gate():
    from transit_scrape_spark.operators.multimodal import _real_decode_available

    # this container has no PIL — the deterministic fake path must engage
    assert _real_decode_available() is False


def test_wfs_url_and_gate(tmp_path):
    from transit_scrape_spark.sources.wfs import build_getfeature_url, fetch_wfs_to_geojson

    url = build_getfeature_url("https://example.test/geoserver/wfs", "ns:cycling")
    assert "request=GetFeature" in url and "typeNames=ns%3Acycling" in url
    with pytest.raises(NotImplementedError):
        fetch_wfs_to_geojson("https://10.255.255.1/wfs", str(tmp_path / "x.geojson"), timeout=2)


def test_load_pipeline_rename_and_nulls(spark, tmp_path):
    """align_to_target: rename type->route_type, drop unknowns, add typed
    NULLs (reference db_helpers.py:163-169)."""
    from transit_scrape_spark.pipelines.load_routes import align_to_target

    df = spark.createDataFrame(
        [("R1", "Cycle Path", "junk")],
        "route_id string, type string, unknown_col string",
    )
    out = align_to_target(df)
    row = out.collect()[0]
    assert row["route_type"] == "Cycle Path"
    assert "unknown_col" not in out.columns
    assert row["locality"] is None
    assert row["created_at"] is not None
