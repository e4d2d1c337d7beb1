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


def test_jsonl_sink_overwrite_clears_stale_parts(spark, tmp_path):
    """A re-run into the same path with FEWER partitions must not leave
    stale part files (ADVICE r2: commit() previously renamed into data/
    without clearing it), and staging must be gone after commit."""
    import os

    from transit_scrape_spark.sources.routes_datasource import JsonlSinkDataSource

    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass
    path = str(tmp_path / "sink")
    df = spark.range(8).select(F.col("id").alias("doc_id"))
    df.repartition(4).write.format("jsonl_sink").mode("overwrite").option(
        "path", path
    ).save()
    assert len(os.listdir(os.path.join(path, "data"))) == 5  # 4 parts + _SUCCESS
    # second run: 2 partitions, half the rows — stale parts must vanish
    df.limit(4).repartition(2).write.format("jsonl_sink").mode("overwrite").option(
        "path", path
    ).save()
    data = os.path.join(path, "data")
    parts = [n for n in os.listdir(data) if n.startswith("part-")]
    assert len(parts) == 2
    assert not os.path.exists(os.path.join(path, "_staging"))
    back = spark.read.schema("doc_id long").json(f"{data}/*.jsonl")
    assert back.count() == 4


def test_jsonl_sink_append_accumulates(spark, tmp_path):
    """Append mode adds parts under fresh indices and accumulates the
    _SUCCESS row count instead of clobbering prior data."""
    import os

    from transit_scrape_spark.sources.routes_datasource import JsonlSinkDataSource

    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass
    path = str(tmp_path / "sink")
    df = spark.range(6).select(F.col("id").alias("doc_id"))
    for _ in range(2):
        df.repartition(3).write.format("jsonl_sink").mode("append").option(
            "path", path
        ).save()
    data = os.path.join(path, "data")
    parts = sorted(n for n in os.listdir(data) if n.startswith("part-"))
    assert parts == [f"part-{i:05d}.jsonl" for i in range(6)]
    with open(os.path.join(data, "_SUCCESS")) as f:
        assert int(f.read()) == 12
    back = spark.read.schema("doc_id long").json(f"{data}/*.jsonl")
    assert back.count() == 12


def test_pit_and_attribution_equal_ts_ties(spark, tmp_path):
    """Equal-timestamp ties (absent from the generated fixtures) must still
    match the oracles' strict-< / <= semantics (ADVICE r2): an order ON the
    spine instant counts, a purchase ON the spine instant does not, and a
    touch sharing a purchase's timestamp is credited regardless of event_id."""
    import duckdb

    from tests.oracle_harness import compare
    from transit_scrape_spark.queries.registry import registry

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                -- user 1: PIT-join ties
                (1, TIMESTAMP '2024-03-10 00:00:00', 1, 'view',     1.0, NULL),
                (2, TIMESTAMP '2024-03-10 00:00:00', 1, 'purchase', 2.0, NULL),
                (3, TIMESTAMP '2024-03-05 00:00:00', 1, 'purchase', 3.0, NULL),
                -- user 2: touch ties purchase's ts with LARGER event_id
                (10, TIMESTAMP '2024-03-10 12:00:00', 2, 'click',    1.0, NULL),
                (12, TIMESTAMP '2024-03-10 12:00:00', 2, 'purchase', 9.0, NULL),
                (15, TIMESTAMP '2024-03-10 12:00:00', 2, 'view',     1.0, NULL),
                -- user 3: only a stale touch outside the 7-day lookback
                (20, TIMESTAMP '2024-03-01 00:00:00', 3, 'click',    1.0, NULL),
                (21, TIMESTAMP '2024-03-09 00:00:01', 3, 'purchase', 5.0, NULL)
            ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (100, 1, 'O', 50.0, TIMESTAMP '2024-03-10 00:00:00', '1-URGENT'),
                (101, 1, 'O', 60.0, TIMESTAMP '2024-03-11 00:00:00', '1-URGENT')
            ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority)
        ) TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    reg = registry()
    for op in ("featurestore-pit-join", "attribution-last-touch"):
        spec = reg[op]
        compare(spec.fn(spark, str(tmp_path)), con, spec.oracle, f"{op}-ties")
    con.close()
