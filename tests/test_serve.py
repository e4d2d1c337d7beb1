"""Serve-layer tests: the app's three interactions end-to-end on a
processed routes frame."""

from __future__ import annotations

from pyspark.sql import functions as F


def _routes(spark):
    rows = [
        ("R1", "Edinburgh", "Cycle Path", [[1.0, 2.0], [3.0, 4.0]]),
        ("R2", "Glasgow", "Cycle Lane", [[5.0, 6.0], [7.0, 8.0]]),
        ("R3", None, "Unknown Type", [[0.0, 0.0], [9.0, 9.0]]),
    ]
    return spark.createDataFrame(
        rows,
        "route_id string, local_authority string, route_type string, "
        "coordinates array<array<double>>",
    )


def test_local_authorities(spark):
    from transit_scrape_spark.serve import get_local_authorities

    vals = [r[0] for r in get_local_authorities(_routes(spark)).collect()]
    assert vals == ["Edinburgh", "Glasgow"]  # sorted, nulls dropped


def test_load_routes_filter_and_all(spark):
    from transit_scrape_spark.serve import load_cycling_routes

    r = _routes(spark)
    assert load_cycling_routes(r).count() == 3  # 'All'
    only = load_cycling_routes(r, authority="Edinburgh").collect()
    assert [x["route_id"] for x in only] == ["R1"]


def test_prepare_map_rows_and_center(spark):
    from transit_scrape_spark.serve import (
        DEFAULT_COLOR,
        map_center,
        prepare_map_rows,
    )

    out = prepare_map_rows(_routes(spark))
    rows = {r["route_id"]: r for r in out.collect()}
    assert rows["R1"]["color"] == "#377eb8"
    assert rows["R3"]["color"] == DEFAULT_COLOR  # dict-default fallback
    assert rows["R1"]["latlon"] == [[2.0, 1.0], [4.0, 3.0]]  # swapped
    assert "N/A" not in rows["R1"]["popup"]
    cx, cy = map_center(out)
    assert (cx, cy) == (4.5, 4.5)
