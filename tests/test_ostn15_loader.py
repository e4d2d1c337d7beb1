"""OSTN15 grid-file ingestion tests (VERDICT r3 item 2).

The real OSTN15 data file is Crown-copyright and absent from this
environment, so the loader path is proven two ways:

1. END-TO-END SELF-CONSISTENCY (always runs): the synthetic shift field
   is written to disk in the published OSTN15 CSV record format, parsed
   back through the REAL loader (`_parse_ostn15_lines` ->
   `build_cells_from_nodes`), and the resulting cells must reproduce
   `build_shift_grid_cells` exactly and drive `gridshift_apply` to the
   same shifts. Dropping in the real file is then purely a data change.

2. GOLDEN CONTROL POINT (gated on $SPARK_GRAFT_OSTN15_GRID): the OS
   'A guide to coordinate systems in Great Britain' worked example
   (Caister water tower) asserted to <= 10 cm through the full
   grid-corrected pipeline. Skips until a real grid file is supplied.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from transit_scrape_spark.functions.geo import (
    GRID_CELL_M,
    GRID_NI,
    GRID_NJ,
    _parse_ostn15_lines,
    build_cells_from_nodes,
    build_shift_grid_cells,
    gridshift_apply,
    load_ostn15_datafile,
    load_shift_grid,
    ostn15_like_shift_exprs,
)


def _write_synthetic_datafile(spark, path: str) -> None:
    """The synthetic shift field, serialized in the OSTN15 record
    layout (record,easting,northing,e_shift,n_shift,geoid) at the demo
    grid's 10 km node spacing — full float64 round-trip via repr."""
    nodes = spark.range((GRID_NI + 1) * (GRID_NJ + 1)).select(
        (F.col("id") % (GRID_NI + 1)).cast("double").alias("i"),
        (F.col("id") / (GRID_NI + 1)).cast("long").cast("double").alias("j"),
    )
    e = F.col("i") * GRID_CELL_M
    n = F.col("j") * GRID_CELL_M
    se, sn = ostn15_like_shift_exprs(e, n)
    rows = nodes.select(e.alias("e"), n.alias("n"), se.alias("se"), sn.alias("sn")).collect()
    with open(path, "w") as fh:
        fh.write("Record,Easting,Northing,E_Shift,N_Shift,Geoid\n")  # header
        for k, r in enumerate(rows):
            fh.write(f"{k + 1},{r['e']!r},{r['n']!r},{r['se']!r},{r['sn']!r},47.0\n")


@pytest.fixture(scope="module")
def datafile(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ostn15") / "synthetic_ostn15.csv")
    _write_synthetic_datafile(spark, p)
    return p


def test_loader_reproduces_builtin_cells(spark, datafile):
    nodes = load_ostn15_datafile(spark, datafile, cell_m=GRID_CELL_M)
    # 71 x 126 nodes for the demo extent
    assert nodes.count() == (GRID_NI + 1) * (GRID_NJ + 1)
    cells_loaded = build_cells_from_nodes(nodes, GRID_CELL_M)
    cells_direct = build_shift_grid_cells(spark)
    assert cells_loaded.count() == cells_direct.count() == GRID_NI * GRID_NJ
    # exact corner-value equality (repr round-trips float64)
    cols = [f"{p}{t}" for p in ("se", "sn") for t in ("00", "10", "01", "11")]
    joined = cells_loaded.alias("a").join(
        cells_direct.alias("b"), ["ci", "cj"]
    )
    diffs = joined.select(
        *[
            F.max(F.abs(F.col(f"a.{c}") - F.col(f"b.{c}"))).alias(c)
            for c in cols
        ]
    ).collect()[0]
    assert all(diffs[c] == 0.0 for c in cols), dict(diffs.asDict())


def test_loader_cells_drive_same_shifts(spark, datafile):
    nodes = load_ostn15_datafile(spark, datafile, cell_m=GRID_CELL_M)
    cells = build_cells_from_nodes(nodes, GRID_CELL_M)
    pts = spark.range(50).select(
        (300000.0 + F.col("id") * 997.0).alias("e"),
        (600000.0 + F.col("id") * 1003.0).alias("n"),
    )
    via_file = gridshift_apply(pts, cells, GRID_CELL_M).select(
        "e", "shift_e", "shift_n"
    )
    direct_se, direct_sn = ostn15_like_shift_exprs(F.col("e"), F.col("n"))
    # bilinear over a 10 km grid vs the closed form: < 1 cm (SURVEY M2
    # curvature bound); the loader path must land inside the same bound
    err = (
        gridshift_apply(pts, build_shift_grid_cells(spark), GRID_CELL_M)
        .alias("d")
        .join(via_file.alias("f"), "e")
        .select(
            F.max(F.abs(F.col("d.shift_e") - F.col("f.shift_e"))).alias("de"),
            F.max(F.abs(F.col("d.shift_n") - F.col("f.shift_n"))).alias("dn"),
        )
        .collect()[0]
    )
    assert err["de"] == 0.0 and err["dn"] == 0.0


def test_malformed_and_header_lines_dropped(spark, tmp_path):
    p = tmp_path / "grid.csv"
    p.write_text(
        "Record,Easting,Northing,E_Shift,N_Shift,Geoid\n"
        "1,0.0,0.0,91.0,-72.0,47.0\n"
        "\n"
        "garbage line without commas\n"
        "2,1000.0,0.0,91.1,-72.1,47.0\n"
    )
    nodes = load_ostn15_datafile(spark, str(p))
    got = {(r["i"], r["j"]): (r["se"], r["sn"]) for r in nodes.collect()}
    assert got == {(0, 0): (91.0, -72.0), (1, 0): (91.1, -72.1)}


def test_out_of_extent_points_survive_with_null_shift(spark):
    cells = build_shift_grid_cells(spark)
    pts = spark.createDataFrame(
        [(1, 350000.0, 650000.0), (2, 9_999_999.0, 650000.0)], "id int, e double, n double"
    )
    out = gridshift_apply(pts, cells, GRID_CELL_M).orderBy("id").collect()
    assert len(out) == 2  # nothing dropped
    assert out[0]["shift_e"] is not None
    assert out[1]["shift_e"] is None and out[1]["shift_n"] is None


def test_dispatcher_falls_back_to_synthetic(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_OSTN15_GRID", raising=False)
    cells, cell_m = load_shift_grid(spark)
    assert cell_m == GRID_CELL_M
    assert cells.count() == GRID_NI * GRID_NJ


def test_inverse_shift_roundtrips_forward_shift(spark):
    """ostn15_inverse_shift must invert the forward field to sub-mm on
    the synthetic grid: forward-shift known ETRS-like points into
    OSGB-like ones, invert, and compare (always runs — the real-grid
    golden below reuses exactly this machinery)."""
    from transit_scrape_spark.functions.geo import ostn15_inverse_shift

    cells = build_shift_grid_cells(spark)
    etrs = spark.range(40).select(
        (250000.0 + F.col("id") * 1499.0).alias("e"),
        (550000.0 + F.col("id") * 2503.0).alias("n"),
    )
    fwd = gridshift_apply(etrs, cells, GRID_CELL_M).select(
        F.col("e").alias("e_true"),
        F.col("n").alias("n_true"),
        (F.col("e") + F.col("shift_e")).alias("e"),
        (F.col("n") + F.col("shift_n")).alias("n"),
    )
    inv = ostn15_inverse_shift(fwd, cells, GRID_CELL_M, iters=2)
    err = inv.select(
        F.max(F.abs(F.col("e_etrs") - F.col("e_true"))).alias("de"),
        F.max(F.abs(F.col("n_etrs") - F.col("n_true"))).alias("dn"),
    ).collect()[0]
    assert err["de"] < 1e-3 and err["dn"] < 1e-3, dict(err.asDict())


def test_grs80_tail_has_no_helmert_jump(spark):
    """The with-grid TM tail (GRS80, no Helmert) and the no-grid tail
    (Airy + Helmert) must differ by roughly the datum shift (~50-200 m)
    on the same input — the guard that nobody re-chains Airy+Helmert
    after a real-grid correction (which would double-apply the datum
    jump; see reproject_etrs89_grid_to_wgs84_udf's doc)."""
    from transit_scrape_spark.functions.geo import (
        reproject_bng_to_wgs84_udf,
        reproject_etrs89_grid_to_wgs84_udf,
    )

    pts = spark.createDataFrame([(400000.0, 500000.0)], "e double, n double")
    airy = reproject_bng_to_wgs84_udf()
    grs = reproject_etrs89_grid_to_wgs84_udf()
    row = (
        pts.withColumn("a", airy(F.col("e"), F.col("n")))
        .withColumn("g", grs(F.col("e"), F.col("n")))
        .collect()[0]
    )
    dlat_m = abs(row["a"]["lat"] - row["g"]["lat"]) * 111_320.0
    dlon_m = (
        abs(row["a"]["lon"] - row["g"]["lon"])
        * 111_320.0
        * math.cos(math.radians(row["g"]["lat"]))
    )
    dist = math.hypot(dlat_m, dlon_m)
    assert 30.0 < dist < 300.0, f"expected a datum-sized gap, got {dist:.2f} m"


# --- golden control point (needs the real Crown-copyright file) -----------

# OS 'A guide to coordinate systems in Great Britain', worked example:
# Caister water tower. OSGB36 National Grid: E 651409.903, N 313177.270;
# ETRS89/WGS84: lat 52deg 39' 28.723" N, lon 1deg 42' 57.787" E
# (= 52.657978611..., 1.716051944...). Transcribed from memory of the
# published guide — RE-VERIFY against the current OS publication when
# dropping in the real grid file (this test is inert until then).
_CAISTER_E, _CAISTER_N = 651409.903, 313177.270
_CAISTER_LAT = 52 + 39 / 60 + 28.723 / 3600
_CAISTER_LON = 1 + 42 / 60 + 57.787 / 3600


def test_golden_control_point_real_grid(spark):
    """Exact-parity golden through the CORRECT real-grid pipeline
    (VERDICT r9 task 6): iterative OSTN15 inverse shift, then inverse
    TM on GRS80 with NO Helmert (ETRS89 == WGS84 at mm level). Gated on
    the real Crown-copyright data file via $SPARK_GRAFT_OSTN15_GRID or
    $SPARK_GRAFT_OSTN15_PATH."""
    path = os.environ.get("SPARK_GRAFT_OSTN15_GRID") or os.environ.get(
        "SPARK_GRAFT_OSTN15_PATH"
    )
    if not path or not os.path.exists(path):
        pytest.skip(
            "set SPARK_GRAFT_OSTN15_GRID (or SPARK_GRAFT_OSTN15_PATH) "
            "to the real OSTN15 data file"
        )
    from transit_scrape_spark.functions.geo import (
        OSTN15_CELL_M,
        ostn15_inverse_shift,
        reproject_etrs89_grid_to_wgs84_udf,
    )

    nodes = load_ostn15_datafile(spark, path)
    cells = build_cells_from_nodes(nodes, OSTN15_CELL_M)
    pts = spark.createDataFrame(
        [(_CAISTER_E, _CAISTER_N)], "e double, n double"
    )
    etrs = ostn15_inverse_shift(pts, cells, OSTN15_CELL_M, iters=2)
    rep = reproject_etrs89_grid_to_wgs84_udf()
    row = etrs.withColumn(
        "ll", rep(F.col("e_etrs"), F.col("n_etrs"))
    ).collect()[0]
    # 1e-6 deg ~ 11 cm N-S; assert <= 10 cm in metres
    dlat_m = abs(row["ll"]["lat"] - _CAISTER_LAT) * 111_320.0
    dlon_m = (
        abs(row["ll"]["lon"] - _CAISTER_LON)
        * 111_320.0
        * math.cos(math.radians(_CAISTER_LAT))
    )
    assert dlat_m <= 0.10 and dlon_m <= 0.10, (dlat_m, dlon_m)
