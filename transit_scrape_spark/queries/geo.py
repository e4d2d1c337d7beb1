"""Geometry operator surface (SURVEY.md §2.2) oracled on synthesized
integer-valued coordinates derived from fixture keys (coords built from
``nation``/``lineitem`` numerics so DuckDB can build the identical
geometry and string results match exactly).

The GeoJSON scan/sink round-trip ops materialize a small deterministic
GeoJSON/CSV corpus under /tmp from the ``nation`` table, exercise the
real distributed reader/writer, and oracle the result against the
originating table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.functions.geo import (
    bounding_box,
    linestring_length,
    linestring_to_wkt,
    swap_coords,
    to_ewkt,
    wkt_to_linestring,
)
from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.geojson import read_geojson_features
from transit_scrape_spark.sources.tables import load_table


def _synth_coords(df: DataFrame, key: str) -> DataFrame:
    """Deterministic 3-point LineString per row from an integer key.

    Integer-valued doubles so WKT strings are formatted identically by
    Spark and DuckDB ('123.0').
    """
    k = F.col(key).cast("long")
    pt = lambda dx, dy: F.array(  # noqa: E731
        ((k * 13 + dx) % 700000).cast("double"), ((k * 29 + dy) % 1000000).cast("double")
    )
    return df.withColumn("coordinates", F.array(pt(0, 0), pt(1000, 2000), pt(5000, 3000)))


_SYNTH_SQL = """
    SELECT n_nationkey,
           [
             [CAST((n_nationkey * 13) % 700000 AS DOUBLE), CAST((n_nationkey * 29) % 1000000 AS DOUBLE)],
             [CAST((n_nationkey * 13 + 1000) % 700000 AS DOUBLE), CAST((n_nationkey * 29 + 2000) % 1000000 AS DOUBLE)],
             [CAST((n_nationkey * 13 + 5000) % 700000 AS DOUBLE), CAST((n_nationkey * 29 + 3000) % 1000000 AS DOUBLE)]
           ] AS coordinates
    FROM nation
"""


@query(
    "derive-route-length",
    oracle=f"""
        SELECT n_nationkey,
               round(
                 sqrt(pow(coordinates[2][1] - coordinates[1][1], 2) + pow(coordinates[2][2] - coordinates[1][2], 2))
               + sqrt(pow(coordinates[3][1] - coordinates[2][1], 2) + pow(coordinates[3][2] - coordinates[2][2], 2)),
               6) AS route_length_m
        FROM ({_SYNTH_SQL})
    """,
    doc="Planar LineString length (reference geometry.length, "
    "process_cycle_networks.py:88) as zip_with(slice,slice)+aggregate — "
    "higher-order functions, no explode, no UDF.",
)
def derive_route_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    return n.select(
        "n_nationkey",
        F.round(linestring_length(F.col("coordinates")), 6).alias("route_length_m"),
    )


@query(
    "geom-to-wkt",
    oracle=f"""
        SELECT n_nationkey,
               concat('LINESTRING (',
                      array_to_string(list_transform(coordinates,
                          p -> concat(CAST(p[1] AS VARCHAR), ' ', CAST(p[2] AS VARCHAR))), ', '),
                      ')') AS wkt,
               concat('SRID=4326;', concat('LINESTRING (',
                      array_to_string(list_transform(coordinates,
                          p -> concat(CAST(p[1] AS VARCHAR), ' ', CAST(p[2] AS VARCHAR))), ', '),
                      ')')) AS ewkt
        FROM ({_SYNTH_SQL})
    """,
    doc="Geometry -> WKT/EWKT serialization (reference "
    "process_cycle_networks.py:158, db_helpers.py:172-176) via "
    "transform+array_join+concat.",
)
def geom_to_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    wkt = linestring_to_wkt(F.col("coordinates"))
    return n.select("n_nationkey", wkt.alias("wkt"), to_ewkt(wkt).alias("ewkt"))


@query(
    "geom-to-ewkt",
    oracle=f"""
        SELECT n_nationkey,
               concat('SRID=4326;', 'LINESTRING (',
                      array_to_string(list_transform(coordinates,
                          p -> concat(CAST(p[1] AS VARCHAR), ' ', CAST(p[2] AS VARCHAR))), ', '),
                      ')') AS ewkt
        FROM ({_SYNTH_SQL})
    """,
    doc="Geometry -> EWKT with SRID prefix (reference db_helpers.py:172-176 "
    "geometry_to_ewkt) — its own registry key per the SURVEY §2 "
    "one-key-per-op contract; shares the WKT serializer with geom-to-wkt.",
)
def geom_to_ewkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    return n.select(
        "n_nationkey",
        to_ewkt(linestring_to_wkt(F.col("coordinates"))).alias("ewkt"),
    )


@query(
    "wkt-to-geom",
    oracle=f"""
        SELECT n_nationkey,
               concat('LINESTRING (',
                      array_to_string(list_transform(coordinates,
                          p -> concat(CAST(p[1] AS VARCHAR), ' ', CAST(p[2] AS VARCHAR))), ', '),
                      ')') AS wkt_roundtrip
        FROM ({_SYNTH_SQL})
    """,
    doc="WKT string -> coordinate arrays (reference GeoSeries.from_wkt, "
    "app/app.py:81-83) via regexp strip + nested split/cast; oracled as "
    "an exact round-trip wkt -> coords -> wkt (the re-serialized string "
    "proves the parse was lossless; output kept scalar-typed for the "
    "driver canonicalizer — nested arrays stay internal).",
)
def wkt_to_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    wkt = linestring_to_wkt(F.col("coordinates"))
    return n.select(
        "n_nationkey",
        linestring_to_wkt(wkt_to_linestring(wkt)).alias("wkt_roundtrip"),
    )


@query(
    "coord-swap",
    oracle=f"""
        SELECT n_nationkey,
               concat('LINESTRING (',
                      array_to_string(list_transform(coordinates,
                          p -> concat(CAST(p[2] AS VARCHAR), ' ', CAST(p[1] AS VARCHAR))), ', '),
                      ')') AS latlon_wkt
        FROM ({_SYNTH_SQL})
    """,
    doc="Per-vertex (lon,lat)->(lat,lon) swap (reference app/app.py:139-141) "
    "via nested transform; emitted as the swapped WKT string (scalar "
    "output for the driver canonicalizer — the array form is internal).",
)
def coord_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    return n.select(
        "n_nationkey",
        linestring_to_wkt(swap_coords(F.col("coordinates"))).alias("latlon_wkt"),
    )


@query(
    "explode-multigeom",
    oracle=f"""
        SELECT n_nationkey, CAST(part_idx AS BIGINT) AS part_idx,
               concat('LINESTRING (',
                      array_to_string(list_transform(part,
                          p -> concat(CAST(p[1] AS VARCHAR), ' ', CAST(p[2] AS VARCHAR))), ', '),
                      ')') AS part_wkt
        FROM (
          SELECT n_nationkey,
                 generate_subscripts(parts, 1) AS part_idx,
                 unnest(parts) AS part
          FROM (SELECT n_nationkey,
                       [coordinates, list_transform(coordinates, p -> [p[1] + 10000, p[2] + 20000])] AS parts
                FROM ({_SYNTH_SQL}))
        )
    """,
    doc="MultiLineString -> constituent LineStrings (reference "
    "geometry.geoms flatten, app/app.py:137-139) via posexplode; each "
    "part emitted as its WKT string (scalar output for the driver).",
)
def explode_multigeom(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    multi = n.withColumn(
        "parts",
        F.array(
            F.col("coordinates"),
            F.transform(
                F.col("coordinates"), lambda p: F.array(p[0] + 10000, p[1] + 20000)
            ),
        ),
    )
    ex = multi.select(
        "n_nationkey", F.posexplode("parts").alias("part_idx0", "part")
    )
    return ex.select(
        "n_nationkey",
        (F.col("part_idx0") + 1).cast("long").alias("part_idx"),
        linestring_to_wkt(F.col("part")).alias("part_wkt"),
    )


@query(
    "agg-geo-bounds",
    oracle=f"""
        SELECT round(min(minx), 6) AS minx, round(min(miny), 6) AS miny,
               round(max(maxx), 6) AS maxx, round(max(maxy), 6) AS maxy,
               round((min(minx) + max(maxx)) / 2, 6) AS center_x,
               round((min(miny) + max(maxy)) / 2, 6) AS center_y
        FROM (
          SELECT list_min(list_transform(coordinates, p -> p[1])) AS minx,
                 list_min(list_transform(coordinates, p -> p[2])) AS miny,
                 list_max(list_transform(coordinates, p -> p[1])) AS maxx,
                 list_max(list_transform(coordinates, p -> p[2])) AS maxy
          FROM ({_SYNTH_SQL})
        )
    """,
    doc="total_bounds + map center (reference app/app.py:94-99): per-row "
    "envelope expressions then a tiny global min/max agg.",
)
def agg_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _synth_coords(load_table(spark, sf_dir, "nation"), "n_nationkey")
    env = n.select(bounding_box(F.col("coordinates")).alias("bb")).select("bb.*")
    return env.agg(
        F.round(F.min("minx"), 6).alias("minx"),
        F.round(F.min("miny"), 6).alias("miny"),
        F.round(F.max("maxx"), 6).alias("maxx"),
        F.round(F.max("maxy"), 6).alias("maxy"),
        F.round((F.min("minx") + F.max("maxx")) / 2, 6).alias("center_x"),
        F.round((F.min("miny") + F.max("maxy")) / 2, 6).alias("center_y"),
    )


from transit_scrape_spark.functions.gridref import os_grid_reference_oracle_sql

_GRID_SQL = os_grid_reference_oracle_sql("e", "n", 6)


@query(
    "geo-partition-key",
    oracle=f"""
        SELECT substring({_GRID_SQL}, 1, 2) AS grid_sq, count(*) AS n_points
        FROM (SELECT CAST((l_partkey * 37) % 700000 AS DOUBLE) AS e,
                     CAST((l_orderkey * 53) % 1000000 AS DOUBLE) AS n
              FROM lineitem)
        GROUP BY 1
    """,
    doc="Spatial partition key derivation (SURVEY §4 item 2: data layout "
    "replaces the reference's B-tree indexes, db_models.py:27-39): "
    "grid square at 100 km/100 m precision from the OS grid reference "
    "expression; writing partitionBy(grid_sq) turns bbox predicates "
    "into partition pruning. Returns per-square route counts.",
)
def geo_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.gridref import os_grid_reference

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        ((F.col("l_partkey") * 37) % 700000).cast("double").alias("e"),
        ((F.col("l_orderkey") * 53) % 1000000).cast("double").alias("n"),
    )
    keyed = pts.select(
        F.substring(os_grid_reference(F.col("e"), F.col("n"), 6), 1, 2).alias("grid_sq")
    )
    return keyed.groupBy("grid_sq").agg(F.count("*").alias("n_points"))


# --- GeoJSON scan round-trip (real file I/O through the engine) -----------

# declared property schema of every nation-derived GeoJSON fixture —
# scans DECLARE rather than infer (inference is an extra full pass at
# scale and cannot bind on an empty feature list; see sources/geojson.py)
NATION_PROPS = "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"


def _geojson_fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a deterministic FeatureCollection from `nation` once per
    (sf_dir CONTENT) under /tmp; returns the file path. Content-keyed so
    changed fixtures at the same path never serve stale data; the write
    below is already atomic (os.replace)."""
    from transit_scrape_spark.sources.fixtures import content_tag

    path = f"/tmp/tss_geojson_{content_tag(sf_dir)}/nation.geojson"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "nation")
            .orderBy("n_nationkey")
            .collect()
        )
        feats = []
        for r in rows:
            k = r["n_nationkey"]
            coords = [
                [float((k * 13) % 700000), float((k * 29) % 1000000)],
                [float((k * 13 + 1000) % 700000), float((k * 29 + 2000) % 1000000)],
            ]
            feats.append(
                {
                    "type": "Feature",
                    "properties": {
                        "n_nationkey": k,
                        "n_name": r["n_name"],
                        "n_regionkey": r["n_regionkey"],
                    },
                    "geometry": {"type": "LineString", "coordinates": coords},
                }
            )
        with open(path + ".tmp", "w") as f:
            json.dump({"type": "FeatureCollection", "features": feats}, f)
        os.replace(path + ".tmp", path)
    return path


@query(
    "scan-geojson",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey,
               'LineString' AS geometry_type,
               CAST(2 AS BIGINT) AS n_points,
               'nation.geojson' AS source_file
        FROM nation
    """,
    doc="GeoJSON FeatureCollection scan (reference import_json_data, "
    "process_cycle_networks.py:18-55): multiLine json read -> explode "
    "features -> flatten properties + geometry; provenance via "
    "input_file_name (reference :95). Round-trips a deterministic "
    "fixture built from `nation`.",
)
def scan_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _geojson_fixture_path(spark, sf_dir)
    feats = read_geojson_features(spark, path, properties=NATION_PROPS)
    return feats.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
        "geometry_type",
        F.size("coordinates").cast("long").alias("n_points"),
        "source_file",
    )


@query(
    "sink-csv-wkt",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               concat('LINESTRING (',
                      CAST(CAST((n_nationkey * 13) % 700000 AS DOUBLE) AS VARCHAR), ' ',
                      CAST(CAST((n_nationkey * 29) % 1000000 AS DOUBLE) AS VARCHAR), ', ',
                      CAST(CAST((n_nationkey * 13 + 1000) % 700000 AS DOUBLE) AS VARCHAR), ' ',
                      CAST(CAST((n_nationkey * 29 + 2000) % 1000000 AS DOUBLE) AS VARCHAR),
                      ')') AS geometry_wkt
        FROM nation
    """,
    doc="CSV sink with WKT-serialized geometry, then read back (reference "
    "process_cycle_networks.py:155-162): withColumn(wkt).drop(geometry) "
    ".write.csv — full write+scan through the engine.",
)
def sink_csv_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.sources.sinks import write_csv_wkt

    path = _geojson_fixture_path(spark, sf_dir)
    feats = read_geojson_features(spark, path, properties=NATION_PROPS).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "coordinates"
    )
    out_dir = os.path.dirname(path) + "/csv_out"
    write_csv_wkt(feats, out_dir)
    # declared read-back schema: inference would re-read the corpus at
    # scale and cannot bind when the sink legitimately wrote zero rows
    back = (
        spark.read.schema("n_nationkey BIGINT, geometry_wkt STRING")
        .option("header", "true")
        .csv(out_dir)
    )
    return back.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "geometry_wkt"
    )


# --- point-in-polygon classification -----------------------------------------

# Small fixed zone set (a convex triangle, a convex quad, a CONCAVE L);
# integer-valued vertices so every constant folds identically in Spark
# and DuckDB. Zones are geofence-sized (handfuls, not millions), so the
# scale-correct plan compiles them INTO the projection (unrolled
# ray-cast arithmetic, whole-stage codegen, zero joins/shuffles) rather
# than cross-joining a zone table — the same reasoning Catalyst applies
# when it constant-folds a literal IN-list. An interpreted HOF fold
# (F.aggregate over an edges array) or a zone cross-join would re-read
# the polygon per row and drop out of codegen.
_PIP_ZONES: list[tuple[str, list[tuple[float, float]]]] = [
    ("tri", [(100.0, 100.0), (500.0, 100.0), (300.0, 450.0)]),
    ("quad", [(550.0, 500.0), (950.0, 520.0), (900.0, 900.0), (600.0, 870.0)]),
    (
        "ell",
        [
            (50.0, 600.0),
            (350.0, 600.0),
            (350.0, 750.0),
            (200.0, 750.0),
            (200.0, 950.0),
            (50.0, 950.0),
        ],
    ),
]


def _pip_inside_col(px, py, poly):
    """Unrolled even-odd ray cast as a single codegen boolean Column.

    Degenerate horizontal edges (yi == yj) are elided at COMPILE time:
    their crossing test ((yi>py) != (yj>py)) is identically false, so
    the edge contributes 0 to the parity sum and the yj-yi division is
    never emitted — no runtime reliance on FALSE-AND-NULL semantics.
    The SQL twin (_pip_inside_sql) applies the same elision so both
    engines evaluate the identical term list.
    """
    total = None
    n = len(poly)
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[(i + 1) % n]
        if yi == yj:
            continue  # horizontal edge: can never cross the ray
        crosses = ((F.lit(yi) > py) != (F.lit(yj) > py)) & (
            px < (F.lit(xj - xi) * (py - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi))
        )
        term = F.when(crosses, 1).otherwise(0)
        total = term if total is None else total + term
    return total % 2 == 1


def _pip_inside_sql(px: str, py: str, poly) -> str:
    """The byte-identical arithmetic as ANSI SQL (same constant deltas,
    same parenthesization, so doubles round-trip bit-exactly)."""
    terms = []
    n = len(poly)
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[(i + 1) % n]
        if yi == yj:
            continue  # elided to match _pip_inside_col (no /0 emitted)
        terms.append(
            f"(CASE WHEN (({yi} > {py}) <> ({yj} > {py}))"
            f" AND ({px} < ({xj - xi} * ({py} - {yi}) / {yj - yi} + {xi}))"
            f" THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _pip_oracle() -> str:
    zone_case = "CASE"
    for name, poly in _PIP_ZONES:
        zone_case += f" WHEN {_pip_inside_sql('px', 'py', poly)} THEN '{name}'"
    zone_case += " ELSE 'none' END"
    hits = " + ".join(
        f"(CASE WHEN {_pip_inside_sql('px', 'py', poly)} THEN 1 ELSE 0 END)"
        for _, poly in _PIP_ZONES
    )
    return f"""
        WITH pts AS (
            SELECT c_custkey,
                   CAST((c_custkey * 17) % 1000 AS DOUBLE) AS px,
                   CAST((c_custkey * 31) % 1000 AS DOUBLE) AS py
            FROM customer
        )
        SELECT c_custkey, px, py,
               {zone_case} AS zone,
               CAST({hits} AS BIGINT) AS zones_hit
        FROM pts
    """


@query(
    "geo-point-in-polygon",
    oracle=_pip_oracle(),
    doc="Point-in-polygon classification (even-odd ray cast) of one "
    "synthesized point per customer against a 3-zone geofence set "
    "(incl. a concave polygon). The zone set is compiled into the "
    "projection as unrolled edge-crossing arithmetic: single scan, "
    "whole-stage codegen, no join/shuffle/HOF — the plan a geofence "
    "lookup should have when zones are dim-sized. Degenerate edges "
    "(yi=yj) are ELIDED at compile time in both the Column and SQL "
    "forms (their crossing test is identically false), so no division "
    "by zero is ever emitted. Re-expresses the containment queries a "
    "transit engine runs against route service areas "
    "(reference src/utils/geotiles.py:8-59 tiles the same plane).",
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    px = (F.col("c_custkey") * 17 % 1000).cast("double")
    py = (F.col("c_custkey") * 31 % 1000).cast("double")
    zone = None
    for name, poly in _PIP_ZONES:
        cond = _pip_inside_col(px, py, poly)
        zone = F.when(cond, name) if zone is None else zone.when(cond, name)
    zone = zone.otherwise("none")
    hits = None
    for _, poly in _PIP_ZONES:
        t = F.when(_pip_inside_col(px, py, poly), 1).otherwise(0)
        hits = t if hits is None else hits + t
    return c.select(
        "c_custkey",
        px.alias("px"),
        py.alias("py"),
        zone.alias("zone"),
        hits.cast("long").alias("zones_hit"),
    )


@query(
    "geo-haversine-nearest",
    oracle="""
        WITH pts AS (
            SELECT CAST(n_nationkey AS BIGINT) AS k, n_name,
                   CAST((n_nationkey * 7) % 120 AS DOUBLE) - 60.0 + 0.5 AS lat,
                   CAST((n_nationkey * 13) % 340 AS DOUBLE) - 170.0 + 0.5 AS lon
            FROM nation
        ),
        pairs AS (
            SELECT a.k, a.n_name, b.k AS other_k,
                   round(2 * 6371.0088 * asin(sqrt(
                       pow(sin(radians(b.lat - a.lat) / 2), 2)
                       + cos(radians(a.lat)) * cos(radians(b.lat))
                         * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3)
                       AS dist_km
            FROM pts a JOIN pts b ON a.k <> b.k
        )
        SELECT k, n_name, other_k AS nearest_k, dist_km
        FROM (SELECT *, row_number() OVER (PARTITION BY k
                                           ORDER BY dist_km, other_k) AS rn
              FROM pairs)
        WHERE rn = 1
    """,
    doc="Great-circle (haversine) nearest neighbor per nation over "
    "deterministic synthetic lat/lon: pairwise spherical distances, "
    "per-point top-1 via a window. The 25-point dim makes all-pairs "
    "exact; at 100 TB points this NEVER runs all-pairs — bucket to a "
    "geo grid (geo-partition-key's layout), search own + 8 neighbor "
    "cells via an equi-join on cell id, and fall back to ring "
    "expansion for empty neighborhoods — same blocking discipline as "
    "the LSH dedup family, in spherical coordinates.",
)
def geo_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n = load_table(spark, sf_dir, "nation")
    pts = n.select(
        F.col("n_nationkey").cast("long").alias("k"),
        "n_name",
        ((F.col("n_nationkey") * 7 % 120).cast("double") - 60.0 + 0.5).alias("lat"),
        ((F.col("n_nationkey") * 13 % 340).cast("double") - 170.0 + 0.5).alias("lon"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    hav = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.col("a.lat")))
        * F.cos(F.radians(F.col("b.lat")))
        * F.pow(F.sin(dlon), 2)
    )
    pairs = a.join(b, F.col("a.k") != F.col("b.k")).select(
        F.col("a.k").alias("k"),
        F.col("a.n_name").alias("n_name"),
        F.col("b.k").alias("other_k"),
        F.round(2 * 6371.0088 * F.asin(F.sqrt(hav)), 3).alias("dist_km"),
    )
    w = Window.partitionBy("k").orderBy("dist_km", "other_k")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "n_name", F.col("other_k").alias("nearest_k"), "dist_km")
    )


@query(
    "geo-polygon-area",
    oracle="""
        WITH ring AS (
            SELECT CAST(n_nationkey AS BIGINT) AS k,
                   CAST((n_nationkey * 3) % 17 AS DOUBLE) AS x0,
                   CAST((n_nationkey * 5) % 23 AS DOUBLE) AS y0,
                   CAST((n_nationkey * 3) % 17 + 10 AS DOUBLE) AS x1,
                   CAST((n_nationkey * 7) % 13 AS DOUBLE) AS y1,
                   CAST((n_nationkey * 11) % 19 + 4 AS DOUBLE) AS x2,
                   CAST((n_nationkey * 5) % 23 + 12 AS DOUBLE) AS y2
            FROM nation
        )
        SELECT k,
               round(abs((x0 * y1 - x1 * y0)
                       + (x1 * y2 - x2 * y1)
                       + (x2 * y0 - x0 * y2)) / 2, 6) AS area,
               ((x0 * y1 - x1 * y0) + (x1 * y2 - x2 * y1)
                + (x2 * y0 - x0 * y2)) > 0 AS is_ccw
        FROM ring
    """,
    doc="Polygon area + winding order by the shoelace formula over "
    "deterministic triangle rings per nation: the signed cross-product "
    "sum gives area (absolute value) AND orientation (sign -> CCW "
    "flag, what GeoJSON ring validity checks need) — pure per-row "
    "codegen arithmetic, the area complement of derive-route-length's "
    "HOF distance sum (reference geometry.length, "
    "process_cycle_networks.py:88). For n-vertex rings the same "
    "cross-product folds through zip_with(coords, shifted-coords) + "
    "aggregate; embarrassingly parallel at any corpus size.",
)
def geo_polygon_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    x0 = (F.col("n_nationkey") * 3 % 17).cast("double")
    y0 = (F.col("n_nationkey") * 5 % 23).cast("double")
    x1 = x0 + 10
    y1 = (F.col("n_nationkey") * 7 % 13).cast("double")
    x2 = (F.col("n_nationkey") * 11 % 19).cast("double") + 4
    y2 = y0 + 12
    signed2 = (x0 * y1 - x1 * y0) + (x1 * y2 - x2 * y1) + (x2 * y0 - x0 * y2)
    return n.select(
        k.alias("k"),
        F.round(F.abs(signed2) / 2, 6).alias("area"),
        (signed2 > 0).alias("is_ccw"),
    )


# --- OSTN15-architecture grid-shift reprojection ---------------------------

_GRIDSHIFT_CORNER_SQL = """
        91.0 + 8*sin({e}/200000.0) + 5*cos({n}/300000.0)
             + 2*sin(({e}+{n})/400000.0)
"""

_GRIDSHIFT_CORNER_N_SQL = """
        -72.0 + 6*cos({e}/250000.0) + 7*sin({n}/350000.0)
              + 2*cos(({e}-{n})/450000.0)
"""


def _gridshift_oracle() -> str:
    """DuckDB parity: same source points, same cell snap, same corner
    formula, same bilinear — expressed inline per point (the oracle
    doesn't need the broadcast-join shape, only the values)."""
    corners = []
    for tag, (de, dn) in {
        "00": (0, 0), "10": (10000, 0), "01": (0, 10000), "11": (10000, 10000),
    }.items():
        e_expr = f"(e0 + {de})"
        n_expr = f"(n0 + {dn})"
        corners.append(
            f"{_GRIDSHIFT_CORNER_SQL.format(e=e_expr, n=n_expr)} AS se{tag}"
        )
        corners.append(
            f"{_GRIDSHIFT_CORNER_N_SQL.format(e=e_expr, n=n_expr)} AS sn{tag}"
        )
    corner_cols = ",\n".join(corners)
    return f"""
        WITH src AS (
            SELECT n_nationkey,
                   CAST(300000 + n_nationkey * 1000 AS DOUBLE) AS e,
                   CAST(600000 + n_nationkey * 1000 AS DOUBLE) AS n
            FROM nation
        ),
        cell AS (
            SELECT *,
                   floor(e / 10000) * 10000 AS e0,
                   floor(n / 10000) * 10000 AS n0,
                   (e - floor(e / 10000) * 10000) / 10000 AS tx,
                   (n - floor(n / 10000) * 10000) / 10000 AS ty
            FROM src
        ),
        corners AS (
            SELECT *, {corner_cols}
            FROM cell
        )
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
               round(se00*(1-tx)*(1-ty) + se10*tx*(1-ty)
                     + se01*(1-tx)*ty + se11*tx*ty, 4) AS shift_e,
               round(sn00*(1-tx)*(1-ty) + sn10*tx*(1-ty)
                     + sn01*(1-tx)*ty + sn11*tx*ty, 4) AS shift_n,
               round(e - (se00*(1-tx)*(1-ty) + se10*tx*(1-ty)
                     + se01*(1-tx)*ty + se11*tx*ty), 4) AS e_corrected,
               round(n - (sn00*(1-tx)*(1-ty) + sn10*tx*(1-ty)
                     + sn01*(1-tx)*ty + sn11*tx*ty), 4) AS n_corrected
        FROM corners
    """


@query(
    "geo-reproject-gridshift",
    oracle=_gridshift_oracle(),
    doc="Grid-shift datum correction in the OSTN15 architecture "
    "(reference grid-aware to_crs, process_cycle_networks.py:112; "
    "closes geo-reproject's documented Helmert-only 1-5 m gap): a "
    "per-cell shift-grid table (4 corner shifts packed per row -> ONE "
    "broadcast equi-join on the cell key, not 4 node joins) + bilinear "
    "interpolation, all whole-stage codegen. The shift field here is a "
    "synthetic OSTN15-magnitude stand-in (the real grid is licensed "
    "data); tests/test_pipelines.py proves the grid+bilinear pipeline "
    "reproduces the underlying field to <1 cm, so dropping in the real "
    "OSTN15 grid file yields the real cm-accurate correction with zero "
    "plan changes. At 100 TB the grid (8750 rows synthetic, ~700k rows "
    "real) broadcasts to every executor; the fact side never shuffles.",
)
def geo_reproject_gridshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.geo import (
        build_shift_grid_cells,
        gridshift_apply,
    )

    n = load_table(spark, sf_dir, "nation")
    pts = n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        (300000.0 + F.col("n_nationkey") * 1000).alias("e"),
        (600000.0 + F.col("n_nationkey") * 1000).alias("n"),
    )
    out = gridshift_apply(pts, build_shift_grid_cells(spark))
    return out.select(
        "n_nationkey",
        F.round("shift_e", 4).alias("shift_e"),
        F.round("shift_n", 4).alias("shift_n"),
        F.round(F.col("e") - F.col("shift_e"), 4).alias("e_corrected"),
        F.round(F.col("n") - F.col("shift_n"), 4).alias("n_corrected"),
    )


# --- grid-blocked spatial join ---------------------------------------------

_GRID_CELL = 250.0  # 4x4 grid over the [0,1000)^2 synthetic plane


def _zone_cells() -> list[tuple[int, str]]:
    """(cell_id, zone) for every grid cell a zone's bbox overlaps —
    computed once from the static zone vertices (a real system derives
    this at polygon-ingest time). Conservative (bbox) coverage: the
    exact ray-cast refine after the join removes false candidates, so
    coverage only needs to be complete, not tight."""
    out = []
    n_cols = int(1000 / _GRID_CELL)
    for name, poly in _PIP_ZONES:
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        for cx in range(int(min(xs) // _GRID_CELL), int(max(xs) // _GRID_CELL) + 1):
            for cy in range(int(min(ys) // _GRID_CELL), int(max(ys) // _GRID_CELL) + 1):
                out.append((cx * n_cols + cy, name))
    return out


def _spatial_grid_oracle() -> str:
    parts = []
    for name, poly in _PIP_ZONES:
        parts.append(f"""
            SELECT '{name}' AS zone,
                   CAST(count(*) AS BIGINT) AS n_points,
                   CAST(sum(c_custkey) AS BIGINT) AS key_sum
            FROM (
                SELECT c_custkey,
                       CAST((c_custkey * 17) % 1000 AS DOUBLE) AS px,
                       CAST((c_custkey * 31) % 1000 AS DOUBLE) AS py
                FROM customer
            )
            WHERE {_pip_inside_sql('px', 'py', poly)}
        """)
    return " UNION ALL ".join(parts)


@query(
    "join-spatial-grid",
    oracle=_spatial_grid_oracle(),
    doc="Grid-blocked spatial join — the scale pattern "
    "geo-haversine-nearest's doc string promises, implemented: points "
    "key to a grid cell (pure arithmetic), polygons pre-expand to the "
    "cells their bbox overlaps (dim-sized table, broadcast), the "
    "equi-join on cell id yields only co-located candidates, and the "
    "exact unrolled ray-cast refines them. Points in cells no polygon "
    "touches are dropped by the JOIN, before any geometry math — at "
    "100 TB points x 10k polygons the work is proportional to "
    "candidates, not the cross product, and the cell id doubles as "
    "the partition key for spatial locality. The oracle runs the "
    "UNblocked exact test per zone: equality proves the grid cover is "
    "lossless.",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n_cols = int(1000 / _GRID_CELL)
    px = (F.col("c_custkey") * 17 % 1000).cast("double")
    py = (F.col("c_custkey") * 31 % 1000).cast("double")
    pts = c.select(
        "c_custkey",
        px.alias("px"),
        py.alias("py"),
        (
            F.floor(px / _GRID_CELL) * n_cols + F.floor(py / _GRID_CELL)
        ).cast("long").alias("cell_id"),
    )
    cells = spark.createDataFrame(
        _zone_cells(), "cell_id long, zone string"
    ).distinct()
    cand = pts.join(F.broadcast(cells), "cell_id")
    refined = None
    for name, poly in _PIP_ZONES:
        inside = _pip_inside_col(F.col("px"), F.col("py"), poly)
        cond = (F.col("zone") == name) & inside
        refined = cond if refined is None else refined | cond
    hits = cand.filter(refined)
    return hits.groupBy("zone").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("c_custkey").cast("long").alias("key_sum"),
    )


def _gridshift_corrected_src_sql() -> str:
    """(n_nationkey, e, n) with the grid-shift correction applied,
    unrounded — the source feed for the chained reprojection oracle."""
    corners = []
    for tag, (de, dn) in {
        "00": (0, 0), "10": (10000, 0), "01": (0, 10000), "11": (10000, 10000),
    }.items():
        e_expr = f"(e0 + {de})"
        n_expr = f"(n0 + {dn})"
        corners.append(
            f"{_GRIDSHIFT_CORNER_SQL.format(e=e_expr, n=n_expr)} AS se{tag}"
        )
        corners.append(
            f"{_GRIDSHIFT_CORNER_N_SQL.format(e=e_expr, n=n_expr)} AS sn{tag}"
        )
    corner_cols = ",\n".join(corners)
    bilin_e = ("(se00*(1-tx)*(1-ty) + se10*tx*(1-ty)"
               " + se01*(1-tx)*ty + se11*tx*ty)")
    bilin_n = ("(sn00*(1-tx)*(1-ty) + sn10*tx*(1-ty)"
               " + sn01*(1-tx)*ty + sn11*tx*ty)")
    return f"""
        SELECT n_nationkey, e - {bilin_e} AS e, n - {bilin_n} AS n
        FROM (
            SELECT *, {corner_cols}
            FROM (
                SELECT *,
                       floor(e / 10000) * 10000 AS e0,
                       floor(n / 10000) * 10000 AS n0,
                       (e - floor(e / 10000) * 10000) / 10000 AS tx,
                       (n - floor(n / 10000) * 10000) / 10000 AS ty
                FROM (
                    SELECT n_nationkey,
                           CAST(300000 + n_nationkey * 1000 AS DOUBLE) AS e,
                           CAST(600000 + n_nationkey * 1000 AS DOUBLE) AS n
                    FROM nation
                )
            )
        )
    """


from transit_scrape_spark.functions.geo_oracle import bng_to_wgs84_oracle_sql


@query(
    "geo-reproject-corrected",
    oracle=bng_to_wgs84_oracle_sql(_gridshift_corrected_src_sql()),
    doc="END-TO-END grid-corrected reprojection DEMO — the full OSTN15 "
    "pipeline shape geo-reproject (Helmert-only) and "
    "geo-reproject-gridshift (shift only) each demonstrate half of: "
    "broadcast-grid bilinear shift corrects the easting/northing, THEN "
    "the Arrow-vectorized inverse transverse-Mercator + Helmert "
    "produces lat/lon, mirrored exactly by the oracle over the "
    "synthetic field. NOTE (r10): with the REAL OSTN15 grid the correct "
    "production tail is ostn15_inverse_shift + "
    "reproject_etrs89_grid_to_wgs84_udf (GRS80 inverse TM, NO Helmert — "
    "chaining Helmert after a real-grid correction double-applies the "
    "datum jump); that path is what the env-gated golden "
    "(tests/test_ostn15_loader.py) certifies against the reference's "
    "grid-aware to_crs (process_cycle_networks.py:112) at cm accuracy. "
    "Oracle chains the same bilinear arithmetic into the "
    "unrolled-iteration reprojection CTE (functions/geo_oracle.py); a "
    "<=1-ulp libm sin/cos divergence in the shift (~1e-14 m) is "
    "~1e-19 deg after the smooth TM inversion, vastly inside the "
    "8-decimal rounding.",
)
def geo_reproject_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transit_scrape_spark.functions.geo import (
        gridshift_apply,
        load_shift_grid,
        reproject_bng_to_wgs84_udf,
    )

    n = load_table(spark, sf_dir, "nation")
    pts = n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        (300000.0 + F.col("n_nationkey") * 1000).alias("e"),
        (600000.0 + F.col("n_nationkey") * 1000).alias("n"),
    )
    # dispatcher: the real OSTN15 grid when $SPARK_GRAFT_OSTN15_GRID is
    # set (cm accuracy), else the synthetic demo field the oracle mirrors
    cells, cell_m = load_shift_grid(spark)
    shifted = gridshift_apply(pts, cells, cell_m).select(
        "n_nationkey",
        (F.col("e") - F.col("shift_e")).alias("e_c"),
        (F.col("n") - F.col("shift_n")).alias("n_c"),
    )
    rep = reproject_bng_to_wgs84_udf()
    out = shifted.withColumn("ll", rep(F.col("e_c"), F.col("n_c")))
    return out.select(
        "n_nationkey",
        F.round(F.col("ll.lon"), 8).alias("lon"),
        F.round(F.col("ll.lat"), 8).alias("lat"),
    )


@query(
    "geo-grid-rollup-multires",
    oracle="""
        WITH pts AS (
            SELECT CAST((l_partkey * 37) % 700000 AS BIGINT) AS e,
                   CAST((l_orderkey * 53) % 1000000 AS BIGINT) AS n,
                   l_extendedprice AS w
            FROM lineitem
        ),
        keyed AS (
            SELECT e // 100000 AS cx100, n // 100000 AS cy100,
                   e // 10000  AS cx10,  n // 10000  AS cy10,
                   w
            FROM pts
        )
        SELECT CASE WHEN grouping(cx10) = 0 THEN '10km' ELSE '100km' END
                   AS resolution,
               CAST(coalesce(cx10, cx100) AS BIGINT) AS cell_x,
               CAST(coalesce(cy10, cy100) AS BIGINT) AS cell_y,
               CAST(count(*) AS BIGINT) AS n_points,
               round(sum(w), 2) AS weight
        FROM keyed
        GROUP BY GROUPING SETS ((cx100, cy100), (cx100, cy100, cx10, cy10))
    """,
    doc="Multi-resolution spatial grid rollup: 100 km AND 10 km cell "
    "aggregates in ONE pass via GROUPING SETS — the spatial twin of "
    "rollup-timebucket's hour/day trick, and the H3/quadkey "
    "hierarchy pattern spelled with integer cell math (child cell id "
    "nests inside its parent by construction, so the coarse tier "
    "could also be re-rolled from the fine tier without rescanning "
    "the fact). Expand emits both granularities before a single "
    "map-side-combined shuffle bounded by |cells|; a heatmap "
    "pyramid at 100 TB is this plan with more tiers. Cells share "
    "geo-partition-key's synthetic easting/northing.",
)
def geo_grid_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        ((F.col("l_partkey") * 37) % 700000).cast("long").alias("e"),
        ((F.col("l_orderkey") * 53) % 1000000).cast("long").alias("n"),
        F.col("l_extendedprice").alias("w"),
    ).createOrReplaceTempView("tss_grr_pts")
    try:
        return spark.sql(
            """
            WITH keyed AS (
                SELECT e DIV 100000 AS cx100, n DIV 100000 AS cy100,
                       e DIV 10000  AS cx10,  n DIV 10000  AS cy10,
                       w
                FROM tss_grr_pts
            )
            SELECT CASE WHEN grouping(cx10) = 0 THEN '10km' ELSE '100km' END
                       AS resolution,
                   CAST(coalesce(cx10, cx100) AS BIGINT) AS cell_x,
                   CAST(coalesce(cy10, cy100) AS BIGINT) AS cell_y,
                   count(*) AS n_points,
                   round(sum(w), 2) AS weight
            FROM keyed
            GROUP BY GROUPING SETS ((cx100, cy100), (cx100, cy100, cx10, cy10))
            """
        )
    finally:
        spark.catalog.dropTempView("tss_grr_pts")


@query(
    "geo-line-interpolate",
    oracle=f"""
        WITH src AS ({_SYNTH_SQL}),
        segs AS (
            SELECT n_nationkey,
                   coordinates[1][1] AS x1, coordinates[1][2] AS y1,
                   coordinates[2][1] AS x2, coordinates[2][2] AS y2,
                   coordinates[3][1] AS x3, coordinates[3][2] AS y3,
                   sqrt(power(coordinates[2][1] - coordinates[1][1], 2)
                        + power(coordinates[2][2] - coordinates[1][2], 2))
                       AS l1,
                   sqrt(power(coordinates[3][1] - coordinates[2][1], 2)
                        + power(coordinates[3][2] - coordinates[2][2], 2))
                       AS l2
            FROM src
        )
        SELECT n_nationkey,
               round(CASE WHEN (l1 + l2) / 2 <= l1
                    THEN x1 + (x2 - x1) * ((l1 + l2) / 2) / l1
                    ELSE x2 + (x3 - x2) * ((l1 + l2) / 2 - l1) / l2 END, 6)
                   AS mid_x,
               round(CASE WHEN (l1 + l2) / 2 <= l1
                    THEN y1 + (y2 - y1) * ((l1 + l2) / 2) / l1
                    ELSE y2 + (y3 - y2) * ((l1 + l2) / 2 - l1) / l2 END, 6)
                   AS mid_y,
               round(l1 + l2, 6) AS total_len
        FROM segs ORDER BY n_nationkey
    """,
    doc="ST_LineInterpolatePoint(0.5) re-expressed relationally: the "
    "point exactly halfway ALONG each route (by arc length, not the "
    "middle vertex — the distinction that matters for stop "
    "placement and progress markers). Cumulative segment lengths "
    "locate the containing segment, then linear interpolation "
    "within it; on the fixed 3-vertex fixture the cumulative "
    "search is a closed-form CASE, and for general linestrings "
    "the same logic is posexplode + a running-length window "
    "partitioned per route (route vertices never leave their "
    "partition). Pure per-row codegen here — zero exchanges, the "
    "plan any per-geometry derivation should have. Reference "
    "anchor: route geometry handling in "
    "/root/reference/src/process_cycle_networks.py.",
)
def geo_line_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    src = _synth_coords(n, "n_nationkey")
    c = F.col("coordinates")
    x1, y1 = c[0][0], c[0][1]
    x2, y2 = c[1][0], c[1][1]
    x3, y3 = c[2][0], c[2][1]
    l1 = F.sqrt(F.pow(x2 - x1, 2) + F.pow(y2 - y1, 2))
    l2 = F.sqrt(F.pow(x3 - x2, 2) + F.pow(y3 - y2, 2))
    half = (l1 + l2) / 2
    mid_x = F.when(half <= l1, x1 + (x2 - x1) * half / l1).otherwise(
        x2 + (x3 - x2) * (half - l1) / l2
    )
    mid_y = F.when(half <= l1, y1 + (y2 - y1) * half / l1).otherwise(
        y2 + (y3 - y2) * (half - l1) / l2
    )
    return src.select(
        "n_nationkey",
        F.round(mid_x, 6).alias("mid_x"),
        F.round(mid_y, 6).alias("mid_y"),
        F.round(l1 + l2, 6).alias("total_len"),
    ).orderBy("n_nationkey")


@query(
    "geo-route-bearing",
    oracle=f"""
        WITH src AS ({_SYNTH_SQL})
        SELECT n_nationkey,
               round(degrees(atan2(coordinates[2][1] - coordinates[1][1],
                                   coordinates[2][2] - coordinates[1][2])),
                     6) AS initial_bearing_deg,
               round(degrees(atan2(coordinates[3][1] - coordinates[2][1],
                                   coordinates[3][2] - coordinates[2][2])),
                     6) AS final_bearing_deg,
               round(abs(((degrees(atan2(coordinates[3][1] - coordinates[2][1],
                                         coordinates[3][2] - coordinates[2][2]))
                           - degrees(atan2(coordinates[2][1] - coordinates[1][1],
                                           coordinates[2][2] - coordinates[1][2]))
                           + 540.0) % 360.0) - 180.0), 6) AS turn_angle_deg
        FROM src ORDER BY n_nationkey
    """,
    doc="Per-route bearing profile: initial and final compass bearings "
    "(atan2(dx, dy) — north-referenced, the navigation convention, "
    "NOT math atan2(dy, dx)) and the absolute turn angle between "
    "them, normalized to [0, 180] via the (delta + 540) % 360 - 180 "
    "wrap-around identity that correctly handles turns crossing "
    "north. Planar approximation consistent with the projected "
    "fixture coordinates (the geodesic version swaps in the "
    "spherical bearing formula, same per-row shape). Pure codegen "
    "projection, zero exchanges; the turn-angle profile is the "
    "route-quality signal (switchback detection) in cycling-network "
    "audits. Reference anchor: /root/reference/src/"
    "process_cycle_networks.py route geometry derivations.",
)
def geo_route_bearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    src = _synth_coords(n, "n_nationkey")
    c = F.col("coordinates")
    b1 = F.degrees(F.atan2(c[1][0] - c[0][0], c[1][1] - c[0][1]))
    b2 = F.degrees(F.atan2(c[2][0] - c[1][0], c[2][1] - c[1][1]))
    turn = F.abs(((b2 - b1 + 540.0) % 360.0) - 180.0)
    return src.select(
        "n_nationkey",
        F.round(b1, 6).alias("initial_bearing_deg"),
        F.round(b2, 6).alias("final_bearing_deg"),
        F.round(turn, 6).alias("turn_angle_deg"),
    ).orderBy("n_nationkey")
