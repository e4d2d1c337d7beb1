"""Geo-module golden cross-checks (r8): the last 10 uncovered geo ops.

The WKT/coordinate family recomputes string geometry from the same
synthesized nation-keyed linestrings in plain Python; the headline test
is an INDEPENDENT scalar-Python implementation of the full
grid-corrected BNG -> WGS84 chain (bilinear shift field, iterative
meridional-arc inversion, OS guide VII-XII series, position-vector
Helmert, iterative geodetic conversion) — same published OS algorithm
and constants, none of the op's numpy code — checked to the op's
8-decimal rounding. With these, geo joins FORMULA_DENSE_MODULES.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def nations():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT n_nationkey, n_name, n_regionkey FROM '{SF}/nation.parquet'"
    ).fetchall()
    con.close()
    return rows


@pytest.fixture(scope="module")
def ops(spark):
    reg = registry()

    def run(op_id):
        return [r.asDict() for r in reg[op_id].fn(spark, SF).collect()]

    return run


def close(got, want, tol=1e-4):
    assert got == pytest.approx(want, rel=tol, abs=tol), (got, want)


def _coords(k: int) -> list[tuple[float, float]]:
    """The ops' synthesized 3-point linestring per nation key."""
    return [
        (float((k * 13) % 700000), float((k * 29) % 1000000)),
        (float((k * 13 + 1000) % 700000), float((k * 29 + 2000) % 1000000)),
        (float((k * 13 + 5000) % 700000), float((k * 29 + 3000) % 1000000)),
    ]


def _wkt(pts) -> str:
    return "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"


def test_geom_to_wkt(ops, nations):
    got = {r["n_nationkey"]: (r["wkt"], r["ewkt"]) for r in ops("geom-to-wkt")}
    for k, _name, _rk in nations:
        w = _wkt(_coords(k))
        assert got[k] == (w, "SRID=4326;" + w)


def test_geom_to_ewkt(ops, nations):
    got = {r["n_nationkey"]: r["ewkt"] for r in ops("geom-to-ewkt")}
    for k, _name, _rk in nations:
        assert got[k] == "SRID=4326;" + _wkt(_coords(k))


def test_wkt_to_geom_roundtrip(ops, nations):
    got = {r["n_nationkey"]: r["wkt_roundtrip"] for r in ops("wkt-to-geom")}
    for k, _name, _rk in nations:
        assert got[k] == _wkt(_coords(k))


def test_coord_swap(ops, nations):
    got = {r["n_nationkey"]: r["latlon_wkt"] for r in ops("coord-swap")}
    for k, _name, _rk in nations:
        swapped = [(y, x) for x, y in _coords(k)]
        assert got[k] == _wkt(swapped)


def test_explode_multigeom(ops, nations):
    got = {
        (r["n_nationkey"], r["part_idx"]): r["part_wkt"]
        for r in ops("explode-multigeom")
    }
    want = {}
    for k, _name, _rk in nations:
        base = _coords(k)
        shifted = [(x + 10000, y + 20000) for x, y in base]
        want[(k, 1)] = _wkt(base)
        want[(k, 2)] = _wkt(shifted)
    assert got == want


def test_derive_route_length(ops, nations):
    got = {r["n_nationkey"]: r["route_length_m"] for r in ops("derive-route-length")}
    for k, _name, _rk in nations:
        p = _coords(k)
        want = math.dist(p[0], p[1]) + math.dist(p[1], p[2])
        close(got[k], want, tol=1e-4)


def test_agg_geo_bounds(ops, nations):
    xs, ys = [], []
    for k, _name, _rk in nations:
        for x, y in _coords(k):
            xs.append(x)
            ys.append(y)
    (row,) = ops("agg-geo-bounds")
    close(row["minx"], min(xs), tol=1e-4)
    close(row["miny"], min(ys), tol=1e-4)
    close(row["maxx"], max(xs), tol=1e-4)
    close(row["maxy"], max(ys), tol=1e-4)
    close(row["center_x"], (min(xs) + max(xs)) / 2, tol=1e-4)
    close(row["center_y"], (min(ys) + max(ys)) / 2, tol=1e-4)


def test_scan_geojson(ops, nations):
    got = {r["n_nationkey"]: r for r in ops("scan-geojson")}
    assert set(got) == {k for k, _n, _r in nations}
    for k, name, rk in nations:
        r = got[k]
        assert (
            r["n_name"], r["n_regionkey"], r["geometry_type"],
            r["n_points"], r["source_file"],
        ) == (name, rk, "LineString", 2, "nation.geojson")


def test_sink_csv_wkt(ops, nations):
    got = {r["n_nationkey"]: r["geometry_wkt"] for r in ops("sink-csv-wkt")}
    for k, _name, _rk in nations:
        pts = _coords(k)[:2]
        assert got[k] == _wkt(pts)


# ---------------------------------------------------------------------------
# END-TO-END grid-corrected BNG -> WGS84, re-derived in scalar Python
# from the published OS algorithm ("A guide to coordinate systems in
# Great Britain"): none of the op's numpy code, independent loop/
# convergence structure, same public constants.

_A, _B = 6377563.396, 6356256.909  # Airy 1830
_F0 = 0.9996012717
_LAT0, _LON0 = math.radians(49.0), math.radians(-2.0)
_N0, _E0 = -100000.0, 400000.0


def _shift(e: float, n: float) -> tuple[float, float]:
    """The synthetic demo shift field at a grid NODE (spec constants)."""
    se = (
        91.0
        + 8 * math.sin(e / 200000.0)
        + 5 * math.cos(n / 300000.0)
        + 2 * math.sin((e + n) / 400000.0)
    )
    sn = (
        -72.0
        + 6 * math.cos(e / 250000.0)
        + 7 * math.sin(n / 350000.0)
        + 2 * math.cos((e - n) / 450000.0)
    )
    return se, sn


def _bilinear_shift(e: float, n: float) -> tuple[float, float]:
    e0 = math.floor(e / 10000) * 10000
    n0 = math.floor(n / 10000) * 10000
    tx = (e - e0) / 10000
    ty = (n - n0) / 10000
    se00, sn00 = _shift(e0, n0)
    se10, sn10 = _shift(e0 + 10000, n0)
    se01, sn01 = _shift(e0, n0 + 10000)
    se11, sn11 = _shift(e0 + 10000, n0 + 10000)
    w00, w10, w01, w11 = (1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty
    return (
        se00 * w00 + se10 * w10 + se01 * w01 + se11 * w11,
        sn00 * w00 + sn10 * w10 + sn01 * w01 + sn11 * w11,
    )


def _meridional_arc(phi: float) -> float:
    nr = (_A - _B) / (_A + _B)
    dphi, sphi = phi - _LAT0, phi + _LAT0
    return _B * _F0 * (
        (1 + nr + 1.25 * nr**2 + 1.25 * nr**3) * dphi
        - (3 * nr + 3 * nr**2 + (21 / 8) * nr**3) * math.sin(dphi) * math.cos(sphi)
        + ((15 / 8) * (nr**2 + nr**3)) * math.sin(2 * dphi) * math.cos(2 * sphi)
        - (35 / 24) * nr**3 * math.sin(3 * dphi) * math.cos(3 * sphi)
    )


def _bng_to_wgs84(E: float, N: float) -> tuple[float, float]:
    e2 = 1 - (_B * _B) / (_A * _A)
    # iterate the meridional arc to convergence (the op unrolls a fixed
    # count; both land on the same fixed point far below 1e-8 deg)
    phi = (N - _N0) / (_A * _F0) + _LAT0
    for _ in range(100):
        M = _meridional_arc(phi)
        if abs(N - _N0 - M) < 1e-10:
            break
        phi += (N - _N0 - M) / (_A * _F0)
    s, c, t = math.sin(phi), math.cos(phi), math.tan(phi)
    nu = _A * _F0 / math.sqrt(1 - e2 * s * s)
    rho = _A * _F0 * (1 - e2) / (1 - e2 * s * s) ** 1.5
    eta2 = nu / rho - 1
    VII = t / (2 * rho * nu)
    VIII = t / (24 * rho * nu**3) * (5 + 3 * t * t + eta2 - 9 * t * t * eta2)
    IX = t / (720 * rho * nu**5) * (61 + 90 * t * t + 45 * t**4)
    X = 1 / (c * nu)
    XI = (nu / rho + 2 * t * t) / (6 * c * nu**3)
    XII = (5 + 28 * t * t + 24 * t**4) / (120 * c * nu**5)
    XIIA = (61 + 662 * t * t + 1320 * t**4 + 720 * t**6) / (5040 * c * nu**7)
    dE = E - _E0
    lat_os = phi - VII * dE**2 + VIII * dE**4 - IX * dE**6
    lon_os = _LON0 + X * dE - XI * dE**3 + XII * dE**5 - XIIA * dE**7
    # OSGB36 geodetic -> cartesian (h=0)
    sp, cp = math.sin(lat_os), math.cos(lat_os)
    nu2 = _A / math.sqrt(1 - e2 * sp * sp)
    x = nu2 * cp * math.cos(lon_os)
    y = nu2 * cp * math.sin(lon_os)
    z = (1 - e2) * nu2 * sp
    # position-vector Helmert, OSGB36 -> WGS84 (public OS parameters)
    tx, ty, tz = 446.448, -125.157, 542.060
    rx, ry, rz = (math.radians(v / 3600) for v in (0.1502, 0.2470, 0.8421))
    sc = -20.4894e-6
    x2 = tx + (1 + sc) * x - rz * y + ry * z
    y2 = ty + rz * x + (1 + sc) * y - rx * z
    z2 = tz - ry * x + rx * y + (1 + sc) * z
    # WGS84 cartesian -> geodetic, iterate to convergence
    a84, b84 = 6378137.0, 6356752.3142
    e284 = 1 - (b84 * b84) / (a84 * a84)
    p = math.hypot(x2, y2)
    lat = math.atan2(z2, p * (1 - e284))
    for _ in range(50):
        nu_w = a84 / math.sqrt(1 - e284 * math.sin(lat) ** 2)
        new = math.atan2(z2 + e284 * nu_w * math.sin(lat), p)
        if abs(new - lat) < 1e-14:
            lat = new
            break
        lat = new
    return math.degrees(math.atan2(y2, x2)), math.degrees(lat)


def test_geo_reproject_corrected(ops, nations):
    got = {r["n_nationkey"]: (r["lon"], r["lat"]) for r in ops("geo-reproject-corrected")}
    assert set(got) == {k for k, _n, _r in nations}
    for k, _name, _rk in nations:
        e = 300000.0 + k * 1000
        n = 600000.0 + k * 1000
        se, sn = _bilinear_shift(e, n)
        lon, lat = _bng_to_wgs84(e - se, n - sn)
        glon, glat = got[k]
        close(glon, lon, tol=2e-8)
        close(glat, lat, tol=2e-8)
