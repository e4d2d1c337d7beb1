"""Golden cross-checks, geo wave 2: the synthetic grid-shift bilinear
interpolation, the OS National Grid letter encoding, and the
grid-blocked spatial join. Plain-Python recomputation from the
published formulas (the OSGB letter algebra is the spec; the shift
field's trig formula is stated in queries/geo.py). The WGS84
reprojection ops are covered by the golden control points in
tests/test_pipelines.py.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("nation", "customer", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def ops(spark):
    reg = registry()

    def run(op_id):
        return [r.asDict() for r in reg[op_id].fn(spark, SF).collect()]

    return run


def close(got, want, tol=1e-4):
    assert got == pytest.approx(want, rel=tol, abs=tol), (got, want)


def _shift_e(e, n):
    return (91.0 + 8 * math.sin(e / 200000.0) + 5 * math.cos(n / 300000.0)
            + 2 * math.sin((e + n) / 400000.0))


def _shift_n(e, n):
    return (-72.0 + 6 * math.cos(e / 250000.0) + 7 * math.sin(n / 350000.0)
            + 2 * math.cos((e - n) / 450000.0))


def _bilinear(e, n):
    e0 = math.floor(e / 10000) * 10000
    n0 = math.floor(n / 10000) * 10000
    tx, ty = (e - e0) / 10000, (n - n0) / 10000
    se = (_shift_e(e0, n0) * (1 - tx) * (1 - ty)
          + _shift_e(e0 + 10000, n0) * tx * (1 - ty)
          + _shift_e(e0, n0 + 10000) * (1 - tx) * ty
          + _shift_e(e0 + 10000, n0 + 10000) * tx * ty)
    sn = (_shift_n(e0, n0) * (1 - tx) * (1 - ty)
          + _shift_n(e0 + 10000, n0) * tx * (1 - ty)
          + _shift_n(e0, n0 + 10000) * (1 - tx) * ty
          + _shift_n(e0 + 10000, n0 + 10000) * tx * ty)
    return se, sn


def test_reproject_gridshift(ops, duck):
    ks = sorted(
        duck.execute("SELECT n_nationkey FROM nation").df()
        .n_nationkey.astype(int)
    )
    rows = {r["n_nationkey"]: r for r in ops("geo-reproject-gridshift")}
    assert set(rows) == set(ks)
    for k in ks:
        e, n = 300000.0 + k * 1000, 600000.0 + k * 1000
        se, sn = _bilinear(e, n)
        r = rows[k]
        close(r["shift_e"], se, tol=1e-3)
        close(r["shift_n"], sn, tol=1e-3)
        close(r["e_corrected"], e - se, tol=1e-3)
        close(r["n_corrected"], n - sn, tol=1e-3)


GRID_CHARS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"


def os_grid_sq(e: float, n: float) -> str:
    """First two letters of the OS grid reference (the published
    100km-square letter algebra; '' outside the valid domain)."""
    e100k, n100k = math.floor(e / 100000), math.floor(n / 100000)
    if not (0 <= e100k <= 6 and 0 <= n100k <= 12):
        return ""
    l1 = (19 - n100k) - (19 - n100k) % 5 + math.floor((e100k + 10) / 5)
    l2 = (19 - n100k) * 5 % 25 + e100k % 5
    return GRID_CHARS[int(l1)] + GRID_CHARS[int(l2)]


def test_geo_partition_key(ops, duck):
    df = duck.execute(
        "SELECT (l_partkey * 37) % 700000 AS e,"
        " (l_orderkey * 53) % 1000000 AS n FROM lineitem"
    ).df()
    cnt = Counter(
        os_grid_sq(float(r.e), float(r.n)) for r in df.itertuples()
    )
    rows = {r["grid_sq"]: r["n_points"] for r in ops("geo-partition-key")}
    assert rows == dict(cnt)


_PIP_ZONES = [
    ("tri", [(100.0, 100.0), (500.0, 100.0), (300.0, 450.0)]),
    ("quad", [(550.0, 500.0), (950.0, 520.0), (900.0, 900.0),
              (600.0, 870.0)]),
    ("ell", [(50.0, 600.0), (350.0, 600.0), (350.0, 750.0),
             (200.0, 750.0), (200.0, 950.0), (50.0, 950.0)]),
]


def _inside(px, py, poly):
    total = 0
    n = len(poly)
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[(i + 1) % n]
        if yi == yj:
            continue
        if ((yi > py) != (yj > py)) and (
            px < (xj - xi) * (py - yi) / (yj - yi) + xi
        ):
            total += 1
    return total % 2 == 1


def test_join_spatial_grid(ops, duck):
    ks = duck.execute("SELECT c_custkey FROM customer").df().c_custkey
    agg: dict = defaultdict(lambda: [0, 0])
    for k in ks.astype(int):
        px, py = float(k * 17 % 1000), float(k * 31 % 1000)
        for name, poly in _PIP_ZONES:
            if _inside(px, py, poly):
                agg[name][0] += 1
                agg[name][1] += k
    rows = {r["zone"]: r for r in ops("join-spatial-grid")}
    assert set(rows) == set(agg)
    for z, (np_, ksum) in agg.items():
        assert (rows[z]["n_points"], rows[z]["key_sum"]) == (np_, ksum)
