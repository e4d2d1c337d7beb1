"""Golden cross-checks for the privacy, sample, and geo families
(round-7 sweep). Deterministic mechanisms (salted-hash inverse-CDF DP
noise, hash splits, priority sampling) and geometry formulas (ray-cast
PIP, haversine, shoelace, bearings) rebuilt in plain Python over the
raw sf0.01 parquet rows. Same third-implementation contract as the
other test_golden_* suites.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"
P = 2147483647


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("nation", "customer", "orders", "lineitem", "events",
              "documents"):
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


def string_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16) % P


def rnd(x, d):
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 10**d + 0.5) / 10**d


def ansi_ntile(pos: int, n: int, k: int) -> int:
    q, r = divmod(n, k)
    if pos < r * (q + 1):
        return pos // (q + 1) + 1
    return r + (pos - r * (q + 1)) // max(q, 1) + 1


# ---------------------------------------------------------------------------
# privacy


@pytest.fixture(scope="module")
def customer(duck):
    return duck.execute(
        "SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal"
        " FROM customer ORDER BY c_custkey"
    ).df()


def test_k_anonymity(ops, customer):
    cells = Counter(
        (r.c_nationkey, r.c_mktsegment, int(r.c_custkey) % 8)
        for r in customer.itertuples()
    )
    K = 5
    viol = [n for n in cells.values() if n < K]
    (row,) = ops("privacy-k-anonymity")
    assert row["k"] == K
    assert row["n_cells"] == len(cells)
    assert row["n_violating_cells"] == len(viol)
    assert row["n_rows_at_risk"] == sum(viol)
    close(row["suppression_rate"], sum(viol) / len(customer))


def test_generalization_ladder(ops, customer):
    K = 5
    rows = {r["band_width"]: r for r in ops("privacy-generalization-ladder")}
    for w in (1, 2, 4, 8):
        cells = Counter(
            (r.c_nationkey, r.c_mktsegment, (int(r.c_custkey) % 8) // w)
            for r in customer.itertuples()
        )
        viol = [n for n in cells.values() if n < K]
        r = rows[w]
        assert r["n_cells"] == len(cells)
        assert r["n_violating_cells"] == len(viol)
        close(r["suppression_rate"], sum(viol) / len(customer))


def test_l_diversity(ops, customer):
    cells: dict = defaultdict(lambda: [0, set()])
    for r in customer.itertuples():
        c = cells[(r.c_nationkey, r.c_mktsegment)]
        c[0] += 1
        c[1].add(math.floor(r.c_acctbal / 1000))
    rows = {(r["c_nationkey"], r["c_mktsegment"]): r
            for r in ops("privacy-l-diversity")}
    assert set(rows) == set(cells)
    for k, (n, bands) in cells.items():
        r = rows[k]
        assert (r["k_size"], r["l_distinct"]) == (n, len(bands))
        assert r["violates_l"] == (len(bands) < 3)


def test_t_closeness(ops, customer):
    total = len(customer)
    overall = {
        s: n / total for s, n in Counter(customer.c_mktsegment).items()
    }
    per: dict = defaultdict(Counter)
    for r in customer.itertuples():
        per[r.c_nationkey][r.c_mktsegment] += 1
    rows = {r["c_nationkey"]: r for r in ops("privacy-t-closeness")}
    assert set(rows) == set(per)
    for nk, cnt in per.items():
        gn = sum(cnt.values())
        t = 0.5 * sum(
            abs(cnt.get(s, 0) / gn - p) for s, p in overall.items()
        )
        r = rows[nk]
        assert r["group_n"] == gn
        close(r["t_distance"], t)
        assert r["meets_t02"] == (t <= 0.2)


def _segments(customer):
    return Counter(customer.c_mktsegment)


def test_dp_laplace(ops, customer):
    segs = _segments(customer)
    rows = {r["c_mktsegment"]: r for r in ops("privacy-dp-laplace")}
    B = 2.0  # sensitivity 1 / eps 0.5
    for s, n in segs.items():
        u = string_hash(s + ":dp-salt-r2") / 2147483647.0
        if u >= 0.5:
            noise = -B * math.log(2.0 * (1.0 - u) + 1e-15)
        else:
            noise = B * math.log(2.0 * u + 1e-15)
        r = rows[s]
        assert r["true_n"] == n
        close(r["released_n"], n + noise, tol=1e-3)
        close(r["abs_noise"], abs(noise), tol=1e-3)


def test_dp_gaussian(ops, customer):
    segs = _segments(customer)
    SIG = 9.689610525210778
    rows = {r["c_mktsegment"]: r for r in ops("privacy-dp-gaussian")}
    for s, n in segs.items():
        u1 = string_hash(s + ":gauss-u1") / 2147483647.0 + 1e-15
        u2 = string_hash(s + ":gauss-u2") / 2147483647.0
        noise = SIG * math.sqrt(-2 * math.log(u1)) * math.cos(
            2 * math.pi * u2
        )
        r = rows[s]
        assert r["true_n"] == n
        close(r["released_n"], n + noise, tol=1e-3)
        close(r["abs_noise"], abs(noise), tol=1e-3)


def test_dp_exponential(ops, customer):
    segs = _segments(customer)
    scored = []
    for s, n in segs.items():
        u = string_hash(s + ":expmech-u") / 2147483647.0 + 1e-15
        g = -math.log(-math.log(u))
        scored.append((0.25 * n + g, s, n))
    # rank desc by score, tie-break seg asc: winner = max score (ties
    # broken by LOWEST segment name)
    best = sorted(scored, key=lambda t: (-t[0], t[1]))[0]
    rows = {r["c_mktsegment"]: r for r in ops("privacy-dp-exponential")}
    for score, s, n in scored:
        r = rows[s]
        assert r["true_n"] == n
        close(r["noisy_score"], score)
        assert r["selected"] == (1 if s == best[1] else 0)


def test_randomized_response(ops, duck):
    df = duck.execute(
        "SELECT user_id, max(CASE WHEN event_type='purchase' THEN 1 ELSE 0"
        " END) AS truth FROM events GROUP BY user_id"
    ).df()
    resp = []
    for r in df.itertuples():
        uid = int(r.user_id)
        c1 = (uid * 2654435761 % 2147483648) / 2147483648.0
        c2 = (uid * 2246822519 % 2147483648) / 2147483648.0
        resp.append(r.truth if c1 < 0.5 else (1 if c2 < 0.5 else 0))
    (row,) = ops("privacy-randomized-response")
    assert row["n_users"] == len(df)
    close(row["reported_rate"], np.mean(resp))
    close(row["debiased_estimate"], (np.mean(resp) - 0.25) / 0.5)
    close(row["true_rate"], df.truth.mean())


def test_ldp_histogram(ops, duck):
    uids = duck.execute(
        "SELECT DISTINCT user_id FROM events"
    ).df().user_id.astype(int)
    reported: Counter = Counter()
    truth: Counter = Counter()
    for uid in uids:
        tb = uid % 4
        truth[tb] += 1
        c1 = (uid * 2654435761 % 2147483648) / 2147483648.0
        rb = (uid * 2246822519 % 2147483648) % 4
        reported[tb if c1 < 0.5 else rb] += 1
    n = sum(reported.values())
    rows = {r["bucket"]: r for r in ops("privacy-ldp-histogram")}
    assert set(rows) == set(reported)
    for b, c in reported.items():
        r = rows[b]
        assert r["reported_count"] == c
        close(r["debiased_count"], (c - n * 0.5 / 4) / 0.5, tol=1e-2)
        assert r["true_count"] == truth[b]


def test_mask_battery(ops, customer):
    import re
    rows = {r["aes_roundtrip"]: r for r in ops("privacy-mask-battery")}
    for r in customer.itertuples():
        g = rows[r.c_name]
        masked = re.sub(r"[0-9]", "n",
                        re.sub(r"[a-z]", "x", re.sub(r"[A-Z]", "X", r.c_name)))
        custom = re.sub(r"[0-9]", "#",
                        re.sub(r"[a-z]", "*", re.sub(r"[A-Z]", "*", r.c_name)))
        assert g["masked_default"] == masked
        assert g["masked_custom"] == custom
        assert g["ct_bytes"] == (len(r.c_name) // 16 + 1) * 16


# ---------------------------------------------------------------------------
# sampling


@pytest.fixture(scope="module")
def docs(duck):
    return duck.execute(
        "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"
    ).df()


def test_hash_split(ops, docs):
    cells: Counter = Counter()
    for r in docs.itertuples():
        slot = string_hash(f"{int(r.doc_id)}:split-salt-r1") % 10
        split = "train" if slot < 8 else ("val" if slot == 8 else "test")
        cells[(r.lang, split)] += 1
    rows = {(r["lang"], r["split"]): r["n_docs"]
            for r in ops("sample-hash-split")}
    assert rows == dict(cells)


def test_stratified(ops, docs):
    want = set()
    for lang, g in docs.groupby("lang"):
        members = sorted(
            (hashlib.md5(str(int(i)).encode()).hexdigest(), int(i))
            for i in g.doc_id
        )
        k = math.ceil(0.2 * len(members))
        want |= {(i, lang) for _, i in members[:k]}
    got = {(r["doc_id"], r["lang"]) for r in ops("sample-stratified")}
    assert got == want


def test_class_balance(ops, docs):
    counts = Counter(docs.lang)
    m = min(counts.values())
    cells: dict = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        thr = math.floor(1000000 * m / counts[r.lang])
        keep = string_hash(f"{int(r.doc_id)}:classbal-salt-r5") % 1000000 < thr
        cells[r.lang][0] += 1
        cells[r.lang][1] += int(keep)
    rows = {r["lang"]: r for r in ops("sample-class-balance")}
    assert set(rows) == set(cells)
    for lang, (nb, nk) in cells.items():
        r = rows[lang]
        assert (r["n_before"], r["n_kept"]) == (nb, nk)
        close(r["keep_rate"], nk / nb)


def test_fixed_k_per_group(ops, duck):
    df = duck.execute(
        "SELECT event_id, event_type FROM events"
    ).df()
    want = set()
    for et, g in df.groupby("event_type"):
        hs = sorted(
            (string_hash(f"{int(i)}:fixk"), int(i)) for i in g.event_id
        )
        want |= {(et, i, rn + 1) for rn, (_, i) in enumerate(hs[:50])}
    got = {(r["event_type"], r["event_id"], r["rn"])
           for r in ops("sample-fixed-k-per-group")}
    assert got == want


def test_weighted_priority(ops, duck):
    df = duck.execute(
        "SELECT c_custkey AS c, sum(o_totalprice) AS w"
        " FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY 1"
    ).df()
    # ORDER BY references the output alias, i.e. the priority ROUNDED
    # to 6dp — u^(1/w) for large weights rounds to 1.0, so the top-10
    # is decided by the custkey tie-break among the rounded ties
    scored = sorted(
        (
            -rnd(
                (((int(r.c) * 2654435761 % 2147483648) + 0.5) / 2147483648.0)
                ** (1.0 / r.w),
                6,
            ),
            int(r.c),
            r.w,
        )
        for r in df.itertuples()
    )[:10]
    got = ops("sample-weighted-priority")
    assert [(r["c_custkey"]) for r in got] == [c for _, c, _ in scored]
    for g, (p, c, w) in zip(got, scored):
        close(g["weight"], w, tol=1e-6)
        close(g["priority"], -p)


def test_reservoir_weighted(ops, duck):
    df = duck.execute(
        "SELECT event_id, event_type, value FROM events"
    ).df()
    scored = sorted(
        (
            -(math.log((string_hash(f"{int(r.event_id)}:reservoir-salt-r5")
                        + 0.5) / P) / (r.value + 1.0)),
            int(r.event_id),
            r.event_type,
            r.value,
        )
        for r in df.itertuples()
    )[:32]
    got = ops("sample-reservoir-weighted")
    assert [r["event_id"] for r in got] == [i for _, i, _, _ in scored]
    for g, (k, i, et, v) in zip(got, scored):
        assert g["event_type"] == et
        close(g["weight_minus_1"], v, tol=1e-3)
        close(g["res_key"], -k)


def test_poisson_bootstrap(ops, duck):
    df = duck.execute("SELECT event_id, value FROM events").df()
    CDF = (0.367879, 0.735759, 0.919699, 0.981012)
    means = []
    for rep in range(16):
        num = den = 0.0
        for r in df.itertuples():
            u = int(
                hashlib.md5(f"{int(r.event_id)}:{rep}".encode())
                .hexdigest()[:12], 16
            ) / 281474976710656.0
            w = 4
            for k, c in enumerate(CDF):
                if u < c:
                    w = k
                    break
            num += w * r.value
            den += w
        means.append(rnd(num / den, 6))
    (row,) = ops("sample-poisson-bootstrap")
    assert row["n_replicas"] == 16
    close(row["mean_of_means"], np.mean(means))
    close(row["ci_lo"], np.percentile(means, 2.5, method="linear"), tol=1e-3)
    close(row["ci_hi"], np.percentile(means, 97.5, method="linear"), tol=1e-3)
    close(row["boot_se"], np.std(means, ddof=1), tol=1e-3)


def test_neyman_allocation(ops, docs):
    members = sorted(
        (int(r.n_chars), int(r.doc_id)) for r in docs.itertuples()
    )
    strata: dict = defaultdict(list)
    for pos, (nc, _) in enumerate(members):
        strata[ansi_ntile(pos, len(members), 5)].append(float(nc))
    z = sum(len(v) * np.std(v, ddof=1) for v in strata.values())
    n_tot = sum(len(v) for v in strata.values())
    rows = {r["stratum"]: r for r in ops("sample-neyman-allocation")}
    assert set(rows) == set(strata)
    for st, vals in strata.items():
        r = rows[st]
        nh, sh = len(vals), np.std(vals, ddof=1)
        assert r["stratum_size"] == nh
        close(r["stratum_mean"], np.mean(vals), tol=1e-3)
        close(r["stratum_sd"], sh, tol=1e-3)
        assert r["neyman_n"] == int(rnd(100.0 * nh * sh / z, 0))
        assert r["proportional_n"] == int(rnd(100.0 * nh / n_tot, 0))


# ---------------------------------------------------------------------------
# geometry


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


def test_point_in_polygon(ops, customer):
    rows = {(r["px"], r["py"]): r for r in ops("geo-point-in-polygon")}
    for r in customer.itertuples():
        px = float(int(r.c_custkey) * 17 % 1000)
        py = float(int(r.c_custkey) * 31 % 1000)
        zone = "none"
        hits = 0
        for name, poly in _PIP_ZONES:
            if _inside(px, py, poly):
                hits += 1
                if zone == "none":
                    zone = name
        g = rows[(px, py)]
        assert g["zone"] == zone
        assert g["zones_hit"] == hits


def test_haversine_nearest(ops, duck):
    nk = duck.execute(
        "SELECT n_nationkey AS k, n_name FROM nation ORDER BY 1"
    ).df()
    pts = {
        int(r.k): (
            float(int(r.k) * 7 % 120) - 60.0 + 0.5,
            float(int(r.k) * 13 % 340) - 170.0 + 0.5,
            r.n_name,
        )
        for r in nk.itertuples()
    }

    def hav_km(a, b):
        la1, lo1 = map(math.radians, pts[a][:2])
        la2, lo2 = map(math.radians, pts[b][:2])
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    rows = {r["k"]: r for r in ops("geo-haversine-nearest")}
    assert set(rows) == set(pts)
    for a in pts:
        best = min(
            (rnd(hav_km(a, b), 3), b) for b in pts if b != a
        )
        r = rows[a]
        assert (r["nearest_k"], r["dist_km"]) == (best[1], best[0])
        assert r["n_name"] == pts[a][2]


def test_polygon_area(ops, duck):
    ks = duck.execute("SELECT n_nationkey FROM nation").df().n_nationkey
    rows = {r["k"]: r for r in ops("geo-polygon-area")}
    for k in ks.astype(int):
        x0, y0 = float(k * 3 % 17), float(k * 5 % 23)
        x1, y1 = x0 + 10, float(k * 7 % 13)
        x2, y2 = float(k * 11 % 19) + 4, y0 + 12
        s2 = (x0 * y1 - x1 * y0) + (x1 * y2 - x2 * y1) + (x2 * y0 - x0 * y2)
        r = rows[k]
        close(r["area"], abs(s2) / 2, tol=1e-6)
        assert r["is_ccw"] == (s2 > 0)


def _synth(k):
    return [
        (float(k * 13 % 700000), float(k * 29 % 1000000)),
        (float((k * 13 + 1000) % 700000), float((k * 29 + 2000) % 1000000)),
        (float((k * 13 + 5000) % 700000), float((k * 29 + 3000) % 1000000)),
    ]


def test_line_interpolate(ops, duck):
    ks = sorted(
        duck.execute("SELECT n_nationkey FROM nation").df()
        .n_nationkey.astype(int)
    )
    got = ops("geo-line-interpolate")
    assert len(got) == len(ks)
    for g, k in zip(got, ks):
        (x1, y1), (x2, y2), (x3, y3) = _synth(k)
        l1 = math.hypot(x2 - x1, y2 - y1)
        l2 = math.hypot(x3 - x2, y3 - y2)
        half = (l1 + l2) / 2
        if half <= l1:
            mx, my = x1 + (x2 - x1) * half / l1, y1 + (y2 - y1) * half / l1
        else:
            mx = x2 + (x3 - x2) * (half - l1) / l2
            my = y2 + (y3 - y2) * (half - l1) / l2
        close(g["mid_x"], mx, tol=1e-3)
        close(g["mid_y"], my, tol=1e-3)
        close(g["total_len"], l1 + l2, tol=1e-3)


def test_route_bearing(ops, duck):
    ks = sorted(
        duck.execute("SELECT n_nationkey FROM nation").df()
        .n_nationkey.astype(int)
    )
    got = ops("geo-route-bearing")
    assert len(got) == len(ks)
    for g, k in zip(got, ks):
        (x1, y1), (x2, y2), (x3, y3) = _synth(k)
        b1 = math.degrees(math.atan2(x2 - x1, y2 - y1))
        b2 = math.degrees(math.atan2(x3 - x2, y3 - y2))
        turn = abs(math.fmod(b2 - b1 + 540.0, 360.0) - 180.0)
        close(g["initial_bearing_deg"], b1, tol=1e-3)
        close(g["final_bearing_deg"], b2, tol=1e-3)
        close(g["turn_angle_deg"], turn, tol=1e-3)


def test_grid_rollup_multires(ops, duck):
    df = duck.execute(
        "SELECT (l_partkey * 37) % 700000 AS e,"
        " (l_orderkey * 53) % 1000000 AS n, l_extendedprice AS w"
        " FROM lineitem"
    ).df()
    coarse: dict = defaultdict(lambda: [0, 0.0])
    fine: dict = defaultdict(lambda: [0, 0.0])
    for r in df.itertuples():
        e, n = int(r.e), int(r.n)
        c = coarse[(e // 100000, n // 100000)]
        c[0] += 1
        c[1] += r.w
        f = fine[(e // 10000, n // 10000)]
        f[0] += 1
        f[1] += r.w
    rows = {(r["resolution"], r["cell_x"], r["cell_y"]): r
            for r in ops("geo-grid-rollup-multires")}
    assert len(rows) == len(coarse) + len(fine)
    for (cx, cy), (np_, w) in coarse.items():
        r = rows[("100km", cx, cy)]
        assert r["n_points"] == np_
        close(r["weight"], w, tol=1e-6)
    for (cx, cy), (np_, w) in fine.items():
        r = rows[("10km", cx, cy)]
        assert r["n_points"] == np_
        close(r["weight"], w, tol=1e-6)
