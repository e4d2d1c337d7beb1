"""Golden cross-checks for the agg family's formula-dense tail
(round-7 sweep): raw-moment batteries, correlation/regression,
robust/weighted quantiles, mergeable-variance algebra, deterministic
CMS/KMV sketches, frequency moments. Raw sf0.01 rows via DuckDB; math
rebuilt in numpy/Counter. (The battery-style relational aggs — cube,
pivot, filter-clause, argminmax, bool — are SQL-semantics ops where the
DuckDB oracle IS an independent implementation; no golden needed.)
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
    for t in ("orders", "lineitem", "events", "documents", "customer"):
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


def test_moments_battery(ops, duck):
    df = duck.execute("SELECT event_type, value FROM events").df()
    rows = {r["event_type"]: r for r in ops("agg-moments-battery")}
    for et, g in df.groupby("event_type"):
        x = g.value.to_numpy()
        m1, m2 = x.mean(), (x**2).mean()
        m3, m4 = (x**3).mean(), (x**4).mean()
        var = m2 - m1 * m1
        r = rows[et]
        assert r["n"] == len(x)
        close(r["mean"], m1)
        close(r["variance"], var)
        close(r["skewness_g1"], (m3 - 3 * m1 * m2 + 2 * m1**3) / var**1.5)
        close(r["excess_kurtosis_g2"],
              (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1**4) / var**2 - 3)


def test_corr_stats(ops, duck):
    df = duck.execute(
        "SELECT l_returnflag AS f, l_quantity AS q, l_extendedprice AS p,"
        " l_discount AS d, l_tax AS t FROM lineitem"
    ).df()
    rows = {r["l_returnflag"]: r for r in ops("agg-corr-stats")}
    for f, g in df.groupby("f"):
        r = rows[f]
        close(r["qty_price_corr"], np.corrcoef(g.q, g.p)[0, 1])
        close(r["qty_price_covar"],
              ((g.q - g.q.mean()) * (g.p - g.p.mean())).mean(), tol=1e-3)
        close(r["disc_stddev"], g.d.std(ddof=1))
        close(r["tax_var"], g.t.var(ddof=0))


def test_corr_matrix(ops, duck):
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    df = duck.execute(f"SELECT {', '.join(cols)} FROM lineitem").df()
    rows = {(r["col_a"], r["col_b"]): r for r in ops("agg-corr-matrix")}
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            r = rows[(a, b)]
            close(r["pearson_r"], np.corrcoef(df[a], df[b])[0, 1])
            close(r["covariance"], np.cov(df[a], df[b], ddof=1)[0, 1],
                  tol=1e-3)


def test_regression_battery(ops, duck):
    df = duck.execute(
        "SELECT l_returnflag AS f, l_quantity AS x, l_extendedprice AS y"
        " FROM lineitem"
    ).df()
    rows = {r["l_returnflag"]: r for r in ops("agg-regression-battery")}
    for f, g in df.groupby("f"):
        slope, intercept = np.polyfit(g.x, g.y, 1)
        resid = g.y - (slope * g.x + intercept)
        r2 = 1 - (resid**2).sum() / ((g.y - g.y.mean()) ** 2).sum()
        r = rows[f]
        close(r["slope"], slope, tol=1e-3)
        close(r["intercept"], intercept, tol=1e-3)
        close(r["r2"], r2, tol=1e-4)
        assert r["n_pairs"] == len(g)
        close(r["avg_qty"], g.x.mean(), tol=1e-4)


def test_robust_mad(ops, duck):
    df = duck.execute("SELECT event_type, value FROM events").df()
    rows = {r["event_type"]: r for r in ops("agg-robust-mad")}
    for et, g in df.groupby("event_type"):
        med = np.percentile(g.value, 50, method="linear")
        mad = np.percentile(np.abs(g.value - med), 50, method="linear")
        r = rows[et]
        close(r["median_value"], med)
        close(r["mad"], mad)
        assert r["n"] == len(g)


def test_weighted_percentile(ops, duck):
    df = duck.execute(
        "SELECT l_returnflag AS f, l_extendedprice AS p, l_quantity AS q,"
        " l_orderkey AS ok, l_linenumber AS ln FROM lineitem"
    ).df()
    rows = {r["l_returnflag"]: r["weighted_median"]
            for r in ops("agg-weighted-percentile")}
    for f, g in df.groupby("f"):
        g = g.sort_values(["p", "ok", "ln"])
        cum = g.q.cumsum()
        total = g.q.sum()
        wm = g.p[cum >= total / 2].iloc[0]
        close(rows[f], wm, tol=1e-6)


def test_variance_merge(ops, duck):
    df = duck.execute(
        "SELECT l_returnflag AS f, l_linestatus AS s, l_extendedprice AS p"
        " FROM lineitem"
    ).df()
    rows = {r["l_returnflag"]: r for r in ops("agg-variance-merge")}
    for f, g in df.groupby("f"):
        # Chan parallel-merge of per-(f,s) partials
        n_tot = s_tot = m2_tot = 0.0
        parts = []
        for _, gg in g.groupby("s"):
            n, mean = len(gg), gg.p.mean()
            m2 = n * gg.p.var(ddof=0)
            parts.append((n, mean, m2))
        N = sum(n for n, _, _ in parts)
        mean_all = sum(n * m for n, m, _ in parts) / N
        m2_all = (
            sum(m2 for _, _, m2 in parts)
            + sum(n * m * m for n, m, _ in parts)
            - sum(n * m for n, m, _ in parts) ** 2 / N
        )
        direct = g.p.var(ddof=0)
        r = rows[f]
        assert r["n"] == N
        close(r["merged_var"], m2_all / N, tol=1e-3)
        close(r["direct_var"], direct, tol=1e-3)
        assert r["merge_is_lossless"] == (
            abs(m2_all / N - direct) <= 1e-6 * direct
        )


def test_histogram(ops, duck):
    prices = duck.execute(
        "SELECT l_extendedprice AS p FROM lineitem"
    ).df().p.to_numpy()
    W = 100000.0 / 20
    bins = np.minimum(np.floor(prices / W).astype(int), 19)
    cnt = Counter(bins.tolist())
    rows = {r["bin_id"]: r for r in ops("agg-histogram")}
    assert set(rows) == set(cnt)
    for b, n in cnt.items():
        r = rows[b]
        assert r["n"] == n
        close(r["bin_lo"], b * W, tol=1e-6)
        close(r["bin_hi"], (b + 1) * W, tol=1e-6)


def test_heavy_hitters(ops, duck):
    cnt: Counter = Counter()
    for (t,) in duck.execute("SELECT text FROM documents").fetchall():
        cnt.update(t.split(" "))
    total = sum(cnt.values())
    want = {t: n for t, n in cnt.items() if n / total >= 0.005}
    rows = {r["token"]: r for r in ops("agg-heavy-hitters")}
    assert set(rows) == set(want)
    for t, n in want.items():
        assert rows[t]["n"] == n
        close(rows[t]["share"], n / total)


def test_frequency_moments(ops, duck):
    cnt = duck.execute(
        "SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1"
    ).df().c.to_numpy(float)
    (row,) = ops("agg-frequency-moments")
    assert row["f0_distinct"] == len(cnt)
    assert row["f1_count"] == int(cnt.sum())
    assert row["f2_selfjoin"] == int((cnt * cnt).sum())
    assert row["finf_max"] == int(cnt.max())
    close(row["surprise_index"], (cnt * cnt).sum() * len(cnt) / cnt.sum() ** 2)
    p = cnt / cnt.sum()
    close(row["shannon_entropy_nats"], -(p * np.log(p)).sum())


def test_count_min_sketch(ops, duck):
    cnt: Counter = Counter()
    for (t,) in duck.execute("SELECT text FROM documents").fetchall():
        cnt.update(t.split(" "))
    D, W = 4, 256
    cells: Counter = Counter()
    for tok, n in cnt.items():
        for d in range(D):
            cells[(d, string_hash(f"{tok}:cms{d}") % W)] += n
    want = {}
    for tok, n in cnt.items():
        if n >= 100:
            est = min(
                cells[(d, string_hash(f"{tok}:cms{d}") % W)] for d in range(D)
            )
            want[tok] = (n, est)
    rows = {r["token"]: r for r in ops("agg-count-min-sketch")}
    assert set(rows) == set(want)
    for tok, (n, est) in want.items():
        r = rows[tok]
        assert (r["exact_n"], r["cms_est"]) == (n, est)
        assert r["never_underestimates"] == (est >= n)


def test_kmv_sketch(ops, duck):
    df = duck.execute(
        "SELECT DISTINCT event_type, user_id FROM events"
        " WHERE event_type IN ('click', 'view')"
    ).df()
    u_of = lambda uid: ((uid * 2654435761 % 2147483648) + 0.5) / 2147483648.0
    rows = {r["event_type"]: r for r in ops("agg-kmv-sketch")}
    sets = {
        et: sorted((u_of(int(i)), int(i)) for i in g.user_id)
        for et, g in df.groupby("event_type")
    }
    # union sketch for the intersection estimate
    uni = {}
    for et, lst in sets.items():
        for u, i in lst:
            rec = uni.setdefault(i, [u, False, False])
            rec[1 if et == "click" else 2] = True
    ulist = sorted((u, i, a, b) for i, (u, a, b) in uni.items())[:64]
    uk_union = ulist[-1][0]
    jacc = sum(1 for _, _, a, b in ulist if a and b) / 64
    est_inter = jacc * (63.0 / uk_union)
    for et, lst in sets.items():
        uk = lst[:64][-1][0]
        r = rows[et]
        assert r["exact_distinct"] == len(lst)
        close(r["kmv_estimate"], 63.0 / uk, tol=1e-3)
        close(r["rel_err"],
              abs(63.0 / uk - len(lst)) / len(lst), tol=1e-2)
        close(r["est_intersection"], est_inter, tol=1e-3)


def test_mode(ops, duck):
    df = duck.execute(
        "SELECT c_mktsegment AS seg, o_orderpriority AS pr"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
    ).df()
    rows = {r["c_mktsegment"]: r for r in ops("agg-mode")}
    for seg, g in df.groupby("seg"):
        cnt = Counter(g.pr)
        pr, n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = rows[seg]
        assert (r["modal_priority"], r["n"]) == (pr, n)
