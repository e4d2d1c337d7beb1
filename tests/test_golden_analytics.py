"""Independent numpy/pandas golden cross-checks for the analytics
family's formula-dense tail (VERDICT r6 item 2).

Same contract as tests/test_golden_stats.py: raw rows come straight
from the sf0.01 parquet via DuckDB (the input SPEC each op documents —
shared), and every metric is rebuilt from the published formula in
plain pandas/numpy set logic — no shared SQL, no shared DataFrame code.
The r6 sparse-grid episode proved same-author parity (op + DuckDB
oracle) hides shared formula errors; these are the third leg.

Covered here (the 8 ops with goldens in test_golden_stats.py —
event-study, hhi, conversion-ci, retention-decay-fit, price-elasticity,
bass-diffusion, adstock-regression, competing-risks — stay there):
nrr, cohort-ltv, growth-accounting, segment-migration, abc-xyz,
pareto-point, ltv-projection, churn, purchase-intervals,
seasonal-index, survival-censored, stickiness, lift-chart,
revenue-decomposition, rfm.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
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


def _epoch_sec(ts) -> int:
    """Spark's unix_timestamp / DuckDB's date_diff('second') both
    truncate microsecond timestamps to whole epoch seconds."""
    return int(ts.value // 1_000_000_000)


def _week_start(d):
    """date_trunc('week'): Monday-start, reimplemented from weekday
    arithmetic (not via either engine's trunc)."""
    return d - timedelta(days=d.weekday())


def _ansi_ntile(order_idx: np.ndarray, k: int) -> np.ndarray:
    """ANSI ntile: with N rows the first N mod k buckets get
    ceil(N/k) rows. order_idx[i] = 0-based global rank of row i."""
    n = len(order_idx)
    q, r = divmod(n, k)
    out = np.empty(n, dtype=int)
    for i, rk in enumerate(order_idx):
        if rk < r * (q + 1):
            out[i] = rk // (q + 1) + 1
        else:
            out[i] = r + (rk - r * (q + 1)) // max(q, 1) + 1
    return out


# ---------------------------------------------------------------------------
# orders-based ops


def test_nrr(ops, duck):
    cm = duck.execute(
        "SELECT o_custkey AS c, CAST(date_trunc('month', o_orderdate) AS"
        " DATE) AS m, round(sum(o_totalprice), 2) AS rev"
        " FROM orders GROUP BY 1, 2"
    ).df()
    rev = {(r.c, (r.m.year, r.m.month)): r.rev for r in cm.itertuples()}
    months = sorted({k[1] for k in rev})
    rows = {(r["month"].year, r["month"].month): r for r in ops("analytics-nrr")}
    seen = set()
    for ym in months:
        prev = (ym[0] - 1, 12) if ym[1] == 1 else (ym[0], ym[1] - 1)
        base = [
            (c, v) for (c, m), v in rev.items() if m == prev
        ]
        if not base:
            continue
        seen.add(ym)
        base_rev = math.fsum(v for _, v in base)
        retained = math.fsum(
            rev.get((c, ym), 0.0) for c, _ in base
        )
        r = rows[ym]
        close(r["base_rev"], base_rev, tol=1e-6)
        close(r["retained_rev"], retained, tol=1e-6)
        close(r["nrr"], retained / base_rev)
    assert set(rows) == seen


def test_seasonal_index(ops, duck):
    raw = duck.execute(
        "SELECT extract(month FROM o_orderdate) AS m, o_totalprice AS p"
        " FROM orders"
    ).df()
    per = raw.groupby("m").agg(n=("p", "size"), rev=("p", "sum"))
    avg_rev = per.rev.mean()
    rows = {r["month"]: r for r in ops("analytics-seasonal-index")}
    assert set(rows) == set(per.index)
    for m, r in per.iterrows():
        got = rows[m]
        assert got["n_orders"] == r.n
        close(got["revenue"], r.rev, tol=1e-6)
        close(got["seasonal_index"], r.rev / avg_rev)


def test_pareto_point(ops, duck):
    df = duck.execute(
        "SELECT o_custkey AS c, sum(o_totalprice) AS r"
        " FROM orders GROUP BY 1"
    ).df()
    df = df.sort_values(["r", "c"], ascending=[False, True])
    cum = df.r.cumsum() / df.r.sum()
    crossing = int(np.argmax(cum.to_numpy() >= 0.8)) + 1
    (row,) = ops("analytics-pareto-point")
    assert row["n_customers"] == len(df)
    assert row["customers_for_80pct"] == crossing
    close(row["pareto_fraction"], crossing / len(df))


def test_abc_xyz(ops, duck):
    df = duck.execute(
        "SELECT l_partkey AS p,"
        " sum(l_extendedprice * (1 - l_discount)) AS rev,"
        " avg(l_quantity) AS mq, stddev_samp(l_quantity) AS sq,"
        " count(*) AS n FROM lineitem GROUP BY 1"
    ).df()
    df = df[df.n >= 2].sort_values(["rev", "p"], ascending=[False, True])
    cum_share = (df.rev.cumsum() / df.rev.sum()).to_numpy()
    cv = (df.sq / df.mq).fillna(0.0).to_numpy()
    abc = np.where(cum_share <= 0.8, "A", np.where(cum_share <= 0.95, "B", "C"))
    xyz = np.where(cv < 0.3, "X", np.where(cv < 0.6, "Y", "Z"))
    want: dict[tuple, list] = defaultdict(lambda: [0, 0.0])
    for a, x, rv in zip(abc, xyz, df.rev):
        want[(a, x)][0] += 1
        want[(a, x)][1] += rv
    rows = {(r["abc"], r["xyz"]): r for r in ops("analytics-abc-xyz")}
    assert set(rows) == set(want)
    for k, (n, rv) in want.items():
        assert rows[k]["n_parts"] == n
        close(rows[k]["revenue"], rv, tol=1e-6)


def test_revenue_decomposition(ops, duck):
    df = duck.execute(
        "SELECT o_orderdate AS d, o_custkey AS c, o_totalprice AS p"
        " FROM orders"
    ).df()
    df["wk"] = df.d.map(lambda d: _week_start(d))
    per = df.groupby("wk").agg(
        buyers=("c", "nunique"), orders=("c", "size"), rev=("p", "sum")
    ).sort_index()
    rows = {r["week"]: r for r in ops("analytics-revenue-decomposition")}
    wks = list(per.index)
    assert set(rows) == {w.date() if hasattr(w, "date") else w for w in wks[1:]} \
        or set(rows) == set(wks[1:])
    for i in range(1, len(wks)):
        cur, prev = per.iloc[i], per.iloc[i - 1]
        key = wks[i]
        r = rows.get(key) or rows[key.date()]
        g_rev = math.log(cur.rev / prev.rev) * 100
        g_buy = math.log(cur.buyers / prev.buyers) * 100
        g_frq = math.log((cur.orders / cur.buyers) / (prev.orders / prev.buyers)) * 100
        g_aov = math.log((cur.rev / cur.orders) / (prev.rev / prev.orders)) * 100
        close(r["revenue_growth_logpct"], g_rev, tol=1e-3)
        close(r["buyers_contrib"], g_buy, tol=1e-3)
        close(r["frequency_contrib"], g_frq, tol=1e-3)
        close(r["aov_contrib"], g_aov, tol=1e-3)
        # the decomposition identity the op's doc claims
        close(g_rev, g_buy + g_frq + g_aov, tol=1e-6)


def test_rfm(ops, duck):
    df = duck.execute(
        "SELECT o_custkey AS c, CAST(max(o_orderdate) AS DATE) AS last_d,"
        " count(*) AS freq, round(sum(o_totalprice), 2) AS mon"
        " FROM orders GROUP BY 1"
    ).df()
    maxd = df.last_d.max()
    df["recency"] = (maxd - df.last_d).map(lambda td: td.days)
    n = len(df)

    def ranks(keys):
        order = sorted(range(n), key=keys)
        idx = np.empty(n, dtype=int)
        for rank, i in enumerate(order):
            idx[i] = rank
        return _ansi_ntile(idx, 5)

    r_s = ranks(lambda i: (df.recency.iat[i], df.c.iat[i]))
    f_s = ranks(lambda i: (-df.freq.iat[i], df.c.iat[i]))
    m_s = ranks(lambda i: (-df.mon.iat[i], df.c.iat[i]))
    rows = {r["custkey"]: r for r in ops("analytics-rfm")}
    assert set(rows) == set(df.c)
    for i in range(n):
        got = rows[df.c.iat[i]]
        assert got["recency_days"] == df.recency.iat[i]
        assert got["frequency"] == df.freq.iat[i]
        close(got["monetary"], df.mon.iat[i], tol=1e-6)
        assert (got["r_score"], got["f_score"], got["m_score"]) == (
            r_s[i], f_s[i], m_s[i]
        ), df.c.iat[i]


# ---------------------------------------------------------------------------
# events-based ops


@pytest.fixture(scope="module")
def events(duck):
    return duck.execute(
        "SELECT event_id, ts, user_id, event_type, value FROM events"
    ).df()


def test_churn(ops, events):
    active: dict = defaultdict(set)
    for r in events.itertuples():
        active[_week_start(r.ts.normalize())].add(r.user_id)
    rows = {r["week"]: r for r in ops("analytics-churn")}
    # Spark date_trunc returns a timestamp at week-start midnight
    got = {k.date() if hasattr(k, "date") else k: v for k, v in rows.items()}
    assert set(got) == {w.date() for w in active}
    for w, users in active.items():
        nxt = active.get(w + timedelta(days=7), set())
        r = got[w.date()]
        assert r["n_active"] == len(users)
        assert r["n_retained"] == len(users & nxt)
        assert r["n_churned"] == len(users - nxt)


def test_stickiness(ops, events):
    by_day: dict = defaultdict(set)
    for r in events.itertuples():
        by_day[r.ts.date()].add(r.user_id)
    rows = {r["day"]: r for r in ops("analytics-stickiness")}
    assert set(rows) == set(by_day)
    for d, users in by_day.items():
        mau = set()
        for d2, u2 in by_day.items():
            if d - timedelta(days=29) <= d2 <= d:
                mau |= u2
        r = rows[d]
        assert r["dau"] == len(users)
        assert r["mau"] == len(mau)
        close(r["stickiness"], len(users) / len(mau))


def test_purchase_intervals(ops, events):
    p = events[events.event_type == "purchase"].sort_values(
        ["user_id", "ts", "event_id"]
    )
    hist: dict = defaultdict(int)
    for _, g in p.groupby("user_id"):
        secs = [_epoch_sec(t) for t in g.ts]
        for a, b in zip(secs, secs[1:]):
            hist[min((b - a) // 3600, 48)] += 1
    rows = {r["gap_hours_capped"]: r["n_intervals"]
            for r in ops("analytics-purchase-intervals")}
    assert rows == dict(hist)


def test_survival_censored(ops, events):
    t_end = _epoch_sec(events.ts.max())
    buckets: dict = defaultdict(int)
    for _, g in events.groupby("user_id"):
        views = g[g.event_type == "view"].ts
        if views.empty:
            continue
        t_view = _epoch_sec(views.min())
        purch = g[g.event_type == "purchase"].ts
        t_p = _epoch_sec(purch.min()) if not purch.empty else None
        if t_p is not None and t_p > t_view:
            hours = (t_p - t_view) / 3600.0
            censored = False
        else:
            hours = (t_end - t_view) / 3600.0
            censored = True
        buckets[(min(int(hours // 24), 7), censored)] += 1
    rows = {(r["day_bucket"], r["censored"]): r["n_users"]
            for r in ops("analytics-survival-censored")}
    assert rows == dict(buckets)


def test_cohort_ltv(ops, events):
    first = events.groupby("user_id").ts.min().dt.date
    sizes = first.value_counts().to_dict()
    p = events[events.event_type == "purchase"]
    cells: dict = defaultdict(float)
    for r in p.itertuples():
        cd = first[r.user_id]
        cells[(cd, (r.ts.date() - cd).days)] += r.value
    want = {}
    by_cohort: dict = defaultdict(list)
    for (cd, di), rev in cells.items():
        by_cohort[cd].append((di, rev))
    for cd, lst in by_cohort.items():
        lst.sort()
        cum = 0.0
        for di, rev in lst:
            cum += rev
            want[(cd, di)] = (sizes[cd], cum)
    rows = {(r["cohort_day"], r["day_index"]): r
            for r in ops("analytics-cohort-ltv")}
    assert set(rows) == set(want)
    for k, (n, cum) in want.items():
        assert rows[k]["n_users"] == n
        close(rows[k]["cum_revenue"], cum, tol=1e-6)


def test_growth_accounting(ops, events):
    days = events.ts.dt.date
    d0 = days.min()
    uw = {(r.user_id, (r.ts.date() - d0).days // 7) for r in events.itertuples()}
    by_user: dict = defaultdict(list)
    for u, wk in uw:
        by_user[u].append(wk)
    max_wk = max(wk for _, wk in uw)
    counts: dict = defaultdict(lambda: [0, 0, 0, 0])  # new/ret/res/churn
    for u, wks in by_user.items():
        wks.sort()
        fw = wks[0]
        prev = None
        for wk in wks:
            if wk == fw:
                counts[wk][0] += 1
            elif prev == wk - 1:
                counts[wk][1] += 1
            else:
                counts[wk][2] += 1
            prev = wk
        for wk in wks:
            if wk + 1 <= max_wk and (wk + 1) not in wks:
                counts[wk + 1][3] += 1
    rows = {r["week"]: r for r in ops("analytics-growth-accounting")}
    assert set(rows) == set(counts)
    for wk, (new, ret, res, chu) in counts.items():
        r = rows[wk]
        assert (r["new_users"], r["retained"], r["resurrected"],
                r["churned"]) == (new, ret, res, chu)
        # the MAU bookkeeping identity from the op's doc
        active = sum(1 for u, w in uw if w == wk)
        assert active == new + ret + res


def test_segment_migration(ops, events):
    d0 = events.ts.dt.date.min()
    cut = d0 + timedelta(days=14)

    def seg_of(spend):
        if spend == 0:
            return "dormant"
        if spend < 50:
            return "low"
        if spend < 200:
            return "mid"
        return "high"

    spend: dict = defaultdict(float)
    users_by_period: dict = defaultdict(set)
    for r in events.itertuples():
        period = "p1" if r.ts.date() < cut else "p2"
        users_by_period[period].add(r.user_id)
        if r.event_type == "purchase":
            spend[(r.user_id, period)] += r.value
    seg = {
        (u, p): seg_of(spend.get((u, p), 0.0))
        for p in ("p1", "p2")
        for u in users_by_period[p]
    }
    mat: dict = defaultdict(int)
    all_users = users_by_period["p1"] | users_by_period["p2"]
    for u in all_users:
        f = seg.get((u, "p1"), "absent")
        t = seg.get((u, "p2"), "absent")
        mat[(f, t)] += 1
    row_tot: dict = defaultdict(int)
    for (f, _), n in mat.items():
        row_tot[f] += n
    rows = {(r["seg_from"], r["seg_to"]): r
            for r in ops("analytics-segment-migration")}
    assert set(rows) == set(mat)
    for k, n in mat.items():
        assert rows[k]["n_users"] == n
        close(rows[k]["p_migrate"], n / row_tot[k[0]])


def test_lift_chart(ops, events):
    per = events.groupby("user_id").agg(
        score=("value", "mean"),
        converted=("event_type", lambda s: int((s == "purchase").any())),
    ).reset_index()
    n = len(per)
    order = per.sort_values(
        ["score", "user_id"], ascending=[False, True]
    ).index.to_numpy()
    rank = np.empty(n, dtype=int)
    for rk, i in enumerate(order):
        rank[i] = rk
    per["decile"] = _ansi_ntile(rank, 10)
    byd = per.groupby("decile").agg(
        n=("converted", "size"), conv=("converted", "sum")
    ).sort_index()
    tc, tn = byd.conv.sum(), byd.n.sum()
    cum = byd.conv.cumsum()
    rows = {r["decile"]: r for r in ops("analytics-lift-chart")}
    assert set(rows) == set(byd.index)
    for d, r in byd.iterrows():
        got = rows[d]
        assert got["n_users"] == r.n
        close(got["conversion_rate"], r.conv / r.n)
        close(got["lift"], (r.conv / r.n) / (tc / tn))
        close(got["cum_gain"], cum[d] / tc)


def test_ltv_projection(ops, events):
    p = events[events.event_type == "purchase"]
    first = p.groupby("user_id").apply(
        lambda g: g.ts.dt.date.min(), include_groups=False
    )
    maxd = events.ts.dt.date.max()
    activity = {
        (r.user_id, (r.ts.date() - first[r.user_id]).days)
        for r in p.itertuples()
    }
    cohort_sizes: dict = defaultdict(int)
    for u, d0 in first.items():
        cohort_sizes[d0] += 1
    ages = sorted({a for _, a in activity if a >= 1})
    numer = {a: sum(1 for _, x in activity if x == a) for a in ages}
    denom = {
        a: float(sum(sz for d0, sz in cohort_sizes.items()
                     if (maxd - d0).days >= a))
        for a in ages
    }
    lx, ly = [], []
    for a in ages:
        if 0 < numer[a] < denom[a]:
            lx.append(math.log(a))
            ly.append(math.log(numer[a] / denom[a]))
    lx, ly = np.array(lx), np.array(ly)
    beta = ((lx * ly).sum() - lx.sum() * ly.sum() / len(lx)) / (
        (lx * lx).sum() - lx.sum() ** 2 / len(lx)
    )
    k = math.exp((ly.sum() - beta * lx.sum()) / len(lx))
    aov = p.value.mean()
    proj = aov * sum(k * t**beta for t in range(1, 91))
    (row,) = ops("analytics-ltv-projection")
    close(row["retention_k"], k)
    close(row["retention_beta"], beta)
    close(row["avg_order_value"], aov, tol=1e-3)
    close(row["projected_90d_ltv_per_user"], proj, tol=1e-3)
