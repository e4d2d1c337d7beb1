"""Golden cross-checks for the timeseries family's remaining 28 ops
(round-7 sweep; holt/ses fold bit-exactness etc. already live in
test_golden_stats.py). Daily rollups re-derived from raw sf0.01 rows
via DuckDB; every filter/window/fit rebuilt in plain numpy/pandas
positional logic. Third-implementation contract as the other
test_golden_* suites.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb
import numpy as np
import pandas as pd
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
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
    if got is None and (want is None or (isinstance(want, float)
                                         and math.isnan(want))):
        return
    assert got == pytest.approx(want, rel=tol, abs=tol), (got, want)


def rnd(x, d):
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 10**d + 0.5) / 10**d


def _d(x):
    """Normalize pandas Timestamp / datetime / date to datetime.date so
    DuckDB-df keys match Spark collect() keys."""
    return x.date() if hasattr(x, "date") else x


def _dayfix(df, col="day"):
    df[col] = df[col].map(_d)
    return df


@pytest.fixture(scope="module")
def daily_orders(duck):
    """day -> sum(o_totalprice), sorted."""
    df = duck.execute(
        "SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ).df()
    return _dayfix(df)


@pytest.fixture(scope="module")
def daily_counts(duck):
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    return _dayfix(df)


@pytest.fixture(scope="module")
def daily_avg_value(duck):
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, avg(value) AS x"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    return _dayfix(df)


# ---------------------------------------------------------------------------
# calendar / resampling


def test_gap_fill(ops, duck):
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, count(*) AS n,"
        " round(sum(value), 4) AS tv FROM events"
        " WHERE event_type = 'purchase' GROUP BY 1"
    ).df()
    d0 = duck.execute("SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)"
                      " FROM events").fetchone()
    d0 = (_d(d0[0]), _d(d0[1]))
    byday = {_d(r.day): (int(r.n), r.tv) for r in df.itertuples()}
    rows = {r["day"]: r for r in ops("timeseries-gap-fill")}
    cur, end = d0
    n_days = 0
    while cur <= end:
        n_days += 1
        r = rows[cur]
        if cur in byday:
            assert (r["n"], r["is_gap"]) == (byday[cur][0], False)
            close(r["total_value"], byday[cur][1], tol=1e-6)
        else:
            assert (r["n"], r["total_value"], r["is_gap"]) == (0, 0.0, True)
        cur += timedelta(days=1)
    assert len(rows) == n_days


def test_ewma(ops, duck):
    df = duck.execute(
        "SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,"
        " ts, event_id, value FROM events ORDER BY user_id, day, ts, event_id"
    ).df()
    rows = {(r["user_id"], r["day"]): r for r in ops("timeseries-ewma")}
    a = 0.3
    for (uid, day), g in df.groupby(["user_id", "day"]):
        vals = g.sort_values(["ts", "event_id"]).value.tolist()
        acc = vals[0]
        for v in vals[1:]:
            acc = (1 - a) * acc + a * v
        r = rows[(uid, day)]
        assert r["n_obs"] == len(vals)
        assert r["ewma_e6"] == math.floor(acc * 1e6 + 0.5)


def test_resample_ohlc(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar,"
        " ts, event_id, value FROM events"
    ).df()
    rows = {(r["event_type"], r["bar_ts"]): r
            for r in ops("timeseries-resample-ohlc")}
    for (et, bar), g in df.groupby(["event_type", "bar"]):
        g = g.sort_values(["ts", "event_id"])
        r = rows[(et, bar)]
        close(r["open"], g.value.iloc[0], tol=1e-5)
        close(r["close"], g.value.iloc[-1], tol=1e-5)
        close(r["high"], g.value.max(), tol=1e-5)
        close(r["low"], g.value.min(), tol=1e-5)
        assert r["n_ticks"] == len(g)


def test_time_weighted_avg(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value"
        " FROM events ORDER BY event_type, day, ts, event_id"
    ).df()
    intervals: dict = defaultdict(list)  # (et, day) -> [(value, dt)]
    for (et, day), g in df.groupby(["event_type", "day"]):
        day = _d(day)
        g = g.sort_values(["ts", "event_id"])
        secs = [int(t.value // 10**9) for t in g.ts]
        vals = g.value.tolist()
        for i in range(len(secs) - 1):
            intervals[(et, day)].append((vals[i], secs[i + 1] - secs[i]))
    days = sorted({d for _, d in intervals})[:5]
    rows = {(r["event_type"], r["day"]): r
            for r in ops("timeseries-time-weighted-avg")}
    want_keys = {(et, d) for et, d in intervals if d in days}
    assert set(rows) == want_keys
    for k in want_keys:
        iv = intervals[k]
        r = rows[k]
        assert r["n_intervals"] == len(iv)
        close(r["twap"], sum(v * dt for v, dt in iv) / sum(dt for _, dt in iv))
        close(r["naive_avg"], np.mean([v for v, _ in iv]))


# ---------------------------------------------------------------------------
# growth / returns


def test_mom_growth(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS m,"
        " round(sum(value), 4) AS v FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    rows = {(r["event_type"], r["month"]): r
            for r in ops("timeseries-mom-growth")}
    for et, g in df.groupby("event_type"):
        prev = None
        for r in g.itertuples():
            got = rows[(et, _d(r.m))]
            if prev is None:
                assert got["prev_v"] is None and got["growth_pct"] is None
            else:
                close(got["prev_v"], prev, tol=1e-6)
                close(got["growth_pct"], (r.v - prev) / prev * 100, tol=1e-3)
            prev = r.v


def test_yoy_growth(ops, duck):
    df = duck.execute(
        "SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,"
        " round(sum(o_totalprice), 2) AS rev, count(*) AS n"
        " FROM orders GROUP BY 1"
    ).df()
    by_m = {(r.m.year, r.m.month): r for r in df.itertuples()}
    rows = {(r["month"].year, r["month"].month): r
            for r in ops("timeseries-yoy-growth")}
    want = set()
    for (y, m), r in by_m.items():
        prior = by_m.get((y - 1, m))
        if prior is not None:
            want.add((y, m))
            g = rows[(y, m)]
            close(g["rev"], r.rev, tol=1e-6)
            assert g["n_orders"] == r.n
            close(g["rev_prior_year"], prior.rev, tol=1e-6)
            close(g["yoy_pct"], (r.rev - prior.rev) / prior.rev * 100,
                  tol=1e-3)
    assert set(rows) == want


def test_seasonal_naive_eval(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,"
        " round(sum(value), 6) AS v FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    rows = {r["event_type"]: r for r in ops("timeseries-seasonal-naive-eval")}
    for et, g in df.groupby("event_type"):
        v = g.v.to_numpy()
        yhat = np.full(len(v), np.nan)
        yhat[7:] = v[:-7]
        mask = ~np.isnan(yhat)
        err = v[mask] - yhat[mask]
        r = rows[et]
        assert r["n_scored"] == int(mask.sum())
        close(r["mae"], np.abs(err).mean(), tol=1e-3)
        close(r["mape_pct"], (np.abs(err) / np.abs(v[mask])).mean() * 100,
              tol=1e-3)
        close(r["bias"], err.mean(), tol=1e-3)


def test_forecast_backtest(ops, daily_orders):
    y = daily_orders.rev.to_numpy()
    n = len(y)
    ae, nae, mape, smape = [], [], [], []
    for i in range(7, n):
        f = y[i - 7]
        ae.append(abs(y[i] - f))
        nae.append(abs(y[i] - y[i - 1]))
        mape.append(abs(y[i] - f) / y[i])
        smape.append(2 * abs(y[i] - f) / (abs(y[i]) + abs(f)))
    (row,) = ops("timeseries-forecast-backtest")
    assert row["n_days"] == len(ae)
    close(row["mape"], np.mean(mape))
    close(row["smape"], np.mean(smape))
    close(row["mase"], np.mean(ae) / np.mean(nae))


# ---------------------------------------------------------------------------
# correlation structure


def test_autocorr(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,"
        " round(sum(value), 6) AS v FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    rows = {r["event_type"]: r for r in ops("timeseries-autocorr")}
    for et, g in df.groupby("event_type"):
        v = g.v.to_numpy()
        r = rows[et]
        assert r["n_days"] == len(v)
        for k in (1, 2, 3):
            want = np.corrcoef(v[k:], v[:-k])[0, 1]
            close(r[f"acf{k}"], want, tol=1e-3)


def test_rolling_corr(ops, duck):
    df = duck.execute(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day,"
        " round(sum(CASE WHEN event_type='view' THEN value END), 6) AS x,"
        " round(sum(CASE WHEN event_type='purchase' THEN value END), 6) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    df = _dayfix(df)
    rows = {r["day"]: r["rolling_corr"] for r in ops("timeseries-rolling-corr")}
    days = df.day.tolist()
    for i in range(13, len(df)):
        win = df.iloc[i - 13:i + 1]
        c = np.corrcoef(win.x, win.y)[0, 1]
        close(rows[days[i]], c, tol=1e-3)
    assert len(rows) == max(0, len(df) - 13)


def test_cross_correlation(ops, duck):
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " avg(CASE WHEN event_type='click' THEN value END) AS x,"
        " avg(CASE WHEN event_type='purchase' THEN value END) AS y"
        " FROM events WHERE event_type IN ('click','purchase')"
        " GROUP BY 1 ORDER BY 1"
    ).df()
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    mx, sx = np.nanmean(x), np.nanstd(x)
    my, sy = np.nanmean(y), np.nanstd(y)
    n = len(df)
    rows = {r["lag"]: r for r in ops("timeseries-cross-correlation")}
    for lag in range(-3, 4):
        ys = np.full(n, np.nan)
        if lag < 0:
            ys[-lag:] = y[:lag] if lag != 0 else y
        elif lag == 0:
            ys = y
        else:
            ys[:-lag] = y[lag:]
        prod = (x - mx) * (ys - my)
        want = np.nanmean(prod) / (sx * sy)
        r = rows[lag]
        assert r["n_days"] == n
        close(r["r"], want, tol=1e-3)


# ---------------------------------------------------------------------------
# structural change / anomalies


def test_changepoint(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS x"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    df = _dayfix(df)
    rows = {r["event_type"]: r for r in ops("timeseries-changepoint")}
    for et, g in df.groupby("event_type"):
        x = g.x.to_numpy()
        days = g.day.tolist()
        n = len(x)
        tot_s, tot_sq = x.sum(), (x * x).sum()
        best = None
        for t in range(2, n - 1):
            cs, csq = x[:t].sum(), (x[:t] ** 2).sum()
            gain = (
                (tot_sq - tot_s**2 / n)
                - (csq - cs**2 / t)
                - ((tot_sq - csq) - (tot_s - cs) ** 2 / (n - t))
            )
            key = (-gain, days[t - 1])
            if best is None or key < best[0]:
                best = (key, days[t - 1], gain, cs / t,
                        (tot_s - cs) / (n - t))
        r = rows[et]
        assert r["split_day"] == best[1]
        close(r["sse_gain"], best[2], tol=1e-3)
        close(r["mean_left"], best[3], tol=1e-4)
        close(r["mean_right"], best[4], tol=1e-4)


def _stl(daily_counts):
    x = daily_counts.x.to_numpy()
    days = daily_counts.day.tolist()
    n = len(x)
    trend = np.full(n, np.nan)
    for i in range(3, n - 3):
        trend[i] = x[i - 3:i + 4].mean()
    dows = np.array([d.weekday() for d in days])
    seasonal_raw = np.full(n, np.nan)
    for dow in range(7):
        sel = dows == dow
        seasonal_raw[sel] = np.nanmean(x[sel] - trend[sel])
    seasonal = seasonal_raw - np.nanmean(np.unique(
        [(d, s) for d, s in zip(dows, seasonal_raw)], axis=0)[:, 1]
    ) if False else seasonal_raw - _grand_mean(dows, seasonal_raw)
    return x, days, trend, seasonal


def _grand_mean(dows, seasonal_raw):
    # avg(seasonal_raw) OVER (): row-weighted mean over ALL rows
    return np.nanmean(seasonal_raw)


def test_stl_naive(ops, daily_counts):
    x, days, trend, seasonal = _stl(daily_counts)
    rows = {r["day"]: r for r in ops("timeseries-stl-naive")}
    want_days = [d for d, t in zip(days, trend) if not math.isnan(t)]
    assert set(rows) == set(want_days)
    for i, d in enumerate(days):
        if math.isnan(trend[i]):
            continue
        r = rows[d]
        close(r["trend"], trend[i], tol=1e-3)
        close(r["seasonal"], seasonal[i], tol=1e-3)
        close(r["residual"], x[i] - trend[i] - seasonal[i], tol=1e-3)


def test_stl_anomaly(ops, daily_counts):
    x, days, trend, seasonal = _stl(daily_counts)
    mask = ~np.isnan(trend)
    resid = x[mask] - trend[mask] - seasonal[mask]
    z = (resid - resid.mean()) / resid.std(ddof=1)
    want = {
        d: (xx, rr, zz)
        for d, xx, rr, zz in zip(
            np.array(days)[mask], x[mask], resid, z
        )
        if abs(zz) > 1.5
    }
    rows = {r["day"]: r for r in ops("timeseries-stl-anomaly")}
    assert set(rows) == set(want)
    for d, (xx, rr, zz) in want.items():
        r = rows[d]
        close(r["volume"], xx)
        close(r["residual"], rr, tol=1e-3)
        close(r["residual_z"], zz, tol=1e-3)


def test_peak_detect(ops, duck):
    df = duck.execute(
        "SELECT event_type, CAST(ts AS DATE) AS day,"
        " CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2"
        " ORDER BY 1, 2"
    ).df()
    df = _dayfix(df)
    want = {}
    for et, g in df.groupby("event_type"):
        x = g.x.to_numpy()
        days = g.day.tolist()
        mu, sd = x.mean(), x.std(ddof=1)
        for i in range(1, len(x) - 1):
            z = (x[i] - mu) / sd
            if x[i] > x[i - 1] and x[i] > x[i + 1] and z > 0.5:
                want[(et, days[i])] = (x[i], z)
    got = ops("timeseries-peak-detect")
    rows = {(r.get("event_type"), r["peak_day"]): r for r in got}
    if any(k[0] is None for k in rows):
        # event_type column not in output: compare by day only
        rows = {r["peak_day"]: r for r in got}
        want = {d: v for (_, d), v in want.items()}
    assert set(rows) == set(want)
    for k, (vol, z) in want.items():
        close(rows[k]["volume"], vol)
        close(rows[k]["z"], z, tol=1e-3)


def test_slope_change(ops, daily_avg_value):
    y = daily_avg_value.x.to_numpy()
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    pre = t <= n / 2

    def fit(sel):
        tt, yy = t[sel], y[sel]
        c = len(tt)
        sxx = (tt * tt).sum() - tt.sum() ** 2 / c
        sxy = (tt * yy).sum() - tt.sum() * yy.sum() / c
        syy = (yy * yy).sum() - yy.sum() ** 2 / c
        slope = sxy / sxx
        var_slope = (syy - sxy**2 / sxx) / (c - 2) / sxx
        return slope, var_slope

    s_pre, v_pre = fit(pre)
    s_post, v_post = fit(~pre)
    (row,) = ops("timeseries-slope-change")
    close(row["slope_pre"], s_pre, tol=1e-3)
    close(row["slope_post"], s_post, tol=1e-3)
    close(row["slope_change"], s_post - s_pre, tol=1e-3)
    close(row["slope_change_z"], (s_post - s_pre) / math.sqrt(v_pre + v_post),
          tol=1e-3)


def test_despike_med3(ops, daily_orders):
    rev = daily_orders.rev.to_numpy()
    n = len(rev)
    med3 = np.array([
        sorted([rev[i - 1], rev[i], rev[i + 1]])[1] for i in range(1, n - 1)
    ])
    inner = rev[1:-1]
    mad = np.median(np.abs(inner - med3))
    rows = sorted(ops("timeseries-despike-med3"),
                  key=lambda r: r.get("day") or r["rev"])
    assert len(rows) == n - 2
    got = sorted((r["rev"], r["med3"], r["spike_flag"]) for r in rows)
    want = sorted(
        (rnd(float(r), 4), rnd(float(m), 4),
         int(abs(r - m) > 5 * mad))
        for r, m in zip(inner, med3)
    )
    for g, w in zip(got, want):
        close(g[0], w[0], tol=1e-6)
        close(g[1], w[1], tol=1e-6)
        assert g[2] == w[2]


# ---------------------------------------------------------------------------
# finance-style rollups


def test_vwap(ops, duck):
    df = duck.execute(
        "SELECT CAST(l_shipdate AS DATE) AS day,"
        " sum(l_extendedprice * l_quantity) AS pq, sum(l_quantity) AS q"
        " FROM lineitem GROUP BY 1 ORDER BY 1"
    ).df()
    df = _dayfix(df)
    rows = {r["day"]: r for r in ops("timeseries-vwap")}
    assert set(rows) == set(df.day)
    pq, q = df.pq.to_numpy(), df.q.to_numpy()
    for i, d in enumerate(df.day):
        r = rows[d]
        close(r["day_vwap"], pq[i] / q[i], tol=1e-5)
        lo = max(0, i - 6)
        close(r["vwap_7d"], pq[lo:i + 1].sum() / q[lo:i + 1].sum(), tol=1e-5)
        close(r["vwap_cum"], pq[:i + 1].sum() / q[:i + 1].sum(), tol=1e-5)


def test_max_drawdown(ops, daily_orders):
    equity = daily_orders.rev.cumsum().to_numpy()
    peak = np.maximum.accumulate(equity)
    (row,) = ops("timeseries-max-drawdown")
    assert row["n_days"] == len(equity)
    close(row["max_drawdown"], ((peak - equity) / peak).max())
    close(row["max_drawdown_abs"], (peak - equity).max(), tol=1e-6)


def test_drawdown_episodes(ops, daily_orders):
    rev = daily_orders.rev.to_numpy()
    days = daily_orders.day.tolist()
    peak = np.maximum.accumulate(rev)
    in_dd = rev < 0.5 * peak
    episodes = []
    i = 0
    n = len(rev)
    while i < n:
        if in_dd[i]:
            j = i
            while j + 1 < n and in_dd[j + 1]:
                j += 1
            worst = (rev[i:j + 1] / peak[i:j + 1]).min()
            episodes.append((days[i], days[j], j - i + 1, worst))
            i = j + 1
        else:
            i += 1
    rows = sorted(
        (r["start_day"], r["end_day"], r["n_days"], r["worst_ratio"])
        for r in ops("timeseries-drawdown-episodes")
    )
    assert len(rows) == len(episodes)
    for g, w in zip(rows, sorted(episodes)):
        assert g[:3] == w[:3]
        close(g[3], w[3], tol=1e-5)


def test_bollinger_bands(ops, daily_orders):
    rev = daily_orders.rev.to_numpy()
    days = daily_orders.day.tolist()
    rows = {r.get("day", i): r for i, r in
            enumerate(ops("timeseries-bollinger-bands"))}
    got = sorted(
        (r["rev"], r["mid"], r["upper_band"], r["lower_band"], r["breach"])
        for r in ops("timeseries-bollinger-bands")
    )
    want = []
    for i in range(19, len(rev)):
        win = rev[i - 19:i + 1]
        mid, sd = win.mean(), win.std(ddof=1)
        breach = 1 if rev[i] > mid + 2 * sd else (
            -1 if rev[i] < mid - 2 * sd else 0
        )
        want.append((rnd(float(rev[i]), 4), rnd(float(mid), 4),
                     rnd(float(mid + 2 * sd), 4),
                     rnd(float(mid - 2 * sd), 4), breach))
    for g, w in zip(got, sorted(want)):
        for a, b in zip(g[:4], w[:4]):
            close(a, b, tol=1e-5)
        assert g[4] == w[4]


def test_wma_crossover(ops, daily_orders):
    rev = daily_orders.rev.to_numpy()
    got = sorted(
        (r["rev"], r["wma7"], r["sma7"], r["momentum_up"])
        for r in ops("timeseries-wma-crossover")
    )
    want = []
    for i in range(6, len(rev)):
        wma = sum((7 - k) * rev[i - k] for k in range(7)) / 28.0
        sma = rev[i - 6:i + 1].mean()
        want.append((rnd(float(rev[i]), 4), rnd(float(wma), 4),
                     rnd(float(sma), 4), int(wma > sma)))
    assert len(got) == len(want)
    for g, w in zip(got, sorted(want)):
        for a, b in zip(g[:3], w[:3]):
            close(a, b, tol=1e-5)
        assert g[3] == w[3]


def test_time_decay_avg(ops, duck):
    df = duck.execute(
        "SELECT user_id, ts, value FROM events"
    ).df()
    per_user = {}
    for uid, g in df.groupby("user_id"):
        secs = np.array([int(t.value // 10**9) for t in g.ts])
        mx = secs.max()
        wt = 0.5 ** ((mx - secs) / (7 * 86400.0))
        per_user[uid] = float((wt * g.value).sum() / wt.sum())
    cells: dict = defaultdict(list)
    for v in per_user.values():
        cells[math.floor(v / 10)].append(v)
    rows = {r["bin"]: r for r in ops("timeseries-time-decay-avg")}
    assert set(rows) == set(cells)
    for b, vals in cells.items():
        assert rows[b]["n_users"] == len(vals)
        close(rows[b]["mean_decayed"], np.mean(vals), tol=1e-3)


# ---------------------------------------------------------------------------
# interpolation / downsampling / symbolic


def test_interpolate_linear(ops, duck):
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS v"
        " FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    ).df()
    df = _dayfix(df)
    days = df.day.tolist()
    v_known = [
        (None if d.day % 4 == 1 else v) for d, v in zip(days, df.v)
    ]
    rows = {r["day"]: r for r in ops("timeseries-interpolate-linear")}
    assert set(rows) == set(days)
    for i, d in enumerate(days):
        prev_i = next((j for j in range(i, -1, -1)
                       if v_known[j] is not None), None)
        next_i = next((j for j in range(i + 1, len(days))
                       if v_known[j] is not None), None)
        if v_known[i] is not None:
            filled = v_known[i]
        elif prev_i is None:
            filled = v_known[next_i]
        elif next_i is None:
            filled = v_known[prev_i]
        else:
            frac = (days[i] - days[prev_i]).days / (
                days[next_i] - days[prev_i]).days
            filled = v_known[prev_i] + (
                v_known[next_i] - v_known[prev_i]) * frac
        r = rows[d]
        assert r["interpolated"] == (v_known[i] is None)
        close(r["v_filled"], filled, tol=1e-3)


def test_lttb_downsample(ops, daily_counts):
    y = daily_counts.x.to_numpy()
    days = daily_counts.day.tolist()
    n = len(y)
    t = np.arange(n, dtype=float)
    bucket = np.minimum(9, np.floor(t * 10 / n).astype(int))
    means = {
        b: (t[bucket == b].mean(), y[bucket == b].mean())
        for b in np.unique(bucket)
    }
    want = {}
    for b in np.unique(bucket):
        pm = means.get(b - 1)
        nm = means.get(b + 1)
        idxs = np.flatnonzero(bucket == b)
        if nm is None:
            # next_mt is NULL -> the whole area expression is NULL for
            # every row of the last bucket; DESC NULLS LAST ordering
            # falls through to the day tie-break, so the earliest row
            # wins
            want[int(b)] = int(y[idxs[0]])
            continue
        best = None
        for i in idxs:
            p_mt = pm[0] if pm else t[i] - 1
            area = abs(
                (p_mt - nm[0]) * (y[i] - nm[1])
                - (p_mt - t[i]) * (nm[1] - y[i])
            )
            key = (-area, days[i])
            if best is None or key < best[0]:
                best = (key, i)
        want[int(b)] = int(y[best[1]])
    rows = {r["bucket"]: r["value"] for r in ops("timeseries-lttb-downsample")}
    assert rows == want


def test_sax_symbolic(ops, daily_avg_value):
    x = daily_avg_value.x.to_numpy()
    mu, sd = x.mean(), x.std(ddof=1)
    z = (x - mu) / sd
    rows = {r["seg"]: r for r in ops("timeseries-sax-symbolic")}
    want = {}
    for seg in range(len(x) // 5):
        vals = z[seg * 5:(seg + 1) * 5]
        if len(vals) == 5:
            paa = vals.mean()
            sym = ("a" if paa < -0.6745 else
                   "b" if paa < 0 else
                   "c" if paa < 0.6745 else "d")
            want[seg] = (paa, sym)
    assert set(rows) == set(want)
    for seg, (paa, sym) in want.items():
        close(rows[seg]["paa"], paa, tol=1e-3)
        assert rows[seg]["symbol"] == sym


def test_ses_grid(ops, daily_orders):
    y = daily_orders.rev.to_numpy()
    mu = y.mean()
    n = len(y)
    rows = {r["alpha"]: r for r in ops("timeseries-ses-grid")}
    sses = {}
    for a in (0.1, 0.3, 0.5, 0.7, 0.9):
        cs = [a * (1 - a) ** k for k in range(14)]
        sse = 0.0
        for i in range(15, n):  # rn > 15 -> 0-based index >= 15
            f = sum(c * y[i - k - 1] for k, c in enumerate(cs))
            f += (1 - a) ** 14 * mu
            sse += (y[i] - f) ** 2
        sses[a] = sse
    best = min(sses.values())
    for a, sse in sses.items():
        r = rows[a]
        close(r["sse"], sse, tol=1e-4)
        assert r["is_best"] == (1 if sse == best else 0)


def test_matrix_profile_discord(ops, daily_avg_value):
    x = daily_avg_value.x.to_numpy()
    days = daily_avg_value.day.tolist()
    n = len(x) - 2
    subs = [(x[i], x[i + 1], x[i + 2]) for i in range(n)]
    scored = []
    for i in range(n):
        d = min(
            math.dist(subs[i], subs[j])
            for j in range(n)
            if abs(i - j) >= 3
        )
        scored.append((-rnd(d, 6), days[i]))
    scored.sort()
    want = scored[:3]
    got = ops("timeseries-matrix-profile-discord")
    assert [(r["discord_day"], r["nn_dist"]) for r in got] == [
        (d, -s) for s, d in want
    ]
