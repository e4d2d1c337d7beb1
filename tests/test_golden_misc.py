"""Golden cross-checks for the remaining small families (round-7
closing sweep): funnel, retention, anomaly, rolling, attribution
(incl. the Shapley closed form), basket, skyline, featurestore, rec,
the ml tail (naive Bayes end-to-end, learning curve, k-fold,
bootstrap-slope), rank-stability bootstrap, binary confusion battery,
and the hash-permutation test. Raw sf0.01 rows via DuckDB; plain
Python recomputation. Third-implementation contract as the other
test_golden_* suites.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"
P = 2147483647


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "customer"):
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


def _sec(ts) -> int:
    return int(ts.value // 1_000_000_000)


def _d(x):
    return x.date() if hasattr(x, "date") else x


@pytest.fixture(scope="module")
def events(duck):
    return duck.execute(
        "SELECT event_id, ts, user_id, event_type, value FROM events"
        " ORDER BY user_id, ts, event_id"
    ).df()


# ---------------------------------------------------------------------------
# funnel / retention


def test_funnel_conversion(ops, events):
    firsts: dict = defaultdict(dict)
    for r in events.itertuples():
        d = firsts[int(r.user_id)]
        if r.event_type not in d:
            d[r.event_type] = r.ts
    n = len(firsts)
    viewed = sum(1 for d in firsts.values() if "view" in d)
    clicked = sum(
        1 for d in firsts.values()
        if "view" in d and "click" in d and d["click"] > d["view"]
    )
    full = sum(
        1 for d in firsts.values()
        if "view" in d and "click" in d and "purchase" in d
        and d["click"] > d["view"] and d["purchase"] > d["click"]
    )
    (row,) = ops("funnel-conversion")
    assert (row["n_users"], row["n_viewed"]) == (n, viewed)
    assert row["n_clicked_after_view"] == clicked
    assert row["n_full_funnel"] == full


def test_funnel_windowed_strict(ops, events):
    firsts: dict = defaultdict(dict)
    for r in events.itertuples():
        firsts[int(r.user_id)].setdefault(r.event_type, []).append(r.ts)
    hour = timedelta(hours=1)
    t_view = {u: min(d["view"]) for u, d in firsts.items() if "view" in d}
    t_click = {}
    for u, tv in t_view.items():
        cands = [
            t for t in firsts[u].get("click", [])
            if tv < t <= tv + hour
        ]
        if cands:
            t_click[u] = min(cands)
    t_buy = {}
    for u, tc in t_click.items():
        cands = [
            t for t in firsts[u].get("purchase", [])
            if tc < t <= tc + hour
        ]
        if cands:
            t_buy[u] = min(cands)
    (row,) = ops("funnel-windowed-strict")
    assert row["n_viewed"] == len(t_view)
    assert row["n_clicked_in_window"] == len(t_click)
    assert row["n_purchased_in_window"] == len(t_buy)


def test_funnel_time_to_convert(ops, events):
    firsts: dict = defaultdict(dict)
    for r in events.itertuples():
        d = firsts[int(r.user_id)]
        if r.event_type not in d:
            d[r.event_type] = r.ts
    secs = [
        _sec(d["purchase"]) - _sec(d["view"])
        for d in firsts.values()
        if "view" in d and "purchase" in d and d["purchase"] > d["view"]
    ]
    (row,) = ops("funnel-time-to-convert")
    assert row["n_converted"] == len(secs)
    assert row["min_secs"] == min(secs)
    close(row["median_secs"], np.percentile(secs, 50, method="linear"),
          tol=1e-3)
    close(row["p90_secs"], np.percentile(secs, 90, method="linear"),
          tol=1e-3)
    close(row["mean_secs"], np.mean(secs), tol=1e-3)


def test_funnel_window_sensitivity(ops, events):
    firsts: dict = defaultdict(dict)
    for r in events.itertuples():
        d = firsts[int(r.user_id)]
        if r.event_type not in d:
            d[r.event_type] = r.ts
    clickers = [d for d in firsts.values() if "click" in d]
    deltas = [
        (_d(d["purchase"]) - _d(d["click"])).days
        for d in clickers
        if "purchase" in d and d["purchase"] >= d["click"]
    ]
    rows = {r["window_days"]: r for r in ops("funnel-window-sensitivity")}
    for w in (1, 3, 7, 14):
        conv = sum(1 for dd in deltas if dd <= w)
        r = rows[w]
        assert r["n_clickers"] == len(clickers)
        assert r["n_converted"] == conv
        close(r["cvr"], conv / len(clickers))


def _week_start(ts):
    d = ts.normalize() if hasattr(ts, "normalize") else ts
    return (d - timedelta(days=d.weekday()))


def test_retention_cohorts(ops, events):
    first_ts = events.groupby("user_id").ts.min()
    cohort = {int(u): _week_start(t) for u, t in first_ts.items()}
    cells: dict = defaultdict(set)
    for r in events.itertuples():
        cw = cohort[int(r.user_id)]
        wk = (_week_start(r.ts) - cw).days // 7
        cells[(cw, wk)].add(int(r.user_id))
    rows = {(r["cohort_week"], r["week_n"]): r["n_active_users"]
            for r in ops("retention-cohorts")}
    got = {(k[0], k[1]): v for k, v in rows.items()}
    want = {(cw.to_pydatetime(), wk): len(us)
            for (cw, wk), us in cells.items()}
    assert len(got) == len(want)
    for (cw, wk), n in want.items():
        assert got[(cw, wk)] == n, (cw, wk)


# ---------------------------------------------------------------------------
# anomaly


def test_anomaly_zscore(ops, events):
    rows = {r["event_type"]: r for r in ops("anomaly-zscore")}
    for et, g in events.groupby("event_type"):
        v = g.value.to_numpy()
        z = np.abs((v - v.mean()) / v.std())
        r = rows[et]
        assert r["n"] == len(v)
        assert r["n_outliers"] == int((z > 3).sum())
        close(r["max_abs_z"], z.max(), tol=1e-3)


def test_anomaly_iqr_fence(ops, events):
    rows = {r["event_type"]: r for r in ops("anomaly-iqr-fence")}
    for et, g in events.groupby("event_type"):
        v = g.value.to_numpy()
        q1 = np.percentile(v, 25, method="linear")
        q3 = np.percentile(v, 75, method="linear")
        iqr = q3 - q1
        out = int(((v < q1 - 1.5 * iqr) | (v > q3 + 1.5 * iqr)).sum())
        r = rows[et]
        close(r["q1"], q1, tol=1e-3)
        close(r["q3"], q3, tol=1e-3)
        close(r["iqr"], iqr, tol=1e-3)
        assert (r["n"], r["n_outliers"]) == (len(v), out)


def test_anomaly_alert_debounce(ops, events):
    daily: dict = defaultdict(Counter)
    for r in events.itertuples():
        daily[r.event_type][_d(r.ts)] += 1
    want = {}
    for et, cnt in daily.items():
        days = sorted(cnt)
        x = np.array([cnt[d] for d in days], dtype=float)
        z = (x - x.mean()) / x.std(ddof=1)
        alerts = [(d, zz) for d, zz in zip(days, z) if abs(zz) > 1.5]
        prev = None
        for d, zz in alerts:
            fired = prev is None or (d - prev).days >= 3
            want[(et, d)] = (zz, fired)
            prev = d
    rows = {(r["event_type"], r["alert_day"]): r
            for r in ops("anomaly-alert-debounce")}
    assert set(rows) == set(want)
    for k, (zz, fired) in want.items():
        close(rows[k]["z"], zz, tol=1e-3)
        assert rows[k]["fired"] == fired


def test_anomaly_poisson_deviance(ops, duck):
    df = duck.execute(
        "SELECT date_trunc('hour', ts) AS h, count(*) AS k"
        " FROM events GROUP BY 1"
    ).df()
    lam = df.k.mean()
    rows = {r["hour"]: r for r in ops("anomaly-poisson-deviance")}
    assert len(rows) == (df.k > 0).sum()
    for r in df.itertuples():
        if r.k == 0:
            continue
        dev = 2 * (r.k * math.log(r.k / lam) - (r.k - lam))
        g = rows[r.h]
        assert g["k"] == r.k
        close(g["baseline_rate"], lam, tol=1e-3)
        close(g["deviance"], dev, tol=1e-3)
        assert g["burst_flag"] == int(dev > 6.635 and r.k > lam)


def test_rolling_active_users(ops, events):
    by_day: dict = defaultdict(set)
    for r in events.itertuples():
        by_day[_d(r.ts)].add(int(r.user_id))
    rows = {r["day"]: r for r in ops("rolling-active-users")}
    assert set(rows) == set(by_day)
    for d, users in by_day.items():
        wau = set()
        for k in range(7):
            wau |= by_day.get(d - timedelta(days=k), set())
        r = rows[d]
        assert (r["dau"], r["wau"]) == (len(users), len(wau))


# ---------------------------------------------------------------------------
# attribution


def test_attribution_last_touch(ops, events):
    touches: dict = defaultdict(list)
    purchases = []
    for r in events.itertuples():
        if r.event_type in ("view", "click"):
            touches[int(r.user_id)].append((r.ts, int(r.event_id),
                                            r.event_type))
        elif r.event_type == "purchase":
            purchases.append((int(r.user_id), r.ts))
    cnt: Counter = Counter()
    week = timedelta(days=7)
    for uid, pts in purchases:
        cands = [
            t for t in touches.get(uid, [])
            if t[0] <= pts and t[0] >= pts - week
        ]
        if cands:
            cnt[max(cands, key=lambda t: (t[0], t[1]))[2]] += 1
        else:
            cnt["direct"] += 1
    rows = {r["channel"]: r["n_purchases"]
            for r in ops("attribution-last-touch")}
    assert rows == dict(cnt)


def _touch_windows(events):
    touches: dict = defaultdict(list)
    purchases = []
    for r in events.itertuples():
        if r.event_type in ("click", "view", "signup"):
            touches[int(r.user_id)].append((r.ts, int(r.event_id),
                                            r.event_type))
        elif r.event_type == "purchase":
            purchases.append((int(r.user_id), r.ts, int(r.event_id)))
    day = timedelta(hours=24)
    out = {}  # p_id -> ordered touch list
    for uid, pts, pid in purchases:
        cands = sorted(
            t for t in touches.get(uid, [])
            if pts - day <= t[0] < pts
        )
        if cands:
            out[(pid, pts)] = cands
    return out


def test_attribution_position_based(ops, events):
    win = _touch_windows(events)
    credit: Counter = Counter()
    n_touch: Counter = Counter()
    for cands in win.values():
        n = len(cands)
        for pos, (_, _, et) in enumerate(cands, 1):
            n_touch[et] += 1
            if n == 1:
                credit[et] += 1.0
            elif n == 2:
                credit[et] += 0.5
            elif pos == 1 or pos == n:
                credit[et] += 0.4
            else:
                credit[et] += 0.2 / (n - 2)
    rows = {r["event_type"]: r for r in ops("attribution-position-based")}
    assert set(rows) == set(n_touch)
    for et in n_touch:
        close(rows[et]["attributed_conversions"], credit[et], tol=1e-3)
        assert rows[et]["n_touches"] == n_touch[et]


def test_attribution_time_decay(ops, events):
    win = _touch_windows(events)
    credit: Counter = Counter()
    n_touch: Counter = Counter()
    for (pid, pts), cands in win.items():
        ws = [
            (et, 0.5 ** ((_sec(pts) - _sec(t)) / 21600.0))
            for t, _, et in cands
        ]
        tot = sum(w for _, w in ws)
        for et, w in ws:
            credit[et] += w / tot
            n_touch[et] += 1
    rows = {r["event_type"]: r for r in ops("attribution-time-decay")}
    assert set(rows) == set(n_touch)
    for et in n_touch:
        close(rows[et]["attributed_conversions"], credit[et], tol=1e-3)
        assert rows[et]["n_touches"] == n_touch[et]


def test_attribution_shapley(ops, events):
    per_user: dict = defaultdict(lambda: [0, 0, 0, 0])  # c, v, s, conv
    for r in events.itertuples():
        u = per_user[int(r.user_id)]
        if r.event_type == "click":
            u[0] = 1
        elif r.event_type == "view":
            u[1] = 1
        elif r.event_type == "signup":
            u[2] = 1
        elif r.event_type == "purchase":
            u[3] = 1
    masks: dict = defaultdict(list)
    for c, v, s, conv in per_user.values():
        masks[c * 4 + v * 2 + s].append(conv)
    V = {m: np.mean(lst) for m, lst in masks.items()}
    g = lambda m: V.get(m, 0.0)
    want = {
        "click": (2 * (g(4) - g(0)) + (g(6) - g(2)) + (g(5) - g(1))
                  + 2 * (g(7) - g(3))) / 6,
        "view": (2 * (g(2) - g(0)) + (g(6) - g(4)) + (g(3) - g(1))
                 + 2 * (g(7) - g(5))) / 6,
        "signup": (2 * (g(1) - g(0)) + (g(5) - g(4)) + (g(3) - g(2))
                   + 2 * (g(7) - g(6))) / 6,
    }
    rows = {r["channel"]: r["shapley"] for r in ops("attribution-shapley")}
    assert set(rows) == set(want)
    for ch, v in want.items():
        close(rows[ch], v)


# ---------------------------------------------------------------------------
# basket / skyline / featurestore / rec


def test_basket_affinity(ops, duck):
    df = duck.execute(
        "SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem"
    ).df()
    by_order: dict = defaultdict(list)
    for r in df.itertuples():
        by_order[int(r.ok)].append(int(r.pk))
    pairs: Counter = Counter()
    for items in by_order.values():
        items.sort()
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pairs[(items[x], items[y])] += 1
    want = sorted(
        ((p, n) for p, n in pairs.items() if n >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:50]
    got = [((r["part_a"], r["part_b"]), r["n_baskets"])
           for r in ops("basket-affinity")]
    assert got == want


def test_skyline_pareto(ops, duck):
    df = duck.execute(
        "SELECT o_orderkey AS k, o_totalprice AS p,"
        " CAST(o_orderkey % 7 AS BIGINT) + length(o_orderpriority) AS s"
        " FROM orders ORDER BY p, k"
    ).df()
    best = -1
    want = set()
    for r in df.itertuples():
        if r.s > best:
            want.add(int(r.k))
        best = max(best, int(r.s))
    got = {r["o_orderkey"] for r in ops("skyline-pareto")}
    assert got == want


def test_featurestore_pit_join(ops, duck):
    orders = duck.execute(
        "SELECT o_custkey AS c, o_orderdate AS d FROM orders ORDER BY 1, 2"
    ).df()
    by_cust: dict = defaultdict(list)
    for r in orders.itertuples():
        by_cust[int(r.c)].append(r.d)
    ev = duck.execute(
        "SELECT event_id, user_id, ts, event_type FROM events"
        " ORDER BY user_id, ts, event_id"
    ).df()
    purch: dict = defaultdict(list)
    for r in ev.itertuples():
        if r.event_type == "purchase":
            purch[int(r.user_id)].append(r.ts)
    rows = {r["event_id"]: r for r in ops("featurestore-pit-join")}
    views = ev[ev.event_type == "view"]
    assert set(rows) == {int(i) for i in views.event_id}
    for r in views.itertuples():
        uid = int(r.user_id)
        past = [d for d in by_cust.get(uid, []) if d <= r.ts]
        g = rows[int(r.event_id)]
        assert g["f_orders_to_date"] == len(past)
        if past:
            assert _d(g["f_last_order_date"]) == _d(max(past))
        else:
            assert g["f_last_order_date"] is None
        assert g["f_purchases_before"] == sum(
            1 for t in purch.get(uid, []) if t < r.ts
        )


def test_featurestore_time_decay_score(ops, events):
    now = events.ts.max()
    per: dict = defaultdict(lambda: [0.0, 0.0, 0])
    for r in events.itertuples():
        if r.event_type not in ("click", "purchase"):
            continue
        u = per[int(r.user_id)]
        dt = _sec(now) - _sec(r.ts)
        u[0] += r.value * math.exp(-0.1 * dt / 86400.0)
        u[1] += r.value
        u[2] += 1
    scored = sorted(
        ((-s, uid, raw, n) for uid, (s, raw, n) in per.items()),
        key=lambda t: (t[0], t[1]),
    )[:20]
    got = ops("featurestore-time-decay-score")
    assert [r["user_id"] for r in got] == [u for _, u, _, _ in scored]
    for g, (s, u, raw, n) in zip(got, scored):
        close(g["decay_score"], -s, tol=1e-3)
        close(g["raw_score"], raw, tol=1e-3)
        assert g["n_events"] == n


@pytest.fixture(scope="module")
def cobaskets(duck):
    df = duck.execute(
        "SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk"
        " FROM lineitem WHERE l_partkey % 7 = 0"
    ).df()
    by_order: dict = defaultdict(list)
    freq: Counter = Counter()
    for r in df.itertuples():
        by_order[int(r.ok)].append(int(r.pk))
        freq[int(r.pk)] += 1
    pairs: Counter = Counter()
    for items in by_order.values():
        items.sort()
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pairs[(items[x], items[y])] += 1
    return freq, pairs


def test_rec_item_item_cosine(ops, cobaskets):
    freq, pairs = cobaskets
    scored = sorted(
        (
            -round_half_up(c / math.sqrt(freq[a] * freq[b]), 6),
            a, b, c,
        )
        for (a, b), c in pairs.items()
        if c >= 2
    )[:20]
    got = [(r["item_a"], r["item_b"], r["n_cobaskets"], r["cosine"])
           for r in ops("rec-item-item-cosine")]
    assert got == [(a, b, c, -s) for s, a, b, c in scored]


def round_half_up(x, d):
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 10**d + 0.5) / 10**d


def test_rec_coverage_novelty(ops, cobaskets):
    freq, pairs = cobaskets
    z = float(sum(freq.values()))
    n_items = float(len(freq))
    recs = sorted(
        (
            -(c / math.sqrt(freq[a] * freq[b])),
            a, b,
        )
        for (a, b), c in pairs.items()
        if c >= 2
    )[:20]
    rec_items = {a for _, a, _ in recs} | {b for _, _, b in recs}
    # UNION ALL in the rec_items CTE: the novelty mean weights items by
    # how many rec pairs they appear in (coverage dedupes, novelty not)
    multiset = [a for _, a, _ in recs] + [b for _, _, b in recs]
    novelty = np.mean([-math.log2(freq[i] / z) for i in multiset])
    (row,) = ops("rec-coverage-novelty")
    assert row["n_rec_items"] == len(rec_items)
    close(row["catalog_coverage"], len(rec_items) / n_items)
    close(row["mean_novelty_bits"], novelty, tol=1e-3)


# ---------------------------------------------------------------------------
# ml tail / eval / stats


def test_ml_kfold_assign(ops, events):
    per: dict = defaultdict(lambda: [0, 0])
    for r in events.itertuples():
        u = per[int(r.user_id)]
        u[0] += 1
        u[1] += int(r.event_type == "purchase")
    cells: dict = defaultdict(lambda: [0, 0, 0])
    for uid, (n, np_) in per.items():
        f = string_hash(f"{uid}:kfold-salt-r5") % 5
        c = cells[f]
        c[0] += 1
        c[1] += n
        c[2] += np_
    rows = {r["fold"]: r for r in ops("ml-kfold-assign")}
    assert set(rows) == set(cells)
    for f, (nu, ne, npu) in cells.items():
        r = rows[f]
        assert (r["n_users"], r["n_events"]) == (nu, ne)
        close(r["purchase_rate"], npu / ne)


def _nb_features(events):
    per_np: dict = defaultdict(list)   # non-purchase values
    hb_cnt: dict = defaultdict(Counter)
    n_purch: Counter = Counter()
    for r in events.itertuples():
        uid = int(r.user_id)
        if r.event_type == "purchase":
            n_purch[uid] += 1
        else:
            per_np[uid].append(r.value)
            hb_cnt[uid][r.ts.hour // 6] += 1
    base = {}
    for uid, vals in per_np.items():
        mv = np.mean(vals)
        f_val = "lo" if mv < 48 else ("mid" if mv < 52 else "hi")
        f_hour = max(
            (str(c).zfill(10) + ":" + str(hb))
            for hb, c in hb_cnt[uid].items()
        ).split(":")[1]
        label = int(n_purch[uid] >= 13)
        base[uid] = (f_val, f_hour, label)
    return base


def test_ml_naive_bayes(ops, events):
    base = _nb_features(events)
    tr = {u: v for u, v in base.items()
          if string_hash(f"{u}:nb-salt-r5") % 5 < 4}
    te = {u: v for u, v in base.items()
          if string_hash(f"{u}:nb-salt-r5") % 5 >= 4}
    n_train = len(tr)
    pri = Counter(lbl for _, _, lbl in tr.values())
    cv: Counter = Counter()
    ch: Counter = Counter()
    for f_val, f_hour, lbl in tr.values():
        cv[(lbl, f_val)] += 1
        ch[(lbl, f_hour)] += 1
    correct = 0
    ll_sum = 0.0
    for f_val, f_hour, lbl in te.values():
        lls = {}
        for c in (0, 1):
            lls[c] = (
                math.log((pri.get(c, 0) + 1) / (n_train + 2))
                + math.log((cv.get((c, f_val), 0) + 1) / (pri.get(c, 0) + 3))
                + math.log((ch.get((c, f_hour), 0) + 1) / (pri.get(c, 0) + 4))
            )
        pred = int(lls[1] > lls[0])
        correct += int(pred == lbl)
        m = max(lls.values())
        ll_sum += lls[lbl] - (m + math.log(
            math.exp(lls[0] - m) + math.exp(lls[1] - m)))
    (row,) = ops("ml-naive-bayes")
    assert (row["n_train"], row["n_test"]) == (n_train, len(te))
    close(row["accuracy"], correct / len(te))
    close(row["log_loss"], -ll_sum / len(te))
    close(row["base_rate"], np.mean([l for _, _, l in te.values()]))


def test_ml_learning_curve(ops, events):
    base = _nb_features(events)  # reuse f_val + label derivation
    hashed = {
        u: (f_val, lbl, string_hash(f"{u}:lc-salt-r5") % 100)
        for u, (f_val, _, lbl) in base.items()
    }
    test = [(f, l) for f, l, h in hashed.values() if h >= 80]
    rows = {r["train_pct_of_pool"]: r for r in ops("ml-learning-curve")}
    for frac in (16, 32, 48, 64, 80):
        train = [(f, l) for f, l, h in hashed.values() if h < frac]
        model = {}
        for f_val in set(f for f, _ in train):
            sel = [l for f, l in train if f == f_val]
            model[f_val] = int(sum(sel) * 2 > len(sel))
        scored = [(model[f], l) for f, l in test if f in model]
        acc = np.mean([p == l for p, l in scored])
        r = rows[frac]
        assert r["n_train"] == len(train)
        assert r["n_test"] == len(scored)
        close(r["accuracy"], acc)


def test_ml_bootstrap_slope_se(ops, events):
    per: dict = defaultdict(lambda: [0, 0])
    for r in events.itertuples():
        u = per[int(r.user_id)]
        if r.event_type == "purchase":
            u[1] += 1
        else:
            u[0] += 1
    pts = [
        (uid, math.log(1 + n_np), float(n_p))
        for uid, (n_np, n_p) in per.items()
        if n_np > 0
    ]
    x = np.array([p[1] for p in pts])
    y = np.array([p[2] for p in pts])
    n = len(pts)
    sxx = ((x - x.mean()) ** 2).sum()
    slope = ((x - x.mean()) * (y - y.mean())).sum() / sxx
    resid = y - (y.mean() + slope * (x - x.mean()))
    se_an = math.sqrt((resid**2).sum() / (n - 2) / sxx)
    CDF = (0.367879, 0.735759, 0.919699, 0.981012)
    slopes = []
    for rep in range(12):
        w = np.empty(n)
        for i, (uid, _, _) in enumerate(pts):
            u = int(hashlib.md5(f"{uid}:bse:{rep}".encode())
                    .hexdigest()[:12], 16) / 281474976710656.0
            ww = 4
            for k, c in enumerate(CDF):
                if u < c:
                    ww = k
                    break
            w[i] = ww
        sw = w.sum()
        sx, sy = (w * x).sum(), (w * y).sum()
        slopes.append(
            ((w * x * y).sum() - sx * sy / sw)
            / ((w * x * x).sum() - sx * sx / sw)
        )
    (row,) = ops("ml-bootstrap-slope-se")
    assert (row["n_users"], row["n_replicas"]) == (n, 12)
    close(row["slope"], slope, tol=1e-3)
    close(row["se_analytic"], se_an, tol=1e-3)
    close(row["se_bootstrap"], np.std(slopes, ddof=1), tol=1e-3)
    close(row["se_ratio"], np.std(slopes, ddof=1) / se_an, tol=1e-2)


def test_eval_rank_stability_bootstrap(ops, events):
    CDF = (0.367879, 0.735759, 0.919699, 0.981012)
    ranks: dict = defaultdict(list)
    for rep in range(12):
        sums: dict = defaultdict(lambda: [0.0, 0.0])
        for r in events.itertuples():
            u = int(hashlib.md5(f"{int(r.event_id)}:rs:{rep}".encode())
                    .hexdigest()[:12], 16) / 281474976710656.0
            w = 4
            for k, c in enumerate(CDF):
                if u < c:
                    w = k
                    break
            s = sums[r.event_type]
            s[0] += w * r.value
            s[1] += w
        means = {et: s[0] / s[1] for et, s in sums.items()}
        order = sorted(means, key=lambda et: (-means[et], et))
        for rk, et in enumerate(order, 1):
            ranks[et].append(rk)
    rows = {r["event_type"]: r for r in ops("eval-rank-stability-bootstrap")}
    assert set(rows) == set(ranks)
    for et, rks in ranks.items():
        r = rows[et]
        close(r["p_rank1"], np.mean([rk == 1 for rk in rks]))
        close(r["mean_rank"], np.mean(rks))
        assert (r["best_rank"], r["worst_rank"]) == (min(rks), max(rks))


def test_binary_confusion_battery(ops, events):
    cells: dict = defaultdict(lambda: [0, 0])
    for r in events.itertuples():
        c = cells[(int(r.user_id), _d(r.ts))]
        if r.event_type == "click":
            c[0] = 1
        if r.event_type == "purchase":
            c[1] = 1
    tp = sum(1 for p, a in cells.values() if p and a)
    fp = sum(1 for p, a in cells.values() if p and not a)
    fn = sum(1 for p, a in cells.values() if not p and a)
    tn = sum(1 for p, a in cells.values() if not p and not a)
    (row,) = ops("stats-binary-confusion-battery")
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    close(row["mcc"], mcc)
    close(row["balanced_accuracy"],
          0.5 * (tp / (tp + fn) + tn / (tn + fp)))
    close(row["youden_informedness"],
          tp / (tp + fn) + tn / (tn + fp) - 1)
    close(row["f1"], 2 * tp / (2 * tp + fp + fn))


def test_permutation_test(ops, events):
    sel = events[events.event_type.isin(["click", "view"])]
    obs = (sel[sel.event_type == "click"].value.mean()
           - sel[sel.event_type == "view"].value.mean())
    diffs = []
    for b in range(20):
        g1, g0 = [], []
        for r in sel.itertuples():
            g = string_hash(f"{int(r.event_id)}:{b}:perm-salt-r5") % 2
            (g1 if g == 1 else g0).append(r.value)
        diffs.append(np.mean(g1) - np.mean(g0))
    diffs = np.array(diffs)
    (row,) = ops("stats-permutation-test")
    assert row["n_permutations"] == 20
    close(row["observed_diff"], obs, tol=1e-3)
    close(row["mean_null_abs_diff"], np.abs(diffs).mean(), tol=1e-3)
    close(row["p_value"],
          (1 + (np.abs(diffs) >= abs(obs)).sum()) / 21, tol=1e-3)
