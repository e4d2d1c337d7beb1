"""Round-8 golden cross-checks: formula-dense stragglers in the
partially-covered modules (advanced, asof, batteries, timeseries,
curation, mlprep_inference).

Same charter as the other golden suites: raw rows come straight from
the sf0.01 parquet via DuckDB, the statistic is rebuilt in plain
Python/numpy/pandas from the documented formula (no Spark, no shared
SQL), and the op output — fetched through the registry, the driver's
entry point — must agree. Highlights: the sweep-line session
concurrency pair (guards the r8 day-bucketed rework), the as-of join
family (nearest/backward/forward/tolerance semantics recomputed by
binary search), Jonckheere-Terpstra (the one uncovered op in
mlprep_inference) and chunk-overlap (ditto for curation). Waves 2-3
close the timeseries, text and analytics modules too — six modules
joined FORMULA_DENSE_MODULES this round (asof, curation,
mlprep_inference, text, timeseries, analytics), so every op in all 16
pinned modules now has a third implementation.
"""

from __future__ import annotations

import math
import re

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
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


def _round_half_up(x: float, d: int) -> float:
    # Spark/DuckDB round() for the non-negative values used here
    return math.floor(x * 10**d + 0.5) / 10**d


# ---------------------------------------------------------------------------
# sweep-line session pair


def _user_sessions(duck):
    """Sessions per user under the 30-min gap rule over (ts, event_id)
    order — the shared SPEC of sessionize / window-session-concurrency.
    Returns (records, sessions): per-event (user_id, event_id, sid0)
    with 0-based sid, and per-session (user_id, sid0, start, end)."""
    rows = duck.execute(
        "SELECT user_id, event_id, ts FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    records, sessions = [], []
    prev_uid = None
    prev_ts = None
    sid = 0
    for uid, eid, ts in rows:
        if uid != prev_uid:
            if prev_uid is not None:
                sessions.append((prev_uid, sid, start, prev_ts))
            prev_uid, sid, start = uid, 0, ts
        elif (ts - prev_ts).total_seconds() > 1800:
            sessions.append((uid, sid, start, prev_ts))
            sid += 1
            start = ts
        records.append((uid, eid, sid))
        prev_ts = ts
    if prev_uid is not None:
        sessions.append((prev_uid, sid, start, prev_ts))
    return records, sessions


def test_sessionize(ops, duck):
    records, _ = _user_sessions(duck)
    want = {(u, e): s + 1 for u, e, s in records}
    got = {(r["user_id"], r["event_id"]): r["session_id"] for r in ops("sessionize")}
    assert got == want


def test_window_session_concurrency(ops, duck):
    _, sessions = _user_sessions(duck)
    # sweep line: +1/-1 at endpoints, total order (ts, delta, skey)
    deltas = []
    for uid, sid, start, end in sessions:
        skey = uid * 1000 + sid
        deltas.append((start, 1, skey))
        deltas.append((end, -1, skey))
    deltas.sort()
    want: dict = {}
    cur = 0
    for ts, delta, _skey in deltas:
        cur += delta
        day = ts.date()
        want[day] = max(want.get(day, cur), cur)
    got = {r["day"]: r["peak_concurrency"] for r in ops("window-session-concurrency")}
    assert got == want


# ---------------------------------------------------------------------------
# as-of join family (backward / forward / nearest / tolerance)


@pytest.fixture(scope="module")
def asof_inputs(duck):
    ev = duck.execute("SELECT event_id, user_id, ts FROM events").fetchall()
    orders: dict[int, list] = {}
    for ck, od in duck.execute(
        "SELECT o_custkey, o_orderdate FROM orders ORDER BY o_custkey, o_orderdate"
    ).fetchall():
        orders.setdefault(ck, []).append(od)
    return ev, orders


def _back_fwd(orders, uid, ts):
    import bisect

    ods = orders.get(uid, [])
    i = bisect.bisect_right(ods, ts)
    back = ods[i - 1] if i > 0 else None
    fwd = ods[i] if i < len(ods) else None
    # o_orderdate == ts belongs to BOTH (<= and >=): bisect_right puts an
    # exact match into `back`; fwd must then also consider it
    if i > 0 and ods[i - 1] == ts:
        fwd = ods[i - 1]
    return back, fwd


def test_join_asof_backward(ops, asof_inputs):
    ev, orders = asof_inputs
    want = {eid: _back_fwd(orders, uid, ts)[0] for eid, uid, ts in ev}
    got = {r["event_id"]: r["asof_o_orderdate"] for r in ops("join-asof")}
    assert got == want


def test_join_asof_forward(ops, asof_inputs):
    ev, orders = asof_inputs
    want = {eid: _back_fwd(orders, uid, ts)[1] for eid, uid, ts in ev}
    got = {r["event_id"]: r["next_o_orderdate"] for r in ops("join-asof-forward")}
    assert got == want


def test_join_asof_nearest(ops, asof_inputs):
    ev, orders = asof_inputs
    want = {}
    for eid, uid, ts in ev:
        back, fwd = _back_fwd(orders, uid, ts)
        if back is None:
            want[eid] = fwd
        elif fwd is None:
            want[eid] = back
        else:
            want[eid] = (
                back
                if (ts - back).total_seconds() <= (fwd - ts).total_seconds()
                else fwd
            )
    got = {r["event_id"]: r["nearest_o_orderdate"] for r in ops("join-asof-nearest")}
    assert got == want


def test_join_asof_tolerance(ops, asof_inputs):
    import datetime

    ev, orders = asof_inputs
    want = {}
    for eid, uid, ts in ev:
        back, _ = _back_fwd(orders, uid, ts)
        ok = back is not None and back >= ts - datetime.timedelta(days=30)
        want[eid] = (back if ok else None, ok)
    got = {
        r["event_id"]: (r["asof_o_orderdate"], r["is_fresh"])
        for r in ops("join-asof-tolerance")
    }
    assert got == want


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra (ordered-alternative trend across hour quadrants)


def test_jonckheere_terpstra(ops, duck):
    (row,) = ops("stats-jonckheere-terpstra")
    df = duck.execute(
        "SELECT CAST(floor(extract(hour FROM ts) / 6) AS INT) AS g, value "
        "FROM events"
    ).df()
    df["v"] = df["value"].map(lambda x: _round_half_up(x, 2))
    groups = [np.sort(df.loc[df.g == g, "v"].to_numpy()) for g in sorted(df.g.unique())]
    jt = 0.0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            a, b = groups[i], groups[j]
            lo = np.searchsorted(a, b, side="left")
            hi = np.searchsorted(a, b, side="right")
            jt += float(lo.sum()) + 0.5 * float((hi - lo).sum())
    sizes = np.array([len(g) for g in groups], dtype=float)
    n = sizes.sum()
    expected = (n * n - (sizes**2).sum()) / 4.0
    var = (n * n * (2 * n + 3) - (sizes**2 * (2 * sizes + 3)).sum()) / 72.0
    assert row["n_obs"] == int(n)
    close(row["jt_stat"], jt, tol=1e-3)
    close(row["expected_jt"], expected, tol=1e-3)
    close(row["jt_z"], (jt - expected) / math.sqrt(var), tol=1e-3)


# ---------------------------------------------------------------------------
# chunk-overlap (32-token windows, stride 16)


def test_text_chunk_overlap(ops, duck):
    want = {}
    for doc_id, text in duck.execute("SELECT doc_id, text FROM documents").fetchall():
        toks = text.split(" ")
        for start in range(0, len(toks), 16):
            chunk = toks[start : start + 32]
            want[(doc_id, start // 16)] = (len(chunk), " ".join(chunk))
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in ops("text-chunk-overlap")
    }
    assert got == want


# ---------------------------------------------------------------------------
# truncated-EWMA window


def test_window_ewma(ops, duck):
    rows = duck.execute(
        "SELECT user_id, event_id, ts, value FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625]
    want = {}
    hist: list = []
    prev_uid = None
    for uid, eid, _ts, v in rows:
        if uid != prev_uid:
            hist, prev_uid = [], uid
        hist.append(v)
        window = hist[-5:][::-1]  # current value first, then lags
        num = sum(w * x for w, x in zip(weights, window))
        den = sum(weights[: len(window)])
        want[eid] = num / den
    got = {r["event_id"]: r["ewma"] for r in ops("window-ewma")}
    assert set(got) == set(want)
    for eid, g in got.items():
        close(g, want[eid], tol=1e-5)


# ---------------------------------------------------------------------------
# cluster purity over sign-hash buckets


def test_embed_cluster_purity(ops):
    reg = registry()
    (row,) = ops("embed-cluster-purity")
    sql = reg["embed-cluster-purity"].oracle
    # the hyperplanes are literal vectors in the op's spec; the MATH
    # (dots, signs, majority counts) is recomputed independently here
    planes = [
        np.array([float(x) for x in m.split(",")])
        for m in re.findall(r"\[([-\d.,\s]+)\]", sql)
    ]
    weights = [int(w) for w in re.findall(r"> 0 THEN (\d+)", sql)]
    assert len(planes) == len(weights) >= 2
    con = duckdb.connect()
    df = con.execute(
        f"SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM '{SF}/embeddings.parquet'"
    ).df()
    emb = np.stack(df["e"].to_numpy())
    buckets = np.zeros(len(emb), dtype=int)
    for plane, w in zip(planes, weights):
        buckets += (emb @ plane > 0) * w
    from collections import Counter

    cells = Counter(zip(buckets.tolist(), df["label"].tolist()))
    per_bucket: dict[int, list[int]] = {}
    for (b, _l), n in cells.items():
        per_bucket.setdefault(b, []).append(n)
    bucket_n = {b: sum(v) for b, v in per_bucket.items()}
    majority = {b: max(v) for b, v in per_bucket.items()}
    assert row["n_buckets"] == len(per_bucket)
    assert row["n_vectors"] == sum(bucket_n.values())
    close(
        row["weighted_purity"],
        sum(majority.values()) / sum(bucket_n.values()),
        tol=1e-5,
    )
    close(
        row["macro_purity"],
        float(np.mean([majority[b] / bucket_n[b] for b in per_bucket])),
        tol=1e-5,
    )


# ---------------------------------------------------------------------------
# exact interpolated percentiles


def test_agg_percentile(ops, duck):
    got = {r["l_returnflag"]: (r["p25"], r["p50"], r["p75"]) for r in ops("agg-percentile")}
    df = duck.execute("SELECT l_returnflag, l_extendedprice FROM lineitem").df()
    for flag, g in df.groupby("l_returnflag"):
        v = g["l_extendedprice"].to_numpy()
        want = tuple(float(np.quantile(v, q, method="linear")) for q in (0.25, 0.5, 0.75))
        for a, b in zip(got[flag], want):
            close(a, b, tol=1e-3)


# ---------------------------------------------------------------------------
# rolling z-score over the daily series


def test_window_zscore_rolling(ops, duck):
    import pandas as pd

    df = duck.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value "
        "FROM events"
    ).df()
    daily = (
        df.groupby(["event_type", "day"])["value"].sum().reset_index(name="raw")
    )
    daily["v"] = daily["raw"].map(lambda x: _round_half_up(x, 6))
    want = {}
    for et, g in daily.sort_values("day").groupby("event_type"):
        v = g["v"].reset_index(drop=True)
        mu = v.rolling(7).mean()
        sd = v.rolling(7).std(ddof=1)
        for i, day in enumerate(g["day"].reset_index(drop=True)):
            if i >= 6:
                z = (v[i] - mu[i]) / sd[i]
                want[(et, pd.Timestamp(day).date())] = (z, abs(z) > 2.5)
    got = {
        (r["event_type"], r["day"]): (r["rolling_z"], r["is_anomaly"])
        for r in ops("window-zscore-rolling")
    }
    assert set(got) == set(want)
    for k, (gz, ga) in got.items():
        wz, wa = want[k]
        close(gz, wz, tol=1e-3)
        assert ga == wa, (k, gz, wz)


# ---------------------------------------------------------------------------
# interval-overlap theta join (user-day sessions x synthetic campaigns)


def test_join_interval_overlap(ops, duck):
    import datetime

    rows = duck.execute(
        "SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "min(ts) AS s, max(ts) AS e FROM events GROUP BY 1, 2"
    ).fetchall()
    (t0,) = duck.execute("SELECT min(ts) FROM events").fetchone()
    want: dict = {}
    for k in range(8):
        cs = t0 + datetime.timedelta(hours=40 * k)
        ce = cs + datetime.timedelta(hours=12)
        n = 0
        ov = 0
        for _u, _d, s, e in rows:
            if s < ce and cs < e:
                n += 1
                # date_diff('second') counts second-BOUNDARY crossings:
                # truncate each endpoint to whole seconds, then subtract
                epoch0 = datetime.datetime(1970, 1, 1)
                esec = lambda x: math.floor((x - epoch0).total_seconds())
                ov += esec(min(e, ce)) - esec(max(s, cs))
        if n:
            want[k] = (n, ov)
    got = {
        r["campaign_id"]: (r["n_sessions"], r["overlap_seconds"])
        for r in ops("join-interval-overlap")
    }
    assert got == want


# ---------------------------------------------------------------------------
# wave 2: the last uncovered timeseries + text ops (promotes both modules
# into FORMULA_DENSE_MODULES)


def test_agg_bitmap_distinct(ops, duck):
    rows = duck.execute("SELECT ts, user_id FROM events").fetchall()
    want: dict = {}
    for ts, uid in rows:
        want.setdefault(ts.date(), set()).add(uid)
    got = {r["day"].date() if hasattr(r["day"], "date") else r["day"]: r["n_distinct_users"]
           for r in ops("agg-bitmap-distinct")}
    assert got == {d: len(s) for d, s in want.items()}


def test_observe_pipeline_metrics(ops, duck):
    (row,) = ops("observe-pipeline-metrics")
    vals = [v for (v,) in duck.execute("SELECT value FROM events").fetchall()]
    assert row["n_rows"] == len(vals)
    assert row["n_negative"] == sum(1 for v in vals if v < 0)
    close(row["total_value"], sum(vals), tol=1e-1)
    close(row["max_value"], max(vals), tol=1e-5)


def test_rollup_timebucket(ops, duck):
    rows = duck.execute("SELECT event_type, ts, value FROM events").fetchall()
    want: dict = {}
    for et, ts, v in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        day = hour.replace(hour=0)
        for gran, b in (("hour", hour), ("day", day)):
            k = (gran, b, et)
            n, s = want.get(k, (0, 0.0))
            want[k] = (n + 1, s + v)
    got = {
        (r["granularity"], r["bucket_ts"], r["event_type"]): (r["n"], r["sum_value"])
        for r in ops("rollup-timebucket")
    }
    assert set(got) == set(want)
    for k, (gn, gs) in got.items():
        wn, ws = want[k]
        assert gn == wn, k
        close(gs, ws, tol=1e-2)


def test_text_lang_agg(ops, duck):
    rows = duck.execute("SELECT lang, n_chars, text FROM documents").fetchall()
    agg: dict = {}
    for lang, nc, text in rows:
        n, chars, toks = agg.get(lang, (0, 0, 0))
        agg[lang] = (n + 1, chars + nc, toks + len(text.split(" ")))
    got = {r["lang"]: (r["n_docs"], r["total_chars"], r["avg_tokens"])
           for r in ops("text-lang-agg")}
    assert set(got) == set(agg)
    for lang, (n, chars, toks) in agg.items():
        gn, gc, gavg = got[lang]
        assert (gn, gc) == (n, chars)
        close(gavg, toks / n, tol=1e-5)


def test_text_split_sentences(ops, duck):
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    want = {}
    for doc_id, text in rows:
        for i, s in enumerate(text.split("."), start=1):
            want[(doc_id, i)] = s.strip()
    got = {(r["doc_id"], r["sentence_idx"]): r["sentence"]
           for r in ops("text-split-sentences")}
    assert got == want


def test_text_udtf_bigrams(ops, duck):
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    want = {}
    for doc_id, text in rows:
        t = text.split(" ")
        for i in range(1, len(t)):  # 1-based idx over len-1 bigrams
            want[(doc_id, i)] = f"{t[i-1]} {t[i]}"
    got = {(r["doc_id"], r["idx"]): r["bigram"] for r in ops("text-udtf-bigrams")}
    assert got == want


def test_text_udtf_table_arg(ops, duck):
    rows = duck.execute("SELECT lang, text FROM documents").fetchall()
    agg: dict = {}
    for lang, text in rows:
        n = len(text.split(" "))
        c, tot, mx = agg.get(lang, (0, 0, 0))
        agg[lang] = (c + 1, tot + n, max(mx, n))
    got = {r["lang"]: (r["n_docs"], r["total_tokens"], r["max_tokens"])
           for r in ops("text-udtf-table-arg")}
    assert got == agg


# ---------------------------------------------------------------------------
# wave 3: the last uncovered analytics-module ops (promotes analytics)


def _round_half_away(x: float, d: int = 0) -> float:
    return math.copysign(math.floor(abs(x) * 10**d + 0.5), x) / 10**d


def test_agg_argminmax_battery(ops, duck):
    rows = duck.execute(
        "SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM customer"
    ).fetchall()
    per: dict = {}
    for nk, ck, name, bal in rows:
        key = int(_round_half_away(bal * 100)) * 10000000 + ck
        per.setdefault(nk, []).append((key, name, bal))
    got = {r["c_nationkey"]: r for r in ops("agg-argminmax-battery")}
    assert set(got) == set(per)
    for nk, items in per.items():
        r = got[nk]
        assert r["poorest_customer"] == min(items)[1]
        assert r["richest_customer"] == max(items)[1]
        close(r["min_bal"], min(b for _, _, b in items), tol=1e-2)
        close(r["max_bal"], max(b for _, _, b in items), tol=1e-2)


def test_agg_multi_distinct_expand(ops, duck):
    rows = duck.execute(
        "SELECT l_returnflag, l_partkey, l_suppkey, l_orderkey FROM lineitem"
    ).fetchall()
    agg: dict = {}
    for f, p, s, o in rows:
        d = agg.setdefault(f, {"p": set(), "s": set(), "o": set(), "n": 0})
        d["p"].add(p); d["s"].add(s); d["o"].add(o); d["n"] += 1
    got = {r["l_returnflag"]: r for r in ops("agg-multi-distinct-expand")}
    assert set(got) == set(agg)
    for f, d in agg.items():
        r = got[f]
        assert (r["nd_parts"], r["nd_supps"], r["nd_orders"], r["n_rows"]) == (
            len(d["p"]), len(d["s"]), len(d["o"]), d["n"]
        )


def test_analytics_fulfillment_latency(ops, duck):
    rows = duck.execute(
        "SELECT o.o_orderdate, l.l_shipdate FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    per: dict = {}
    for od, sd in rows:
        mth = od.date().replace(day=1)
        per.setdefault(mth, []).append((sd.date() - od.date()).days)
    got = {r["mth"]: r for r in ops("analytics-fulfillment-latency")}
    assert set(got) == set(per)
    for mth, lags in per.items():
        r = got[mth]
        assert r["n_lineitems"] == len(lags)
        v = np.array(lags, dtype=float)
        close(r["p50_days"], float(np.quantile(v, 0.5, method="linear")), tol=1e-3)
        close(r["p95_days"], float(np.quantile(v, 0.95, method="linear")), tol=1e-3)
        close(r["mean_days"], float(v.mean()), tol=1e-3)


def test_analytics_new_vs_returning(ops, duck):
    rows = duck.execute("SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) FROM events").fetchall()
    first: dict = {}
    for uid, day in rows:
        first[uid] = min(first.get(uid, day), day)
    per: dict = {}
    for uid, day in rows:
        new, ret = per.get(day, (0, 0))
        if day == first[uid]:
            new += 1
        else:
            ret += 1
        per[day] = (new, ret)
    got = {r["day"]: r for r in ops("analytics-new-vs-returning")}
    assert set(got) == set(per)
    for day, (new, ret) in per.items():
        r = got[day]
        assert (r["new_users"], r["returning_users"]) == (new, ret)
        close(r["returning_share"], ret / (new + ret), tol=1e-5)


def _sessions_with_events(duck):
    """(uid, sid) -> ordered list of event types, same gap rule."""
    rows = duck.execute(
        "SELECT user_id, event_id, ts, event_type FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    out: dict = {}
    prev_uid, prev_ts, sid = None, None, 0
    for uid, _eid, ts, et in rows:
        if uid != prev_uid:
            prev_uid, sid = uid, 0
        elif (ts - prev_ts).total_seconds() > 1800:
            sid += 1
        out.setdefault((uid, sid), []).append(et)
        prev_ts = ts
    return out


def test_analytics_session_conversion(ops, duck):
    (row,) = ops("analytics-session-conversion")
    sess = _sessions_with_events(duck)
    n = len(sess)
    conv = sum(1 for ets in sess.values() if "purchase" in ets)
    assert row["n_sessions"] == n
    assert row["n_converted"] == conv
    close(row["session_conversion"], conv / n, tol=1e-5)
    close(
        row["avg_events_per_session"],
        sum(len(v) for v in sess.values()) / n,
        tol=1e-5,
    )


def test_analytics_session_paths(ops, duck):
    from collections import Counter

    sess = _sessions_with_events(duck)
    paths = Counter(
        " > ".join(ets) for ets in sess.values() if len(ets) <= 4
    )
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r["path"], r["n_sessions"]) for r in ops("analytics-session-paths")]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top


def test_scd2_point_in_time(ops, duck):
    import datetime

    rows = duck.execute(
        "SELECT user_id, event_id, ts, event_type FROM events "
        "WHERE ts <= TIMESTAMP '2024-01-20' ORDER BY user_id, ts, event_id"
    ).fetchall()
    want: dict = {}
    for uid, _eid, ts, et in rows:  # last (ts, event_id) per user wins
        want[uid] = (et, ts)
    got = {
        r["user_id"]: (r["state_at_t"], r["effective_from"])
        for r in ops("scd2-point-in-time")
    }
    assert got == want


def test_window_index_to_first(ops, duck):
    rows = duck.execute(
        "SELECT user_id, event_id, ts, value FROM events "
        "WHERE event_type = 'purchase' ORDER BY user_id, ts, event_id"
    ).fetchall()
    want: dict = {}
    first: dict = {}
    for uid, eid, _ts, v in rows:
        v0 = first.setdefault(uid, v)
        if v0 != 0:
            want[eid] = 100.0 * v / v0
    got = {r["event_id"]: r["indexed_value"] for r in ops("window-index-to-first")}
    assert set(got) == set(want)
    for eid, g in got.items():
        close(g, want[eid], tol=1e-3)


def test_window_pct_of_total(ops, duck):
    rows = duck.execute(
        "SELECT c_nationkey, o_totalprice FROM orders "
        "JOIN customer ON o_custkey = c_custkey"
    ).fetchall()
    rev: dict = {}
    cnt: dict = {}
    for nk, tp in rows:
        rev[nk] = rev.get(nk, 0.0) + tp
        cnt[nk] = cnt.get(nk, 0) + 1
    rev = {nk: _round_half_away(v, 2) for nk, v in rev.items()}
    total = sum(rev.values())
    order = sorted(rev, key=lambda nk: (-rev[nk], nk))
    cum = 0.0
    want = {}
    for nk in order:
        cum += rev[nk]
        want[nk] = (rev[nk], cnt[nk], rev[nk] / total, cum / total)
    got = {
        r["c_nationkey"]: (r["nation_rev"], r["n_orders"], r["pct_of_total"], r["cum_share"])
        for r in ops("window-pct-of-total")
    }
    assert set(got) == set(want)
    for nk, (gr, gn, gp, gc) in got.items():
        wr, wn, wp, wc = want[nk]
        close(gr, wr, tol=1e-2)
        assert gn == wn
        close(gp, wp, tol=1e-5)
        close(gc, wc, tol=1e-5)


def test_window_sequence_gaps(ops, duck):
    keys = sorted(
        k for (k,) in duck.execute("SELECT DISTINCT o_orderkey FROM orders").fetchall()
    )
    gaps = [
        (b - a - 1, a + 1, b - 1)
        for a, b in zip(keys, keys[1:])
        if b - a > 1
    ]
    top = sorted(gaps, key=lambda g: (-g[0], g[1]))[:100]
    want = [(s, e, ln) for ln, s, e in top]
    got = [
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in ops("window-sequence-gaps")
    ]
    assert sorted(got, key=lambda g: (-g[2], g[0])) == want


def test_window_streaks(ops, duck):
    import datetime

    rows = duck.execute(
        "SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) FROM events"
    ).fetchall()
    per_user: dict = {}
    for uid, day in rows:
        per_user.setdefault(uid, []).append(day)
    want = {}
    for uid, days in per_user.items():
        days.sort()
        streaks = []
        start = days[0]
        ln = 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                ln += 1
            else:
                streaks.append((ln, start))
                start, ln = b, 1
        streaks.append((ln, start))
        best = sorted(streaks, key=lambda s: (-s[0], s[1]))[0]
        want[uid] = best
    got = {
        r["user_id"]: (r["streak_len"], r["streak_start"])
        for r in ops("window-streaks")
    }
    assert got == want
