"""Golden cross-checks for the data-quality family's formula-dense
subset (round-7 closing sweep): Benford deviation, PSI/KS/Wasserstein
drift battery, winsorization impact, cardinality/volume drift, sequence
integrity. Raw sf0.01 rows via DuckDB; plain Python recomputation.
(The counting-style dq ops — column-profile, constraint-check,
referential-integrity, reconciliation, partition-digest — are
SQL-semantics checks where the oracle is already independent.)
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "events", "documents", "lineitem"):
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


def _d(x):
    return x.date() if hasattr(x, "date") else x


def test_volume_drift(ops, duck):
    df = duck.execute(
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*)"
        " AS n FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    rows = {r["day"]: r for r in ops("dq-volume-drift")}
    ns = df.n.tolist()
    days = df.day.tolist()
    assert len(rows) == len(df) - 1
    for i in range(1, len(ns)):
        r = rows[days[i]]
        assert (r["n"], r["prev_n"]) == (ns[i], ns[i - 1])
        drift = (ns[i] - ns[i - 1]) / ns[i - 1]
        close(r["drift"], drift)
        assert r["is_anomalous"] == (abs(drift) > 0.5)


def test_benford_screen(ops, duck):
    vals = duck.execute(
        "SELECT o_totalprice FROM orders WHERE o_totalprice >= 1"
    ).df().o_totalprice
    digits = Counter(int(str(int(math.floor(v)))[0]) for v in vals)
    total = sum(digits.values())
    rows = {r["d"]: r for r in ops("dq-benford-screen")}
    assert set(rows) == set(digits)
    for d, n in digits.items():
        r = rows[d]
        assert r["n"] == n
        p_obs = n / total
        p_ben = math.log(1 + 1 / d) / math.log(10)
        close(r["p_observed"], p_obs)
        close(r["p_benford"], p_ben)
        close(r["abs_dev"], abs(p_obs - p_ben))


def test_freshness_lag(ops, duck):
    df = duck.execute(
        "SELECT event_type, max(ts) AS latest, count(*) AS n"
        " FROM events GROUP BY 1"
    ).df()
    corpus_max = df.latest.max()
    rows = {r["event_type"]: r for r in ops("dq-freshness-lag")}
    for r in df.itertuples():
        g = rows[r.event_type]
        assert g["n_rows"] == r.n
        lag_min = (int(corpus_max.value // 10**9)
                   - int(r.latest.value // 10**9)) // 60
        assert g["lag_minutes"] == lag_min
        assert g["is_stale"] == (lag_min > 360)


def test_distribution_drift_psi(ops, duck):
    df = duck.execute("SELECT ts, value FROM events").df()
    us = df.ts.astype("int64") // 1000
    t0, t1 = int(us.min()), int(us.max())
    mid = t0 + (t1 - t0) // 2
    first = us < mid
    bins = np.minimum(np.floor(df.value / 50).astype(int), 9)
    p_cnt = Counter(bins[first].tolist())
    q_cnt = Counter(bins[~first].tolist())
    np_, nq = sum(p_cnt.values()), sum(q_cnt.values())
    psi = 0.0
    n_bins = 0
    for b in set(p_cnt) | set(q_cnt):
        p, q = p_cnt.get(b, 0) / np_, q_cnt.get(b, 0) / nq
        if p > 0 and q > 0:
            n_bins += 1
            psi += (p - q) * math.log(p / q)
    (row,) = ops("dq-distribution-drift-psi")
    assert row["n_bins"] == n_bins
    close(row["psi"], psi, tol=1e-3)
    assert row["drift_alert"] == (psi > 0.2)


def test_profile_drift(ops, duck):
    df = duck.execute(
        "SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice,"
        " o_custkey FROM orders"
    ).df()
    a = df[df.o_orderkey % 2 == 0]
    b = df[df.o_orderkey % 2 == 1]
    rows = {r["col_name"]: r for r in ops("dq-profile-drift")}
    for col in ("o_orderstatus", "o_orderpriority", "o_totalprice",
                "o_custkey"):
        na, nb = len(a), len(b)
        nulls_a, nulls_b = a[col].isna().sum(), b[col].isna().sum()
        da, db = a[col].nunique(), b[col].nunique()
        r = rows[col]
        close(r["null_frac_a"], nulls_a / na)
        close(r["null_frac_b"], nulls_b / nb)
        assert (r["distinct_a"], r["distinct_b"]) == (da, db)
        drift = abs(da / na - db / nb)
        close(r["distinct_rate_drift"], drift)
        assert r["drifted"] == (
            drift > 0.05 or abs(nulls_a / na - nulls_b / nb) > 0.01
        )


def test_sequence_monotonicity(ops, duck):
    df = duck.execute(
        "SELECT user_id, event_id, ts FROM events ORDER BY user_id, event_id"
    ).df()
    checked = viol = 0
    for _, g in df.groupby("user_id"):
        ts = g.sort_values("event_id").ts.tolist()
        for a, b in zip(ts, ts[1:]):
            checked += 1
            viol += int(b < a)
    (row,) = ops("dq-sequence-monotonicity")
    assert (row["n_checked"], row["n_violations"]) == (checked, viol)
    close(row["violation_rate"], viol / checked)


def test_sequence_integrity(ops, duck):
    df = duck.execute(
        "SELECT user_id, event_id, ts FROM events"
        " ORDER BY user_id, ts, event_id"
    ).df()
    n_users = df.user_id.nunique()
    n_events = len(df)
    n_dup = n_events - df.event_id.nunique()
    ties = invs = 0
    gaps = []
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        rows_ = list(zip(g.ts, g.event_id))
        for (t0, i0), (t1, i1) in zip(rows_, rows_[1:]):
            ties += int(t1 == t0)
            invs += int(i1 < i0)
            gaps.append((t1 - t0).total_seconds())
    (row,) = ops("dq-sequence-integrity")
    assert (row["n_users"], row["n_events"]) == (n_users, n_events)
    assert row["n_dup_event_ids"] == n_dup
    assert (row["n_ts_ties"], row["n_id_inversions"]) == (ties, invs)
    close(row["mean_gap_sec"], np.mean(gaps), tol=1e-2)


def test_winsorize_impact(ops, duck):
    x = duck.execute("SELECT o_totalprice FROM orders").df().o_totalprice
    p01 = np.percentile(x, 1, method="linear")
    p99 = np.percentile(x, 99, method="linear")
    xc = np.clip(x, p01, p99)
    (row,) = ops("dq-winsorize-impact")
    assert row["n_rows"] == len(x)
    assert row["n_capped"] == int((x != xc).sum())
    close(row["mean_before"], x.mean(), tol=1e-5)
    close(row["mean_after"], xc.mean(), tol=1e-5)
    close(row["sd_before"], x.std(ddof=1), tol=1e-5)
    close(row["sd_after"], xc.std(ddof=1), tol=1e-5)


def test_drift_battery(ops, duck):
    df = duck.execute("SELECT CAST(ts AS DATE) AS day, value FROM events").df()
    d0 = df.day.min()
    cut = _d(d0) + timedelta(days=14)
    is_ref = df.day.map(_d) < cut
    v = df.value.to_numpy()
    lo, hi = v.min(), v.max()
    bins = np.minimum(63, np.floor((v - lo) / (hi - lo) * 64.0).astype(int))
    present = sorted(set(bins.tolist()))
    c_ref = np.array([(bins[is_ref.to_numpy()] == b).sum() for b in present],
                     dtype=float)
    c_cur = np.array(
        [(bins[~is_ref.to_numpy()] == b).sum() for b in present], dtype=float
    )
    p = (c_ref + 0.5) / (c_ref + 0.5).sum()
    q = (c_cur + 0.5) / (c_cur + 0.5).sum()
    cdf_ref = np.cumsum(c_ref) / c_ref.sum()
    cdf_cur = np.cumsum(c_cur) / c_cur.sum()
    (row,) = ops("dq-drift-battery")
    close(row["psi"], float(((q - p) * np.log(q / p)).sum()), tol=1e-3)
    close(row["ks_d"], float(np.abs(cdf_ref - cdf_cur).max()), tol=1e-3)
    close(row["wasserstein_1"],
          float((np.abs(cdf_ref - cdf_cur) * (hi - lo) / 64.0).sum()),
          tol=1e-3)
    close(row["total_variation"], float(0.5 * np.abs(p - q).sum()), tol=1e-3)


def test_rare_categories(ops, duck):
    cnt = duck.execute(
        "SELECT source, count(*) AS c FROM documents GROUP BY 1"
    ).df()
    n = cnt.c.sum()
    rare = cnt[cnt.c / n < 0.04]
    (row,) = ops("dq-rare-categories")
    assert row["n_levels"] == len(cnt)
    assert row["n_rare_levels"] == len(rare)
    close(row["rare_mass"], rare.c.sum() / n)
    assert row["levels_after_other_bucket"] == (
        len(cnt) - len(rare) + min(1, len(rare))
    )


def test_cardinality_drift(ops, duck):
    df = duck.execute(
        "SELECT strftime(o_orderdate, '%Y-%m') AS m, o_custkey FROM orders"
    ).df()
    per = {
        m: (g.o_custkey.nunique(), len(g))
        for m, g in df.groupby("m")
    }
    months = sorted(per)
    rows = {r["month"]: r for r in ops("dq-cardinality-drift")}
    assert set(rows) == set(months[1:])
    for prev, cur in zip(months, months[1:]):
        nc, no = per[cur]
        pc, _ = per[prev]
        r = rows[cur]
        assert (r["n_distinct_cust"], r["n_orders"]) == (nc, no)
        close(r["orders_per_cust"], no / nc)
        close(r["cust_mom_drift"], nc / pc - 1)
