"""Independent numpy golden cross-checks for the formula-dense
stats/timeseries/ml ops.

Why this exists (VERDICT r5 #1): every oracle-parity pair in this repo
is same-author — a formula error shared by the Spark op and its DuckDB
oracle is invisible to the parity gate (the cramers-v Bergsma bug,
commit 4583517, proved it happens). These tests recompute each op's
statistic a THIRD way: raw input rows are pulled straight from the
sf0.01 parquet with DuckDB, and the statistic is rebuilt in plain numpy
from the published textbook formula — no shared code, no shared SQL,
no scipy. Agreement is asserted to the op's own rounding.

Conventions:
- inputs come from the same derivation the op documents (e.g. "hour
  quadrant" groups) — the SPEC is shared, the MATH is not.
- each test collects the op output via the registry (same entry point
  the driver uses) and compares field-by-field.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# shared fixtures


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
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


# ---------------------------------------------------------------------------
# contingency / categorical tests


def test_chi_square(ops, duck):
    (row,) = ops("stats-chi-square")
    df = duck.execute(
        "SELECT event_type, user_id % 4 AS seg FROM events"
    ).df()
    tab = df.groupby(["event_type", "seg"]).size().unstack(fill_value=0)
    obs = tab.to_numpy(dtype=float)
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    r, c = obs.shape
    close(row["chi2"], chi2)
    close(row["cramers_v"], math.sqrt(chi2 / (n * min(r - 1, c - 1))))
    assert row["dof"] == (r - 1) * (c - 1)
    assert row["n_events"] == n


def test_anova_oneway(ops, duck):
    (row,) = ops("stats-anova-oneway")
    df = duck.execute("SELECT event_type, value FROM events").df()
    groups = [g.to_numpy(dtype=float) for _, g in df.groupby("event_type").value]
    n = sum(len(g) for g in groups)
    k = len(groups)
    gm = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    msb, msw = ssb / (k - 1), ssw / (n - k)
    close(row["ms_between"], msb)
    close(row["ms_within"], msw)
    close(row["f_stat"], msb / msw)
    assert (row["dof_between"], row["dof_within"]) == (k - 1, n - k)


def test_welch_ttest(ops, duck):
    (row,) = ops("stats-welch-ttest")
    df = duck.execute(
        "SELECT event_type, value FROM events"
        " WHERE event_type IN ('click','view')"
    ).df()
    a = df.value[df.event_type == "click"].to_numpy(dtype=float)
    b = df.value[df.event_type == "view"].to_numpy(dtype=float)
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / len(a) + v2 / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / (
        (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
    )
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    close(row["mean_diff"], a.mean() - b.mean())
    close(row["t_stat"], t)
    close(row["dof_welch"], dof, tol=1e-3)


def _daily_means(duck, types=None):
    where = (
        "WHERE event_type IN ({})".format(
            ",".join(f"'{t}'" for t in types)
        )
        if types
        else ""
    )
    return duck.execute(
        f"SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS m "
        f"FROM events {where} GROUP BY 1, 2"
    ).df()


def test_mann_whitney(ops, duck):
    (row,) = ops("stats-mann-whitney")
    df = _daily_means(duck, ("click", "view"))
    # ranks 1..n over all daily means (continuous => no ties expected)
    m = df.m.to_numpy(dtype=float)
    assert len(np.unique(m)) == len(m), "tie would change the z form"
    r = np.empty(len(m))
    r[np.argsort(m, kind="stable")] = np.arange(1, len(m) + 1)
    is1 = (df.event_type == "click").to_numpy()
    n1, n2 = int(is1.sum()), int((~is1).sum())
    r1 = r[is1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    z = (u1 - n1 * n2 / 2) / math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12)
    assert (row["n1"], row["n2"]) == (n1, n2)
    close(row["u1"], u1, tol=1e-3)
    close(row["z"], z)


def test_kruskal_wallis(ops, duck):
    (row,) = ops("stats-kruskal-wallis")
    df = _daily_means(duck)
    m = df.m.to_numpy(dtype=float)
    assert len(np.unique(m)) == len(m)
    r = np.empty(len(m))
    r[np.argsort(m, kind="stable")] = np.arange(1, len(m) + 1)
    n = len(m)
    h = 0.0
    k = 0
    for _, idx in df.groupby("event_type").indices.items():
        k += 1
        ri = r[idx].sum()
        h += ri * ri / len(idx)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    close(row["h_stat"], h)
    close(row["epsilon_sq"], (h - k + 1) / (n - k))
    assert (row["k_groups"], row["n_total"], row["dof"]) == (k, n, k - 1)


def test_wilcoxon_signed_rank(ops, duck):
    (row,) = ops("stats-wilcoxon-signed-rank")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " avg(CASE WHEN event_type='click' THEN value END)"
        " - avg(CASE WHEN event_type='view' THEN value END) AS d"
        " FROM events WHERE event_type IN ('click','view')"
        " GROUP BY 1"
        " HAVING count(CASE WHEN event_type='click' THEN 1 END) > 0"
        " AND count(CASE WHEN event_type='view' THEN 1 END) > 0"
    ).df()
    d = df.d.to_numpy(dtype=float)
    d = d[d != 0]
    n = len(d)
    order = np.argsort(np.abs(d), kind="stable")
    r = np.empty(n)
    r[order] = np.arange(1, n + 1)
    w_plus = r[d > 0].sum()
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24)
    assert row["n_days"] == n
    close(row["w_plus"], w_plus, tol=1e-2)
    close(row["wilcoxon_z"], z)


def test_levene_median(ops, duck):
    (row,) = ops("stats-levene-median")
    df = duck.execute("SELECT event_type, value FROM events").df()
    zs = []
    for _, g in df.groupby("event_type").value:
        v = g.to_numpy(dtype=float)
        zs.append(np.abs(v - np.quantile(v, 0.5)))
    n = sum(len(z) for z in zs)
    k = len(zs)
    gm = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    close(row["levene_w"], (ssb / (k - 1)) / (ssw / (n - k)))
    assert (row["n"], row["dof_between"], row["dof_within"]) == (
        n, k - 1, n - k,
    )


def test_bartlett(ops, duck):
    (row,) = ops("stats-bartlett-test")
    df = duck.execute("SELECT event_type, value FROM events").df()
    ni, vi = [], []
    for _, g in df.groupby("event_type").value:
        v = g.to_numpy(dtype=float)
        ni.append(len(v))
        vi.append(v.var(ddof=1))
    ni, vi = np.array(ni, float), np.array(vi, float)
    k, n = len(ni), ni.sum()
    sp2 = ((ni - 1) * vi).sum() / (n - k)
    t = (n - k) * math.log(sp2) - ((ni - 1) * np.log(vi)).sum()
    c = 1 + ((1.0 / (ni - 1)).sum() - 1.0 / (n - k)) / (3 * (k - 1))
    close(row["pooled_var"], sp2)
    close(row["bartlett_stat"], t / c)
    assert (row["k_groups"], row["n_total"], row["dof"]) == (k, int(n), k - 1)


def test_mood_median(ops, duck):
    (row,) = ops("stats-mood-median")
    df = _daily_means(duck)
    m = df.m.to_numpy(dtype=float)
    gm = np.quantile(m, 0.5)  # interpolated median, both engines' def
    p = (m > gm).mean()
    chi2 = 0.0
    for _, idx in df.groupby("event_type").indices.items():
        nig = len(idx)
        aig = (m[idx] > gm).sum()
        e = nig * p
        chi2 += (aig - e) ** 2 / (e * (1 - p))
    close(row["mood_chi2"], chi2)
    assert row["n_total"] == len(m)


def test_g_test_williams(ops, duck):
    (row,) = ops("stats-g-test")
    df = duck.execute("SELECT lang, source FROM documents").df()
    tab = df.groupby(["lang", "source"]).size().unstack(fill_value=0)
    obs = tab.to_numpy(dtype=float)
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    nz = obs > 0
    g = 2.0 * (obs[nz] * np.log(obs[nz] / exp[nz])).sum()
    r, c = obs.shape
    q = 1 + (n * (1.0 / obs.sum(1)).sum() - 1) * (
        n * (1.0 / obs.sum(0)).sum() - 1
    ) / (6 * n * (r - 1) * (c - 1))
    close(row["g_stat"], g)
    close(row["williams_q"], q)
    close(row["g_adj"], g / q)
    assert (row["n_docs"], row["dof"]) == (n, (r - 1) * (c - 1))


def _weekly_flags(duck, weeks=3):
    sel = ",".join(
        f"max(CASE WHEN event_type='purchase' AND CAST(ts AS DATE)"
        f" BETWEEN d0 + INTERVAL {7*i} DAY AND d0 + INTERVAL {7*i+6} DAY"
        f" THEN 1 ELSE 0 END) AS w{i+1}"
        for i in range(weeks)
    )
    return duck.execute(
        f"WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)"
        f" SELECT {sel} FROM events, span GROUP BY user_id"
    ).df()


def test_mcnemar(ops, duck):
    (row,) = ops("stats-mcnemar")
    f = _weekly_flags(duck, 2)
    b = float(((f.w1 == 1) & (f.w2 == 0)).sum())
    c = float(((f.w1 == 0) & (f.w2 == 1)).sum())
    close(row["mcnemar_chi2"], (abs(b - c) - 1) ** 2 / (b + c))
    assert (row["lost_purchasers"], row["gained_purchasers"]) == (b, c)
    assert row["n_users"] == len(f)


def test_cochran_q(ops, duck):
    (row,) = ops("stats-cochran-q")
    f = _weekly_flags(duck, 3)
    x = f[["w1", "w2", "w3"]].to_numpy(dtype=float)
    k = 3
    cj = x.sum(0)
    ri = x.sum(1)
    q = k * (k - 1) * ((cj - cj.mean()) ** 2).sum() / (
        k * ri.sum() - (ri**2).sum()
    )
    close(row["cochran_q"], q)
    assert [
        row["week1_purchasers"], row["week2_purchasers"],
        row["week3_purchasers"],
    ] == list(cj)


def test_cochran_armitage(ops, duck):
    (row,) = ops("stats-cochran-armitage")
    df = duck.execute(
        "SELECT CAST(user_id % 4 AS DOUBLE) AS dose,"
        " max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS resp"
        " FROM events GROUP BY user_id, CAST(ts AS DATE)"
    ).df()
    t = df.dose.to_numpy(dtype=float)
    y = df.resp.to_numpy(dtype=float)
    n = len(y)
    pbar = y.mean()
    num = 0.0
    den_t = 0.0
    for d in np.unique(t):
        ni = (t == d).sum()
        ri = y[t == d].sum()
        num += d * (ri - ni * pbar)
        den_t += ni * d * d
    den = math.sqrt(
        pbar * (1 - pbar) * (den_t - (t.sum()) ** 2 / n)
    )
    close(row["ca_trend_z"], num / den)
    close(row["pooled_rate"], pbar)
    assert row["n_user_days"] == n
