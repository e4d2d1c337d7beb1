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


def test_friedman(ops, duck):
    (row,) = ops("stats-friedman-test")
    df = _daily_means(duck)
    piv = df.pivot(index="day", columns="event_type", values="m").dropna()
    x = piv.to_numpy(dtype=float)
    n, k = x.shape
    assert k == 5
    # within-day ranks 1..k
    r = x.argsort(1).argsort(1) + 1.0
    rj = r.sum(0)
    chi2 = 12.0 / (n * k * (k + 1)) * (rj**2).sum() - 3 * n * (k + 1)
    close(row["friedman_chi2"], chi2)
    assert (row["n_days"], row["k_treatments"]) == (n, k)


def test_welch_anova(ops, duck):
    (row,) = ops("stats-welch-anova")
    df = duck.execute("SELECT event_type, value FROM events").df()
    groups = [g.to_numpy(dtype=float) for _, g in df.groupby("event_type").value]
    k = len(groups)
    w = np.array([len(g) / g.var(ddof=1) for g in groups])
    m = np.array([g.mean() for g in groups])
    nv = np.array([len(g) for g in groups], float)
    mbar = (w * m).sum() / w.sum()
    numerator = (w * (m - mbar) ** 2).sum() / (k - 1)
    lam = (((1 - w / w.sum()) ** 2) / (nv - 1)).sum()
    f = numerator / (1 + 2.0 * (k - 2) / (k * k - 1) * lam)
    close(row["welch_f"], f)
    close(row["df2"], (k * k - 1.0) / (3 * lam), tol=1e-3)
    assert (row["k_groups"], row["df1"]) == (k, k - 1)


def _daily_xy(duck):
    return duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " avg(CASE WHEN event_type='click' THEN value END) AS x,"
        " avg(CASE WHEN event_type='view' THEN value END) AS y"
        " FROM events WHERE event_type IN ('click','view')"
        " GROUP BY 1"
        " HAVING count(CASE WHEN event_type='click' THEN 1 END) > 0"
        " AND count(CASE WHEN event_type='view' THEN 1 END) > 0"
    ).df()


def test_kendall_tau(ops, duck):
    (row,) = ops("stats-kendall-tau")
    df = _daily_xy(duck)
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    n = len(x)
    prod = np.sign(np.subtract.outer(x, x)) * np.sign(np.subtract.outer(y, y))
    iu = np.triu_indices(n, 1)
    conc = int((prod[iu] > 0).sum())
    disc = int((prod[iu] < 0).sum())
    npairs = n * (n - 1) // 2
    assert (row["n_pairs"], row["concordant"], row["discordant"]) == (
        npairs, conc, disc,
    )
    close(row["kendall_tau"], (conc - disc) / npairs)


def test_mann_kendall(ops, duck):
    (row,) = ops("stats-mann-kendall")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, avg(value) AS x"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    x = df.x.to_numpy(float)
    n = len(x)
    # tril (a>b): outer[a,b] = x_a - x_b = x_j - x_i with j>i — S directly
    s = float(np.sign(np.subtract.outer(x, x)[np.tril_indices(n, -1)]).sum())
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    close(row["s_stat"], s, tol=1e-1)
    close(row["var_s"], var_s, tol=1e-3)
    close(row["z"], (s - np.sign(s)) / math.sqrt(var_s))
    assert row["n_days"] == n


def test_spearman(ops, duck):
    (row,) = ops("stats-spearman-corr")
    df = _daily_xy(duck)
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    n = len(x)
    rx = np.empty(n); rx[np.argsort(x, kind="stable")] = np.arange(1, n + 1)
    ry = np.empty(n); ry[np.argsort(y, kind="stable")] = np.arange(1, n + 1)
    rho = np.corrcoef(rx, ry)[0, 1]
    close(row["spearman_rho"], rho)
    close(row["rho_formula"], 1 - 6 * ((rx - ry) ** 2).sum() / (n * (n * n - 1)))
    assert row["n_days"] == n


def test_cronbach_alpha(ops, duck):
    (row,) = ops("stats-cronbach-alpha")
    df = _daily_means(duck)
    piv = df.pivot(index="day", columns="event_type", values="m").dropna()
    x = piv.to_numpy(dtype=float)
    k = x.shape[1]
    siv = x.var(0, ddof=1).sum()
    tv = x.sum(1).var(ddof=1)
    close(row["sum_item_var"], siv)
    close(row["total_var"], tv, tol=1e-3)
    close(row["cronbach_alpha"], k / (k - 1) * (1 - siv / tv))
    assert row["n_days"] == x.shape[0]


def test_icc(ops, duck):
    (row,) = ops("stats-icc")
    df = duck.execute("SELECT user_id, value FROM events").df()
    groups = [g.to_numpy(dtype=float) for _, g in df.groupby("user_id").value]
    ng = np.array([len(g) for g in groups], float)
    mg = np.array([g.mean() for g in groups])
    n, G = ng.sum(), len(groups)
    gm = (ng * mg).sum() / n
    msb = (ng * (mg - gm) ** 2).sum() / (G - 1)
    msw = sum(((g - g.mean()) ** 2).sum() for g in groups) / (n - G)
    k0 = (n - (ng**2).sum() / n) / (G - 1)
    close(row["ms_between"], msb)
    close(row["ms_within"], msw)
    close(row["k0"], k0, tol=1e-3)
    close(row["icc1"], (msb - msw) / (msb + (k0 - 1) * msw))
    assert (row["n_obs"], row["n_groups"]) == (n, G)


def test_tukey_hsd(ops, duck):
    rows = ops("stats-tukey-hsd")
    df = duck.execute("SELECT event_type, value FROM events").df()
    stats = {
        g: (float(len(v)), v.mean(), ((v - v.mean()) ** 2).sum())
        for g, v in (
            (g, x.to_numpy(dtype=float))
            for g, x in df.groupby("event_type").value
        )
    }
    n = sum(s[0] for s in stats.values())
    k = len(stats)
    mse = sum(s[2] for s in stats.values()) / (n - k)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        na, ma, _ = stats[r["group_a"]]
        nb, mb, _ = stats[r["group_b"]]
        se = math.sqrt(mse / 2 * (1 / na + 1 / nb))
        close(r["mean_diff"], ma - mb)
        close(r["se"], se)
        close(r["q_stat"], abs(ma - mb) / se, tol=1e-3)
        assert r["df_err"] == n - k


def test_auc_delong(ops, duck):
    (row,) = ops("eval-auc-delong-ci")
    df = duck.execute(
        "SELECT round(value,2) AS s,"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y"
        " FROM events"
    ).df()
    pos = np.sort(df.s[df.y == 1].to_numpy(float))
    neg = np.sort(df.s[df.y == 0].to_numpy(float))
    npos, nneg = len(pos), len(neg)
    # per-observation placement values (DeLong 1988)
    lt = np.searchsorted(neg, pos, side="left")
    le = np.searchsorted(neg, pos, side="right")
    v10 = (lt + 0.5 * (le - lt)) / nneg
    lt2 = np.searchsorted(pos, neg, side="left")
    le2 = np.searchsorted(pos, neg, side="right")
    v01 = ((npos - le2) + 0.5 * (le2 - lt2)) / npos
    auc = v10.mean()
    se = math.sqrt(v10.var(ddof=1) / npos + v01.var(ddof=1) / nneg)
    close(row["auc"], auc)
    close(row["se"], se)
    close(row["ci_lo"], auc - 1.959964 * se)
    close(row["ci_hi"], auc + 1.959964 * se)
    assert (row["n_pos"], row["n_neg"]) == (npos, nneg)
    # sanity: both placement means estimate the same AUC
    close(v01.mean(), auc, tol=1e-9)


def test_logistic_irls(ops, duck):
    (row,) = ops("ml-logistic-irls")
    df = duck.execute(
        "SELECT ln(1 + count(*)) AS x,"
        " CAST(max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS y"
        " FROM events GROUP BY user_id"
    ).df()
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    X = np.column_stack([np.ones_like(x), x])
    beta = np.zeros(2)
    for _ in range(2):  # two Newton steps from beta=0, the op's spec
        p = 1.0 / (1.0 + np.exp(-X @ beta))
        w = p * (1 - p)
        h = X.T @ (X * w[:, None])
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(h, g)
    p = 1.0 / (1.0 + np.exp(-X @ beta))
    ll = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    close(row["beta0"], beta[0], tol=1e-3)
    close(row["beta1"], beta[1], tol=1e-3)
    close(row["log_loss"], ll, tol=1e-4)
    assert row["n_users"] == len(x)


def test_ols_inference(ops, duck):
    rows = {r["term"]: r for r in ops("ml-ols-inference")}
    df = duck.execute(
        "SELECT ln(1 + CAST(sum(CASE WHEN event_type<>'purchase'"
        " THEN 1 ELSE 0 END) AS DOUBLE)) AS x1,"
        " avg(CASE WHEN event_type<>'purchase' THEN value END) AS x2,"
        " CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS y"
        " FROM events GROUP BY user_id"
        " HAVING sum(CASE WHEN event_type<>'purchase' THEN 1 ELSE 0 END) > 0"
    ).df()
    X = np.column_stack(
        [np.ones(len(df)), df.x1.to_numpy(float), df.x2.to_numpy(float)]
    )
    y = df.y.to_numpy(float)
    n, p = X.shape
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sigma2 = (resid @ resid) / (n - p)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    se = np.sqrt(np.diag(cov))
    tss = ((y - y.mean()) ** 2).sum()
    r2 = 1 - (resid @ resid) / tss
    for i, term in enumerate(
        ["intercept", "x1_log_nonpurchase", "x2_mean_value"]
    ):
        r = rows[term]
        close(r["estimate"], beta[i], tol=1e-3)
        close(r["std_err"], se[i], tol=1e-3)
        close(r["t_stat"], beta[i] / se[i], tol=2e-3)
        close(r["r2"], r2)
        assert r["n_obs"] == n


def test_adf(ops, duck):
    (row,) = ops("timeseries-adf-test")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    yv = df.y.to_numpy(float)
    dy = np.diff(yv)
    y1 = yv[:-1]
    n = len(dy)
    X = np.column_stack([np.ones(n), y1])
    beta, *_ = np.linalg.lstsq(X, dy, rcond=None)
    resid = dy - X @ beta
    sigma2 = (resid @ resid) / (n - 2)
    se_rho = math.sqrt(sigma2 * np.linalg.inv(X.T @ X)[1, 1])
    close(row["rho_coef"], beta[1])
    close(row["adf_t"], beta[1] / se_rho, tol=1e-3)
    close(row["drift"], beta[0], tol=1e-3)
    assert row["n_obs"] == n


def _daily_counts(duck):
    return duck.execute(
        "SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df().y.to_numpy(float)


def test_ljung_box(ops, duck):
    (row,) = ops("timeseries-ljung-box")
    x = _daily_counts(duck)
    n = len(x)
    xc = x - x.mean()
    denom = (xc**2).sum()
    q = 0.0
    rho1 = None
    for k in range(1, 6):
        rk = (xc[k:] * xc[:-k]).sum() / denom
        if k == 1:
            rho1 = rk
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    close(row["rho1"], rho1)
    close(row["ljung_box_q"], q)
    assert row["n_days"] == n


def _trend_resid(y):
    t = np.arange(1, len(y) + 1, dtype=float)
    X = np.column_stack([np.ones_like(t), t])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    return y - X @ beta, t


def test_durbin_watson(ops, duck):
    (row,) = ops("stats-durbin-watson")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, avg(value) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    r, _ = _trend_resid(df.y.to_numpy(float))
    dw = (np.diff(r) ** 2).sum() / (r**2).sum()
    close(row["durbin_watson"], dw)
    assert row["n_days"] == len(r)


def test_breusch_pagan(ops, duck):
    (row,) = ops("stats-breusch-pagan")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, avg(value) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    r, t = _trend_resid(df.y.to_numpy(float))
    r2 = np.corrcoef(r**2, t)[0, 1] ** 2
    close(row["aux_r2"], r2)
    close(row["breusch_pagan_lm"], len(r) * r2, tol=1e-3)
    assert row["n_days"] == len(r)


def _durations(duck, grouped=False):
    gsel = "CAST(user_id % 2 AS INT) AS grp," if grouped else ""
    return duck.execute(
        f"""
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id, {gsel}
                   min(CASE WHEN event_type='view' THEN CAST(ts AS DATE) END) AS fv,
                   min(CASE WHEN event_type='purchase' THEN CAST(ts AS DATE) END) AS fp
            FROM events GROUP BY user_id
        )
        SELECT {'grp,' if grouped else ''}
               CASE WHEN fp IS NOT NULL AND fp >= fv
                    THEN date_diff('day', fv, fp)
                    ELSE date_diff('day', fv, e.obs_end) END AS t,
               CASE WHEN fp IS NOT NULL AND fp >= fv THEN 1 ELSE 0 END AS died
        FROM pu CROSS JOIN ends e WHERE fv IS NOT NULL
        """
    ).df()


def test_kaplan_meier(ops, duck):
    rows = ops("stats-kaplan-meier")
    df = _durations(duck)
    t = df.t.to_numpy(float)
    died = df.died.to_numpy(int)
    s = 1.0
    golden = {}
    for u in np.sort(np.unique(t)):
        at_risk = int((t >= u).sum())
        d = int(died[t == u].sum())
        if d > 0:
            s *= 1 - d / at_risk
            golden[int(u)] = (at_risk, d, s)
    assert len(rows) == len(golden)
    for r in rows:
        n_risk, d, s = golden[r["t_days"]]
        assert (r["n_risk"], r["n_events"]) == (n_risk, d)
        close(r["survival"], s)


def test_logrank(ops, duck):
    (row,) = ops("stats-logrank-test")
    df = _durations(duck, grouped=True)
    t = df.t.to_numpy(float)
    died = df.died.to_numpy(int)
    g = df.grp.to_numpy(int)
    o1 = e1 = v = 0.0
    for u in np.sort(np.unique(t[died == 1])):
        n = float((t >= u).sum())
        n1 = float(((t >= u) & (g == 1)).sum())
        d = float(died[t == u].sum())
        d1 = float(died[(t == u) & (g == 1)].sum())
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    close(row["observed_g1"], o1)
    close(row["expected_g1"], e1)
    close(row["logrank_chi2"], (o1 - e1) ** 2 / v, tol=1e-3)
    assert row["n_users"] == len(df)


def test_jarque_bera(ops, duck):
    (row,) = ops("stats-jarque-bera")
    v = duck.execute("SELECT value FROM events").df().value.to_numpy(float)
    n = len(v)
    mu = v.mean()
    m2 = ((v - mu) ** 2).mean()
    m3 = ((v - mu) ** 3).mean()
    m4 = ((v - mu) ** 4).mean()
    s = m3 / m2**1.5
    k = m4 / m2**2 - 3
    close(row["skewness"], s)
    close(row["excess_kurtosis"], k)
    close(row["jarque_bera"], n / 6.0 * (s * s + k * k / 4), tol=1e-3)
    assert row["n"] == n


def test_dagostino_k2(ops, duck):
    (row,) = ops("stats-dagostino-k2")
    v = duck.execute("SELECT value FROM events").df().value.to_numpy(float)
    n = float(len(v))
    mu = v.mean()
    m2 = ((v - mu) ** 2).mean()
    g1 = ((v - mu) ** 3).mean() / m2**1.5
    b2 = ((v - mu) ** 4).mean() / m2**2
    # D'Agostino (1970) skewness transform
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w = math.sqrt(-1 + math.sqrt(2 * (beta2 - 1)))
    delta = 1 / math.sqrt(math.log(w))
    alpha = math.sqrt(2 / (w * w - 1))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    # Anscombe-Glynn (1983) kurtosis transform
    e_b2 = 3.0 * (n - 1) / (n + 1)
    v_b2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    x = (b2 - e_b2) / math.sqrt(v_b2)
    sb1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    a = 6 + 8 / sb1 * (2 / sb1 + math.sqrt(1 + 4 / (sb1 * sb1)))
    z2 = (
        (1 - 2.0 / (9 * a))
        - np.cbrt((1 - 2.0 / a) / (1 + x * math.sqrt(2 / (a - 4))))
    ) / math.sqrt(2.0 / (9 * a))
    close(row["skew_g1"], g1)
    close(row["excess_kurtosis"], b2 - 3)
    close(row["z_skew"], z1)
    close(row["z_kurt"], z2)
    close(row["k2_stat"], z1 * z1 + z2 * z2, tol=1e-3)


def test_cochrane_orcutt(ops, duck):
    (row,) = ops("timeseries-cochrane-orcutt")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    y = df.y.to_numpy(float)
    t = np.array(
        [(d - df.d.iloc[0]).days for d in df.d], dtype=float
    )
    X = np.column_stack([np.ones_like(t), t])
    a, b = np.linalg.lstsq(X, y, rcond=None)[0]
    e = y - (a + b * t)
    rho = (e[1:] * e[:-1]).sum() / (e[:-1] ** 2).sum()
    ys = y[1:] - rho * y[:-1]
    ts = t[1:] - rho * t[:-1]
    X2 = np.column_stack([np.ones_like(ts), ts])
    a2, b2 = np.linalg.lstsq(X2, ys, rcond=None)[0]
    close(row["rho"], rho)
    close(row["slope_ols"], b, tol=1e-3)
    close(row["slope_co"], b2, tol=1e-3)
    close(row["intercept_co"], a2 / (1 - rho), tol=1e-3)
    assert row["n_days"] == len(y)


def test_theil_sen(ops, duck):
    rows = {r["event_type"]: r for r in ops("timeseries-theil-sen")}
    df = _daily_means(duck)
    for et, sub in df.groupby("event_type"):
        sub = sub.sort_values("day")
        m = sub.m.to_numpy(float)
        days = np.array([(d - sub.day.iloc[0]).days for d in sub.day], float)
        slopes = []
        for i in range(len(m)):
            for j in range(i + 1, len(m)):
                slopes.append((m[j] - m[i]) / (days[j] - days[i]))
        r = rows[et]
        close(r["sen_slope"], np.quantile(np.array(slopes), 0.5))
        assert r["n_pairs"] == len(slopes)


def test_granger_1lag(ops, duck):
    (row,) = ops("timeseries-granger-1lag")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS c,"
        " CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS v"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    y = df.c.to_numpy(float)[1:]
    x1 = df.c.to_numpy(float)[:-1]
    x2 = df.v.to_numpy(float)[:-1]
    n = len(y)
    # full model: y ~ 1 + x1 + x2; restricted: y ~ 1 + x1
    Xf = np.column_stack([np.ones(n), x1, x2])
    Xr = np.column_stack([np.ones(n), x1])
    bf, *_ = np.linalg.lstsq(Xf, y, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    rss_f = ((y - Xf @ bf) ** 2).sum()
    rss_r = ((y - Xr @ br) ** 2).sum()
    f = (rss_r - rss_f) / (rss_f / (n - 3))
    close(row["beta_own_lag"], bf[1], tol=1e-3)
    close(row["beta_cross_lag"], bf[2], tol=1e-3)
    close(row["granger_f"], f, tol=1e-3)
    assert row["n"] == n


def test_odds_ratio(ops, duck):
    (row,) = ops("stats-odds-ratio")
    df = duck.execute(
        "SELECT user_id % 2 = 0 AS even,"
        " event_type = 'purchase' AS purch FROM events"
    ).df()
    a = float((df.even & df.purch).sum())
    b = float((df.even & ~df.purch).sum())
    c = float((~df.even & df.purch).sum())
    d = float((~df.even & ~df.purch).sum())
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    close(row["odds_ratio"], orr)
    close(row["ci_lo"], math.exp(math.log(orr) - 1.959964 * se))
    close(row["ci_hi"], math.exp(math.log(orr) + 1.959964 * se))


def test_cmh_pooled_or(ops, duck):
    (row,) = ops("stats-cmh-pooled-or")
    df = duck.execute(
        "WITH counts AS (SELECT user_id,"
        " sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS k"
        " FROM events GROUP BY user_id),"
        " thr AS (SELECT avg(k) AS kbar FROM counts)"
        " SELECT user_id % 5 AS stratum, user_id % 2 = 0 AS treated,"
        " CASE WHEN k > kbar THEN 1 ELSE 0 END AS conv"
        " FROM counts, thr"
    ).df()
    num = den = a_tot = c_tot = 0.0
    for _, s in df.groupby("stratum"):
        a = float((s.treated & (s.conv == 1)).sum())
        b = float((s.treated & (s.conv == 0)).sum())
        c = float((~s.treated & (s.conv == 1)).sum())
        d = float((~s.treated & (s.conv == 0)).sum())
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        a_tot += a
        c_tot += c
    close(row["cmh_odds_ratio"], num / den)
    assert (row["treated_converters"], row["control_converters"]) == (
        a_tot, c_tot,
    )
    assert row["n_strata"] == df.stratum.nunique()


def test_meta_analysis(ops, duck):
    (row,) = ops("stats-meta-analysis")
    df = duck.execute(
        "SELECT (isodow(CAST(ts AS DATE)) - 1) % 7 AS dow, event_type, value"
        " FROM events WHERE event_type IN ('click','view')"
    ).df()
    d, vd = [], []
    for _, s in df.groupby("dow"):
        a = s.value[s.event_type == "click"].to_numpy(float)
        b = s.value[s.event_type == "view"].to_numpy(float)
        if len(a) > 1 and len(b) > 1:
            d.append(a.mean() - b.mean())
            vd.append(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    d, vd = np.array(d), np.array(vd)
    w = 1 / vd
    pooled = (w * d).sum() / w.sum()
    q = (w * (d - pooled) ** 2).sum()
    k = len(d)
    close(row["pooled_effect"], pooled)
    close(row["pooled_se"], math.sqrt(1 / w.sum()))
    close(row["cochran_q_het"], q, tol=1e-3)
    close(row["i_squared"], max(0.0, (q - (k - 1)) / q))
    assert row["n_strata"] == k


def test_diff_in_diff(ops, duck):
    (row,) = ops("stats-diff-in-diff")
    df = duck.execute(
        "WITH treated AS (SELECT user_id,"
        " max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS tr"
        " FROM events GROUP BY user_id)"
        " SELECT t.tr, CAST(e.ts AS DATE) >= DATE '2024-01-16' AS post,"
        " e.value FROM events e JOIN treated t USING (user_id)"
        " WHERE e.event_type = 'purchase'"
    ).df()
    m = {
        (tr, post): s.value.mean()
        for (tr, post), s in df.groupby(["tr", "post"])
    }
    # sf0.01 is degenerate: every purchaser signed up, so the control
    # cells are empty and the op must emit NULLs, not fabricate a did
    close(row["treated_pre"], m[(1, False)])
    close(row["treated_post"], m[(1, True)])
    if (0, False) in m and (0, True) in m:
        did = (m[(1, True)] - m[(1, False)]) - (m[(0, True)] - m[(0, False)])
        close(row["did_estimate"], did)
        close(row["control_post"], m[(0, True)])
    else:
        assert row["did_estimate"] is None
        assert row["control_pre"] is None and row["control_post"] is None
    assert row["n_obs"] == len(df)


def test_cuped(ops, duck):
    (row,) = ops("stats-cuped-adjustment")
    df = duck.execute(
        "WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)"
        " SELECT avg(CASE WHEN CAST(ts AS DATE) < d0 + INTERVAL 14 DAY"
        "            THEN value END) AS x,"
        " avg(CASE WHEN CAST(ts AS DATE) >= d0 + INTERVAL 14 DAY"
        "     THEN value END) AS y"
        " FROM events, span GROUP BY user_id"
    ).df().dropna()
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    theta = np.cov(y, x, ddof=1)[0, 1] / x.var(ddof=1)
    rho2 = np.corrcoef(y, x)[0, 1] ** 2
    close(row["theta"], theta)
    close(row["var_raw"], y.var(ddof=1))
    close(row["var_cuped"], y.var(ddof=1) * (1 - rho2))
    close(row["variance_reduction"], rho2)
    assert row["n_users"] == len(x)


def test_prop_diff_ci(ops, duck):
    (row,) = ops("stats-prop-diff-ci")
    df = duck.execute(
        "SELECT max(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS grp,"
        " max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv"
        " FROM events GROUP BY user_id"
    ).df()
    z = 1.959964
    z2 = z * z

    def wilson(x, n):
        p = x / n
        ctr = (x + z2 / 2) / (n + z2)
        hw = z * math.sqrt(n) / (n + z2) * math.sqrt(p * (1 - p) + z2 / (4 * n))
        return p, ctr - hw, ctr + hw

    n1 = int((df.grp == 1).sum())
    x1 = int(df.conv[df.grp == 1].sum())
    n2 = int((df.grp == 0).sum())
    p1, l1, u1 = wilson(x1, n1)
    close(row["p_clickers"], p1)
    assert row["n1"] == n1
    if n2 > 0:
        x2 = int(df.conv[df.grp == 0].sum())
        p2, l2, u2 = wilson(x2, n2)
        close(row["p_nonclickers"], p2)
        close(row["diff"], p1 - p2)
        # Newcombe hybrid square-and-add
        close(
            row["ci_lo"],
            p1 - p2 - math.sqrt((p1 - l1) ** 2 + (u2 - p2) ** 2),
        )
        close(
            row["ci_hi"],
            p1 - p2 + math.sqrt((u1 - p1) ** 2 + (p2 - l2) ** 2),
        )
        assert row["n2"] == n2
    else:
        # sf0.01 degeneracy: every user clicked — the non-clicker arm is
        # empty and the op must surface NULLs rather than a fake diff
        assert row["n2"] is None and row["diff"] is None


def test_eb_shrinkage(ops, duck):
    rows = {r["c_nationkey"]: r for r in ops("stats-eb-shrinkage")}
    df = duck.execute(
        "SELECT c.c_nationkey,"
        " CAST(sum(CASE WHEN o.o_orderstatus='F' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS conv,"
        " CAST(count(*) AS DOUBLE) AS n"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " GROUP BY 1"
    ).df()
    r = (df.conv / df.n).to_numpy(float)
    mu, v = r.mean(), r.var(ddof=1)
    strength = mu * (1 - mu) / v - 1
    alpha, beta = mu * strength, (1 - mu) * strength
    for _, g in df.iterrows():
        got = rows[g.c_nationkey]
        close(got["raw_rate"], g.conv / g.n)
        close(got["shrunk_rate"], (g.conv + alpha) / (g.n + alpha + beta))
        close(got["prior_mean"], mu)


def test_gini(ops, duck):
    (row,) = ops("agg-gini-coefficient")
    df = duck.execute(
        "SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
        " AS revenue FROM orders GROUP BY o_custkey"
    ).df()
    x = np.sort(df.revenue.to_numpy(float))
    n = len(x)
    i = np.arange(1, n + 1)
    gini = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
    close(row["gini"], gini)
    assert row["n_customers"] == n


def test_runs_test(ops, duck):
    (row,) = ops("stats-runs-test")
    x = _daily_counts(duck)
    moves = [1 if b > a else 0 for a, b in zip(x, x[1:]) if b != a]
    n1 = float(sum(moves))
    n2 = float(len(moves) - sum(moves))
    r = 1 + sum(1 for a, b in zip(moves, moves[1:]) if a != b)
    e_r = 2 * n1 * n2 / (n1 + n2) + 1
    var_r = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (row["n_up"], row["n_down"], row["n_runs"]) == (n1, n2, r)
    close(row["expected_runs"], e_r)
    close(row["z"], (r - e_r) / math.sqrt(var_r))


def test_sign_test(ops, duck):
    (row,) = ops("stats-sign-test")
    df = _daily_xy(duck)
    plus = float((df.x > df.y).sum())
    minus = float((df.x < df.y).sum())
    assert (row["days_click_higher"], row["days_view_higher"]) == (
        plus, minus,
    )
    close(
        row["sign_z"],
        (plus - (plus + minus) / 2) / math.sqrt((plus + minus) / 4),
    )


def test_grubbs(ops, duck):
    (row,) = ops("stats-grubbs-outlier")
    df = duck.execute(
        "SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev"
        " FROM orders GROUP BY 1"
    ).df()
    rev = df.rev.to_numpy(float)
    g = np.abs(rev - rev.mean()) / rev.std(ddof=1)
    i = int(np.argmax(g))
    close(row["g_stat"], g[i])
    close(row["outlier_rev"], rev[i], tol=1e-3)
    assert str(row["outlier_day"])[:10] == str(df.day.iloc[i])[:10]
    assert row["n_days"] == len(rev)


def _daily_rev(duck):
    return duck.execute(
        "SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ).df()


def test_gumbel_maxima(ops, duck):
    (row,) = ops("stats-gumbel-maxima")
    df = duck.execute(
        "SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)"
        " AS wk, max(o_totalprice) AS block_max"
        " FROM orders GROUP BY 1"
    ).df()
    x = df.block_max.to_numpy(float)
    sd = x.std(ddof=1)
    beta = sd * math.sqrt(6) / math.pi
    mu = x.mean() - 0.5772156649 * beta
    close(row["gumbel_beta"], beta, tol=1e-3)
    close(row["gumbel_mu"], mu, tol=1e-3)
    close(
        row["return_level_52wk"],
        mu - beta * math.log(-math.log(1 - 1.0 / 52)),
        tol=1e-3,
    )
    assert row["n_blocks"] == len(x)


def test_gpd_pot(ops, duck):
    (row,) = ops("stats-gpd-pot")
    rev = _daily_rev(duck).rev.to_numpy(float)
    u = np.quantile(rev, 0.90)
    y = rev[rev > u] - u
    mu, v = y.mean(), y.var(ddof=1)
    close(row["mean_excess"], mu, tol=1e-3)
    close(row["gpd_xi"], 0.5 * (1 - mu * mu / v))
    close(row["gpd_beta"], 0.5 * mu * (mu * mu / v + 1), tol=1e-3)
    close(row["max_excess"], y.max(), tol=1e-3)
    assert row["n_exceedances"] == len(y)


def test_hill_tail(ops, duck):
    (row,) = ops("stats-hill-tail-index")
    x = duck.execute(
        "SELECT o_totalprice FROM orders"
    ).df().o_totalprice.to_numpy(float)
    xmin = np.quantile(x, 0.9)
    tail = x[x > xmin]
    s = np.log(tail / xmin).sum()
    k = len(tail)
    close(row["hill_alpha"], 1.0 + k / s)
    close(row["tail_index"], k / s)
    assert row["n_tail"] == k


def _roc_bins(duck):
    df = duck.execute(
        "SELECT value AS score,"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y"
        " FROM events"
    ).df()
    s = df.score.to_numpy(float)
    y = df.y.to_numpy(int)
    lo, hi = s.min(), s.max()
    b = np.minimum(255, np.floor((s - lo) / (hi - lo) * 256.0)).astype(int)
    bins = np.unique(b)
    pos = np.array([(y[b == bb] == 1).sum() for bb in bins], float)
    neg = np.array([(y[b == bb] == 0).sum() for bb in bins], float)
    return bins, pos, neg, lo, hi


def test_roc_auc_binned(ops, duck):
    (row,) = ops("stats-roc-auc-binned")
    bins, pos, neg, _, _ = _roc_bins(duck)
    # descending threshold sweep
    order = np.argsort(-bins)
    tpr = np.cumsum(pos[order]) / pos.sum()
    fpr = np.cumsum(neg[order]) / neg.sum()
    tpr_prev = np.concatenate([[0.0], tpr[:-1]])
    fpr_prev = np.concatenate([[0.0], fpr[:-1]])
    auc = ((fpr - fpr_prev) * (tpr + tpr_prev) / 2).sum()
    close(row["roc_auc"], auc)
    assert row["n_thresholds"] == len(bins)


def test_youden_threshold(ops, duck):
    (row,) = ops("stats-youden-threshold")
    bins, pos, neg, lo, hi = _roc_bins(duck)
    order = np.argsort(-bins)
    tpr = np.cumsum(pos[order]) / pos.sum()
    fpr = np.cumsum(neg[order]) / neg.sum()
    j = tpr - fpr
    # argmax with (J desc, bin asc) tie-break
    cand = sorted(
        zip(j, bins[order], tpr, fpr), key=lambda t: (-t[0], t[1])
    )[0]
    close(row["youden_j"], cand[0])
    close(row["threshold"], lo + cand[1] * (hi - lo) / 256.0, tol=1e-3)
    close(row["tpr"], cand[2])
    close(row["fpr"], cand[3])


def test_lin_concordance(ops, duck):
    (row,) = ops("stats-lin-concordance")
    df = _daily_xy(duck)
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    ccc = 2 * cxy / (x.var() + y.var() + (x.mean() - y.mean()) ** 2)
    r = np.corrcoef(x, y)[0, 1]
    close(row["pearson_r"], r)
    close(row["lin_ccc"], ccc)
    close(row["bias_correction_factor"], ccc / r, tol=1e-3)
    assert row["n_days"] == len(x)


def _paired_prices(duck):
    return duck.execute(
        "SELECT p.p_retailprice AS x,"
        " l.l_extendedprice / l.l_quantity AS y"
        " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
    ).df()


def test_bland_altman(ops, duck):
    (row,) = ops("stats-bland-altman")
    df = _paired_prices(duck)
    diff = (df.y - df.x).to_numpy(float)
    bias, sd = diff.mean(), diff.std(ddof=1)
    close(row["bias"], bias, tol=1e-3)
    close(row["sd_diff"], sd, tol=1e-3)
    close(row["loa_lo"], bias - 1.959964 * sd, tol=1e-3)
    close(row["loa_hi"], bias + 1.959964 * sd, tol=1e-3)
    close(
        row["frac_outside"],
        (np.abs(diff - bias) > 1.959964 * sd).mean(),
    )
    assert row["n"] == len(diff)


def test_deming(ops, duck):
    (row,) = ops("stats-deming-regression")
    df = _paired_prices(duck)
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    sxx, syy = x.var(ddof=1), y.var(ddof=1)
    sxy = np.cov(x, y, ddof=1)[0, 1]
    slope = (syy - sxx + math.sqrt((syy - sxx) ** 2 + 4 * sxy * sxy)) / (
        2 * sxy
    )
    close(row["slope"], slope, tol=1e-3)
    close(row["intercept"], y.mean() - slope * x.mean(), tol=1e-3)
    close(row["pearson_r"], sxy / math.sqrt(sxx * syy))
    # symmetry property of Deming (lambda=1): swap(x,y) inverts slope
    sxy2 = sxy
    slope_inv = (sxx - syy + math.sqrt((sxx - syy) ** 2 + 4 * sxy2**2)) / (
        2 * sxy2
    )
    close(slope * slope_inv, 1.0, tol=1e-5)


def test_fieller(ops, duck):
    (row,) = ops("stats-fieller-ratio-ci")
    df = duck.execute(
        "SELECT CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS a,"
        " CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS b"
        " FROM events GROUP BY user_id"
    ).df()
    a, b = df.a.to_numpy(float), df.b.to_numpy(float)
    n = len(a)
    ma, mb = a.mean(), b.mean()
    va = a.var(ddof=1) / n
    vb = b.var(ddof=1) / n
    vab = np.cov(a, b, ddof=1)[0, 1] / n
    z = 1.959964
    r = ma / mb
    g = z * z * vb / (mb * mb)
    rad = math.sqrt(va - 2 * r * vab + r * r * vb - g * (va - vab**2 / vb))
    close(row["ratio"], r)
    close(row["g_fieller"], g)
    close(row["ci_lo"], (r - g * vab / vb - z / mb * rad) / (1 - g))
    close(row["ci_hi"], (r - g * vab / vb + z / mb * rad) / (1 - g))
    assert row["n_users"] == n


def test_page_trend(ops, duck):
    (row,) = ops("stats-page-trend-test")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " CAST(floor(extract(hour FROM ts)/6) AS INT) AS q, avg(value) AS m"
        " FROM events GROUP BY 1, 2"
    ).df()
    piv = df.pivot(index="day", columns="q", values="m").dropna()
    x = piv.to_numpy(float)
    b, k = float(x.shape[0]), float(x.shape[1])
    r = x.argsort(1).argsort(1) + 1.0
    rj = r.sum(0)
    big_l = ((np.arange(1, int(k) + 1)) * rj).sum()
    e_l = b * k * (k + 1) ** 2 / 4.0
    z = (12 * big_l - 3 * b * k * (k + 1) ** 2) / math.sqrt(
        b * k * k * (k + 1) * (k * k - 1)
    )
    close(row["page_l"], big_l, tol=1e-3)
    close(row["expected_l"], e_l, tol=1e-3)
    close(row["page_z"], z, tol=1e-3)
    assert (row["n_blocks"], row["k_treatments"]) == (b, k)


def test_yuen_trimmed(ops, duck):
    (row,) = ops("stats-yuen-trimmed-ttest")
    df = duck.execute(
        "SELECT CASE WHEN event_type='purchase' THEN 'purchase'"
        " ELSE 'other' END AS g, value AS y FROM events"
        " WHERE event_type IN ('purchase','view')"
    ).df()

    def stats_for(g):
        y = df.y[df.g == g].to_numpy(float)
        lo, hi = np.quantile(y, 0.2), np.quantile(y, 0.8)
        w = np.clip(y, lo, hi)
        core = (y >= lo) & (y <= hi)
        h = float(core.sum())
        return y[core].mean(), (len(y) - 1) * w.var(ddof=1), h, len(y)

    tma, sswa, ha, na = stats_for("purchase")
    tmb, sswb, hb, nb = stats_for("other")
    t = (tma - tmb) / math.sqrt(
        sswa / (ha * (ha - 1)) + sswb / (hb * (hb - 1))
    )
    close(row["trimmed_mean_a"], tma)
    close(row["trimmed_mean_b"], tmb)
    close(row["yuen_t"], t, tol=1e-3)
    assert (row["n_a"], row["n_b"]) == (na, nb)


def test_rayleigh(ops, duck):
    rows = {r["event_type"]: r for r in ops("stats-rayleigh-circular")}
    df = duck.execute(
        "SELECT event_type,"
        " (extract(hour FROM ts)*3600 + extract(minute FROM ts)*60"
        "  + extract(second FROM ts)) * 2 * pi() / 86400.0 AS theta"
        " FROM events"
    ).df()
    for et, sub in df.groupby("event_type"):
        th = sub.theta.to_numpy(float)
        c, s = np.cos(th).mean(), np.sin(th).mean()
        r2 = c * c + s * s
        mean_dir = math.atan2(s, c)
        if mean_dir < 0:
            mean_dir += 2 * math.pi
        got = rows[et]
        close(got["resultant_r"], math.sqrt(r2))
        close(got["rayleigh_z"], len(th) * r2, tol=1e-3)
        close(got["mean_hour"], mean_dir * 24 / (2 * math.pi), tol=1e-3)
        assert got["n_events"] == len(th)


def test_anova_two_way(ops, duck):
    rows = {r["src"]: r for r in ops("stats-anova-two-way")}
    df = duck.execute(
        "SELECT event_type AS a,"
        " CAST(floor(extract(hour FROM ts)/6) AS INT) AS b, value AS y"
        " FROM events"
    ).df()
    y = df.y.to_numpy(float)
    gm, n = y.mean(), float(len(y))
    am = df.groupby("a").y.mean()
    na = df.groupby("a").size().astype(float)
    bm = df.groupby("b").y.mean()
    nb = df.groupby("b").size().astype(float)
    cm = df.groupby(["a", "b"]).y.mean()
    nc = df.groupby(["a", "b"]).size().astype(float)
    ss_a = (na * (am - gm) ** 2).sum()
    ss_b = (nb * (bm - gm) ** 2).sum()
    ss_ab = sum(
        nc[(a, b)] * (cm[(a, b)] - am[a] - bm[b] + gm) ** 2
        for a, b in cm.index
    )
    resid = df.y - df.set_index(["a", "b"]).index.map(cm)
    ss_err = (resid.to_numpy(float) ** 2).sum()
    df_a, df_b = len(am) - 1, len(bm) - 1
    n_cells = float(len(cm))
    mse = ss_err / (n - n_cells)
    close(rows["event_type"]["sum_sq"], ss_a, tol=1e-3)
    close(rows["hour_quadrant"]["sum_sq"], ss_b, tol=1e-3)
    close(rows["interaction"]["sum_sq"], ss_ab, tol=1e-3)
    close(rows["event_type"]["f_stat"], (ss_a / df_a) / mse, tol=1e-3)
    close(rows["interaction"]["f_stat"],
          (ss_ab / (df_a * df_b)) / mse, tol=1e-3)
    assert rows["interaction"]["df"] == df_a * df_b


def test_theil_decomposition(ops, duck):
    (row,) = ops("agg-theil-decomposition")
    df = duck.execute(
        "SELECT CAST(user_id % 4 AS BIGINT) AS seg, sum(value) AS x"
        " FROM events WHERE event_type = 'purchase' GROUP BY user_id"
    ).df()
    x = df.x.to_numpy(float)
    seg = df.seg.to_numpy(int)
    mu, n = x.mean(), float(len(x))
    t_w = t_b = 0.0
    for s in np.unique(seg):
        xs = x[seg == s]
        mus = xs.mean()
        ts = ((xs / mus) * np.log(xs / mus)).mean()
        share = (len(xs) / n) * (mus / mu)
        t_w += share * ts
        t_b += share * math.log(mus / mu)
    close(row["theil_within"], t_w)
    close(row["theil_between"], t_b)
    close(row["theil_total"], t_w + t_b)
    # decomposition identity vs the direct Theil T on the pooled data
    t_direct = ((x / mu) * np.log(x / mu)).mean()
    close(row["theil_total"], t_direct, tol=1e-3)
    assert row["n_users"] == n


def test_capture_recapture(ops, duck):
    (row,) = ops("stats-capture-recapture")
    df = duck.execute(
        "WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events)"
        " SELECT user_id,"
        " bool_or(CAST(ts AS DATE) BETWEEN d0 AND d0 + INTERVAL 6 DAY) AS w1,"
        " bool_or(CAST(ts AS DATE) BETWEEN d0 + INTERVAL 7 DAY"
        "         AND d0 + INTERVAL 13 DAY) AS w2"
        " FROM events, span GROUP BY user_id"
    ).df()
    n1 = int(df.w1.sum())
    n2 = int(df.w2.sum())
    m = int((df.w1 & df.w2).sum())
    close(row["chapman_estimate"], (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert (row["week1_users"], row["week2_users"], row["recaptured"]) == (
        n1, n2, m,
    )


def test_weibull_fit(ops, duck):
    (row,) = ops("stats-weibull-fit")
    v = duck.execute(
        "SELECT value FROM events WHERE value > 0"
    ).df().value.to_numpy(float)
    lx = np.log(v)
    sd = lx.std(ddof=1)
    k = math.pi / (sd * math.sqrt(6))
    lam = math.exp(lx.mean() + 0.5772156649 * sd * math.sqrt(6) / math.pi)
    close(row["weibull_shape_k"], k)
    close(row["weibull_scale_lambda"], lam, tol=1e-3)
    assert row["n_rows"] == len(v)


def test_gamma_fit(ops, duck):
    (row,) = ops("stats-gamma-fit")
    v = duck.execute(
        "SELECT value FROM events WHERE value > 0"
    ).df().value.to_numpy(float)
    mu, var = v.mean(), v.var(ddof=1)
    k = mu * mu / var
    close(row["gamma_shape_k"], k)
    close(row["gamma_scale_theta"], var / mu)
    close(row["implied_skewness"], 2.0 / math.sqrt(k))
    assert row["n_rows"] == len(v)


def test_negbin_fit(ops, duck):
    (row,) = ops("stats-negbin-fit")
    df = duck.execute(
        "SELECT count(*) AS k FROM events GROUP BY date_trunc('hour', ts)"
    ).df()
    k = df.k.to_numpy(float)
    mu, v = k.mean(), k.var(ddof=1)
    r = mu * mu / (v - mu)
    close(row["dispersion_index"], v / mu)
    close(row["nb_r"], r, tol=1e-3)
    close(row["nb_p"], mu / v)
    close(row["nb_alpha"], 1.0 / r)
    assert row["n_hours"] == len(k)


def test_exponential_fit_ks(ops, duck):
    (row,) = ops("stats-exponential-fit-ks")
    df = duck.execute(
        "SELECT date_diff('second', lag(ts) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id), ts) AS dt FROM events"
    ).df().dropna()
    dt = df.dt.to_numpy(float)
    dt = dt[dt > 0]
    lam = 1.0 / dt.mean()
    close(row["events_per_hour"], lam * 3600, tol=1e-3)
    assert row["n_gaps"] == len(dt)
    # binned ECDF KS vs fitted CDF at upper bin edges, scale-free grid
    z = dt * lam
    z = z[z < 8.0]
    bins = np.floor(z / 0.125).astype(int)
    uniq = np.unique(bins)
    counts = np.array([(bins == b).sum() for b in uniq], float)
    f_emp = np.cumsum(counts) / len(dt)
    f_fit = 1 - np.exp(-((uniq + 1) * 0.125))
    close(row["ks_to_exponential"], np.abs(f_emp - f_fit).max())


def _binned_ecdf_pair(duck):
    df = duck.execute(
        "SELECT value AS v,"
        " CASE WHEN event_type='click' THEN 1 ELSE 0 END AS is1"
        " FROM events WHERE event_type IN ('click','view')"
    ).df()
    v = df.v.to_numpy(float)
    is1 = df.is1.to_numpy(int)
    lo, hi = v.min(), v.max()
    b = np.minimum(255, np.floor((v - lo) / (hi - lo) * 256.0)).astype(int)
    bins = np.unique(b)
    c1 = np.array([(is1[b == bb] == 1).sum() for bb in bins], float)
    c2 = np.array([(is1[b == bb] == 0).sum() for bb in bins], float)
    return bins, c1, c2, hi - lo


def test_ks_binned(ops, duck):
    (row,) = ops("stats-ks-binned")
    bins, c1, c2, _ = _binned_ecdf_pair(duck)
    f1 = np.cumsum(c1) / c1.sum()
    f2 = np.cumsum(c2) / c2.sum()
    d = np.abs(f1 - f2).max()
    n1, n2 = c1.sum(), c2.sum()
    close(row["ks_d"], d)
    close(
        row["p_approx"],
        2 * math.exp(-2 * (d * math.sqrt(n1 * n2 / (n1 + n2))) ** 2),
    )
    assert (row["n1"], row["n2"]) == (n1, n2)


def test_wasserstein_binned(ops, duck):
    (row,) = ops("stats-wasserstein-binned")
    bins, c1, c2, span = _binned_ecdf_pair(duck)
    f1 = np.cumsum(c1) / c1.sum()
    f2 = np.cumsum(c2) / c2.sum()
    w1 = (np.abs(f1 - f2) * span / 256.0).sum()
    close(row["wasserstein_1"], w1)


def test_anderson_darling_binned(ops, duck):
    (row,) = ops("stats-anderson-darling-binned")
    bins, c1, c2, _ = _binned_ecdf_pair(duck)
    n1, n2 = c1.sum(), c2.sum()
    n = n1 + n2
    cumn = np.cumsum(c1 + c2)
    f1 = np.cumsum(c1) / n1
    f2 = np.cumsum(c2) / n2
    keep = (cumn > 0) & (cumn < n)
    d = (f1 - f2)[keep]
    h = (cumn / n)[keep]
    ad = n1 * n2 / n * (d * d / (h * (1 - h)) / 256.0).sum()
    close(row["ad_statistic"], ad, tol=1e-3)
    assert (row["n1"], row["n2"]) == (n1, n2)


def test_mutual_information(ops, duck):
    (row,) = ops("stats-mutual-information")
    df = duck.execute(
        "SELECT event_type AS x, user_id % 4 AS y FROM events"
    ).df()
    tab = df.groupby(["x", "y"]).size().unstack(fill_value=0)
    pxy = tab.to_numpy(float)
    pxy /= pxy.sum()
    px = pxy.sum(1, keepdims=True)
    py = pxy.sum(0, keepdims=True)
    nz = pxy > 0
    mi = (pxy[nz] * np.log(pxy[nz] / (px @ py)[nz])).sum()
    hx = -(px * np.log(px)).sum()
    hy = -(py * np.log(py)).sum()
    close(row["mi_nats"], mi)
    close(row["h_x"], hx)
    close(row["h_y"], hy)
    close(row["nmi"], mi / min(hx, hy))


def _segment_pvals(duck):
    df = duck.execute("SELECT event_type, value FROM events").df()
    gm = df.value.mean()
    gv = df.value.var(ddof=1)
    out = {}
    for et, g in df.groupby("event_type").value:
        z = abs(g.mean() - gm) / math.sqrt(gv / len(g))
        out[et] = (z, math.exp(-z * z / 2))
    return out


def test_benjamini_hochberg(ops, duck):
    rows = ops("stats-benjamini-hochberg")
    pv = _segment_pvals(duck)
    m = len(pv)
    ordered = sorted(pv.items(), key=lambda kv: (kv[1][1], kv[0]))
    k_max = max(
        (k for k, (_, (z, p)) in enumerate(ordered, 1)
         if p <= 0.05 * k / m),
        default=0,
    )
    for r in rows:
        z, p = pv[r["event_type"]]
        close(r["z"], z)
        close(r["p"], p)
        close(r["bh_threshold"], 0.05 * r["k"] / m)
        want_k = [et for et, _ in ordered].index(r["event_type"]) + 1
        assert r["k"] == want_k
        assert r["rejected"] == (want_k <= k_max)


def test_holm_bonferroni(ops, duck):
    rows = ops("stats-holm-bonferroni")
    pv = _segment_pvals(duck)
    m = len(pv)
    ordered = sorted(pv.items(), key=lambda kv: (kv[1][1], kv[0]))
    first_fail = next(
        (k for k, (_, (z, p)) in enumerate(ordered, 1)
         if p > 0.05 / (m - k + 1)),
        m + 1,
    )
    for r in rows:
        _, p = pv[r["event_type"]]
        close(r["p"], p)
        close(r["holm_threshold"], 0.05 / (m - r["k"] + 1))
        want_k = [et for et, _ in ordered].index(r["event_type"]) + 1
        assert r["k"] == want_k
        assert r["rejected"] == (want_k < first_fail)


def test_power_proportions(ops, duck):
    (row,) = ops("stats-power-proportions")
    df = duck.execute(
        "SELECT avg(CASE WHEN event_type='purchase' THEN 1.0 ELSE 0 END)"
        " AS p1 FROM events"
    ).df()
    p1 = float(df.p1.iloc[0])
    p2 = p1 * 1.10
    za, zb = 1.959964, 0.841621
    pbar = (p1 + p2) / 2
    n = math.ceil(
        (za * math.sqrt(2 * pbar * (1 - pbar))
         + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
        / (p2 - p1) ** 2
    )
    close(row["baseline_rate"], p1)
    close(row["target_rate"], p2)
    assert row["n_per_variant"] == n


def test_tost(ops, duck):
    (row,) = ops("stats-tost-equivalence")
    df = duck.execute(
        "SELECT event_type, value FROM events"
        " WHERE event_type IN ('click','view')"
    ).df()
    a = df.value[df.event_type == "click"].to_numpy(float)
    b = df.value[df.event_type == "view"].to_numpy(float)
    se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    d = a.mean() - b.mean()
    t_lo, t_hi = (d + 5.0) / se, (d - 5.0) / se
    close(row["mean_diff"], d)
    close(row["t_lower"], t_lo, tol=1e-3)
    close(row["t_upper"], t_hi, tol=1e-3)
    assert row["equivalent"] == (t_lo > 1.644854 and t_hi < -1.644854)


def test_srm_check(ops, duck):
    (row,) = ops("stats-srm-check")
    df = duck.execute("SELECT DISTINCT user_id FROM events").df()
    v = (df.user_id.to_numpy("int64") * 2654435761 % 2147483648) % 2
    n0, n1 = float((v == 0).sum()), float((v != 0).sum())
    e = (n0 + n1) / 2
    chi2 = (n0 - e) ** 2 / e + (n1 - e) ** 2 / e
    assert (row["variant_a"], row["variant_b"]) == (n0, n1)
    close(row["srm_chi2"], chi2)
    assert row["srm_flag"] == (chi2 > 3.841459)


def test_cohens_d_battery(ops, duck):
    rows = {(r["type_a"], r["type_b"]): r for r in ops("stats-cohens-d-battery")}
    df = duck.execute("SELECT event_type, value FROM events").df()
    stats = {
        et: (float(len(g)), g.mean(), g.var(ddof=1))
        for et, g in df.groupby("event_type").value
    }
    ks = sorted(stats)
    assert len(rows) == len(ks) * (len(ks) - 1) // 2
    for i, ta in enumerate(ks):
        for tb in ks[i + 1:]:
            na, ma, va = stats[ta]
            nb, mb, vb = stats[tb]
            d = (ma - mb) / math.sqrt(
                ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
            )
            r = rows[(ta, tb)]
            close(r["cohens_d"], d)
            close(r["hedges_g"], d * (1 - 3.0 / (4 * (na + nb) - 9)))


def test_xbar_control_chart(ops, duck):
    rows = ops("stats-xbar-control-chart")
    df = duck.execute("SELECT CAST(ts AS DATE) AS day, value FROM events").df()
    per = {
        str(day)[:10]: (g.mean(), g.var(ddof=1), float(len(g)))
        for day, g in df.groupby("day").value
    }
    nsum = sum(n for _, _, n in per.values())
    gm = sum(m * n for m, _, n in per.values()) / nsum
    sw = math.sqrt(
        sum((n - 1) * v for _, v, n in per.values())
        / sum(n - 1 for _, _, n in per.values())
    )
    assert len(rows) == len(per)
    for r in rows:
        m, v, n = per[str(r["day"])[:10]]
        close(r["xbar"], m)
        close(r["lcl"], gm - 3 * sw / math.sqrt(n), tol=1e-3)
        close(r["ucl"], gm + 3 * sw / math.sqrt(n), tol=1e-3)
        assert r["out_of_control"] == (
            m < gm - 3 * sw / math.sqrt(n) or m > gm + 3 * sw / math.sqrt(n)
        )


def test_ewma_control_chart(ops, duck):
    rows = ops("stats-ewma-control-chart")
    df = _daily_rev(duck)
    rev = df.rev.to_numpy(float)
    mu, sd = rev.mean(), rev.std(ddof=1)
    lam = 0.2
    ucl = mu + 3 * sd * math.sqrt(lam / (2 - lam))
    lcl = mu - 3 * sd * math.sqrt(lam / (2 - lam))
    got = {str(r["day"])[:10]: r for r in rows}
    # 15-lag truncated EWMA with mu filling the tail (the op's doc'd form)
    for i in (14, len(rev) - 1):  # spot-check a middle and the last day
        z = 0.0
        for k in range(15):
            x = rev[i - k] if i - k >= 0 else mu
            z += lam * (1 - lam) ** k * x
        z += (1 - lam) ** 15 * mu
        r = got[str(df.day.iloc[i])[:10]]
        close(r["ewma"], z, tol=1e-3)
        close(r["ucl"], ucl, tol=1e-3)
        close(r["lcl"], lcl, tol=1e-3)


def test_process_capability(ops, duck):
    (row,) = ops("stats-process-capability")
    v = duck.execute("SELECT value FROM events").df().value.to_numpy(float)
    mu, sd = v.mean(), v.std(ddof=1)
    lsl, usl = 0.0, 200.0
    close(row["cp"], (usl - lsl) / (6 * sd))
    close(row["cpk"], min(usl - mu, mu - lsl) / (3 * sd))
    close(row["centering_k"], (mu - (usl + lsl) / 2) / ((usl - lsl) / 2))
    assert row["n_rows"] == len(v)


def test_delta_method_ci(ops, duck):
    (row,) = ops("stats-delta-method-ci")
    df = duck.execute(
        "SELECT CAST(sum(CASE WHEN event_type='purchase' THEN value"
        " ELSE 0 END) AS DOUBLE) AS rev,"
        " CAST(count(*) AS DOUBLE) AS n_ev"
        " FROM events GROUP BY user_id"
    ).df()
    x, y = df.rev.to_numpy(float), df.n_ev.to_numpy(float)
    n = len(x)
    mx, my = x.mean(), y.mean()
    r = mx / my
    var = (
        r * r
        * (x.var(ddof=1) / mx**2 + y.var(ddof=1) / my**2
           - 2 * np.cov(x, y, ddof=1)[0, 1] / (mx * my))
        / n
    )
    close(row["revenue_per_event"], r)
    close(row["var_delta"], var)
    close(row["ci_lo"], r - 1.959964 * math.sqrt(var))
    close(row["ci_hi"], r + 1.959964 * math.sqrt(var))
    assert row["n_users"] == n


def test_rank_biased_overlap(ops, duck):
    (row,) = ops("stats-rank-biased-overlap")
    df = duck.execute(
        "SELECT CASE WHEN lang='en' THEN 'en' ELSE 'other' END AS grp,"
        " unnest(string_split(lower(text), ' ')) AS w FROM documents"
    ).df()
    df = df[df.w != ""]
    tops = {}
    for grp, sub in df.groupby("grp"):
        cnt = sub.groupby("w").size().reset_index(name="n")
        cnt = cnt.sort_values(["n", "w"], ascending=[False, True])
        tops[grp] = {w: i + 1 for i, w in enumerate(cnt.w.head(20))}
    pairs = [
        (r1, tops["other"][w])
        for w, r1 in tops["en"].items()
        if w in tops["other"]
    ]
    rbo = 0.0
    a20 = None
    for d in range(1, 21):
        a_d = sum(1 for r1, r2 in pairs if r1 <= d and r2 <= d) / d
        rbo += 0.9 ** (d - 1) * a_d
        if d == 20:
            a20 = a_d
    close(row["rbo_p09"], (1 - 0.9) * rbo)
    close(row["overlap_at_20"], a20)


def test_jackknife_cv(ops, duck):
    (row,) = ops("stats-jackknife-cv")
    x = _daily_rev(duck).rev.to_numpy(float)
    n = len(x)
    cv_full = x.std(ddof=1) / x.mean()
    cvs = []
    for i in range(n):
        loo = np.delete(x, i)
        cvs.append(loo.std(ddof=1) / loo.mean())
    cvs = np.array(cvs)
    se = math.sqrt((n - 1) / n * ((cvs - cvs.mean()) ** 2).sum())
    close(row["cv_full"], cv_full)
    close(row["cv_jack_mean"], cvs.mean())
    close(row["se_jackknife"], se, tol=1e-3)
    close(row["cv_bias_corrected"], n * cv_full - (n - 1) * cvs.mean(),
          tol=1e-3)
    assert row["n_days"] == n


def test_quantile_ci(ops, duck):
    (row,) = ops("stats-quantile-ci")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, avg(value) AS m"
        " FROM events GROUP BY 1 ORDER BY avg(value)"
    ).df()
    m = np.sort(df.m.to_numpy(float))
    n = len(m)
    q, z = 0.9, 1.959964
    r_pt = math.ceil(q * n)
    r_lo = max(1, math.floor(q * n - z * math.sqrt(n * q * (1 - q))))
    r_hi = min(n, math.ceil(q * n + z * math.sqrt(n * q * (1 - q))) + 1)
    close(row["p90_point"], m[r_pt - 1])
    close(row["ci_lo"], m[r_lo - 1])
    close(row["ci_hi"], m[r_hi - 1])
    assert row["n_days"] == n


def test_copula_tail(ops, duck):
    (row,) = ops("stats-copula-tail-dependence")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " avg(CASE WHEN event_type='click' THEN value END) AS x,"
        " avg(CASE WHEN event_type='view' THEN value END) AS y"
        " FROM events WHERE event_type IN ('click','view') GROUP BY 1"
    ).df().dropna()
    # the op rounds daily means to 6dp before the quantile compare
    # (knife-edge hardening from the null-hostility sweep)
    x = np.round(df.x.to_numpy(float), 6)
    y = np.round(df.y.to_numpy(float), 6)
    qxu, qyu = np.quantile(x, 0.8), np.quantile(y, 0.8)
    qxl, qyl = np.quantile(x, 0.2), np.quantile(y, 0.2)
    lu = ((x > qxu) & (y > qyu)).sum() / (y > qyu).sum()
    ll = ((x < qxl) & (y < qyl)).sum() / (y < qyl).sum()
    close(row["lambda_upper"], lu)
    close(row["lambda_lower"], ll)
    assert row["n_days"] == len(x)


def test_partial_corr(ops, duck):
    (row,) = ops("stats-partial-corr")
    df = duck.execute(
        "SELECT l_quantity AS x, l_extendedprice AS y, l_discount AS z"
        " FROM lineitem"
    ).df()
    c = np.corrcoef(np.column_stack([df.x, df.y, df.z]).T)
    rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
    close(row["corr_qty_price"], rxy)
    close(
        row["partial_corr_given_discount"],
        (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2)),
    )
    assert row["n_rows"] == len(df)


def test_turning_points(ops, duck):
    (row,) = ops("timeseries-turning-points")
    x = _daily_counts(duck)
    n = float(len(x))
    tp = sum(
        1
        for i in range(1, len(x) - 1)
        if (x[i] > x[i - 1] and x[i] > x[i + 1])
        or (x[i] < x[i - 1] and x[i] < x[i + 1])
    )
    e = 2 * (n - 2) / 3
    close(row["expected_tp"], e)
    close(row["z"], (tp - e) / math.sqrt((16 * n - 29) / 90))
    assert (row["n_days"], row["turning_points"]) == (n, tp)


def test_approx_entropy(ops, duck):
    (row,) = ops("timeseries-approx-entropy")
    x = _daily_counts(duck)
    n = len(x)
    r = 0.2 * x.std(ddof=1)
    # phi_1: per-i fraction of j with |x_i - x_j| < r (self included)
    d = np.abs(np.subtract.outer(x, x)) < r
    phi1 = np.log(d.sum(1) / n).mean()
    # phi_2: both coords of the length-2 template within r
    x1 = x[1:]
    d2 = (np.abs(np.subtract.outer(x[:-1], x[:-1])) < r) & (
        np.abs(np.subtract.outer(x1, x1)) < r
    )
    phi2 = np.log(d2.sum(1) / (n - 1)).mean()
    close(row["phi_m1"], phi1, tol=1e-3)
    close(row["phi_m2"], phi2, tol=1e-3)
    close(row["approx_entropy"], phi1 - phi2, tol=1e-3)


def test_hurst_rs(ops, duck):
    (row,) = ops("timeseries-hurst-rs")
    x = _daily_counts(duck)
    pts = []
    for m in (4, 8, 16):
        rss = []
        for blk in range(len(x) // m):
            seg = x[blk * m:(blk + 1) * m]
            if len(seg) < m:
                continue
            z = np.cumsum(seg - seg.mean())
            s = seg.std()  # population
            if s > 0:
                rss.append((z.max() - z.min()) / s)
        if rss:
            pts.append((math.log(m), math.log(np.mean(rss))))
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    h = ((lx * ly).sum() - lx.sum() * ly.sum() / len(lx)) / (
        (lx * lx).sum() - lx.sum() ** 2 / len(lx)
    )
    close(row["hurst_exponent"], h, tol=1e-3)
    assert row["n_scales"] == len(pts)


def test_ranking_metrics(ops, duck):
    (row,) = ops("eval-ranking-metrics")
    df = duck.execute(
        "SELECT user_id, event_id, value,"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS rel"
        " FROM events"
    ).df()
    ndcgs, rrs, p5s = [], [], []
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["value", "event_id"], ascending=[False, True])
        rel = g.rel.to_numpy(int)
        disc = 1.0 / np.log2(np.arange(2, len(rel) + 2))
        dcg = (rel[:10] * disc[:10]).sum()
        ideal = np.sort(rel)[::-1]
        idcg = (ideal[:10] * disc[:10]).sum()
        if idcg > 0:
            ndcgs.append(dcg / idcg)
        hits = np.nonzero(rel)[0]
        rrs.append(1.0 / (hits[0] + 1) if len(hits) else 0.0)
        p5s.append(rel[:5].sum() / 5.0)
    close(row["mean_ndcg_at_10"], np.mean(ndcgs))
    close(row["mrr"], np.mean(rrs))
    close(row["p_at_5"], np.mean(p5s))
    assert row["n_users"] == df.user_id.nunique()


def test_pass_at_k(ops, duck):
    (row,) = ops("eval-pass-at-k")
    df = duck.execute(
        "SELECT count(*) AS n,"
        " sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS c"
        " FROM events GROUP BY user_id HAVING count(*) >= 10"
    ).df()

    def pass_at(n, c, k):
        # exact Codex estimator 1 - C(n-c, k)/C(n, k)
        if n - c < k:
            return 1.0
        return 1.0 - math.comb(int(n - c), k) / math.comb(int(n), k)

    for k, col in ((1, "pass_at_1"), (5, "pass_at_5"), (10, "pass_at_10")):
        want = np.mean([pass_at(n, c, k) for n, c in zip(df.n, df.c)])
        close(row[col], want)
    assert row["n_tasks"] == len(df)


def _user_score_label(duck, binw):
    return duck.execute(
        f"SELECT least(CAST(floor(avg(value)/{binw}) AS BIGINT),"
        f" {100 // binw - 1}) AS bin,"
        " CASE WHEN sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        " >= 14 THEN 1 ELSE 0 END AS y"
        " FROM events GROUP BY user_id"
    ).df()


def test_woe_iv(ops, duck):
    rows = {r["bin"]: r for r in ops("ml-woe-iv")}
    df = _user_score_label(duck, 10)
    tp = float(df.y.sum())
    tn = float((1 - df.y).sum())
    iv = 0.0
    want = {}
    for b, g in df.groupby("bin"):
        pos, neg = float(g.y.sum()), float((1 - g.y).sum())
        pp, pn = (pos + 0.5) / tp, (neg + 0.5) / tn
        woe = math.log(pp / pn)
        iv += (pp - pn) * woe
        want[b] = (pos, neg, woe)
    assert set(rows) == set(want)
    for b, (pos, neg, woe) in want.items():
        r = rows[b]
        assert (r["n_pos"], r["n_neg"]) == (pos, neg)
        close(r["woe"], woe)
        close(r["total_iv"], iv)


def test_pr_auc_binned(ops, duck):
    (row,) = ops("ml-pr-auc-binned")
    df = _user_score_label(duck, 5)
    g = df.groupby("bin").y.agg(["sum", "count"]).sort_index(ascending=False)
    pos = g["sum"].to_numpy(float)
    tot = g["count"].to_numpy(float)
    cpos = np.cumsum(pos)
    call = np.cumsum(tot)
    prec = cpos / call
    rec = cpos / pos.sum()
    d_rec = np.diff(np.concatenate([[0.0], rec]))
    close(row["pr_auc"], (prec * d_rec).sum())
    close(
        row["best_precision_at_recall50"],
        prec[rec >= 0.5].max(),
    )
    assert row["n_bins"] == len(pos)


def test_bm25_topk(ops, duck):
    rows = ops("eval-bm25-topk")
    df = duck.execute(
        "SELECT doc_id,"
        " unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token"
        " FROM documents"
    ).df()
    k1, b = 1.2, 0.75
    from collections import Counter
    dl = df.groupby("doc_id").size().to_dict()
    avgdl = np.mean(list(dl.values()))
    n_docs = float(len(dl))
    # query = 3 most frequent tokens, (count desc, token) tie-break
    counts = Counter(df.token)
    qterms = [
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:3]
    scores = Counter()
    for q in qterms:
        sub = df[df.token == q]
        tf = sub.groupby("doc_id").size()
        dfq = float(len(tf))
        idf = math.log(1 + (n_docs - dfq + 0.5) / (dfq + 0.5))
        for doc, f in tf.items():
            scores[doc] += (
                idf * f * (k1 + 1)
                / (f + k1 * (1 - b + b * dl[doc] / avgdl))
            )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(rows) == 10
    for r, (doc, s) in zip(rows, want):
        assert r["doc_id"] == doc
        close(r["bm25"], s)


def test_sprt_monitor(ops, duck):
    rows = ops("stats-sprt-monitor")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        "      AS DOUBLE) AS x,"
        " CAST(count(*) AS DOUBLE) AS n"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    llr = (
        df.x.to_numpy(float) * math.log(0.22 / 0.20)
        + (df.n - df.x).to_numpy(float) * math.log(0.78 / 0.80)
    )
    cum = np.cumsum(llr)
    hi, lo = math.log((1 - 0.2) / 0.05), math.log(0.2 / (1 - 0.05))
    assert len(rows) == len(cum)
    for r, c in zip(rows, cum):
        close(r["llr_cum"], c, tol=1e-3)
        want = (
            "accept_h1" if c >= hi else "accept_h0" if c <= lo else "continue"
        )
        assert r["decision"] == want


def test_var_backtest(ops, duck):
    (row,) = ops("stats-var-backtest")
    rev = _daily_rev(duck).rev.to_numpy(float)
    r = np.log(rev[1:] / rev[:-1])
    var05 = np.quantile(r, 0.05)
    n, x = float(len(r)), float((r < var05).sum())
    p = x / n
    lr = -2 * (
        (n - x) * math.log(0.95) + x * math.log(0.05)
        - (n - x) * math.log(1 - p) - x * math.log(p)
    )
    assert (row["n_days"], row["n_violations"]) == (n, x)
    close(row["violation_rate"], p)
    close(row["kupiec_lr"], lr, tol=1e-3)


def test_croston(ops, duck):
    rows = {r["l_partkey"]: r for r in ops("timeseries-croston")}
    df = duck.execute(
        "SELECT l_partkey, CAST(l_shipdate AS DATE) AS d, sum(l_quantity)"
        " AS z FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    alpha = 0.1
    want = {}
    for pk, g in df.groupby("l_partkey"):
        if len(g) < 4:
            continue
        z = g.z.to_numpy(float)
        days = [(b - a).days for a, b in zip(g.d, g.d[1:])]
        # recursive SES, standard Croston init (z1; first interval)
        zh = z[0]
        for v in z[1:]:
            zh = alpha * v + (1 - alpha) * zh
        ph = float(days[0])
        for v in days[1:]:
            ph = alpha * v + (1 - alpha) * ph
        want[pk] = (len(z), zh, ph)
    # the op emits the top-20 by forecast
    assert len(rows) == 20
    for pk, r in rows.items():
        n, zh, ph = want[pk]
        assert r["n_demands"] == n
        close(r["size_ses"], zh, tol=1e-3)
        close(r["interval_ses"], ph, tol=1e-3)
        close(r["croston_forecast"], zh / ph, tol=1e-3)


def test_pca_2d(ops, duck):
    (row,) = ops("stats-pca-2d")
    df = duck.execute(
        "SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem"
    ).df()
    X = np.column_stack([df.x.to_numpy(float), df.y.to_numpy(float)])
    cov = np.cov(X.T, ddof=0)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    close(row["lambda1"], evals[0], tol=1e-3)
    close(row["lambda2"], evals[1], tol=1e-3)
    close(row["explained_ratio"], evals[0] / evals.sum())
    # PC1 direction from the eigenvector, mapped to the op's atan2 form
    w, v = np.linalg.eigh(cov)
    pc1 = v[:, np.argmax(w)]
    ang = math.degrees(math.atan2(pc1[1], pc1[0]))
    got = row["pc1_angle_deg"]
    assert (
        abs(ang - got) < 1e-2 or abs(abs(ang - got) - 180) < 1e-2
    ), (ang, got)
    assert row["n_rows"] == len(df)


def test_mahalanobis_outliers(ops, duck):
    rows = ops("stats-mahalanobis-outliers")
    df = duck.execute(
        "SELECT o.o_orderkey AS k, o.o_totalprice AS p,"
        " CAST(count(*) AS DOUBLE) AS q"
        " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " GROUP BY 1, 2"
    ).df()
    X = np.column_stack([df.p.to_numpy(float), df.q.to_numpy(float)])
    mu = X.mean(0)
    cov = np.cov(X.T, ddof=0)
    inv = np.linalg.inv(cov)
    d = X - mu
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    order = sorted(
        zip(d2, df.k), key=lambda t: (-t[0], t[1])
    )[:20]
    assert len(rows) == 20
    for r, (dist, key) in zip(rows, order):
        assert r["o_orderkey"] == key
        close(r["mahalanobis_sq"], dist, tol=1e-3)


def test_target_encode_loo(ops, duck):
    rows = {r["event_type"]: r for r in ops("ml-target-encode-loo")}
    df = duck.execute("SELECT event_type, value FROM events").df()
    mu = df.value.mean()
    for et, g in df.groupby("event_type").value:
        v = g.to_numpy(float)
        n, s = len(v), v.sum()
        if n <= 1:
            continue
        loo = (s - v) / (n - 1)
        smoothed = (s - v + 20 * mu) / (n - 1 + 20)
        r = rows[et]
        close(r["mean_loo"], loo.mean())
        close(r["mean_smoothed"], smoothed.mean())
        close(r["sd_loo"], loo.std(ddof=1))
        assert r["n"] == n


def test_bradley_terry(ops, duck):
    rows = {r["event_type"]: r for r in ops("eval-bradley-terry")}
    df = _daily_means(duck)
    piv = df.pivot(index="day", columns="event_type", values="m")
    types = sorted(piv.columns)
    import itertools
    nij = {}
    wij = {}
    for i, j in itertools.combinations(types, 2):
        sub = piv[[i, j]].dropna()
        neq = sub[sub[i] != sub[j]]
        nij[(i, j)] = float(len(neq))
        wij[(i, j)] = float((neq[i] > neq[j]).sum())
    # directed view: per team, total wins and opponent multiset
    W = {t: 0.0 for t in types}
    opp = {t: [] for t in types}
    games = {t: 0.0 for t in types}
    for (i, j), n in nij.items():
        if n == 0:
            continue
        W[i] += wij[(i, j)]
        W[j] += n - wij[(i, j)]
        opp[i].append((j, n))
        opp[j].append((i, n))
        games[i] += n
        games[j] += n
    # two MM updates from uniform p=1
    p = {t: 1.0 for t in types}
    for _ in range(2):
        p = {
            t: W[t] / sum(n / (p[t] + p[o]) for o, n in opp[t])
            for t in types
        }
    z = sum(p.values())
    for t in types:
        r = rows[t]
        close(r["bt_strength"], p[t] / z)
        assert (r["games"], r["wins"]) == (games[t], W[t])


def test_gini_split(ops, duck):
    (row,) = ops("stats-gini-split")
    df = duck.execute(
        "SELECT value,"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y"
        " FROM events"
    ).df()
    v = df.value.to_numpy(float)
    y = df.y.to_numpy(float)
    lo, hi = v.min(), v.max()
    b = np.minimum(31, np.floor((v - lo) / (hi - lo) * 32.0)).astype(int)
    best = None
    tpos, tn = y.sum(), float(len(y))
    for thr_bin in np.unique(b):
        left = b <= thr_bin
        ln, lpos = float(left.sum()), y[left].sum()
        if ln == 0 or ln == tn:
            continue
        pl = lpos / ln
        pr = (tpos - lpos) / (tn - ln)
        gw = (ln / tn) * 2 * pl * (1 - pl) + ((tn - ln) / tn) * 2 * pr * (
            1 - pr
        )
        if best is None or (gw, thr_bin) < best:
            best = (gw, thr_bin)
    gw, thr_bin = best
    g_root = 2 * (tpos / tn) * (1 - tpos / tn)
    assert row["bin"] == thr_bin
    close(row["threshold"], lo + (thr_bin + 1) * (hi - lo) / 32.0, tol=1e-3)
    close(row["weighted_gini"], gw)
    close(row["gini_gain"], g_root - gw)


def test_nelson_aalen(ops, duck):
    rows = ops("stats-nelson-aalen")
    df = _durations(duck)
    t = df.t.to_numpy(float)
    died = df.died.to_numpy(int)
    h = v = 0.0
    golden = {}
    for u in np.sort(np.unique(t)):
        n_risk = float((t >= u).sum())
        d = float(died[t == u].sum())
        h += d / n_risk
        v += d / (n_risk * n_risk)
        if d > 0:
            golden[int(u)] = (n_risk, d, h, v)
    assert len(rows) == len(golden)
    for r in rows:
        n_risk, d, hh, vv = golden[r["t_days"]]
        assert (r["n_risk"], r["n_events"]) == (n_risk, d)
        close(r["cum_hazard"], hh)
        close(r["breslow_survival"], math.exp(-hh))
        close(r["hazard_se"], math.sqrt(vv))


def test_mcf_recurrent(ops, duck):
    rows = ops("event-mcf-recurrent")
    df = duck.execute(
        "WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),"
        " fu AS (SELECT user_id, min(CAST(ts AS DATE)) AS enter_d"
        "        FROM events GROUP BY user_id)"
        " SELECT e.user_id,"
        " date_diff('day', f.enter_d, CAST(e.ts AS DATE)) AS t,"
        " e.event_type = 'purchase' AS purch,"
        " date_diff('day', f.enter_d, x.obs_end) AS tau"
        " FROM events e JOIN fu f USING (user_id) CROSS JOIN ends x"
    ).df()
    taus = df.groupby("user_id").tau.first().to_numpy(float)
    n_users = float(len(taus))
    p = df[df.purch]
    mcf = 0.0
    got = {r["t_days"]: r for r in rows}
    for u in np.sort(p.t.unique()):
        d = float((p.t == u).sum())
        n_risk = n_users - float((taus < u).sum())
        mcf += d / n_risk
        r = got[int(u)]
        assert (r["n_risk"], r["n_events"]) == (n_risk, d)
        close(r["mcf"], mcf)
    assert len(rows) == p.t.nunique()


def test_competing_risks(ops, duck):
    rows = ops("analytics-competing-risks")
    df = duck.execute(
        """
        WITH ends AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
        pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type='view' THEN CAST(ts AS DATE) END) AS fv,
                   min(CASE WHEN event_type='purchase' THEN CAST(ts AS DATE) END) AS fp,
                   min(CASE WHEN event_type='error' THEN CAST(ts AS DATE) END) AS fe
            FROM events GROUP BY user_id
        )
        SELECT CASE
                 WHEN fp IS NOT NULL AND fp >= fv AND (fe IS NULL OR fp <= fe)
                   THEN date_diff('day', fv, fp)
                 WHEN fe IS NOT NULL AND fe >= fv
                   THEN date_diff('day', fv, fe)
                 ELSE date_diff('day', fv, e.obs_end) END AS t,
               CASE
                 WHEN fp IS NOT NULL AND fp >= fv AND (fe IS NULL OR fp <= fe) THEN 1
                 WHEN fe IS NOT NULL AND fe >= fv THEN 2
                 ELSE 0 END AS cause
        FROM pu CROSS JOIN ends e WHERE fv IS NOT NULL
        """
    ).df()
    t = df.t.to_numpy(float)
    cause = df.cause.to_numpy(int)
    # Aalen-Johansen CIFs: S(t-) carried through event times
    s_minus = 1.0
    cif1 = cif2 = 0.0
    golden = {}
    for u in np.sort(np.unique(t)):
        n_risk = float((t >= u).sum())
        d1 = float(((t == u) & (cause == 1)).sum())
        d2 = float(((t == u) & (cause == 2)).sum())
        cif1 += s_minus * d1 / n_risk
        cif2 += s_minus * d2 / n_risk
        golden[int(u)] = (n_risk, d1, d2, cif1, cif2)
        if d1 + d2 > 0:
            s_minus *= 1 - (d1 + d2) / n_risk
    for r in rows:
        n_risk, d1, d2, c1, c2 = golden[r["t_days"]]
        close(r["cif_purchase"], c1)
        close(r["cif_error"], c2)


def test_brier_decomposition(ops, duck):
    (row,) = ops("eval-brier-decomposition")
    from transit_scrape_spark.operators.dedup import sql_string_hash

    expr = sql_string_hash("CAST(event_id AS VARCHAR) || ':brier-salt-r5'")
    df = duck.execute(
        f"SELECT CAST(extract(hour FROM ts) AS INT) AS h,"
        f" CASE WHEN event_type='purchase' THEN 1.0 ELSE 0.0 END AS o,"
        f" ({expr}) % 5 AS slot FROM events"
    ).df()
    tr = df[df.slot < 4]
    te = df[df.slot >= 4].copy()
    rates = tr.groupby("h").o.mean()
    te["p"] = te.h.map(rates)
    te = te.dropna(subset=["p"])
    o = te.o.to_numpy(float)
    p = te.p.to_numpy(float)
    n = float(len(o))
    obar = o.mean()
    brier = ((p - o) ** 2).mean()
    rel = res = 0.0
    for pk, g in te.groupby("p").o:
        nk = float(len(g))
        rel += nk * (pk - g.mean()) ** 2
        res += nk * (g.mean() - obar) ** 2
    rel /= n
    res /= n
    unc = obar * (1 - obar)
    close(row["brier"], brier)
    close(row["reliability"], rel)
    close(row["resolution"], res)
    close(row["uncertainty"], unc)
    # Murphy identity must hold exactly at distinct-forecast binning
    close(row["identity_residual"], 0.0, tol=1e-5)
    close(brier, rel - res + unc, tol=1e-9)
    assert row["n_test"] == n


def test_calibration_slope(ops, duck):
    (row,) = ops("ml-calibration-slope")
    from transit_scrape_spark.operators.dedup import sql_string_hash

    expr = sql_string_hash("CAST(event_id AS VARCHAR) || ':calib-slope-r5'")
    df = duck.execute(
        f"SELECT CAST(extract(hour FROM ts) AS INT) AS h,"
        f" CASE WHEN event_type='purchase' THEN 1.0 ELSE 0.0 END AS o,"
        f" ({expr}) % 5 AS slot FROM events"
    ).df()
    tr, te = df[df.slot < 4], df[df.slot >= 4].copy()
    rates = tr.groupby("h").o.mean()
    te["p"] = te.h.map(rates)
    xs, zs, ws = [], [], []
    for pk, g in te.groupby("p").o:
        if 0 < pk < 1:
            nk = float(len(g))
            obar = g.mean()
            xs.append(math.log(pk / (1 - pk)))
            zs.append(math.log((obar * nk + 0.5) / ((1 - obar) * nk + 0.5)))
            ws.append(nk)
    x, z, w = map(np.array, (xs, zs, ws))
    mx = (w * x).sum() / w.sum()
    mz = (w * z).sum() / w.sum()
    b = (w * (x - mx) * (z - mz)).sum() / (w * (x - mx) ** 2).sum()
    close(row["calibration_slope"], b, tol=1e-3)
    close(row["calibration_intercept"], mz - b * mx, tol=1e-3)
    assert (row["n_bins"], row["n_test"]) == (len(x), w.sum())


def test_calibration_curve(ops, duck):
    rows = ops("stats-calibration-curve")
    df = duck.execute(
        "SELECT value AS score,"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y"
        " FROM events"
    ).df()
    s = df.score.to_numpy(float)
    y = df.y.to_numpy(float)
    conf = (s - s.min()) / (s.max() - s.min())
    b = np.minimum(9, np.floor(conf * 10)).astype(int)
    tn = float(len(conf))
    ece = 0.0
    golden = {}
    for bb in np.unique(b):
        sel = b == bb
        mc, orr, n = conf[sel].mean(), y[sel].mean(), float(sel.sum())
        ece += abs(orr - mc) * n / tn
        golden[int(bb)] = (mc, orr, n)
    assert len(rows) == len(golden)
    for r in rows:
        mc, orr, n = golden[r["bin"]]
        close(r["mean_confidence"], mc)
        close(r["observed_rate"], orr)
        close(r["ece"], ece)
        assert r["n"] == n


def _daily_value_means(duck):
    return duck.execute(
        "SELECT CAST(ts AS DATE) AS day, avg(value) AS x"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df().x.to_numpy(float)


def test_kpss_level(ops, duck):
    (row,) = ops("timeseries-kpss-level")
    x = _daily_value_means(duck)
    n = len(x)
    e = x - x.mean()
    s_t = np.cumsum(e)
    eta = (s_t**2).sum() / (n * n * (e**2).mean())
    close(row["kpss_stat"], eta)
    assert row["n_days"] == n
    assert row["reject_level_stationarity_5pct"] == int(eta > 0.463)


def test_variance_ratio(ops, duck):
    (row,) = ops("timeseries-variance-ratio")
    x = _daily_counts(duck)
    r1 = np.log(x[1:] / x[:-1])
    r5 = np.log(x[5:] / x[:-5])
    vr = r5.var(ddof=1) / (5 * r1.var(ddof=1))
    close(row["var_1d"], r1.var(ddof=1))
    close(row["var_5d"], r5.var(ddof=1))
    close(row["variance_ratio"], vr)
    close(row["z_approx"], (vr - 1) * math.sqrt(len(r5) * 5.0 / 8))
    assert row["n_returns"] == len(r1)


def test_acf_pacf(ops, duck):
    (row,) = ops("timeseries-acf-pacf")
    x = _daily_value_means(duck)
    m = x.mean()
    e = x - m
    denom = (e**2).sum()
    r = [np.dot(e[k:], e[:-k]) / denom for k in (1, 2, 3)]
    close(row["acf1"], r[0])
    close(row["acf2"], r[1])
    close(row["acf3"], r[2])
    # Durbin-Levinson
    p22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    p21 = r[0] * (1 - p22)
    p33 = (r[2] - p21 * r[1] - p22 * r[0]) / (1 - p21 * r[0] - p22 * r[1])
    close(row["pacf1"], r[0])
    close(row["pacf2"], p22)
    close(row["pacf3"], p33, tol=1e-3)


def test_trimmed_mean(ops, duck):
    rows = {r["event_type"]: r for r in ops("agg-trimmed-mean")}
    df = duck.execute("SELECT event_type, value FROM events").df()
    for et, g in df.groupby("event_type").value:
        v = g.to_numpy(float)
        p10, p90 = np.quantile(v, 0.1), np.quantile(v, 0.9)
        kept = v[(v >= p10) & (v <= p90)]
        r = rows[et]
        close(r["trimmed_mean"], kept.mean())
        close(r["p10"], p10)
        close(r["p90"], p90)
        assert r["n_kept"] == len(kept)


def test_median_of_means(ops, duck):
    (row,) = ops("agg-median-of-means")
    df = duck.execute("SELECT event_id, value FROM events").df()
    grp = (df.event_id.to_numpy("int64") * 2654435761 % 2147483648) % 10
    means = np.array(
        [df.value[grp == g].mean() for g in np.unique(grp)]
    )
    close(row["median_of_means"], np.quantile(means, 0.5))
    close(row["plain_mean"], df.value.mean())
    assert (row["n_groups"], row["n_rows"]) == (len(means), len(df))


def test_power_mean(ops, duck):
    (row,) = ops("stats-power-mean")
    v = duck.execute("SELECT value FROM events").df().value.to_numpy(float)
    mu, var = v.mean(), v.var(ddof=1)
    delta = mu * 0.05
    z = 1.959964 + 0.841621
    close(row["baseline_mean"], mu)
    close(row["baseline_sd"], math.sqrt(var))
    assert row["n_per_variant"] == math.ceil(2 * z * z * var / delta**2)


def test_lorenz_asymmetry(ops, duck):
    (row,) = ops("stats-lorenz-asymmetry")
    r = duck.execute(
        "SELECT sum(o_totalprice) AS r FROM orders GROUP BY o_custkey"
    ).df().r.to_numpy(float)
    mu = r.mean()
    f = (r < mu).mean()
    l = r[r < mu].sum() / r.sum()
    close(row["f_below_mean"], f)
    close(row["share_below_mean"], l)
    close(row["lorenz_asymmetry_s"], f + l)
    assert row["n_customers"] == len(r)


def test_overdispersion(ops, duck):
    (row,) = ops("stats-overdispersion")
    k = duck.execute(
        "SELECT CAST(count(*) AS DOUBLE) AS k FROM events GROUP BY user_id"
    ).df().k.to_numpy(float)
    mu, v = k.mean(), k.var(ddof=1)
    close(row["mean_events"], mu)
    close(row["dispersion_index"], v / mu)
    close(row["nb_alpha"], (v - mu) / (mu * mu))
    close(row["poisson_chi2"], (len(k) - 1) * v / mu, tol=1e-3)
    assert row["n_users"] == len(k)


def test_ks_exact_daily(ops, duck):
    (row,) = ops("stats-ks-exact-daily")
    df = _daily_means(duck, ("click", "view"))
    a = np.sort(df.m[df.event_type == "click"].to_numpy(float))
    b = np.sort(df.m[df.event_type == "view"].to_numpy(float))
    # exact two-sample KS via merged grid
    grid = np.sort(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(f1 - f2).max()
    close(row["ks_d"], d)
    close(
        row["ks_stat_scaled"],
        d * math.sqrt(len(a) * len(b) / (len(a) + len(b))),
    )
    assert (row["n1"], row["n2"]) == (len(a), len(b))


def test_uniformity_hours(ops, duck):
    (row,) = ops("stats-uniformity-hours")
    df = duck.execute(
        "SELECT extract(hour FROM ts) AS hr, count(*) AS c"
        " FROM events GROUP BY 1"
    ).df()
    c = df.c.to_numpy(float)
    n = c.sum()
    e = n / 24
    close(row["chi2_uniform"], ((c - e) ** 2 / e).sum(), tol=1e-3)
    close(row["peak_to_trough"], c.max() / c.min())
    assert (row["n_events"], row["n_hours_present"]) == (n, len(c))


def test_spectral_entropy(ops, duck):
    (row,) = ops("timeseries-spectral-entropy")
    x = _daily_counts(duck)
    n = float(len(x))
    xc = x - x.mean()
    t = np.arange(len(x), dtype=float)
    p = np.array([
        (xc * np.cos(2 * math.pi * k * t / n)).sum() ** 2
        + (xc * np.sin(2 * math.pi * k * t / n)).sum() ** 2
        for k in range(1, 11)
    ])
    q = p / p.sum()
    se = -(q[q > 0] * np.log(q[q > 0])).sum()
    close(row["spectral_entropy"], se)
    close(row["normalized_se"], se / math.log(10))
    close(row["peak_share"], q.max())
    assert row["n_freqs"] == 10


def test_ancova(ops, duck):
    rows = {r["grp"]: r for r in ops("stats-ancova")}
    df = duck.execute(
        "SELECT event_type AS g, CAST(extract(hour FROM ts) AS DOUBLE) AS x,"
        " value AS y FROM events"
    ).df()
    sxx_w = sxy_w = syy_w = 0.0
    per = {}
    for g, s in df.groupby("g"):
        x, y = s.x.to_numpy(float), s.y.to_numpy(float)
        per[g] = (len(x), x.mean(), y.mean())
        sxx_w += ((x - x.mean()) ** 2).sum()
        sxy_w += ((x - x.mean()) * (y - y.mean())).sum()
        syy_w += ((y - y.mean()) ** 2).sum()
    xt, yt = df.x.to_numpy(float), df.y.to_numpy(float)
    n, k = float(len(xt)), float(len(per))
    xbar = xt.mean()
    b_w = sxy_w / sxx_w
    sse_full = syy_w - sxy_w**2 / sxx_w
    sxx_t = ((xt - xt.mean()) ** 2).sum()
    sxy_t = ((xt - xt.mean()) * (yt - yt.mean())).sum()
    syy_t = ((yt - yt.mean()) ** 2).sum()
    sse_red = syy_t - sxy_t**2 / sxx_t
    f_group = ((sse_red - sse_full) / (k - 1)) / (sse_full / (n - k - 1))
    for g, (ng, xg, yg) in per.items():
        r = rows[g]
        close(r["raw_mean"], yg)
        close(r["adjusted_mean"], yg - b_w * (xg - xbar))
        close(r["common_slope"], b_w)
        close(r["f_group"], f_group, tol=1e-3)
        assert r["n"] == ng


def test_chow(ops, duck):
    (row,) = ops("stats-chow-test")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    t = np.array([(d - df.d.iloc[0]).days for d in df.d], float)
    y = df.y.to_numpy(float)
    t0 = (df.d.iloc[-1] - df.d.iloc[0]).days // 2

    def sse(tt, yy):
        X = np.column_stack([np.ones_like(tt), tt])
        b, *_ = np.linalg.lstsq(X, yy, rcond=None)
        return ((yy - X @ b) ** 2).sum()

    pre, post = t < t0, t >= t0
    sse_p = sse(t, y)
    sse_s = sse(t[pre], y[pre]) + sse(t[post], y[post])
    n = float(len(y))
    f = ((sse_p - sse_s) / 2) / (sse_s / (n - 4))
    close(row["sse_pooled"], sse_p, tol=1e-3)
    close(row["sse_split"], sse_s, tol=1e-3)
    close(row["chow_f"], f, tol=1e-3)
    assert (row["n_pre"], row["n_post"]) == (pre.sum(), post.sum())


def test_cramers_v_bergsma(ops, duck):
    """The op whose r4 bias-correction bug motivated this module:
    Bergsma (2013) r~ = r - (r-1)^2/(N-1), denominator min(r~-1, c~-1)."""
    (row,) = ops("stats-cramers-v")
    df = duck.execute(
        "SELECT o_orderstatus AS s, o_orderpriority AS p FROM orders"
    ).df()
    tab = df.groupby(["s", "p"]).size().unstack(fill_value=0)
    obs = tab.to_numpy(float)
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    r, c = obs.shape
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1)))
    phi2p = max(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
    rt = r - (r - 1) ** 2 / (n - 1)
    ct = c - (c - 1) ** 2 / (n - 1)
    vp = math.sqrt(phi2p / min(rt - 1, ct - 1))
    close(row["chi2"], chi2, tol=1e-3)
    close(row["cramers_v"], v)
    close(row["cramers_v_corrected"], vp)
    assert row["n_rows"] == n


def test_poisson_two_rate(ops, duck):
    (row,) = ops("stats-poisson-two-rate")
    df = duck.execute(
        "SELECT event_type, CAST(ts AS DATE) AS d FROM events"
        " WHERE event_type IN ('click','purchase')"
    ).df()
    k1 = float((df.event_type == "click").sum())
    k2 = float((df.event_type == "purchase").sum())
    t = df.d.nunique()
    close(row["rate1"], k1 / t)
    close(row["rate2"], k2 / t)
    close(row["z_unconditional"], (k1 - k2) / math.sqrt(k1 + k2))
    close(
        row["z_conditional"],
        (k1 / (k1 + k2) - 0.5) / math.sqrt(0.25 / (k1 + k2)),
    )
    assert (row["k1"], row["k2"], row["t_days"]) == (k1, k2, t)


def test_runs_median(ops, duck):
    (row,) = ops("stats-runs-median")
    x = _daily_counts(duck)
    md = np.quantile(x, 0.5)
    sides = [1 if v > md else 0 for v in x if v != md]
    n1 = float(sum(sides))
    n2 = float(len(sides) - sum(sides))
    r = 1 + sum(1 for a, b in zip(sides, sides[1:]) if a != b)
    e_r = 2 * n1 * n2 / (n1 + n2) + 1
    var_r = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (row["n_above"], row["n_below"], row["n_runs"]) == (n1, n2, r)
    close(row["z"], (r - e_r) / math.sqrt(var_r))


def test_periodogram(ops, duck):
    rows = {r["k"]: r for r in ops("timeseries-periodogram")}
    x = _daily_counts(duck)
    n = float(len(x))
    xc = x - x.mean()
    t = np.arange(len(x), dtype=float)
    for k in range(1, 11):
        p = (
            (xc * np.cos(2 * math.pi * k * t / n)).sum() ** 2
            + (xc * np.sin(2 * math.pi * k * t / n)).sum() ** 2
        ) / n**2
        close(rows[k]["power_norm"], p)
        close(rows[k]["period_days"], n / k, tol=1e-3)


def test_dfa(ops, duck):
    (row,) = ops("timeseries-dfa")
    x = _daily_value_means(duck)
    y = np.cumsum(x - x.mean())
    fs = {}
    for s in (5, 10):
        res = []
        for box in range(len(y) // s):
            seg = y[box * s:(box + 1) * s]
            i = np.arange(s, dtype=float)
            X = np.column_stack([np.ones(s), i])
            b, *_ = np.linalg.lstsq(X, seg, rcond=None)
            res.append(((seg - X @ b) ** 2).mean())
        fs[s] = math.sqrt(np.mean(res))
    close(row["f_s5"], fs[5], tol=1e-3)
    close(row["f_s10"], fs[10], tol=1e-3)
    close(
        row["dfa_alpha"],
        (math.log(fs[10]) - math.log(fs[5])) / (math.log(10) - math.log(5)),
        tol=1e-3,
    )


def test_pettitt(ops, duck):
    (row,) = ops("timeseries-pettitt")
    x = _daily_value_means(duck)
    n = len(x)
    # mid-ranks
    order = np.argsort(x)
    r = np.empty(n)
    r[order] = np.arange(1, n + 1)
    # Pettitt U_t via rank cumsum (continuous values: no ties expected)
    u = 2 * np.cumsum(r) - np.arange(1, n + 1) * (n + 1.0)
    k_idx = int(np.argmax(np.abs(u[: n - 1])))
    k = abs(u[k_idx])
    close(row["k_stat"], k, tol=1e-3)
    close(
        row["p_approx"],
        2 * math.exp(-6 * k * k / (float(n) ** 3 + float(n) ** 2)),
    )
    assert row["n_days"] == n


def test_cusum(ops, duck):
    rows = ops("timeseries-cusum")
    df = duck.execute(
        "SELECT event_type, CAST(ts AS DATE) AS day,"
        " CAST(round(sum(value) * 100) AS BIGINT) AS v"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    got = {(r["event_type"], str(r["day"])[:10]): r["cusum"] for r in rows}
    for et, g in df.groupby("event_type"):
        v = g.v.to_numpy("int64")
        mu = int(round(v.astype(float).mean()))
        cs = np.cumsum(v - mu)
        for day, c in zip(g.day, cs):
            close(got[(et, str(day)[:10])], c / 100.0, tol=1e-6)


def test_page_hinkley(ops, duck):
    (row,) = ops("timeseries-page-hinkley")
    x = _daily_value_means(duck)
    m_t = 0.0
    m_min = 0.0
    max_ph = 0.0
    alarms = 0
    first = None
    days = duck.execute(
        "SELECT CAST(ts AS DATE) AS day FROM events GROUP BY 1 ORDER BY 1"
    ).df().day
    running_sum = 0.0
    for i, v in enumerate(x):
        running_sum += v
        xbar = running_sum / (i + 1)
        m_t += v - xbar - 0.005
        m_min = min(m_min, m_t)
        ph = m_t - m_min
        max_ph = max(max_ph, ph)
        if ph > 5.0:
            alarms += 1
            if first is None:
                first = days.iloc[i]
    close(row["max_ph"], max_ph, tol=1e-3)
    assert row["n_alarm_days"] == alarms
    if first is not None:
        assert str(row["first_alarm_day"])[:10] == str(first)[:10]
    assert row["n_days"] == len(x)


def test_seasonality_strength(ops, duck):
    (row,) = ops("timeseries-seasonality-strength")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x,"
        " (isodow(CAST(ts AS DATE)) - 1) % 7 AS dow"
        " FROM events GROUP BY 1, 3 ORDER BY 1"
    ).df()
    x = df.x.to_numpy(float)
    n = len(x)
    trend = np.full(n, np.nan)
    for i in range(3, n - 3):
        trend[i] = x[i - 3:i + 4].mean()
    dt = x - trend
    dow = df.dow.to_numpy(int)
    sraw = np.array([np.nanmean(dt[dow == d]) for d in range(7)])
    # op normalizes by the mean of per-ROW seasonal_raw (not per-dow)
    per_row_raw = sraw[dow]
    seasonal_rows = per_row_raw - per_row_raw.mean()
    keep = ~np.isnan(trend)
    detr = dt[keep]
    resid = (dt - seasonal_rows)[keep]
    vs_d = detr.var(ddof=1)
    vs_r = resid.var(ddof=1)
    close(row["var_detrended"], vs_d, tol=1e-3)
    close(row["var_residual"], vs_r, tol=1e-3)
    close(row["seasonality_strength"], max(0.0, 1 - vs_r / vs_d), tol=1e-3)
    assert row["n_days"] == keep.sum()


def test_harmonic_fit(ops, duck):
    (row,) = ops("timeseries-harmonic-fit")
    x = _daily_value_means(duck)
    n = float(len(x))
    mu = x.mean()
    t = np.arange(len(x), dtype=float)
    best = None
    sst = ((x - mu) ** 2).sum()
    for k in range(1, 11):
        a = 2.0 / n * ((x - mu) * np.cos(2 * math.pi * k * t / n)).sum()
        b = 2.0 / n * ((x - mu) * np.sin(2 * math.pi * k * t / n)).sum()
        p = a * a + b * b
        if best is None or p > best[0] + 1e-15:
            best = (p, k, a, b)
    p, k, a, b = best
    close(row["amplitude"], math.sqrt(p))
    close(row["phase"], math.atan2(b, a), tol=1e-3)
    assert row["dominant_k"] == k
    close(row["period_days"], n / k, tol=1e-3)
    # harmonic R^2 = n(a^2+b^2)/2 / SST
    close(row["r2_explained"], n * p / 2 / sst, tol=1e-3)


def _daily_counts_dates(duck):
    return duck.execute(
        "SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()


def test_seasonal_mann_kendall(ops, duck):
    (row,) = ops("timeseries-seasonal-mann-kendall")
    df = duck.execute(
        "WITH daily AS (SELECT CAST(ts AS DATE) AS d,"
        " CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1)"
        " SELECT dayofweek(d) AS dow,"
        " CAST(date_diff('week', (SELECT min(d) FROM daily), d) AS BIGINT)"
        " AS wk, y FROM daily"
    ).df()
    s = var_s = 0.0
    n_days = 0
    for _, g in df.groupby("dow"):
        g = g.sort_values("wk")
        y = g.y.to_numpy(float)
        ns = float(len(y))
        n_days += len(y)
        for i in range(len(y)):
            for j in range(i + 1, len(y)):
                s += np.sign(y[j] - y[i])
        var_s += ns * (ns - 1) * (2 * ns + 5) / 18.0
    z = (s - np.sign(s)) / math.sqrt(var_s)
    assert (row["n_days"], row["s_stat"]) == (n_days, s)
    close(row["var_s"], var_s, tol=1e-3)
    close(row["z_smk"], z, tol=1e-3)


def test_sen_slope_seasonal(ops, duck):
    (row,) = ops("timeseries-sen-slope-seasonal")
    df = _daily_counts_dates(duck)
    d0 = df.d.iloc[0]
    df["t"] = [(d - d0).days for d in df.d]
    # use duckdb's dayofweek directly to avoid convention mismatch
    df["dow"] = duck.execute(
        "SELECT dayofweek(CAST(ts AS DATE)) AS dow FROM events"
        " GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)"
    ).df().dow.to_numpy()
    slopes = []
    for _, g in df.groupby("dow"):
        t = g.t.to_numpy(float)
        y = g.y.to_numpy(float)
        for i in range(len(t)):
            for j in range(i + 1, len(t)):
                slopes.append((y[j] - y[i]) / (t[j] - t[i]))
    slopes = np.array(slopes)
    close(row["sen_slope_per_day"], np.quantile(slopes, 0.5))
    close(row["slope_p05"], np.quantile(slopes, 0.05))
    close(row["slope_p95"], np.quantile(slopes, 0.95))
    assert row["n_pairs"] == len(slopes)


def test_intervention_its(ops, duck):
    (row,) = ops("timeseries-intervention-its")
    df = _daily_counts_dates(duck)
    d0 = df.d.iloc[0]
    t = np.array([(d - d0).days for d in df.d], float)
    y = df.y.to_numpy(float)
    t0 = (df.d.iloc[-1] - d0).days // 2

    def fit(tt, yy):
        X = np.column_stack([np.ones_like(tt), tt])
        return np.linalg.lstsq(X, yy, rcond=None)[0]

    pre, post = t < t0, t >= t0
    a0, b0 = fit(t[pre], y[pre])
    a1, b1 = fit(t[post], y[post])
    close(row["slope_pre"], b0, tol=1e-3)
    close(row["slope_post"], b1, tol=1e-3)
    close(row["slope_change"], b1 - b0, tol=1e-3)
    close(row["level_jump"], (a1 + b1 * t0) - (a0 + b0 * t0), tol=1e-3)
    assert (row["n_pre"], row["n_post"]) == (pre.sum(), post.sum())


def _two_raters(duck):
    return duck.execute(
        "SELECT CASE WHEN n_chars < 220 THEN 0"
        " WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,"
        " CASE WHEN length(text) - length(replace(text, ' ', '')) < 40"
        "      THEN 0"
        " WHEN length(text) - length(replace(text, ' ', '')) < 70"
        "      THEN 1 ELSE 2 END AS rb"
        " FROM documents"
    ).df()


def test_cohen_kappa_weighted(ops, duck):
    (row,) = ops("stats-cohen-kappa-weighted")
    df = _two_raters(duck)
    tab = np.zeros((3, 3))
    for a, b in zip(df.ra, df.rb):
        tab[a, b] += 1
    n = tab.sum()
    o = tab / n
    pr = tab.sum(1) / n
    pc = tab.sum(0) / n
    i, j = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    v = (i - j) ** 2 / 4.0
    kappa_w = 1 - (v * o).sum() / (v * np.outer(pr, pc)).sum()
    close(row["kappa_w"], kappa_w)
    close(row["raw_agreement"], np.trace(tab) / n)
    assert row["n_docs"] == n


def test_bowker_symmetry(ops, duck):
    (row,) = ops("stats-bowker-symmetry")
    df = _two_raters(duck)
    tab = np.zeros((3, 3))
    for a, b in zip(df.ra, df.rb):
        tab[a, b] += 1
    chi2 = 0.0
    dof = 0
    disc = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            nij, nji = tab[i, j], tab[j, i]
            if nij + nji > 0:
                chi2 += (nij - nji) ** 2 / (nij + nji)
                dof += 1
                disc += nij + nji
    close(row["bowker_chi2"], chi2)
    close(row["frac_discordant"], disc / tab.sum())
    assert (row["n_docs"], row["dof"]) == (tab.sum(), dof)


def test_friedman_nemenyi(ops, duck):
    rows = {
        (r["type_a"], r["type_b"]): r for r in ops("stats-friedman-nemenyi")
    }
    df = _daily_means(duck)
    piv = df.pivot(index="day", columns="event_type", values="m").dropna()
    x = piv.to_numpy(float)
    n, k = map(float, x.shape)
    r = x.argsort(1).argsort(1) + 1.0
    rbar = dict(zip(piv.columns, r.mean(0)))
    se = math.sqrt(k * (k + 1) / (6 * n))
    for (ta, tb), rr in rows.items():
        q = abs(rbar[ta] - rbar[tb]) / se
        close(rr["rank_a"], rbar[ta])
        close(rr["rank_b"], rbar[tb])
        close(rr["nemenyi_q"], q, tol=1e-3)
        close(rr["q_range_scale"], q * math.sqrt(2), tol=1e-3)


def test_fleiss_kappa(ops, duck):
    (row,) = ops("eval-fleiss-kappa")
    from transit_scrape_spark.operators.dedup import sql_string_hash

    h1 = sql_string_hash(
        "CAST(e.event_id AS VARCHAR) || ':' || CAST(t.r AS VARCHAR)"
        " || ':fleiss-salt-r5'"
    )
    h2 = sql_string_hash(
        "CAST(e.event_id AS VARCHAR) || ':n:' || CAST(t.r AS VARCHAR)"
        " || ':fleiss-salt-r5'"
    )
    df = duck.execute(
        f"SELECT e.event_id,"
        f" CASE WHEN ({h1}) % 4 = 0"
        f"  THEN (least(CAST(floor(e.value / 34) AS BIGINT), 2) + 1"
        f"        + ({h2}) % 2) % 3"
        f"  ELSE least(CAST(floor(e.value / 34) AS BIGINT), 2) END AS cat"
        f" FROM events e CROSS JOIN (SELECT unnest(range(3)) AS r) t"
    ).df()
    # per-subject agreement P_i with n=3 raters
    pis = []
    nj = np.zeros(3)
    for _, g in df.groupby("event_id").cat:
        counts = np.bincount(g.to_numpy(int), minlength=3).astype(float)
        nj += counts
        pis.append(((counts**2).sum() - 3) / (3 * 2))
    p_bar = float(np.mean(pis))
    pj = nj / nj.sum()
    p_e = float((pj**2).sum())
    close(row["p_bar"], p_bar)
    close(row["p_e"], p_e)
    close(row["fleiss_kappa"], (p_bar - p_e) / (1 - p_e))
    assert row["n_subjects"] == len(pis)


def test_vif_collinearity(ops, duck):
    rows = {r["feature"]: r for r in ops("ml-vif-collinearity")}
    df = duck.execute(
        "SELECT ln(1 + count(*)) AS x1, avg(value) AS x2,"
        " ln(1 + sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END))"
        " AS x3 FROM events GROUP BY user_id"
    ).df()
    X = df[["x1", "x2", "x3"]].to_numpy(float)
    names = ["x1_log_events", "x2_mean_value", "x3_log_purchases"]
    # VIF via direct OLS of each feature on the other two
    for i, name in enumerate(names):
        y = X[:, i]
        others = X[:, [j for j in range(3) if j != i]]
        A = np.column_stack([np.ones(len(y)), others])
        b, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = y - A @ b
        r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
        close(rows[name]["vif"], 1 / (1 - r2), tol=1e-3)
        assert rows[name]["n_users"] == len(y)


def test_uplift_by_segment(ops, duck):
    rows = {r["segment"]: r for r in ops("ml-uplift-by-segment")}
    df = duck.execute(
        "SELECT count(*) AS n,"
        " max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS tr,"
        " max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS conv"
        " FROM events GROUP BY user_id"
    ).df()
    seg = np.where(df.n < 50, "low", np.where(df.n < 80, "mid", "high"))
    for s in np.unique(seg):
        sel = df[seg == s]
        t = sel[sel.tr == 1]
        c = sel[sel.tr == 0]
        r = rows[s]
        assert (r["n_treated"], r["n_control"]) == (len(t), len(c))
        pt = t.conv.mean() if len(t) else None
        pc = c.conv.mean() if len(c) else None
        if pt is not None:
            close(r["conv_treated"], pt)
        if pc is not None:
            close(r["conv_control"], pc)
        if pt is not None and pc is not None:
            close(r["uplift"], pt - pc)


def test_cost_threshold(ops, duck):
    rows = {r["fn_cost"]: r for r in ops("ml-cost-threshold")}
    df = duck.execute(
        "SELECT round(value, 1) AS s,"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y"
        " FROM events"
    ).df()
    s = df.s.to_numpy(float)
    y = df.y.to_numpy(int)
    thresholds = np.unique(s)
    n = float(len(y))
    for c in (1, 5, 10):
        best = None
        for thr in thresholds:
            pred = s >= thr
            fp = float((pred & (y == 0)).sum())
            fn = float((~pred & (y == 1)).sum())
            cost = (fp + c * fn) / n
            if best is None or (cost, thr) < best:
                best = (cost, thr)
        r = rows[c]
        close(r["expected_cost"], best[0])
        close(r["best_threshold"], best[1], tol=1e-6)


def test_hhi(ops, duck):
    (row,) = ops("analytics-hhi")
    df = duck.execute(
        "SELECT n.n_name, sum(o.o_totalprice) AS r FROM orders o"
        " JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1"
    ).df()
    s = df.r.to_numpy(float)
    s = s / s.sum()
    close(row["hhi"], (s**2).sum() * 10000, tol=1e-3)
    close(row["effective_n"], 1.0 / (s**2).sum(), tol=1e-3)
    close(row["top_share"], s.max())
    assert row["n_nations"] == len(s)


def test_price_elasticity(ops, duck):
    (row,) = ops("analytics-price-elasticity")
    df = duck.execute(
        "SELECT l_partkey, ln(l_extendedprice / l_quantity) AS lp,"
        " ln(l_quantity) AS lq FROM lineitem WHERE l_quantity > 0"
    ).df()
    # within (fixed-effects) estimator via per-part demeaning
    gp = df.groupby("l_partkey")
    dlp = (df.lp - gp.lp.transform("mean")).to_numpy(float)
    dlq = (df.lq - gp.lq.transform("mean")).to_numpy(float)
    sxy = (dlp * dlq).sum()
    sxx = (dlp * dlp).sum()
    syy = (dlq * dlq).sum()
    n = len(dlp)
    close(row["elasticity"], sxy / sxx)
    close(row["r2_within"], sxy * sxy / (sxx * syy))
    close(row["se_naive"],
          math.sqrt((syy - sxy**2 / sxx) / (n - 2) / sxx), tol=1e-3)
    assert row["n_obs"] == n


def test_conversion_ci(ops, duck):
    rows = {str(r["day"])[:10]: r for r in ops("analytics-conversion-ci")}
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " count(DISTINCT user_id) AS n,"
        " count(DISTINCT user_id) FILTER (WHERE event_type='purchase')"
        " AS b FROM events GROUP BY 1"
    ).df()
    z = 1.959964
    for _, g in df.iterrows():
        n, b = float(g.n), float(g.b)
        phat = b / n
        ctr = phat + z * z / (2 * n)
        hw = z * math.sqrt(phat * (1 - phat) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        r = rows[str(g.day)[:10]]
        close(r["conv_rate"], phat)
        close(r["wilson_lo"], (ctr - hw) / denom)
        close(r["wilson_hi"], (ctr + hw) / denom)
        assert (r["active_users"], r["buyers"]) == (n, b)


def test_retention_decay_fit(ops, duck):
    (row,) = ops("analytics-retention-decay-fit")
    df = duck.execute(
        "WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events"
        "           WHERE event_type='purchase'),"
        " firsts AS (SELECT user_id, min(day) AS d0 FROM p GROUP BY 1),"
        " maxd AS (SELECT max(CAST(ts AS DATE)) AS md FROM events)"
        " SELECT DISTINCT p.user_id,"
        " date_diff('day', f.d0, p.day) AS age,"
        " date_diff('day', f.d0, m.md) AS capacity"
        " FROM p JOIN firsts f USING (user_id) CROSS JOIN maxd m"
    ).df()
    caps = df.groupby("user_id").capacity.first()
    pts = []
    for age in sorted(df.age[df.age >= 1].unique()):
        numer = float((df.age == age).sum())
        denom = float((caps >= age).sum())
        if 0 < numer < denom:
            pts.append((math.log(age), math.log(numer / denom)))
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    n = len(lx)
    beta = ((lx * ly).sum() - lx.sum() * ly.sum() / n) / (
        (lx * lx).sum() - lx.sum() ** 2 / n
    )
    icept = (ly.sum() - beta * lx.sum()) / n
    close(row["decay_exponent"], beta, tol=1e-3)
    close(row["day1_retention_fit"], math.exp(icept), tol=1e-3)
    assert row["n_ages"] == n


def test_bass_diffusion(ops, duck):
    (row,) = ops("analytics-bass-diffusion")
    df = duck.execute(
        "SELECT min(CAST(ts AS DATE)) AS d0 FROM events"
        " WHERE event_type='purchase' GROUP BY user_id"
    ).df()
    counts = df.groupby("d0").size().sort_index()
    n_t = counts.to_numpy(float)
    big_n = np.concatenate([[0.0], np.cumsum(n_t)[:-1]])
    # OLS n_t = a + b*N + c*N^2
    X = np.column_stack([np.ones_like(big_n), big_n, big_n**2])
    (a, b, c), *_ = np.linalg.lstsq(X, n_t, rcond=None)
    m_cap = (-b - math.sqrt(b * b - 4 * c * a)) / (2 * c)
    close(row["coef_a"], a, tol=1e-3)
    close(row["coef_b"], b, tol=1e-3)
    close(row["coef_c"], c, tol=1e-3)
    close(row["market_size"], m_cap, tol=1e-3)
    close(row["p_innovation"], a / m_cap, tol=1e-3)
    close(row["q_imitation"], -c * m_cap, tol=1e-3)
    assert row["n_days"] == len(n_t)


def test_adstock_regression(ops, duck):
    (row,) = ops("analytics-adstock-regression")
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day,"
        " sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS x,"
        " sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END) AS y"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).df()
    x = df.x.to_numpy(float)
    y = df.y.to_numpy(float)
    ad = np.array([
        sum(0.6**k * x[i - k] for k in range(8)) for i in range(7, len(x))
    ])
    yy = y[7:]
    X = np.column_stack([np.ones_like(ad), ad])
    (alpha, beta), *_ = np.linalg.lstsq(X, yy, rcond=None)
    resid = yy - (alpha + beta * ad)
    r2 = 1 - (resid**2).sum() / ((yy - yy.mean()) ** 2).sum()
    close(row["beta"], beta, tol=1e-3)
    close(row["alpha"], alpha, tol=1e-3)
    close(row["r2"], r2, tol=1e-3)
    close(row["elasticity_at_mean"], beta * ad.mean() / yy.mean(), tol=1e-3)
    assert row["n_days"] == len(ad)


def test_event_study(ops, duck):
    rows = {r["event_type"]: r for r in ops("analytics-event-study")}
    df = _daily_means(duck)
    t0 = df.day.min() + __import__("datetime").timedelta(days=14)
    lo, hi = t0 - __import__("datetime").timedelta(days=7), t0 + __import__(
        "datetime"
    ).timedelta(days=6)
    for et, g in df.groupby("event_type"):
        g = g[(g.day >= lo) & (g.day <= hi)]
        pre = g.m[g.day < t0].to_numpy(float)
        post = g.m[g.day >= t0].to_numpy(float)
        r = rows[et]
        close(r["lift"], post.mean() - pre.mean())
        close(
            r["t_stat"],
            (post.mean() - pre.mean())
            / math.sqrt(
                pre.var(ddof=1) / len(pre) + post.var(ddof=1) / len(post)
            ),
        )
        assert (r["n_pre"], r["n_post"]) == (len(pre), len(post))


def _transition_counts(duck):
    return duck.execute(
        "WITH seq AS (SELECT event_type AS i,"
        " lead(event_type) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS j FROM events)"
        " SELECT i, j, CAST(count(*) AS DOUBLE) AS n FROM seq"
        " WHERE j IS NOT NULL GROUP BY i, j"
    ).df()


def test_entropy_rate(ops, duck):
    (row,) = ops("event-entropy-rate")
    t = _transition_counts(duck)
    total = t.n.sum()
    h_rate = h0 = 0.0
    for i, g in t.groupby("i"):
        ni = g.n.sum()
        pi = ni / total
        p = g.n.to_numpy(float) / ni
        h_rate += pi * -(p * np.log(p)).sum()
        h0 += -pi * math.log(pi)
    close(row["entropy_marginal"], h0)
    close(row["entropy_rate"], h_rate)
    close(row["predictability_gain"], 1 - h_rate / h0)


def test_markov_stationary(ops, duck):
    rows = {r["state"]: r for r in ops("event-markov-stationary")}
    t = _transition_counts(duck)
    states = sorted(set(t.i))
    idx = {s: k for k, s in enumerate(states)}
    T = np.zeros((len(states), len(states)))
    for _, r in t.iterrows():
        T[idx[r.i], idx[r.j]] = r.n
    T = T / T.sum(1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(4):
        pi = pi @ T
    pi = pi / pi.sum()
    for s in states:
        close(rows[s]["pi_stationary"], pi[idx[s]])


def test_interarrival_burstiness(ops, duck):
    rows = {r["event_type"]: r for r in ops("event-interarrival-burstiness")}
    df = duck.execute(
        "SELECT event_type,"
        " CAST(date_diff('second', lag(ts) OVER (PARTITION BY event_type"
        " ORDER BY ts, event_id), ts) AS DOUBLE) AS g"
        " FROM events ORDER BY event_type, ts, event_id"
    ).df().dropna()
    for et, g in df.groupby("event_type").g:
        v = g.to_numpy(float)
        mu, sd = v.mean(), v.std(ddof=1)
        cv = sd / mu
        mem = np.corrcoef(v[1:], v[:-1])[0, 1]
        r = rows[et]
        close(r["mean_gap_sec"], mu, tol=1e-3)
        close(r["cv"], cv)
        close(r["burstiness"], (cv - 1) / (cv + 1))
        close(r["memory_coef"], mem, tol=1e-3)
        assert r["n_gaps"] == len(v)


def test_stratified_ate(ops, duck):
    (row,) = ops("stats-stratified-ate")
    df = duck.execute(
        "SELECT count(*) AS n,"
        " max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS tr,"
        " sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END) AS y,"
        " user_id"
        " FROM events GROUP BY user_id ORDER BY n, user_id"
    ).df()
    # ANSI ntile(5) over (n_events, user_id) order
    n_rows = len(df)
    k = 5
    q, rem = divmod(n_rows, k)
    sizes = [q + 1 if i < rem else q for i in range(k)]
    strata = np.repeat(np.arange(1, k + 1), sizes)
    num = den = 0.0
    for s in range(1, k + 1):
        sel = df[strata == s]
        t = sel.y[sel.tr == 1]
        c = sel.y[sel.tr == 0]
        if len(t) and len(c):
            num += (t.mean() - c.mean()) * len(sel)
            den += len(sel)
    n_t, n_c = int((df.tr == 1).sum()), int((df.tr == 0).sum())
    if den > 0:
        naive = df.y[df.tr == 1].mean() - df.y[df.tr == 0].mean()
        close(row["ate_naive"], naive, tol=1e-3)
        close(row["ate_stratified"], num / den, tol=1e-3)
        assert (row["n_treated"], row["n_control"]) == (n_t, n_c)
    else:
        # sf0.01 degeneracy: every user signed up, so NO stratum has
        # both arms and the op's both-arms filter empties the summary —
        # the whole row must surface as NULL, not a fabricated effect
        assert n_c == 0
        assert all(
            row[c] is None
            for c in ("n_treated", "n_control", "ate_naive",
                      "ate_stratified")
        )


def test_bic_trend_select(ops, duck):
    (row,) = ops("stats-bic-trend-select")
    y = _daily_value_means(duck)
    n = float(len(y))
    t = np.arange(1, len(y) + 1, dtype=float)

    def rss(design):
        X = np.column_stack([np.ones_like(t)] + design)
        b, *_ = np.linalg.lstsq(X, y, rcond=None)
        return ((y - X @ b) ** 2).sum()

    r0 = ((y - y.mean()) ** 2).sum()
    r1 = rss([t])
    r2 = rss([t, t * t])
    b0 = n * math.log(r0 / n) + 1 * math.log(n)
    b1 = n * math.log(r1 / n) + 2 * math.log(n)
    b2 = n * math.log(r2 / n) + 3 * math.log(n)
    close(row["bic_constant"], b0, tol=1e-3)
    close(row["bic_linear"], b1, tol=1e-3)
    close(row["bic_quadratic"], b2, tol=1e-3)
    want = (
        "constant" if b0 <= min(b1, b2) else "linear" if b1 <= b2
        else "quadratic"
    )
    assert row["best_model"] == want


def test_holt_linear(ops, duck):
    rows = {r["event_type"]: r for r in ops("timeseries-holt-linear")}
    from transit_scrape_spark.queries.timeseries import HOLT_ALPHA, HOLT_BETA

    df = duck.execute(
        "SELECT event_type, CAST(ts AS DATE) AS day,"
        " CAST(count(*) AS DOUBLE) AS y"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    for et, g in df.groupby("event_type"):
        y = g.y.to_numpy(float)
        lvl, tr = y[0], 0.0
        for v in y[1:]:
            new_lvl = HOLT_ALPHA * v + (1 - HOLT_ALPHA) * (lvl + tr)
            tr = HOLT_BETA * (new_lvl - lvl) + (1 - HOLT_BETA) * tr
            lvl = new_lvl
        r = rows[et]
        assert r["level_e6"] == math.floor(lvl * 1e6 + 0.5)
        assert r["trend_e6"] == math.floor(tr * 1e6 + 0.5)
        assert r["forecast_7d_e6"] == math.floor((lvl + 7 * tr) * 1e6 + 0.5)
        assert r["n_days"] == len(y)
