"""Golden cross-checks for the event-sequence family tail and the
remaining simsearch ops (LSH bucket/probe/multiprobe, IVF Lloyd
iterations, recall eval, two-stage rerank). Raw sf0.01 rows via DuckDB;
numpy/Counter recomputation. Third-implementation contract as the
other test_golden_* suites.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"
DIM, N_PLANES = 64, 8


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "embeddings"):
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


def rnd(x, d):
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 10**d + 0.5) / 10**d


@pytest.fixture(scope="module")
def seqs(duck):
    """user_id -> [(ts, event_id, event_type)] ordered by (ts, event_id)."""
    df = duck.execute(
        "SELECT user_id, ts, event_id, event_type FROM events"
        " ORDER BY user_id, ts, event_id"
    ).df()
    out: dict = defaultdict(list)
    for r in df.itertuples():
        out[int(r.user_id)].append((r.ts, int(r.event_id), r.event_type))
    return out


# ---------------------------------------------------------------------------
# event-sequence ops


def test_transition_matrix(ops, seqs):
    cnt: Counter = Counter()
    for evs in seqs.values():
        for a, b in zip(evs, evs[1:]):
            cnt[(a[2], b[2])] += 1
    row_tot: Counter = Counter()
    for (i, _), n in cnt.items():
        row_tot[i] += n
    rows = {(r["from_state"], r["to_state"]): r
            for r in ops("event-transition-matrix")}
    assert set(rows) == set(cnt)
    for k, n in cnt.items():
        assert rows[k]["n"] == n
        close(rows[k]["p"], n / row_tot[k[0]])


def test_path_ngrams(ops, seqs):
    cnt: Counter = Counter()
    for evs in seqs.values():
        for a, b, c in zip(evs, evs[1:], evs[2:]):
            cnt[f"{a[2]} > {b[2]} > {c[2]}"] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["path"], r["n"]) for r in ops("event-path-ngrams")]
    assert got == want


def test_audience_overlap(ops, seqs):
    users: dict = defaultdict(set)
    for uid, evs in seqs.items():
        for _, _, et in evs:
            users[et].add(uid)
    rows = {(r["type_a"], r["type_b"]): r for r in ops("event-audience-overlap")}
    types = sorted(users)
    for x in range(len(types)):
        for y in range(x + 1, len(types)):
            a, b = types[x], types[y]
            both = len(users[a] & users[b])
            if both == 0:
                assert (a, b) not in rows
                continue
            r = rows[(a, b)]
            assert r["n_both"] == both
            close(r["jaccard"], both / len(users[a] | users[b]))


def test_dwell_time(ops, seqs):
    dwells: dict = defaultdict(list)
    for evs in seqs.values():
        for a, b in zip(evs, evs[1:]):
            dt = int(b[0].value // 10**9) - int(a[0].value // 10**9)
            if 1 <= dt <= 1800:
                dwells[a[2]].append(float(dt))
    rows = {r["event_type"]: r for r in ops("event-dwell-time")}
    assert set(rows) == set(dwells)
    for et, ds in dwells.items():
        r = rows[et]
        assert r["n"] == len(ds)
        close(r["p50_sec"], np.percentile(ds, 50, method="linear"), tol=1e-3)
        close(r["p90_sec"], np.percentile(ds, 90, method="linear"), tol=1e-3)
        close(r["mean_sec"], np.mean(ds), tol=1e-3)


def test_next_action_baseline(ops, seqs):
    cnt: Counter = Counter()
    for evs in seqs.values():
        for a, b in zip(evs, evs[1:]):
            cnt[(a[2], b[2])] += 1
    total = sum(cnt.values())
    row_tot: Counter = Counter()
    for (i, _), n in cnt.items():
        row_tot[i] += n
    rows = {r["current_action"]: r for r in ops("event-next-action-baseline")}
    for i in row_tot:
        best = sorted(
            ((j, n) for (ii, j), n in cnt.items() if ii == i),
            key=lambda kv: (-kv[1], kv[0]),
        )[0]
        r = rows[i]
        assert r["predicted_next"] == best[0]
        close(r["hit_rate"], best[1] / row_tot[i])
        close(r["support"], row_tot[i] / total)


def test_hour_dow_heatmap(ops, duck):
    df = duck.execute(
        "SELECT CAST(ts AS DATE) AS day, extract(hour FROM ts) AS hr"
        " FROM events"
    ).df()
    cnt: Counter = Counter()
    for r in df.itertuples():
        d = r.day.weekday() if hasattr(r.day, "weekday") else r.day.weekday()
        cnt[(d, int(r.hr))] += 1
    c = np.array(list(cnt.values()), dtype=float)
    mu, sd, tot = c.mean(), c.std(ddof=1), c.sum()
    rows = {(r["dow"], r["hr"]): r for r in ops("event-hour-dow-heatmap")}
    assert set(rows) == set(cnt)
    for k, n in cnt.items():
        r = rows[k]
        assert r["n_events"] == n
        close(r["share"], n / tot)
        close(r["cell_z"], (n - mu) / sd, tol=1e-3)


def test_cooccurrence_lift(ops, duck):
    df = duck.execute(
        "SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type"
        " FROM events"
    ).df()
    ud: dict = defaultdict(set)
    for r in df.itertuples():
        ud[(int(r.user_id), r.day)].add(r.event_type)
    n_cells = len(ud)
    marg: Counter = Counter()
    pairs: Counter = Counter()
    for types in ud.values():
        ts = sorted(types)
        marg.update(ts)
        for x in range(len(ts)):
            for y in range(x + 1, len(ts)):
                pairs[(ts[x], ts[y])] += 1
    rows = {(r["type_a"], r["type_b"]): r
            for r in ops("event-cooccurrence-lift")}
    assert set(rows) == set(pairs)
    for (a, b), n in pairs.items():
        r = rows[(a, b)]
        assert r["n_both"] == n
        close(r["lift"], n * n_cells / (marg[a] * marg[b]))
        close(r["jaccard"], n / (marg[a] + marg[b] - n))


def test_session_depth_histogram(ops, seqs):
    depths = []
    for evs in seqs.values():
        depth = 0
        prev_ts = None
        for ts, _, _ in evs:
            if prev_ts is not None and (ts - prev_ts).total_seconds() > 1800:
                depths.append(depth)
                depth = 0
            depth += 1
            prev_ts = ts
        depths.append(depth)
    cells: dict = defaultdict(lambda: [0, 0])
    for d in depths:
        b = "1" if d == 1 else "2-3" if d <= 3 else "4-7" if d <= 7 else "8+"
        cells[b][0] += 1
        cells[b][1] += d
    rows = {r["depth_bucket"]: r for r in ops("event-session-depth-histogram")}
    assert set(rows) == set(cells)
    for b, (ns, ne) in cells.items():
        r = rows[b]
        assert (r["n_sessions"], r["n_events"]) == (ns, ne)
        close(r["mean_depth"], ne / ns)


# ---------------------------------------------------------------------------
# simsearch remainder (sign-LSH / IVF)


@pytest.fixture(scope="module")
def vecs(duck):
    df = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).df()
    ids = df.vec_id.astype(int).tolist()
    V = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64)
         for v in df.embedding]
    )
    return ids, V


def _buckets(V):
    planes = np.array(
        [
            [((1103515245 * (k * DIM + i) + 12345) % 2001) - 1000
             for i in range(DIM)]
            for k in range(N_PLANES)
        ],
        dtype=float,
    )
    return (((V @ planes.T) > 0) << np.arange(N_PLANES)).sum(1)


def _cos(a, b):
    return float(a @ b) / (math.sqrt(a @ a) * math.sqrt(b @ b))


def test_lsh_bucket(ops, vecs):
    _, V = vecs
    cnt = Counter(int(b) for b in _buckets(V))
    rows = {r["bucket"]: r["n_vectors"] for r in ops("simsearch-lsh-bucket")}
    assert rows == dict(cnt)


def test_lsh_probe(ops, vecs):
    ids, V = vecs
    b = _buckets(V)
    byid = {i: k for k, i in enumerate(ids)}
    qb = b[byid[1]]
    q = V[byid[1]]
    cands = sorted(
        (-rnd(_cos(V[k], q), 6), int(i))
        for k, i in enumerate(ids)
        if b[k] == qb and i != 1
    )[:5]
    got = [(r["vec_id"], r["sim"]) for r in ops("simsearch-lsh-probe")]
    assert got == [(i, -s) for s, i in cands]


def test_lsh_multiprobe(ops, vecs):
    ids, V = vecs
    b = _buckets(V)
    byid = {i: k for k, i in enumerate(ids)}
    qb = int(b[byid[1]])
    probes = {qb} | {qb ^ (1 << k) for k in range(N_PLANES)}
    q = V[byid[1]]
    cands = sorted(
        (-rnd(_cos(V[k], q), 6), int(i))
        for k, i in enumerate(ids)
        if int(b[k]) in probes and i != 1
    )[:5]
    got = [(r["vec_id"], r["sim"]) for r in ops("simsearch-lsh-multiprobe")]
    assert got == [(i, -s) for s, i in cands]


def test_recall_eval(ops, vecs):
    ids, V = vecs
    b = _buckets(V)
    byid = {i: k for k, i in enumerate(ids)}
    rows = {r["q_id"]: r for r in ops("simsearch-recall-eval")}
    for qid in range(0, 6):
        if qid not in byid:
            continue
        q, qb = V[byid[qid]], b[byid[qid]]
        scored = [
            (-rnd(_cos(V[k], q), 6), int(i), b[k] == qb)
            for k, i in enumerate(ids)
            if i != qid
        ]
        exact = {i for _, i, _ in sorted(scored)[:10]}
        cand = {i for _, i, inb in scored if inb}
        r = rows[qid]
        assert r["n_candidates"] == len(cand)
        assert r["n_hits"] == len(exact & cand)
        close(r["recall_at_10"], len(exact & cand) / 10, tol=1e-2)


def test_two_stage_rerank(ops, vecs):
    ids, V = vecs
    b = _buckets(V)
    byid = {i: k for k, i in enumerate(ids)}
    q, qb = V[byid[1]], b[byid[1]]
    scored = [
        (_cos(V[k], q), int(i), b[k] == qb)
        for k, i in enumerate(ids)
        if i != 1
    ]
    truth = {i for _, i in sorted(((-c, i) for c, i, _ in scored))[:10]}
    cands = [(c, i) for c, i, inb in scored if inb]
    approx = {i for _, i in sorted(((-c, i) for c, i in cands))[:10]}
    (row,) = ops("simsearch-two-stage-rerank")
    assert row["n_candidates"] == len(cands)
    assert row["hits"] == len(truth & approx)
    close(row["recall_at_10"], len(truth & approx) / 10, tol=1e-2)


def test_ivf_probe(ops, vecs):
    ids, V = vecs
    byid = {i: k for k, i in enumerate(ids)}
    cents = [V[byid[c * 7 + 2]].copy() for c in range(8)]

    def assign(cs):
        # F.array_position(dists, array_min): FIRST index achieving the
        # min — ties resolve to the lowest cell id
        d = np.stack([((V - c) ** 2).sum(1) for c in cs], axis=1)
        return d.argmin(1)  # argmin returns first occurrence on ties

    for _ in range(2):
        cells = assign(cents)
        for c in range(8):
            members = V[cells == c]
            if len(members):
                cents[c] = np.array(
                    [rnd(m, 9) for m in members.mean(0)]
                )
    cells = assign(cents)
    qk = byid[1]
    qcell = cells[qk]
    cands = sorted(
        (-rnd(_cos(V[k], V[qk]), 6), int(i))
        for k, i in enumerate(ids)
        if cells[k] == qcell and i != 1
    )[:5]
    got = [(r["vec_id"], r["sim"]) for r in ops("simsearch-ivf-probe")]
    assert got == [(i, -s) for s, i in cands]
