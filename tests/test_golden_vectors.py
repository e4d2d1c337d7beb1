"""Independent numpy golden cross-checks for the embed/simsearch
families (round-7 continuation of VERDICT r6 item 1's technique).

Raw vectors come straight from the sf0.01 parquet (500 x 64 float32,
widened to float64 exactly as the ops' as_double cast does); every
statistic — cosine rankings, PQ assignment, power iteration, JL
distortion, TwoNN intrinsic dim, hubness skew, greedy MMR — is rebuilt
in plain numpy linear algebra, sharing no SQL and no DataFrame code
with either engine. Ops that round-then-rank replicate Spark's
HALF_UP rounding so tie-breaks agree.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"
DIM = 64


@pytest.fixture(scope="module")
def emb():
    """(ids, V, labels): vec_id array, (n, 64) float64 matrix (widened
    from the stored float32, matching the ops' as_double), labels."""
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SF}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).df()
    con.close()
    ids = df.vec_id.to_numpy()
    V = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for v in df.embedding]
    )
    return ids, V, df.label.to_numpy()


@pytest.fixture(scope="module")
def ops(spark):
    reg = registry()

    def run(op_id):
        return [r.asDict() for r in reg[op_id].fn(spark, SF).collect()]

    return run


def close(got, want, tol=1e-4):
    assert got == pytest.approx(want, rel=tol, abs=tol), (got, want)


def rnd(x, d):
    """Spark/DuckDB ROUND: HALF_UP away from zero (numpy's round is
    banker's — replicating the engines' rule keeps rank tie-breaks on
    rounded values identical)."""
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 10**d + 0.5) / 10**d


def cos(a, b):
    return float(a @ b) / (math.sqrt(a @ a) * math.sqrt(b @ b))


def _by_id(ids, V):
    return {int(i): V[k] for k, i in enumerate(ids)}


# ---------------------------------------------------------------------------
# brute-force similarity search


def test_simsearch_topk(ops, emb):
    ids, V, labels = emb
    q = _by_id(ids, V)[1]
    scored = sorted(
        (
            (-rnd(cos(V[k], q), 6), int(i))
            for k, i in enumerate(ids)
            if i != 1
        ),
    )[:10]
    got = ops("simsearch-topk")
    assert [(r["vec_id"], r["sim"]) for r in got] == [
        (i, -s) for s, i in scored
    ]


def test_simsearch_range(ops, emb):
    ids, V, _ = emb
    q = _by_id(ids, V)[1]
    want = {
        int(i): rnd(cos(V[k], q), 6)
        for k, i in enumerate(ids)
        if i != 1 and cos(V[k], q) >= 0.3
    }
    rows = {r["vec_id"]: r["sim"] for r in ops("simsearch-range")}
    assert rows == want


def test_simsearch_knn_join(ops, emb):
    ids, V, _ = emb
    byid = _by_id(ids, V)
    want = []
    for qid in range(0, 6):  # the op's query side is vec_id <= 5
        if qid not in byid:
            continue
        scored = sorted(
            (-rnd(cos(V[k], byid[qid]), 6), int(i))
            for k, i in enumerate(ids)
            if i != qid
        )[:3]
        want += [(qid, i, -s) for s, i in scored]
    got = sorted(
        (r["q_id"], r["vec_id"], r["sim"]) for r in ops("simsearch-knn-join")
    )
    assert got == sorted(want)


def test_simsearch_batch_topk(ops, emb):
    ids, V, _ = emb
    byid = _by_id(ids, V)
    want = []
    for qid in range(0, 11):
        if qid not in byid:
            continue
        scored = sorted(
            (-rnd(cos(V[k], byid[qid]), 6), int(i))
            for k, i in enumerate(ids)
            if i != qid
        )[:5]
        want += [(qid, i, -s, rk + 1) for rk, (s, i) in enumerate(scored)]
    got = sorted(
        (r["qid"], r["vec_id"], r["sim"], r["rnk"])
        for r in ops("simsearch-batch-topk")
    )
    assert got == sorted(want)


def test_hard_negative_mining(ops, emb):
    ids, V, labels = emb
    lab = {int(i): int(l) for i, l in zip(ids, labels)}
    byid = _by_id(ids, V)
    want = []
    for qid in range(0, 6):
        if qid not in byid:
            continue
        scored = sorted(
            (-rnd(cos(V[k], byid[qid]), 6), int(i))
            for k, i in enumerate(ids)
            if i != qid and lab[int(i)] != lab[qid]
        )[:5]
        want += [(qid, i, lab[qid], lab[i], -s) for s, i in scored]
    got = sorted(
        (r["q_id"], r["neg_id"], r["q_label"], r["neg_label"], r["sim"])
        for r in ops("embed-hard-negative-mining")
    )
    assert got == sorted(want)


def test_matryoshka_recall(ops, emb):
    ids, V, _ = emb
    q = _by_id(ids, V)[1]

    def top10(d):
        return {
            i
            for _, i in sorted(
                (-rnd(cos(V[k][:d], q[:d]), 6), int(i))
                for k, i in enumerate(ids)
                if i != 1
            )[:10]
        }

    overlap = len(top10(DIM) & top10(16))
    (row,) = ops("embed-matryoshka-recall")
    assert row["k"] == 10
    assert row["overlap_n"] == overlap
    close(row["recall_at_10"], overlap / 10)


# ---------------------------------------------------------------------------
# norms / moments / spectra


def test_embed_norms(ops, emb):
    ids, V, labels = emb
    rows = {r["label"]: r for r in ops("embed-norms")}
    for lab in set(labels.tolist()):
        sel = V[labels == lab]
        r = rows[lab]
        assert r["n_vecs"] == len(sel)
        close(r["avg_norm"], np.linalg.norm(sel, axis=1).mean())
        close(r["min_component"], sel.min())
        close(r["max_component"], sel.max())


def test_embed_centroid(ops, emb):
    ids, V, labels = emb
    rows = {r["label"]: r for r in ops("embed-centroid")}
    for lab in set(labels.tolist()):
        sel = V[labels == lab]
        r = rows[lab]
        assert (r["n_vecs"], r["dim"]) == (len(sel), DIM)
        close(r["centroid_norm"], np.linalg.norm(sel.mean(0)))


def test_normalize_arrow(ops, emb):
    ids, V, _ = emb
    rows = {r["vec_id"]: r for r in ops("embed-normalize-arrow")}
    assert set(rows) == {int(i) for i in ids}
    for k, i in enumerate(ids):
        n = np.linalg.norm(V[k])
        close(rows[int(i)]["nrm"], n, tol=1e-5)
        close(rows[int(i)]["first_unit"], V[k][0] / n, tol=1e-5)


def test_covariance_block(ops, emb):
    _, V, _ = emb
    n = len(V)
    rows = {(r["i"], r["j"]): r["cov_e9"] for r in ops("embed-covariance-block")}
    for i in range(8):
        for j in range(i, 8):
            cov = (V[:, i] * V[:, j]).mean() - V[:, i].mean() * V[:, j].mean()
            want = math.floor(cov * 1e9 + 0.5)
            assert abs(rows[(i, j)] - want) <= 2, (i, j)


def test_whitening_diag(ops, emb):
    ids, V, _ = emb
    mu = V[:, :8].mean(0)
    sd = V[:, :8].std(0)  # population
    rows = {r["vec_id"]: r for r in ops("embed-whitening-diag")}
    for k, i in enumerate(ids):
        for d in range(8):
            close(rows[int(i)][f"w{d}"], (V[k, d] - mu[d]) / sd[d], tol=1e-5)


def test_dim_variance_screen(ops, emb):
    _, V, _ = emb
    var = V.var(0)
    order = sorted(range(DIM), key=lambda d: (rnd(var[d], 8), d))
    rank = {d: k + 1 for k, d in enumerate(order)}
    rows = {r["dim"]: r for r in ops("embed-dim-variance-screen")}
    assert set(rows) == set(range(DIM))
    for d in range(DIM):
        close(rows[d]["dim_var"], var[d], tol=1e-6)
        close(rows[d]["dim_mean"], V[:, d].mean(), tol=1e-5)
        assert rows[d]["var_rank"] == rank[d]
        assert rows[d]["is_dead"] == bool(rnd(var[d], 8) < 0.001)


def test_effective_rank(ops, emb):
    _, V, _ = emb
    lam = V.var(0)
    p = lam / lam.sum()
    (row,) = ops("embed-effective-rank")
    assert row["ambient_dim"] == DIM
    close(row["participation_ratio"], lam.sum() ** 2 / (lam * lam).sum())
    close(row["entropy_effective_rank"], math.exp(-(p * np.log(p)).sum()))


def test_power_iteration(ops, emb):
    _, V, _ = emb
    G = (V[:, :8].T @ V[:, :8]) / len(V)
    x = np.full(8, 1 / math.sqrt(8))
    for _ in range(3):
        y = G @ x
        x = y / np.linalg.norm(y)
    ev = x @ G @ x
    rows = {r["dim"]: r for r in ops("embed-power-iteration")}
    assert set(rows) == set(range(8))
    for d in range(8):
        close(rows[d]["loading"], x[d])
        close(rows[d]["eigenvalue"], ev, tol=1e-3)


# ---------------------------------------------------------------------------
# quantization ladder


def test_quantize_int8(ops, emb):
    ids, V, _ = emb
    lo, hi = V.min(0), V.max(0)
    codes = np.floor((V - lo) / (hi - lo) * 254.0) - 127
    dims = np.arange(1, DIM + 1)
    checksums = (codes * dims).sum(1).astype(int)
    rows = {r["vec_id"]: r for r in ops("embed-quantize-int8")}
    assert set(rows) == {int(i) for i in ids}
    for k, i in enumerate(ids):
        assert rows[int(i)]["code_checksum"] == checksums[k], i
        recon = (codes[k] + 127) / 254.0 * (hi - lo) + lo
        ok = bool((np.abs(recon - V[k]) <= (hi - lo) / 254.0 + 1e-9).all())
        assert rows[int(i)]["recon_within_step"] == ok


def _pq_assign(V, ids):
    """4 sub-spaces x 16 dims, codebook = sub-vectors of vec_id < 8."""
    byid = _by_id(ids, V)
    cb = {m: [(c, byid[c][m * 16:(m + 1) * 16]) for c in range(8)]
          for m in range(4)}
    out = {}
    for k, i in enumerate(ids):
        for m in range(4):
            sv = V[k][m * 16:(m + 1) * 16]
            best = min(
                (float(((sv - cv) ** 2).sum()), c) for c, cv in cb[m]
            )
            out[(int(i), m)] = (best[1], best[0])
    return out


def test_pq_codes(ops, emb):
    ids, V, _ = emb
    assign = _pq_assign(V, ids)
    rows = {r["vec_id"]: r for r in ops("embed-pq-codes")}
    assert set(rows) == {int(i) for i in ids}
    for i in rows:
        for m in range(4):
            assert rows[i][f"code_{m}"] == assign[(i, m)][0], (i, m)


def test_pq_adc(ops, emb):
    ids, V, _ = emb
    byid = _by_id(ids, V)
    assign = _pq_assign(V, ids)
    q = byid[1]
    lut = {
        (m, c): float(((byid[c][m * 16:(m + 1) * 16]
                        - q[m * 16:(m + 1) * 16]) ** 2).sum())
        for m in range(4)
        for c in range(8)
    }
    scored = sorted(
        (
            rnd(sum(lut[(m, assign[(int(i), m)][0])] for m in range(4)), 4),
            int(i),
        )
        for i in ids
        if i != 1
    )[:20]
    got = [(r["adc_dist2"], r["vec_id"]) for r in ops("simsearch-pq-adc")]
    assert got == scored


def test_pq_distortion(ops, emb):
    ids, V, _ = emb
    assign = _pq_assign(V, ids)
    rows = {r["subspace"]: r for r in ops("embed-pq-distortion")}
    for m in range(4):
        d2 = np.array([assign[(int(i), m)][1] for i in ids])
        msn = float((V[:, m * 16:(m + 1) * 16] ** 2).sum(1).mean())
        r = rows[m]
        assert r["n_vecs"] == len(ids)
        close(r["mse"], d2.mean())
        close(r["rmse"], math.sqrt(d2.mean()))
        close(r["relative_distortion"], d2.mean() / msn)


def test_binary_hamming(ops, emb):
    ids, V, _ = emb
    bits = (V > 0).astype(np.int64)
    w0 = (bits[:, :32] << np.arange(32)).sum(1)
    w1 = (bits[:, 32:] << np.arange(32)).sum(1)
    byid = {int(i): (w0[k], w1[k]) for k, i in enumerate(ids)}
    q0, q1 = byid[1]
    scored = sorted(
        (
            int(bin(int(w0[k]) ^ int(q0)).count("1")
                + bin(int(w1[k]) ^ int(q1)).count("1")),
            int(i),
        )
        for k, i in enumerate(ids)
        if i != 1
    )[:20]
    got = [(r["hamming"], r["vec_id"]) for r in ops("simsearch-binary-hamming")]
    assert got == scored


# ---------------------------------------------------------------------------
# label-structure diagnostics


def test_outlier_distance(ops, emb):
    _, V, labels = emb
    rows = {r["label"]: r for r in ops("embed-outlier-distance")}
    for lab in set(labels.tolist()):
        sel = V[labels == lab]
        cent = sel.mean(0)
        d = np.linalg.norm(sel - cent, axis=1)
        z = (d - d.mean()) / d.std()
        r = rows[lab]
        assert r["n_vecs"] == len(sel)
        assert r["n_outliers"] == int((z > 2).sum())
        close(r["max_dist"], d.max(), tol=1e-3)


def test_separation_histogram(ops, emb):
    ids, V, labels = emb
    sel = [(int(i), V[k], int(labels[k])) for k, i in enumerate(ids)
           if i % 17 == 0 and i < 3400]
    from collections import defaultdict
    want: dict = defaultdict(int)
    for x in range(len(sel)):
        for y in range(len(sel)):
            ia, va, la = sel[x]
            ib, vb, lb = sel[y]
            if ia >= ib:
                continue
            c = cos(va, vb)
            bucket = min(max(int(math.floor((c + 1.0) / 0.25)), 0), 7)
            want[(la == lb, bucket)] += 1
    rows = {(r["same_label"], r["cos_bucket"]): r["n_pairs"]
            for r in ops("embed-separation-histogram")}
    assert rows == dict(want)


def test_centroid_eval(ops, emb):
    _, V, labels = emb
    labs = sorted(set(labels.tolist()))
    cents = {l: V[labels == l].mean(0) for l in labs}
    correct = 0
    for k in range(len(V)):
        best = max(
            (cos(V[k], cents[l]), -l) for l in labs
        )  # sim desc, label asc tie-break
        correct += int(-best[1] == labels[k])
    (row,) = ops("embed-centroid-eval")
    assert row["n_vectors"] == len(V)
    close(row["accuracy"], correct / len(V))


def test_centroid_margin(ops, emb):
    _, V, labels = emb
    labs = sorted(set(labels.tolist()))
    cents = {l: V[labels == l].mean(0) for l in labs}
    agg: dict = {l: [0, 0, [], []] for l in labs}
    for k in range(len(V)):
        d = sorted(
            (float(((V[k] - cents[l]) ** 2).sum()), l) for l in labs
        )
        pred, d1, d2nd = d[0][1], math.sqrt(d[0][0]), math.sqrt(d[1][0])
        a = agg[int(labels[k])]
        a[0] += 1
        margin = d2nd - d1
        a[2].append(margin)
        if pred == labels[k]:
            a[1] += 1
            a[3].append(margin)
    rows = {r["label"]: r for r in ops("embed-centroid-margin")}
    for l in labs:
        n, nc, margins, cmargins = agg[l]
        r = rows[l]
        assert (r["n_vecs"], r["n_correct"]) == (n, nc)
        close(r["mean_margin"], np.mean(margins), tol=1e-3)
        if cmargins:
            close(r["mean_margin_correct"], np.mean(cmargins), tol=1e-3)
        else:
            assert r["mean_margin_correct"] is None


def test_norm_drift_ks(ops, emb):
    _, V, labels = emb
    nrm = np.linalg.norm(V, axis=1)
    lo, hi = nrm.min(), nrm.max()
    bins = np.minimum(63, np.floor((nrm - lo) / (hi - lo) * 64.0).astype(int))
    is0 = labels == 0
    n0, n1 = int(is0.sum()), int((~is0).sum())
    ks = 0.0
    c0 = c1 = 0
    for b in sorted(set(bins.tolist())):
        c0 += int((is0 & (bins == b)).sum())
        c1 += int((~is0 & (bins == b)).sum())
        ks = max(ks, abs(c0 / n0 - c1 / n1))
    (row,) = ops("embed-norm-drift-ks")
    assert (row["n_label0"], row["n_label1"]) == (n0, n1)
    close(row["norm_ks_d"], ks)


# ---------------------------------------------------------------------------
# manifold / projection diagnostics


def test_intrinsic_dim(ops, emb):
    ids, V, _ = emb
    bb = (V * V).sum(1)
    anchors = [k for k, i in enumerate(ids) if i % 10 == 0 and i < 2000]
    ln_mus = []
    for a in anchors:
        dd = sorted(
            (float(bb[a] - 2 * (V[a] @ V[k]) + bb[k]), int(ids[k]))
            for k in range(len(V))
            if ids[k] != ids[a]
        )
        d1, d2 = dd[0][0], dd[1][0]
        if d1 > 0:
            ln_mus.append(0.5 * math.log(d2 / d1))
    (row,) = ops("embed-intrinsic-dim")
    assert row["n_anchors"] == len(ln_mus)
    close(row["intrinsic_dim"], len(ln_mus) / sum(ln_mus), tol=1e-3)


def test_hubness(ops, emb):
    ids, V, _ = emb
    bb = (V * V).sum(1)
    anchors = [k for k, i in enumerate(ids) if i % 5 == 0 and i < 2000]
    from collections import Counter
    occ = Counter()
    for a in anchors:
        dd = sorted(
            (float(bb[a] - 2 * (V[a] @ V[k]) + bb[k]), int(ids[k]))
            for k in range(len(V))
            if ids[k] != ids[a]
        )[:10]
        for _, bid in dd:
            occ[bid] += 1
    k_occ = np.array(list(occ.values()), dtype=float)
    mu = k_occ.mean()
    m2, m3 = (k_occ**2).mean(), (k_occ**3).mean()
    skew = (m3 - 3 * mu * m2 + 2 * mu**3) / (m2 - mu * mu) ** 1.5
    (row,) = ops("embed-hubness")
    assert row["n_in_some_topk"] == len(k_occ)
    close(row["max_k_occurrence"], k_occ.max())
    close(row["k_skewness"], skew, tol=1e-3)


def test_jl_projection(ops, emb):
    ids, V, _ = emb
    signs = np.array(
        [
            [1 - 2 * (((i * 1103515245 + j * 12345) % 65537) % 2)
             for j in range(16)]
            for i in range(64)
        ],
        dtype=float,
    )
    sel = [(int(i), V[k]) for k, i in enumerate(ids) if i <= 20]
    ratios = []
    for x in range(len(sel)):
        for y in range(x + 1, len(sel)):
            va, vb = sel[x][1], sel[y][1]
            pa, pb = (va @ signs) / 4.0, (vb @ signs) / 4.0
            d2o = float(((va - vb) ** 2).sum())
            if d2o > 0:
                ratios.append(
                    math.sqrt(float(((pa - pb) ** 2).sum())) / math.sqrt(d2o)
                )
    r = np.array(ratios)
    (row,) = ops("embed-jl-projection")
    assert row["n_pairs"] == len(r)
    close(row["mean_ratio"], r.mean())
    close(row["min_ratio"], r.min())
    close(row["max_ratio"], r.max())
    close(row["rms_distortion"], math.sqrt(((r - 1) ** 2).mean()))


def test_mmr_rerank(ops, emb):
    ids, V, _ = emb
    q = _by_id(ids, V)[1]
    lam = 0.7
    pool = sorted(
        ((-rnd(cos(V[k], q), 6), int(i), k) for k, i in enumerate(ids) if i != 1)
    )[:20]
    cand = [(i, -s, V[k]) for s, i, k in pool]  # (cid, simq, vec)
    sims = {
        (a[0], b[0]): rnd(cos(a[2], b[2]), 6)
        for a in cand
        for b in cand
        if a[0] != b[0]
    }
    picks = []
    # step 1: pure relevance argmax
    s1 = max(cand, key=lambda c: (c[1], -c[0]))
    picks.append((1, s1[0], s1[1], s1[1]))
    chosen = [s1[0]]
    for step in (2, 3):
        best = None
        for cid, simq, _ in cand:
            if cid in chosen:
                continue
            pen = max(sims[(cid, p)] for p in chosen)
            score = rnd(lam * simq - (1 - lam) * pen, 7)
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid, simq, score)
        picks.append((step, best[1], best[2], best[3]))
        chosen.append(best[1])
    got = sorted(
        (r["sel_rank"], r["cid"], r["relevance"], r["mmr_score"])
        for r in ops("embed-mmr-rerank")
    )
    assert got == picks
