"""Independent pure-Python golden cross-checks for the dedup family
(round-7 continuation of the VERDICT r6 item 1 technique).

The MinHash/SimHash/LSH pipeline is deterministic integer math over
md5-based token hashes (operators/dedup.py documents the constants —
those ARE the spec). These tests rebuild the whole ladder — token hash,
shingle fold, permutation minima, band fold, bit votes, candidate
generation, exact Jaccard verify, survivor clustering — in plain Python
hashlib/sets/union-find over the raw sf0.01 parquet rows, sharing no
Spark expressions and no DuckDB SQL with either engine side.
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
MULT = 1000003
NUM_PERM, BANDS, ROWS = 12, 4, 3


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    con.close()
    return list(zip(df.doc_id.astype(int), df.text))


@pytest.fixture(scope="module")
def corpus(docs):
    """documents + mutated copy (last two tokens dropped, id + 1e6) —
    the corpus construction every minhash op documents."""
    out = list(docs)
    for i, t in docs:
        toks = t.split(" ")
        out.append((i + 1000000, " ".join(toks[: max(len(toks) - 2, 1)])))
    return out


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


def token_hashes(text: str) -> list[int]:
    return [string_hash(t) for t in text.split(" ")]


def shingle_set(th: list[int], k: int = 3) -> set[int]:
    out = set()
    for i in range(len(th) - k + 1):
        h = 0
        for j in range(k):
            h = (h * MULT + th[i + j]) % P
        out.add(h)
    return out


def hash_params(k: int) -> tuple[int, int]:
    a = (2654435761 * (k + 1)) % P
    b = (40503 * (k + 7) + 17) % P
    return (a or 1), b


def signature(sh: set[int]) -> list[int]:
    sig = []
    for k in range(NUM_PERM):
        a, b = hash_params(k)
        sig.append(min((h * a + b) % P for h in sh))
    return sig


def band_keys(sig: list[int], bands: int = BANDS, rows: int = ROWS):
    out = []
    for b in range(bands):
        h = 0
        for r in range(rows):
            h = (h * MULT + sig[b * rows + r]) % P
        out.append((b + 1, h))
    return out


@pytest.fixture(scope="module")
def shingled(corpus):
    return {i: shingle_set(token_hashes(t)) for i, t in corpus}


def _jac(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def _candidates(shingled, bands=BANDS, rows=ROWS):
    buckets: dict = defaultdict(list)
    for i, sh in shingled.items():
        for key in band_keys(signature(sh), bands, rows):
            buckets[key].append(i)
    pairs = set()
    for members in buckets.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                pairs.add((members[x], members[y]))
    return pairs


# ---------------------------------------------------------------------------


def test_minhash_signature(ops, shingled):
    rows = {r["doc_id"]: r["signature"] for r in ops("dedup-minhash-signature")}
    assert set(rows) == set(shingled)
    for i, sh in shingled.items():
        assert rows[i] == "-".join(str(v) for v in signature(sh)), i


def test_near_minhash(ops, shingled):
    want = {}
    for a, b in _candidates(shingled):
        j = _jac(shingled[a], shingled[b])
        if j >= 0.5:
            want[(a, b)] = j
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard_sim"]
            for r in ops("dedup-near-minhash")}
    assert set(rows) == set(want)
    for k, j in want.items():
        close(rows[k], j, tol=1e-5)


def test_ngram_jaccard(ops, shingled):
    rows = {r["doc_id"]: r["jaccard_sim"] for r in ops("dedup-ngram-jaccard")}
    orig_ids = {i for i in shingled if i < 1000000}
    assert set(rows) == orig_ids
    for i in orig_ids:
        close(rows[i], _jac(shingled[i], shingled[i + 1000000]), tol=1e-5)


def test_ngram_containment(ops, shingled):
    rows = {r["doc_id"]: r for r in ops("dedup-ngram-containment")}
    for i in (i for i in shingled if i < 1000000):
        o, m = shingled[i], shingled[i + 1000000]
        inter = len(o & m)
        r = rows[i]
        close(r["containment_in_orig"], inter / len(o), tol=1e-5)
        close(r["containment_in_mut"], inter / len(m), tol=1e-5)
        assert r["orig_is_shorter"] == (len(o) <= len(m))


def test_simhash(ops, corpus):
    def simhash16(text):
        th = token_hashes(text)
        out = 0
        for j in range(16):
            vote = sum(((h >> j) & 1) * 2 - 1 for h in th)
            if vote > 0:
                out |= 1 << j
        return out

    sims = {i: simhash16(t) for i, t in corpus}
    rows = {r["doc_id"]: r for r in ops("dedup-simhash")}
    orig_ids = {i for i in sims if i < 1000000}
    assert set(rows) == orig_ids
    for i in orig_ids:
        r = rows[i]
        assert r["simhash_orig"] == sims[i]
        assert r["simhash_mut"] == sims[i + 1000000]
        assert r["hamming"] == bin(sims[i] ^ sims[i + 1000000]).count("1")


def test_lsh_tuning(ops, shingled, docs):
    rows = {r["config"]: r for r in ops("dedup-lsh-tuning")}
    assert set(rows) == {"6x2", "4x3"}
    for bands, rws in ((6, 2), (4, 3)):
        cands = _candidates(shingled, bands, rws)
        n_true = sum(1 for a, b in cands if b == a + 1000000)
        r = rows[f"{bands}x{rws}"]
        assert r["n_candidates"] == len(cands)
        assert r["n_true"] == n_true
        close(r["precision"], n_true / len(cands))
        close(r["recall"], n_true / len(docs))


def test_minhash_estimation_error(ops, shingled):
    exact, est = [], []
    for i in (i for i in shingled if i < 1000000 and i % 5 == 0):
        o, m = shingled[i], shingled[i + 1000000]
        exact.append(_jac(o, m))
        so, sm = signature(o), signature(m)
        est.append(sum(a == b for a, b in zip(so, sm)) / NUM_PERM)
    err = np.abs(np.array(est) - np.array(exact))
    (row,) = ops("dedup-minhash-estimation-error")
    assert row["n_pairs"] == len(exact)
    close(row["avg_exact"], np.mean(exact))
    close(row["avg_estimate"], np.mean(est))
    close(row["mean_abs_err"], err.mean())
    close(row["max_abs_err"], err.max())


def test_span_coverage(ops, docs):
    spans = {i: shingle_set(token_hashes(t), k=8) for i, t in docs}
    df: Counter = Counter()
    for sh in spans.values():
        for h in sh:
            df[h] += 1
    rows = {r["doc_id"]: r for r in ops("dedup-span-coverage")}
    want_ids = {i for i, sh in spans.items() if sh}
    assert set(rows) == want_ids
    for i in want_ids:
        n = len(spans[i])
        dup = sum(1 for h in spans[i] if df[h] > 1)
        r = rows[i]
        assert (r["n_spans"], r["n_dup_spans"]) == (n, dup)
        close(r["dup_coverage"], dup / n)


def test_shingle_size_sweep(ops, corpus):
    th = {i: token_hashes(t) for i, t in corpus}
    rows = {r["shingle_k"]: r for r in ops("dedup-shingle-size-sweep")}
    for k in (2, 3, 5):
        jacs = [
            _jac(shingle_set(th[i], k), shingle_set(th[i + 1000000], k))
            for i in th
            if i < 1000000
        ]
        r = rows[k]
        assert r["n_pairs"] == len(jacs)
        close(r["mean_jaccard"], np.mean(jacs))
        close(r["min_jaccard"], min(jacs))


def test_weighted_jaccard(ops, corpus):
    tf: dict = defaultdict(Counter)
    for i, t in corpus:
        tf[(i % 1000000, i >= 1000000)].update(t.split(" "))
    rows = {r["doc_id"]: r for r in ops("dedup-weighted-jaccard")}
    keys = {k for k, _ in tf}
    assert set(rows) == keys
    for key in keys:
        o, m = tf[(key, False)], tf[(key, True)]
        union_toks = set(o) | set(m)
        num = sum(min(o[t], m[t]) for t in union_toks)
        den = sum(max(o[t], m[t]) for t in union_toks)
        r = rows[key]
        assert r["n_union_tokens"] == len(union_toks)
        close(r["weighted_jaccard"], num / den)


def test_exact(ops, docs):
    rows = ops("dedup-exact")
    assert len(rows) == len(docs)
    assert {r["doc_id"] for r in rows} == {i for i, _ in docs}


def test_exact_hash(ops, docs):
    want: dict = {}
    for i, t in docs:
        h = hashlib.sha256(t.encode("utf-8")).hexdigest()
        if h in want:
            want[h] = (min(want[h][0], i), want[h][1] + 2)
        else:
            want[h] = (i, 2)  # doubled corpus: each text appears twice
    rows = {r["text_hash"]: r for r in ops("dedup-exact-hash")}
    assert set(rows) == set(want)
    for h, (keep, n) in want.items():
        assert rows[h]["keep_doc_id"] == keep
        assert rows[h]["n_copies"] == n


def test_cluster_keep(ops, shingled, corpus):
    # union-find over verified near-dup pairs; survivor = min id
    parent = {i: i for i, _ in corpus}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _candidates(shingled):
        if _jac(shingled[a], shingled[b]) >= 0.5:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    rows = {r["doc_id"]: r for r in ops("dedup-cluster-keep")}
    assert set(rows) == {i for i, _ in corpus}
    for i, _ in corpus:
        canon = find(i)
        assert rows[i]["canonical_id"] == canon, i
        assert rows[i]["is_kept"] == (canon == i)


# ---------------------------------------------------------------------------
# embedding-space dedup


@pytest.fixture(scope="module")
def vecs():
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).df()
    con.close()
    ids = df.vec_id.astype(int).tolist()
    V = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64)
         for v in df.embedding]
    )
    return ids, V


def _cos(a, b):
    return float(a @ b) / (math.sqrt(a @ a) * math.sqrt(b @ b))


def test_near_embedding(ops, vecs):
    ids, V = vecs
    rows = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in ops("dedup-near-embedding")}
    # doubled corpus: each planted pair is identical -> cosine 1.0
    assert set(rows) == {(i, i + 1000000) for i in ids}
    assert all(v == 1.0 for v in rows.values())


def test_near_embedding_lsh(ops, vecs):
    ids, V = vecs
    DIM, N_PLANES = 64, 8
    planes = np.array(
        [
            [((1103515245 * (k * DIM + i) + 12345) % 2001) - 1000
             for i in range(DIM)]
            for k in range(N_PLANES)
        ],
        dtype=float,
    )
    dots = V @ planes.T  # (n, 8)
    buckets = ((dots > 0) << np.arange(N_PLANES)).sum(1)
    # doubled corpus: (id, vec, bucket) + (id + 1e6, same vec, same bucket)
    entries = [(i, k) for k, i in enumerate(ids)] + [
        (i + 1000000, k) for k, i in enumerate(ids)
    ]
    bybucket: dict = defaultdict(list)
    for i, k in entries:
        bybucket[int(buckets[k])].append((i, k))
    want = {}
    for members in bybucket.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                (ia, ka), (ib, kb) = members[x], members[y]
                c = _cos(V[ka], V[kb])
                if c >= 0.999:
                    want[(ia, ib)] = c
    rows = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in ops("dedup-near-embedding-lsh")}
    assert set(rows) == set(want)
    for k, c in want.items():
        close(rows[k], c, tol=1e-5)
