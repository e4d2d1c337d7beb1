"""Golden cross-checks, dedup family wave 2: the curation-pipeline ops
(decontamination, URL canonicalization, paragraph/prefix/sentence exact
dedup, edit-distance blocking, incremental ingest, containment scoring,
SemDeDup bucketing). Same contract as test_golden_dedup.py: raw sf0.01
rows, plain Python string/set/DP logic, no shared engine code.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"
P = 2147483647
MULT = 1000003


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM"
        f" '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    con.close()
    return df


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


def shingle_set(text: str, k: int = 3) -> set[int]:
    th = [string_hash(t) for t in text.split(" ")]
    out = set()
    for i in range(len(th) - k + 1):
        h = 0
        for j in range(k):
            h = (h * MULT + th[i + j]) % P
        out.add(h)
    return out


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------


def test_decontaminate(ops, docs):
    sh = {int(r.doc_id): shingle_set(r.text) for r in docs.itertuples()}
    bench = set().union(*(s for i, s in sh.items() if i % 97 == 0))
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for r in docs.itertuples():
        i = int(r.doc_id)
        if i % 97 == 0:
            continue
        a = agg[r.lang]
        a[0] += 1
        if sh[i] & bench:
            a[1] += 1
        else:
            a[2] += 1
    rows = {r["lang"]: r for r in ops("dedup-decontaminate")}
    assert set(rows) == set(agg)
    for lang, (n, rm, cl) in agg.items():
        r = rows[lang]
        assert (r["n_candidates"], r["n_removed"], r["n_clean"]) == (n, rm, cl)


def test_url_normalize(ops, docs):
    groups: dict = defaultdict(list)
    for r in docs.itertuples():
        i = int(r.doc_id)
        url = (
            f"HTTPS://WWW.{r.source}.example.com/sec{i % 7}/page"
            + ("/" if i % 5 == 0 else "")
            + f"?utm_campaign=x&ref={i % 3}"
            + ("#frag" if i % 2 == 0 else "")
        )
        u = url.lower()
        u = re.sub(r"#.*$", "", u)
        u = re.sub(r"\?.*$", "", u)
        u = re.sub(r"^https?://www\.", "https://", u)
        u = re.sub(r"/$", "", u)
        groups[u].append(i)
    rows = {r["canonical_url"]: r for r in ops("dedup-url-normalize")}
    assert set(rows) == set(groups)
    for u, ids in groups.items():
        assert rows[u]["n_docs"] == len(ids)
        assert rows[u]["keep_doc_id"] == min(ids)


def test_paragraph_exact(ops, docs):
    chunks = []  # (chunk_text, doc_id, chunk_idx)
    for r in docs.itertuples():
        toks = r.text.split(" ")
        for ci in range(len(toks) // 10):
            chunks.append((" ".join(toks[ci * 10:(ci + 1) * 10]),
                           int(r.doc_id), ci))
    seen: dict = defaultdict(list)
    for c, i, ci in chunks:
        seen[c].append((i, ci))
    per_doc: dict = defaultdict(lambda: [0, 0])
    for c, occ in seen.items():
        occ.sort()
        for rn, (i, _) in enumerate(occ, 1):
            per_doc[i][0] += 1
            if rn > 1:
                per_doc[i][1] += 1
    rows = {r["doc_id"]: r for r in ops("dedup-paragraph-exact")}
    assert set(rows) == set(per_doc)
    for i, (n, dup) in per_doc.items():
        assert (rows[i]["n_chunks"], rows[i]["n_dup_chunks"]) == (n, dup)


def test_fuzzy_levenshtein(ops, docs):
    pre = [
        (r.lang, int(r.n_chars) // 16, r.text[:32], int(r.doc_id))
        for r in docs.itertuples()
    ]
    by_block: dict = defaultdict(list)
    for lang, bucket, prefix, i in pre:
        by_block[(lang, bucket)].append((i, prefix))
    agg: dict = defaultdict(lambda: [0, 0, 10**9])
    for (lang, _), members in by_block.items():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                d = levenshtein(members[x][1], members[y][1])
                a = agg[lang]
                a[0] += 1
                a[1] += int(d <= 8)
                a[2] = min(a[2], d)
    rows = {r["lang"]: r for r in ops("dedup-fuzzy-levenshtein")}
    assert set(rows) == set(agg)
    for lang, (n, near, mn) in agg.items():
        r = rows[lang]
        assert (r["n_pairs"], r["n_near"], r["min_dist"]) == (n, near, mn)


def test_incremental_batch(ops, docs):
    corpus_h = {
        hashlib.md5(r.text.encode()).hexdigest()
        for r in docs.itertuples()
        if int(r.doc_id) % 4 != 0
    }
    batch = sorted(
        (int(r.doc_id) + 5000000, hashlib.md5(r.text.encode()).hexdigest())
        for r in docs.itertuples()
        if int(r.doc_id) % 4 == 0 or int(r.doc_id) % 5 == 0
    )
    rank_within: Counter = Counter()
    n_dup_corpus = n_dup_batch = n_admit = 0
    for _, h in batch:
        rank_within[h] += 1
        if h in corpus_h:
            n_dup_corpus += 1
        elif rank_within[h] > 1:
            n_dup_batch += 1
        else:
            n_admit += 1
    (row,) = ops("dedup-incremental-batch")
    assert row["n_batch"] == len(batch)
    assert row["n_dup_of_corpus"] == n_dup_corpus
    assert row["n_dup_within_batch"] == n_dup_batch
    assert row["n_admitted"] == n_admit


def test_containment_score(ops, docs):
    sh = {int(r.doc_id): shingle_set(r.text) for r in docs.itertuples()}
    df: Counter = Counter()
    for s in sh.values():
        df.update(s)
    kept = {i: {h for h in s if df[h] <= 50} for i, s in sh.items()}
    inv: dict = defaultdict(list)
    for i, s in kept.items():
        for h in s:
            inv[h].append(i)
    shared: Counter = Counter()
    for members in inv.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                shared[(members[x], members[y])] += 1
    want = {}
    for (a, b), n in shared.items():
        ca, cb = n / len(kept[a]), n / len(kept[b])
        if max(ca, cb) >= 0.5:
            want[(a, b)] = (
                n,
                math.floor(ca * 1e6 + 0.5),
                math.floor(cb * 1e6 + 0.5),
            )
    rows = {(r["doc_a"], r["doc_b"]): r for r in ops("dedup-containment-score")}
    assert set(rows) == set(want)
    for k, (n, ea, eb) in want.items():
        r = rows[k]
        assert (r["n_shared"], r["cont_a_in_b_e6"], r["cont_b_in_a_e6"]) == (
            n, ea, eb
        )


def test_crossdoc_prefix(ops, docs):
    groups: dict = defaultdict(list)
    for r in docs.itertuples():
        groups[" ".join(r.text.split(" ")[:8])].append(int(r.doc_id))
    want = {p: ids for p, ids in groups.items() if len(ids) > 1}
    rows = {r["prefix"]: r for r in ops("dedup-crossdoc-prefix")}
    assert set(rows) == set(want)
    for p, ids in want.items():
        assert rows[p]["n_docs"] == len(ids)
        assert rows[p]["keeper_doc_id"] == min(ids)


def test_sentence_boilerplate(ops, docs):
    occ: dict = defaultdict(list)
    for r in docs.itertuples():
        for s in re.split(r"\. ", r.text):
            s = s.strip()
            if len(s) >= 20:
                occ[s].append(int(r.doc_id))
    want = {
        s: (len(set(ids)), len(ids))
        for s, ids in occ.items()
        if len(set(ids)) >= 3
    }
    rows = {r["sentence"]: r for r in ops("dedup-sentence-boilerplate")}
    assert set(rows) == set(want)
    for s, (nd, no) in want.items():
        assert (rows[s]["n_docs"], rows[s]["n_occurrences"]) == (nd, no)


def test_semdedup_bucket(ops):
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
    n = len(V)
    bits = min(12, max(3, math.ceil(math.log2(n / 80.0))))
    buckets = np.zeros(n, dtype=int)
    for i in range(bits):
        buckets += np.where(V[:, i] >= 0, 1 << (11 - i), 0)
    members: dict = defaultdict(list)
    for k in range(n):
        members[int(buckets[k])].append(k)
    want = {}
    for b, ks in members.items():
        cent = V[ks].mean(0)
        cent_sim = {
            k: float(V[k] @ cent)
            / (np.linalg.norm(V[k]) * np.linalg.norm(cent))
            for k in ks
        }
        ks_sorted = sorted(ks, key=lambda k: ids[k])
        n_pairs = 0
        removed = set()
        for x in range(len(ks_sorted)):
            for y in range(x + 1, len(ks_sorted)):
                ka, kb = ks_sorted[x], ks_sorted[y]
                c = float(V[ka] @ V[kb]) / (
                    np.linalg.norm(V[ka]) * np.linalg.norm(V[kb])
                )
                if c > 0.85:
                    n_pairs += 1
                    removed.add(
                        ids[ka] if cent_sim[ka] >= cent_sim[kb] else ids[kb]
                    )
        want[b] = (len(ks), n_pairs, len(removed))
    rows = {r["bucket"]: r for r in ops("dedup-semdedup-bucket")}
    assert set(rows) == set(want)
    for b, (nv, np_, nr) in want.items():
        r = rows[b]
        assert (r["n_vecs"], r["n_dup_pairs"], r["n_removed"]) == (nv, np_, nr)
