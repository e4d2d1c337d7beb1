"""Golden cross-checks for the text-analysis family (round-7 sweep):
quality features, entropies, LM scores, lexical statistics, stylometry,
watermark detection, BPE training. Raw sf0.01 rows via DuckDB; every
statistic rebuilt in plain Python (re/Counter/math/numpy) from the
published formula. Third-implementation contract as the other
test_golden_* suites.
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
STOPS = ("a", "the")


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


def ansi_ntile(pos: int, n: int, k: int) -> int:
    q, r = divmod(n, k)
    if pos < r * (q + 1):
        return pos // (q + 1) + 1
    return r + (pos - r * (q + 1)) // max(q, 1) + 1


# ---------------------------------------------------------------------------
# per-doc projections


def test_token_count(ops, docs):
    rows = {r["doc_id"]: r for r in ops("text-token-count")}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        g = rows[int(r.doc_id)]
        assert g["n_tokens"] == len(toks)
        assert g["n_distinct_tokens"] == len(set(toks))
        assert g["n_chars_text"] == len(r.text)


def test_token_regex(ops, docs):
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in ops("text-token-regex")}
    for r in docs.itertuples():
        want = len(re.findall(r"[a-z]+|[0-9]+|[^a-z0-9 ]", r.text))
        assert rows[int(r.doc_id)] == want


def test_quality_score(ops, docs):
    rows = {r["doc_id"]: r for r in ops("text-quality-score")}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        n = len(toks)
        g = rows[int(r.doc_id)]
        assert (g["n_chars_text"], g["n_tokens"]) == (len(r.text), n)
        close(g["avg_token_len"], len(r.text) / n)
        close(g["stopword_ratio"], sum(t in STOPS for t in toks) / n)
        close(g["ttr"], len(set(toks)) / n)


def test_lang_id(ops, docs):
    rows = {r["doc_id"]: r["lang_guess"] for r in ops("text-lang-id")}
    for r in docs.itertuples():
        hits = sum(t in ("the", "a", "of", "and") for t in r.text.split(" "))
        want = "en" if hits >= 3 else ("long" if len(r.text) > 400 else "other")
        assert rows[int(r.doc_id)] == want


def test_fingerprint(ops, docs):
    rows = {r["doc_id"]: r["fingerprint"] for r in ops("text-fingerprint")}
    for r in docs.itertuples():
        acc = 0
        for t in r.text.split(" "):
            code = (ord(t[0]) if t else 0) * 31 + len(t)
            acc = (acc * 1000003 + code) % P
        assert rows[int(r.doc_id)] == acc


def test_analyze(ops, docs):
    rows = {r["doc_id"]: r for r in ops("text-analyze")}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        g = rows[int(r.doc_id)]
        assert g["lang"] == r.lang
        close(g["stopword_ratio"], sum(t in STOPS for t in toks) / len(toks))
        hits = sum(t in ("the", "a", "of", "and") for t in toks)
        assert g["lang_guess"] == ("en" if hits >= 3 else "other")


def test_readability(ops, docs):
    got = ops("text-readability")
    assert len(got) == len(docs)
    recomputed = []
    for r in docs.itertuples():
        nw = len(r.text.split(" "))
        ns = max(len(re.findall(r"[.!?]+", r.text)), 1)
        syl = len(re.findall(r"[aeiouy]+", r.text.lower()))
        fl = 206.835 - 1.015 * (nw / ns) - 84.6 * (syl / nw)
        recomputed.append((nw, ns, syl, fl))
    got_sorted = sorted(
        (g["n_words"], g["n_sentences"], g["n_syllables"], g["flesch"])
        for g in got
    )
    for g, w in zip(got_sorted, sorted(recomputed)):
        assert g[:3] == w[:3]
        close(g[3], w[3], tol=1e-3)


def test_code_detect(ops, docs):
    got = sorted(
        (g["n_code_chars"], g["n_keywords"], g["looks_like_code"])
        for g in ops("text-code-detect")
    )
    want = []
    kw_re = r"\b(def|class|return|import|function|var|const|if|else)\b"
    for r in docs.itertuples():
        nc = len(r.text) - len(re.sub(r"[{};()=<>\[\]]", "", r.text))
        kw = len(re.findall(kw_re, r.text.lower()))
        want.append((nc, kw, nc / len(r.text) > 0.05 or kw >= 3))
    assert got == sorted(want)


def test_pii_scrub(ops, docs):
    rows = {r["doc_id"]: r for r in ops("text-pii-scrub")}
    email = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    num = r"\+?[0-9][0-9]+"
    for r in docs.itertuples():
        i = int(r.doc_id)
        t = f"{r.text} contact user{i}@example.com or +44{i * 7} now"
        no_email = re.sub(email, "<EMAIL>", t)
        scrubbed = re.sub(num, "<NUM>", no_email)[:80]
        n_pii = len(re.findall(email, t)) + len(re.findall(num, no_email))
        assert rows[i]["scrubbed_head"] == scrubbed
        assert rows[i]["n_pii"] == n_pii


def test_char_entropy(ops, docs):
    rows = {r["doc_id"]: r for r in ops("text-char-entropy")}
    for r in docs.itertuples():
        cnt = Counter(re.findall(r".", r.text))
        tot = sum(cnt.values())
        h = -sum((n / tot) * math.log(n / tot) for n in cnt.values())
        g = rows[int(r.doc_id)]
        assert (g["n_chars"], g["n_distinct_chars"]) == (tot, len(cnt))
        close(g["entropy_nats"], h)


# ---------------------------------------------------------------------------
# corpus-level LM / lexical statistics


@pytest.fixture(scope="module")
def vocab_space(docs):
    """Unigram counts over raw space-split tokens."""
    cnt: Counter = Counter()
    for t in docs.text:
        cnt.update(t.split(" "))
    return cnt


def test_unigram_logprob(ops, docs, vocab_space):
    total = sum(vocab_space.values())
    rows = {r["doc_id"]: r for r in ops("text-unigram-logprob")}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        lp = sum(math.log(vocab_space[t] / total) for t in toks) / len(toks)
        g = rows[int(r.doc_id)]
        assert g["n_tokens"] == len(toks)
        close(g["avg_logprob"], lp)


def test_tfidf_topterms(ops, docs):
    tf: dict = defaultdict(Counter)
    for r in docs.itertuples():
        tf[int(r.doc_id)].update(r.text.split(" "))
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(docs)
    want = []
    for i, c in tf.items():
        scored = sorted(
            ((-round_half_up(cnt * math.log(n / df[t]), 6), t)
             for t, cnt in c.items()),
        )[:3]
        want += [(i, t, -s) for s, t in scored]
    got = sorted(
        (r["doc_id"], r["token"], r["tfidf"])
        for r in ops("text-tfidf-topterms")
    )
    assert got == sorted(want)


def round_half_up(x, d):
    s = 1.0 if x >= 0 else -1.0
    return s * math.floor(abs(x) * 10**d + 0.5) / 10**d


def test_inverted_index(ops, docs):
    a = {int(r.doc_id) for r in docs.itertuples()
         if "the" in r.text.split(" ")}
    b = {int(r.doc_id) for r in docs.itertuples()
         if "of" in r.text.split(" ")}
    (row,) = ops("text-inverted-index")
    assert (row["df_the"], row["df_of"], row["df_and"]) == (
        len(a), len(b), len(a & b)
    )
    assert row["first_match"] == (min(a & b) if a & b else None)


def test_zipf_slope(ops, docs):
    cnt: Counter = Counter()
    for t in docs.text:
        cnt.update(re.findall(r"[a-z]+", t.lower()))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    ln_n = np.log([n for _, n in top])
    ln_r = np.log(np.arange(1, len(top) + 1, dtype=float))
    slope = np.polyfit(ln_r, ln_n, 1)
    (row,) = ops("text-zipf-slope")
    assert row["n_top"] == len(top)
    close(row["zipf_slope"], slope[0], tol=1e-3)
    close(row["zipf_intercept"], slope[1], tol=1e-3)


def test_hashing_features(ops, docs):
    cells: Counter = Counter()
    for r in docs.itertuples():
        if int(r.doc_id) % 10 != 0:
            continue
        for t in re.findall(r"[a-z]+", r.text.lower()):
            b = int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % 16
            cells[(int(r.doc_id), b)] += 1
    rows = {(r["doc_id"], r["bucket"]): r["n"]
            for r in ops("text-hashing-features")}
    assert rows == dict(cells)


def test_df_prune(ops, docs):
    df: Counter = Counter()
    for t in docs.text:
        df.update(set(re.findall(r"[a-z]+", t.lower())))
    n = len(docs)
    want = {
        t: (d, math.log(n / d))
        for t, d in df.items()
        if 3 <= d <= 0.5 * n
    }
    rows = {r["token"]: r for r in ops("text-df-prune")}
    assert set(rows) == set(want)
    for t, (d, idf) in want.items():
        assert rows[t]["doc_freq"] == d
        close(rows[t]["idf"], idf)


def test_bigram_perplexity(ops, docs):
    toks = {int(r.doc_id): re.findall(r"[a-z]+", r.text.lower())
            for r in docs.itertuples()}
    uni: Counter = Counter()
    bi: Counter = Counter()
    for ts in toks.values():
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    V = float(len(uni))
    lang = dict(zip(docs.doc_id.astype(int), docs.lang))
    per_lang: dict = defaultdict(list)
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        lps = [
            math.log((bi[(a, b)] + 1.0) / (uni[a] + V))
            for a, b in zip(ts, ts[1:])
        ]
        per_lang[lang[i]].append(math.exp(-sum(lps) / len(lps)))
    rows = {r["lang"]: r for r in ops("text-bigram-perplexity")}
    assert set(rows) == set(per_lang)
    for lg, ppls in per_lang.items():
        r = rows[lg]
        assert r["n_docs"] == len(ppls)
        close(r["avg_ppl"], np.mean(ppls), tol=1e-3)
        close(r["min_ppl"], min(ppls), tol=1e-3)
        close(r["max_ppl"], max(ppls), tol=1e-3)


def test_repetition_score(ops, docs):
    per_lang: dict = defaultdict(list)
    for r in docs.itertuples():
        ts = r.text.split(" ")
        if len(ts) < 2:
            continue
        bg = list(zip(ts, ts[1:]))
        per_lang[r.lang].append(1.0 - len(set(bg)) / len(bg))
    rows = {r["lang"]: r for r in ops("text-repetition-score")}
    assert set(rows) == set(per_lang)
    for lg, fr in per_lang.items():
        r = rows[lg]
        assert r["n_docs"] == len(fr)
        close(r["avg_dup_bigram_frac"], np.mean(fr))
        close(r["max_dup_bigram_frac"], max(fr))
        assert r["n_repetitive"] == sum(1 for f in fr if f > 0.2)


def test_js_divergence(ops, docs):
    en: Counter = Counter()
    ot: Counter = Counter()
    for r in docs.itertuples():
        tgt = en if r.lang == "en" else ot
        tgt.update(t for t in r.text.lower().split(" ") if t)
    te, to = sum(en.values()), sum(ot.values())
    vocab = set(en) | set(ot)
    js = 0.0
    for w in vocab:
        pw, qw = en.get(w, 0) / te, ot.get(w, 0) / to
        m = (pw + qw) / 2
        if pw > 0:
            js += 0.5 * pw * math.log(pw / m)
        if qw > 0:
            js += 0.5 * qw * math.log(qw / m)
    (row,) = ops("text-js-divergence")
    assert row["vocab"] == len(vocab)
    close(row["js_nats"], js)
    close(row["js_distance"], math.sqrt(js))


def test_ngram_novelty(ops, docs):
    first: dict = {}
    per_doc: dict = {}
    for r in docs.itertuples():
        ts = r.text.lower().split(" ")
        tris = [tuple(ts[i:i + 3]) for i in range(len(ts) - 2)]
        if not tris:
            continue
        per_doc[int(r.doc_id)] = tris
        for tg in tris:
            first.setdefault(tg, int(r.doc_id))
    doc_ids = sorted(per_doc)
    cells: dict = defaultdict(lambda: [0, 0])
    for pos, i in enumerate(doc_ids):
        dec = ansi_ntile(pos, len(doc_ids), 10)
        tris = per_doc[i]
        cells[dec][0] += len(tris)
        cells[dec][1] += sum(1 for tg in tris if first[tg] == i)
    rows = {r["corpus_decile"]: r for r in ops("text-ngram-novelty")}
    assert set(rows) == set(cells)
    for dec, (nt, nn) in cells.items():
        assert rows[dec]["trigrams"] == nt
        close(rows[dec]["novelty_rate"], nn / nt)


def test_burstiness(ops, docs):
    per: dict = defaultdict(Counter)
    for r in docs.itertuples():
        for w in r.text.lower().split(" "):
            if w:
                per[w][int(r.doc_id)] += 1
    nd = float(len(docs))
    scored = []
    for w, cm in per.items():
        total = sum(cm.values())
        if total < 50:
            continue
        mu = total / nd
        var = sum(c * c for c in cm.values()) / nd - mu * mu
        scored.append((-round_half_up(var / mu, 6), w, total, len(cm)))
    scored.sort()
    want = scored[:20]
    got = ops("text-burstiness")
    assert [(r["token"], r["total"], r["doc_freq"], r["fano_factor"])
            for r in got] == [(w, t, d, -f) for f, w, t, d in want]


def test_heaps_law(ops, docs):
    per_doc_toks = {}
    first_use: dict = {}
    for r in docs.itertuples():
        ws = [w for w in r.text.lower().split(" ") if w]
        per_doc_toks[int(r.doc_id)] = len(ws)
        for w in ws:
            first_use.setdefault(w, int(r.doc_id))
    doc_ids = sorted(per_doc_toks)
    dec_of = {
        i: ansi_ntile(pos, len(doc_ids), 10) for pos, i in enumerate(doc_ids)
    }
    toks_per_dec: Counter = Counter()
    new_per_dec: Counter = Counter()
    for i, n in per_doc_toks.items():
        toks_per_dec[dec_of[i]] += n
    for w, i in first_use.items():
        new_per_dec[dec_of[i]] += 1
    lx, ly = [], []
    n_cum = v_cum = 0
    for dec in sorted(toks_per_dec):
        n_cum += toks_per_dec[dec]
        v_cum += new_per_dec.get(dec, 0)
        lx.append(math.log(n_cum))
        ly.append(math.log(v_cum))
    lx, ly = np.array(lx), np.array(ly)
    beta, intercept = np.polyfit(lx, ly, 1)
    (row,) = ops("text-heaps-law")
    assert row["n_points"] == len(lx)
    close(row["heaps_beta"], beta)
    close(row["heaps_k"], math.exp(intercept), tol=1e-3)


def test_vocab_overlap(ops, docs):
    vocab: dict = defaultdict(set)
    for r in docs.itertuples():
        vocab[r.lang].update(w for w in r.text.lower().split(" ") if w)
    en = vocab.get("en", set())
    rows = {r["lang"]: r for r in ops("corpus-vocab-overlap")}
    assert set(rows) == {lg for lg in vocab if lg != "en"}
    for lg, v in vocab.items():
        if lg == "en":
            continue
        r = rows[lg]
        assert r["vocab_size"] == len(v)
        assert r["shared_with_en"] == len(v & en)
        close(r["en_coverage"], len(v & en) / len(v))


def test_mattr_diversity(ops, docs):
    mattrs = []
    for r in docs.itertuples():
        full = r.text.lower().split(" ")
        chunks: dict = defaultdict(list)
        for idx, w in enumerate(full):
            if w:
                chunks[idx // 50].append(w)
        ttrs = [len(set(ws)) / 50 for ws in chunks.values() if len(ws) == 50]
        if ttrs:
            mattrs.append(np.mean(ttrs))
    (row,) = ops("text-mattr-diversity")
    assert row["n_docs"] == len(mattrs)
    close(row["corpus_mattr"], np.mean(mattrs))
    close(row["min_doc_mattr"], min(mattrs))
    close(row["max_doc_mattr"], max(mattrs))


def test_langid_eval(ops, docs):
    tp = fp = fn = tn = 0
    for r in docs.itertuples():
        actual = r.lang == "en"
        pred = sum(
            t in ("the", "a", "of", "and") for t in r.text.split(" ")
        ) >= 3
        tp += actual and pred
        fp += (not actual) and pred
        fn += actual and not pred
        tn += (not actual) and not pred
    n = tp + fp + fn + tn
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    (row,) = ops("text-langid-eval")
    assert row["n_docs"] == n
    close(row["precision_"], tp / (tp + fp))
    close(row["recall_"], tp / (tp + fn))
    close(row["f1"], 2 * tp / (2 * tp + fp + fn))
    close(row["cohens_kappa"], (po - pe) / (1 - pe))


def test_pmi_cooccurrence(ops, docs):
    docsets = {
        int(r.doc_id): {w for w in r.text.lower().split(" ") if w}
        for r in docs.itertuples()
    }
    df: Counter = Counter()
    for s in docsets.values():
        df.update(s)
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    topset = {w for w, _ in top}
    dfd = dict(top)
    n = float(len(docs))
    both: Counter = Counter()
    for s in docsets.values():
        ws = sorted(s & topset)
        for x in range(len(ws)):
            for y in range(x + 1, len(ws)):
                both[(ws[x], ws[y])] += 1
    cands = []
    for (w1, w2), b in both.items():
        if b >= 5:
            pmi = math.log((b / n) / ((dfd[w1] / n) * (dfd[w2] / n)))
            cands.append((-round_half_up(pmi, 6), w1, w2, b))
    cands.sort()
    want = cands[:20]
    got = ops("text-pmi-cooccurrence")
    assert [(r["w1"], r["w2"], r["n_docs_both"], r["pmi"]) for r in got] == [
        (w1, w2, b, -p) for p, w1, w2, b in want
    ]


def test_yule_k(ops, docs):
    cnt: Counter = Counter()
    for t in docs.text:
        cnt.update(w for w in t.lower().split(" ") if w)
    n = float(sum(cnt.values()))
    sm2 = float(sum(m * m for m in cnt.values()))
    (row,) = ops("text-yule-k")
    assert row["n_tokens"] == int(n)
    assert row["vocabulary"] == len(cnt)
    close(row["yule_k"], 10000 * (sm2 - n) / (n * n))
    close(row["ttr"], len(cnt) / n)


def test_burrows_delta(ops, docs):
    toks: dict = defaultdict(Counter)
    nt: Counter = Counter()
    allc: Counter = Counter()
    for r in docs.itertuples():
        ws = r.text.split(" ")
        toks[r.source].update(ws)
        nt[r.source] += len(ws)
        allc.update(ws)
    top = [w for w, _ in sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    sources = sorted(toks)
    z: dict = {}
    for w in top:
        rfs = {s: toks[s][w] / nt[s] for s in sources}
        mu = np.mean(list(rfs.values()))
        sd = np.std(list(rfs.values()), ddof=1)
        for s in sources:
            z[(s, w)] = (rfs[s] - mu) / sd
    rows = {(r["source_a"], r["source_b"]): r["delta"]
            for r in ops("text-burrows-delta")}
    for x in range(len(sources)):
        for y in range(x + 1, len(sources)):
            a, b = sources[x], sources[y]
            delta = np.mean([abs(z[(a, w)] - z[(b, w)]) for w in top])
            close(rows[(a, b)], delta)


def test_self_bleu_lite(ops, docs):
    sample = {
        int(r.doc_id): {w for w in r.text.lower().split(" ") if w}
        for r in docs.itertuples()
        if int(r.doc_id) % 53 == 0 and int(r.doc_id) < 5300
    }
    precs = []
    for a, sa in sample.items():
        for b, sb in sample.items():
            if a != b and sa & sb:
                precs.append(len(sa & sb) / len(sa))
    (row,) = ops("text-self-bleu-lite")
    assert row["n_docs"] == len(sample)
    assert row["n_pairs"] == len(precs)
    close(row["mean_self_bleu1"], np.mean(precs))
    close(row["max_self_bleu1"], max(precs))


def test_watermark_detect(ops, docs):
    green_tot: dict = defaultdict(lambda: [0, 0])  # lang -> [green, n]
    per_doc: dict = {}
    for r in docs.itertuples():
        g = n = 0
        for t in r.text.split(" "):
            n += 1
            if string_hash(t + ":wm-key-r5") % 2 == 0:
                g += 1
        per_doc[int(r.doc_id)] = (r.lang, g, n)
        green_tot[r.lang][0] += g
        green_tot[r.lang][1] += n
    p0 = {lg: g / n for lg, (g, n) in green_tot.items()}
    zs: dict = defaultdict(list)
    for lg, g, n in per_doc.values():
        if n >= 16:
            p = p0[lg]
            zs[lg].append((g - n * p) / math.sqrt(n * p * (1 - p)))
    rows = {r["lang"]: r for r in ops("text-watermark-detect")}
    assert set(rows) == set(zs)
    for lg, vals in zs.items():
        r = rows[lg]
        assert r["n_docs"] == len(vals)
        close(r["mean_z"], np.mean(vals))
        close(r["frac_flagged"], np.mean([v >= 2 for v in vals]))


def test_lm_interpolated(ops, docs, vocab_space):
    total = float(sum(vocab_space.values()))
    bi: Counter = Counter()
    for t in docs.text:
        ts = t.split(" ")
        bi.update(zip(ts, ts[1:]))
    rows = {r["doc_id"]: r for r in ops("text-lm-interpolated")}
    for r in docs.itertuples():
        ts = r.text.split(" ")
        if len(ts) < 2:
            continue
        lps = [
            math.log(
                0.7 * (bi[(a, b)] / vocab_space[a])
                + 0.3 * (vocab_space[b] / total)
            )
            for a, b in zip(ts, ts[1:])
        ]
        g = rows[int(r.doc_id)]
        assert g["n_bigrams"] == len(lps)
        close(g["avg_interp_logprob"], np.mean(lps))


_RAKE_STOPS = (
    "the|and|of|to|in|a|is|for|on|with|as|by|at|an|be|or|it|this|"
    "that|are|was|were|from|has|have|had|not|but|its"
)


def test_rake_keywords(ops, docs):
    split_re = rf"\b(?:{_RAKE_STOPS})\b"
    phrases = []  # all phrase occurrences (phrase, plen)
    for t in docs.text:
        norm = re.sub(r"[^a-z ]", " ", t.lower())
        for frag in re.split(split_re, norm):
            ph = re.sub(r" +", " ", frag).strip()
            if ph:
                plen = len(ph.split(" "))
                if 2 <= plen <= 4:
                    phrases.append((ph, plen))
    wscore_n: Counter = Counter()
    wscore_s: Counter = Counter()
    for ph, plen in phrases:
        for w in ph.split(" "):
            wscore_n[w] += 1
            wscore_s[w] += plen
    wscore = {w: wscore_s[w] / wscore_n[w] for w in wscore_n}
    pscore = {}
    for ph, plen in set(phrases):
        words = set(ph.split(" "))
        pscore[ph] = (plen, sum(wscore[w] for w in words))
    cands = sorted(
        ((-round_half_up(s, 6), ph, plen) for ph, (plen, s) in pscore.items())
    )[:15]
    got = ops("text-rake-keywords")
    assert [(r["phrase"], r["n_words"], r["rake_score"]) for r in got] == [
        (ph, plen, -s) for s, ph, plen in cands
    ]


def test_sentence_length_profile(ops, docs):
    per_lang: dict = defaultdict(list)
    for r in docs.itertuples():
        for s in re.split(r"\. ", r.text):
            s = s.strip()
            if s:
                per_lang[r.lang].append(float(len(s.split(" "))))
    rows = {r["lang"]: r for r in ops("text-sentence-length-profile")}
    assert set(rows) == set(per_lang)
    for lg, lens in per_lang.items():
        r = rows[lg]
        assert r["n_sentences"] == len(lens)
        close(r["mean_tokens"], np.mean(lens))
        close(r["sd_tokens"], np.std(lens, ddof=1))
        close(r["cv_tokens"], np.std(lens, ddof=1) / np.mean(lens))
        assert r["max_tokens"] == int(max(lens))


def test_bpe_train(ops, docs):
    words: Counter = Counter()
    for t in docs.text:
        for w in t.split(" "):
            if w:
                words[w] += 1
    seqs = {" " + "  ".join(list(w)) + " ": c for w, c in words.items()}

    def pair_counts(sq):
        cnt: Counter = Counter()
        for seq, c in sq.items():
            syms = seq.strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                cnt[a + "  " + b] += c
        return cnt

    p1 = pair_counts(seqs)
    m1 = min(p1.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    seqs1 = {
        seq.replace(" " + m1 + " ", " " + m1.replace("  ", "") + " "): c
        for seq, c in seqs.items()
    }
    p2 = pair_counts(seqs1)
    want = []
    for rnd, p in ((1, p1), (2, p2)):
        top = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want += [(rnd, pair.replace("  ", "+"), tot) for pair, tot in top]
    got = sorted(
        (r["round"], r["pair"], r["total"]) for r in ops("text-bpe-train")
    )
    assert got == sorted(want)
