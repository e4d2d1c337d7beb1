"""Golden cross-checks for the corpus-curation family (round-7 sweep):
training-mix planning, quality gates, perplexity bucketing, DSIR
importance, packing, budgets. Raw sf0.01 rows via DuckDB; all math in
plain Python/Counter/numpy. Same third-implementation contract as the
other test_golden_* suites.
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


def ansi_ntile(sorted_pos: int, n: int, k: int) -> int:
    q, r = divmod(n, k)
    if sorted_pos < r * (q + 1):
        return sorted_pos // (q + 1) + 1
    return r + (sorted_pos - r * (q + 1)) // max(q, 1) + 1


# ---------------------------------------------------------------------------


def test_corpus_stats(ops, docs):
    ntok = docs.text.map(lambda t: len(t.split(" ")))
    (row,) = ops("corpus-stats")
    assert row["n_docs"] == len(docs)
    assert row["total_tokens"] == int(ntok.sum())
    assert row["min_chars"] == int(docs.n_chars.min())
    assert row["max_chars"] == int(docs.n_chars.max())
    close(row["p50_tokens"], np.percentile(ntok.to_numpy(float), 50,
                                           method="linear"))
    assert row["n_langs"] == docs.lang.nunique()


def test_resample_mix(ops, docs):
    agg: dict = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        slot = string_hash(f"{int(r.doc_id)}:mix-salt") % 100
        thr = 35 if r.lang == "en" else 90
        a = agg[r.lang]
        a[0] += 1
        a[1] += int(slot < thr)
    rows = {r["lang"]: r for r in ops("corpus-resample-mix")}
    assert set(rows) == set(agg)
    for lang, (nb, na) in agg.items():
        assert (rows[lang]["n_before"], rows[lang]["n_after"]) == (nb, na)


def test_pack_sequences(ops, docs):
    cells: dict = defaultdict(lambda: [0, 0])
    for lang, g in docs.sort_values("doc_id").groupby("lang"):
        off = 0
        for t in g.text:
            n = len(t.split(" "))
            pid = off // 512
            cells[(lang, pid)][0] += 1
            cells[(lang, pid)][1] += n
            off += n
    rows = {(r["lang"], r["pack_id"]): r for r in ops("corpus-pack-sequences")}
    assert set(rows) == set(cells)
    for k, (nd, pt) in cells.items():
        assert (rows[k]["n_docs"], rows[k]["pack_tokens"]) == (nd, pt)


def test_dataset_card(ops, docs):
    con = duckdb.connect()
    n_emb, dim = con.execute(
        f"SELECT count(*), max(len(embedding)) FROM"
        f" '{SF}/embeddings.parquet'"
    ).fetchone()
    con.close()
    uniq = len({hashlib.md5(t.encode()).hexdigest() for t in docs.text})
    (row,) = ops("corpus-dataset-card")
    assert row["n_docs"] == len(docs)
    assert row["n_langs"] == docs.lang.nunique()
    assert row["n_sources"] == docs.source.nunique()
    assert row["total_tokens"] == int(
        docs.text.map(lambda t: len(t.split(" "))).sum()
    )
    assert row["total_chars"] == int(docs.n_chars.sum())
    close(row["exact_dup_rate"], 1 - uniq / len(docs))
    assert (row["n_embeddings"], row["embedding_dim"]) == (n_emb, dim)


def test_token_budget(ops, docs):
    per = {
        src: int(g.text.map(lambda t: len(t.split(" "))).sum())
        for src, g in docs.groupby("source")
    }
    total = sum(per.values())
    order = sorted(per, key=lambda s: (-per[s], s))
    rows = {r["source"]: r for r in ops("corpus-token-budget")}
    assert set(rows) == set(per)
    cum = 0
    for src in order:
        cum += per[src]
        r = rows[src]
        assert (r["toks"], r["cum_toks"]) == (per[src], cum)
        close(r["share"], per[src] / total)
        assert r["in_budget"] == (cum <= int(0.5 * total))


def test_shannon_diversity(ops, docs):
    rows = {r["source"]: r for r in ops("corpus-shannon-diversity")}
    for src, g in docs.groupby("source"):
        cnt: Counter = Counter()
        for t in g.text:
            cnt.update(re.findall(r"[a-z]+", t.lower()))
        tot = sum(cnt.values())
        h = -sum((n / tot) * math.log(n / tot) for n in cnt.values())
        r = rows[src]
        assert (r["total_n"], r["vocab"]) == (tot, len(cnt))
        close(r["shannon_h"], h)
        close(r["effective_vocab"], math.exp(h), tol=1e-3)


def test_curation_report(ops, docs):
    texts = Counter(docs.text)
    exact = sum(n - 1 for n in texts.values() if n > 1)
    prefixes = Counter(" ".join(t.split(" ")[:8]) for t in docs.text)
    pref = sum(n - 1 for n in prefixes.values() if n > 1)
    short = sum(1 for t in docs.text if len(t.split(" ")) < 20)
    rows = {r["stage"]: r for r in ops("corpus-curation-report")}
    for stage, n in (("exact-duplicate", exact), ("prefix-boilerplate", pref),
                     ("too-short", short)):
        assert rows[stage]["n_removed"] == n
        close(rows[stage]["removal_rate"], n / len(docs))


def test_dedup_impact(ops, docs):
    cells: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in docs.itertuples():
        k = hashlib.md5(r.text.strip().lower().encode()).hexdigest()
        c = cells[r.source][k]
        c[0] += 1
        c[1] = max(c[1], len(r.text.split(" ")))
    rows = {r["source"]: r for r in ops("corpus-dedup-impact")}
    assert set(rows) == set(cells)
    for src, groups in cells.items():
        before = sum(n for n, _ in groups.values())
        after = len(groups)
        removed = sum((n - 1) * t for n, t in groups.values())
        r = rows[src]
        assert (r["docs_before"], r["docs_after"], r["tokens_removed"]) == (
            before, after, removed
        )
        close(r["dup_rate"], 1 - after / before)


def test_cross_source_dup(ops, docs):
    keyed = {
        (r.source, hashlib.md5(r.text.strip().lower().encode()).hexdigest())
        for r in docs.itertuples()
    }
    byk: dict = defaultdict(set)
    for src, k in keyed:
        byk[k].add(src)
    pairs: Counter = Counter()
    for srcs in byk.values():
        s = sorted(srcs)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pairs[(s[x], s[y])] += 1
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r["source_a"], r["source_b"]), r["shared_docs"])
           for r in ops("corpus-cross-source-dup")]
    assert got == want


def test_chinchilla_budget(ops, docs):
    groups: dict = {}
    for r in docs.itertuples():
        k = hashlib.md5(r.text.strip().lower().encode()).hexdigest()
        groups[k] = max(groups.get(k, 0), len(r.text.split(" ")))
    uniq = float(sum(groups.values()))
    rows = {r["model_params"]: r for r in ops("corpus-chinchilla-budget")}
    for n_params in (10**8, 10**9, 10**10):
        need = n_params * 20
        r = rows[n_params]
        assert r["tokens_needed"] == need
        assert r["tokens_available"] == int(uniq)
        close(r["coverage"], uniq / need)
        assert r["epochs_required"] == math.ceil(need / uniq)


def test_language_balance_sampler(ops, docs):
    per = docs.lang.value_counts().to_dict()
    n = sum(per.values())
    z = sum(v**0.3 for v in per.values())
    rows = {r["lang"]: r for r in ops("corpus-language-balance-sampler")}
    assert set(rows) == set(per)
    for lang, nd in per.items():
        r = rows[lang]
        assert r["n_docs"] == nd
        close(r["raw_share"], nd / n)
        close(r["temp_share"], nd**0.3 / z)
        close(r["sample_weight"], (nd**0.3 / z) / (nd / n))


def test_quality_dedup_matrix(ops, docs):
    min_id: dict = {}
    for r in docs.itertuples():
        h = hashlib.sha256(r.text.encode()).hexdigest()
        min_id[h] = min(min_id.get(h, 10**18), int(r.doc_id))
    cells: dict = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        toks = r.text.split(" ")
        n = len(toks)
        stop = sum(1 for t in toks if t in ("a", "the")) / n
        clean = "clean" if (20 <= n <= 1000 and stop < 0.3) else "lowq"
        h = hashlib.sha256(r.text.encode()).hexdigest()
        dup = "unique" if min_id[h] == int(r.doc_id) else "dup"
        cells[(clean, dup)][0] += 1
        cells[(clean, dup)][1] += n
    rows = {(r["quality"], r["dedup_status"]): r
            for r in ops("corpus-quality-dedup-matrix")}
    assert set(rows) == set(cells)
    for k, (nd, tt) in cells.items():
        assert (rows[k]["n_docs"], rows[k]["total_tokens"]) == (nd, tt)


def test_dsir_importance(ops, docs):
    B = 64
    doc_f = {}  # doc_id -> list of bucket ids (one per token occurrence)
    for r in docs.itertuples():
        doc_f[int(r.doc_id)] = [
            string_hash(w) % B for w in r.text.lower().split(" ")
        ]
    src: Counter = Counter()
    tgt: Counter = Counter()
    lang = dict(zip(docs.doc_id.astype(int), docs.lang))
    for i, fs in doc_f.items():
        src.update(fs)
        if lang[i] == "en":
            tgt.update(fs)
    ns, nt = sum(src.values()), sum(tgt.values())
    lr = {
        f: math.log(((tgt.get(f, 0) + 1) / (nt + B)) / ((src[f] + 1) / (ns + B)))
        for f in src
    }
    per_lang: dict = defaultdict(list)
    for i, fs in doc_f.items():
        per_lang[lang[i]].append(sum(lr[f] for f in fs) / len(fs))
    rows = {r["lang"]: r for r in ops("corpus-dsir-importance")}
    assert set(rows) == set(per_lang)
    for lg, vals in per_lang.items():
        r = rows[lg]
        assert r["n_docs"] == len(vals)
        close(r["mean_log_importance"], np.mean(vals))
        assert r["n_selected"] == sum(1 for v in vals if v > 0)


def test_temperature_sampling(ops, docs):
    per = docs.groupby("source").n_chars.sum().astype(float).to_dict()
    rows = {(r["tau"], r["source"]): r
            for r in ops("corpus-temperature-sampling")}
    for tau in (0.3, 0.7, 1.0):
        zsum = sum(v**tau for v in per.values())
        tot = sum(per.values())
        for src, toks in per.items():
            p = toks**tau / zsum
            r = rows[(tau, src)]
            assert r["source_tokens"] == int(toks)
            close(r["sample_prob"], p)
            close(r["upsample_factor"], p / (toks / tot), tol=1e-3)


def test_filter_pipeline(ops, docs):
    kept = []
    for r in docs.itertuples():
        toks = r.text.split(" ")
        n = len(toks)
        stop = sum(1 for t in toks if t in ("a", "the")) / n
        if 20 <= n <= 500 and stop < 0.3 and r.lang in ("en", "de", "fr"):
            kept.append((hashlib.sha256(r.text.encode()).hexdigest(),
                         int(r.doc_id), r.lang, n))
    groups: dict = {}
    for h, i, lg, n in kept:
        cur = groups.get(h)
        if cur is None:
            groups[h] = [i, lg, n]
        else:
            groups[h] = [min(cur[0], i), min(cur[1], lg), min(cur[2], n)]
    agg: dict = defaultdict(lambda: [0, 0])
    for _, lg, n in groups.values():
        agg[lg][0] += 1
        agg[lg][1] += n
    rows = {r["lang"]: r for r in ops("corpus-filter-pipeline")}
    assert set(rows) == set(agg)
    for lg, (nd, tt) in agg.items():
        assert (rows[lg]["n_docs"], rows[lg]["total_tokens"]) == (nd, tt)


def test_ngram_topk(ops, docs):
    grams: Counter = Counter()
    for t in docs.text:
        toks = t.split(" ")
        for i in range(len(toks) - 2):
            grams[" ".join(toks[i:i + 3])] += 1
    want = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["ngram"], r["n"]) for r in ops("corpus-ngram-topk")]
    assert got == want


def test_gopher_rule_audit(ops, docs):
    flags = []
    for t in docs.text:
        toks = t.split(" ")
        n = len(toks)
        mwl = (len(t) - n + 1.0) / n
        sym = len(re.sub(r"[a-zA-Z0-9 ]", "", t)) / len(t)
        alpha = sum(1 for x in toks if re.search(r"[a-zA-Z]", x)) / n
        stop = sum(1 for x in toks if x in ("a", "the"))
        flags.append((
            int(not 20 <= n <= 1000),
            int(not 3 <= mwl <= 10),
            int(sym > 0.1),
            int(alpha < 0.8),
            int(stop < 2),
        ))
    names = ["len", "wordlen", "symbol", "alpha", "stopword"]
    rows = {r["rule"]: r for r in ops("corpus-gopher-rule-audit")}
    for k, name in enumerate(names):
        n_fail = sum(f[k] for f in flags)
        sole = sum(1 for f in flags if f[k] == 1 and sum(f) == 1)
        assert (rows[name]["n_fail"], rows[name]["n_sole_fail"]) == (
            n_fail, sole
        ), name
    assert rows["any"]["n_fail"] == sum(1 for f in flags if sum(f) >= 1)
    assert rows["any"]["n_sole_fail"] == sum(1 for f in flags if sum(f) == 1)


def test_tokenizer_fertility(ops, docs):
    rows = {r["lang"]: r for r in ops("corpus-tokenizer-fertility")}
    for lg, g in docs.groupby("lang"):
        nbpe = sum(len(re.findall(r"[a-z]+|[0-9]+|[^a-z0-9 ]", t))
                   for t in g.text)
        nw = sum(len(t.split(" ")) for t in g.text)
        nc = sum(len(t) for t in g.text)
        r = rows[lg]
        assert (r["n_docs"], r["total_tokens"]) == (len(g), nbpe)
        close(r["fertility_tokens_per_word"], nbpe / nw)
        close(r["chars_per_token"], nc / nbpe)
        close(r["tokens_per_kchar"], nbpe / nc * 1000, tol=1e-3)


def test_ccnet_ppl_buckets(ops, docs):
    vocab: Counter = Counter()
    for t in docs.text:
        vocab.update(t.split(" "))
    total = sum(vocab.values())
    ppl = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        ppl[int(r.doc_id)] = math.exp(
            -sum(math.log(vocab[t] / total) for t in toks) / len(toks)
        )
    lang = dict(zip(docs.doc_id.astype(int), docs.lang))
    cells: dict = defaultdict(list)
    for lg in set(lang.values()):
        members = sorted(
            (i for i in ppl if lang[i] == lg), key=lambda i: (ppl[i], i)
        )
        for pos, i in enumerate(members):
            t = ansi_ntile(pos, len(members), 3)
            bucket = {1: "head", 2: "middle"}.get(t, "tail")
            cells[(lg, bucket)].append(ppl[i])
    rows = {(r["lang"], r["bucket"]): r for r in ops("corpus-ccnet-ppl-buckets")}
    assert set(rows) == set(cells)
    for k, vals in cells.items():
        r = rows[k]
        assert r["n_docs"] == len(vals)
        close(r["mean_ppl"], np.mean(vals), tol=1e-3)
        close(r["max_ppl"], max(vals), tol=1e-3)


def test_oov_rate(ops, docs):
    cnt: Counter = Counter()
    for t in docs.text:
        cnt.update(t.split(" "))
    top = {
        t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    agg: dict = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        for t in r.text.split(" "):
            agg[r.lang][0] += 1
            agg[r.lang][1] += int(t not in top)
    rows = {r["lang"]: r for r in ops("corpus-oov-rate")}
    assert set(rows) == set(agg)
    for lg, (n, oov) in agg.items():
        r = rows[lg]
        assert (r["n_tokens"], r["n_oov"]) == (n, oov)
        close(r["oov_rate"], oov / n)


def test_curriculum_order(ops, docs):
    scored = sorted(
        (
            round(int(r.n_chars) * (1 + len(r.text.split(" "))), 4),
            int(r.doc_id),
            r.lang,
        )
        for r in docs.itertuples()
    )
    n = len(scored)
    cells: dict = defaultdict(lambda: [0, math.inf, -math.inf, set()])
    for pos, (d, i, lg) in enumerate(scored):
        ph = ansi_ntile(pos, n, 3)
        c = cells[ph]
        c[0] += 1
        c[1] = min(c[1], d)
        c[2] = max(c[2], d)
        c[3].add(lg)
    rows = {r["phase"]: r for r in ops("corpus-curriculum-order")}
    assert set(rows) == set(cells)
    for ph, (nd, mn, mx, langs) in cells.items():
        r = rows[ph]
        assert r["n_docs"] == nd
        close(r["min_difficulty"], mn, tol=1e-6)
        close(r["max_difficulty"], mx, tol=1e-6)
        assert r["n_langs"] == len(langs)
