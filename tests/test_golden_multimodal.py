"""Multimodal-family golden cross-checks (r8): the deterministic fake
codec's features are pure functions of the payload bytes, so every op
in queries/multimodal.py is recomputable in plain Python (hashlib,
byte arithmetic) straight from the documents parquet — no Spark, no
shared SQL. With these 10, the multimodal module is 100% golden and
joins FORMULA_DENSE_MODULES.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    con.close()
    return rows


@pytest.fixture(scope="module")
def ops(spark):
    reg = registry()

    def run(op_id):
        return [r.asDict() for r in reg[op_id].fn(spark, SF).collect()]

    return run


def close(got, want, tol=1e-4):
    assert got == pytest.approx(want, rel=tol, abs=tol), (got, want)


def test_multimodal_cols(ops, docs):
    want = {
        d: ("fake/utf8", len(t.encode()), d % 640 + 1, d % 480 + 1, t[:4].encode().hex())
        for d, _l, t in docs
    }
    got = {
        r["doc_id"]: (r["format"], r["byte_len"], r["width"], r["height"], r["head_hex"])
        for r in ops("multimodal-cols")
    }
    assert got == want


def test_multimodal_decode(ops, docs):
    got = {r["doc_id"]: r for r in ops("multimodal-decode")}
    assert set(got) == {d for d, _l, _t in docs}
    for d, _l, t in docs:
        r = got[d]
        blen = len(t.encode())
        assert r["byte_len"] == blen
        assert r["n_frames"] == blen % 7 + 1
        close(r["mean_byte"], sum(ord(c) for c in t) / blen, tol=1e-6)
        assert r["head_hex"] == t[:8].encode().hex()


def test_multimodal_frame_sample(ops, docs):
    want = {}
    for d, _l, t in docs:
        blen = len(t.encode())
        n = min(blen % 7 + 1, 4)
        stride = blen // n
        for idx in range(n):
            k = idx * stride
            want[(d, idx)] = t[k : k + 4].encode().hex()
    got = {
        (r["doc_id"], r["frame_idx"]): r["frame_head_hex"]
        for r in ops("multimodal-frame-sample")
    }
    assert got == want


def test_multimodal_aspect_bucket(ops, docs):
    buckets: dict = {}
    for d, _l, _t in docs:
        w, h = float(d % 640 + 1), float(d % 480 + 1)
        ar = w / h
        b = (
            0.5 if ar < 0.625 else
            0.75 if ar < 0.875 else
            1.0 if ar < 1.165 else
            1.33 if ar < 1.665 else 2.0
        )
        n, sar, swaste = buckets.get(b, (0, 0.0, 0.0))
        buckets[b] = (
            n + 1,
            sar + ar,
            swaste + 1 - min(ar, b) / max(ar, b),
        )
    got = {r["bucket_ar"]: r for r in ops("multimodal-aspect-bucket")}
    assert set(got) == set(buckets)
    for b, (n, sar, swaste) in buckets.items():
        r = got[b]
        assert r["n_images"] == n
        close(r["mean_ar"], sar / n, tol=1e-5)
        close(r["mean_crop_waste"], swaste / n, tol=1e-5)


def test_multimodal_audio_framing(ops, docs):
    want = {}
    for d, _l, _t in docs:
        n_samples = d % 32000 + 16000
        n_frames = (n_samples - 4000) // 1600 + 1
        for idx in range(n_frames):
            want[(d, idx)] = (idx * 1600, idx * 1600 + 4000, n_frames)
    got = {
        (r["doc_id"], r["frame_idx"]): (r["start_sample"], r["end_sample"], r["n_frames"])
        for r in ops("multimodal-audio-framing")
    }
    assert got == want


def test_multimodal_clip_score_filter(ops, docs):
    scored = []
    for d, lang, t in docs:
        s = (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1000000) / 1000000.0
        if s >= 0.75:
            scored.append((-s, d, lang, len(t.encode()), s))
    scored.sort()
    want = [
        (d, lang, blen, s) for _negs, d, lang, blen, s in scored[:25]
    ]
    got = [
        (r["doc_id"], r["lang"], r["byte_len"], r["clip_score"])
        for r in ops("multimodal-clip-score-filter")
    ]
    assert len(got) == len(want)
    for (gd, gl, gb, gs), (wd, wl, wb, ws) in zip(
        sorted(got, key=lambda x: (-x[3], x[0])), want
    ):
        assert (gd, gl, gb) == (wd, wl, wb)
        close(gs, ws, tol=1e-5)


def test_multimodal_dedup_binary(ops, docs):
    corpus = [(d, t) for d, _l, t in docs] + [
        (d + 1000000, t) for d, _l, t in docs if d % 5 == 0
    ]
    groups: dict = {}
    for d, t in corpus:
        h = hashlib.sha256(t.encode()).hexdigest()
        n, mn = groups.get(h, (0, None))
        groups[h] = (n + 1, d if mn is None else min(mn, d))
    want = {
        h: (n, mn) for h, (n, mn) in groups.items() if n > 1
    }
    got = {}
    for r in ops("multimodal-dedup-binary"):
        h = r["payload_sha256"]
        h = h.hex() if isinstance(h, (bytes, bytearray)) else str(h).lower()
        got[h] = (r["n_copies"], r["survivor_id"])
    assert got == want


def test_multimodal_shard_balance(ops, docs):
    shards: dict = {}
    for d, _l, t in docs:
        n, b = shards.get(d % 8, (0, 0))
        shards[d % 8] = (n + 1, b + len(t.encode()))
    mean_bytes = sum(b for _n, b in shards.values()) / len(shards)
    got = {r["shard"]: r for r in ops("multimodal-shard-balance")}
    assert set(got) == set(shards)
    for s, (n, b) in shards.items():
        r = got[s]
        assert (r["n_payloads"], r["shard_bytes"]) == (n, b)
        close(r["balance_ratio"], b / mean_bytes, tol=1e-3)


def test_multimodal_tile_grid(ops, docs):
    want = {}
    for d, _l, _t in docs:
        w, h = d % 640 + 1, d % 480 + 1
        for tx in range(math.ceil(w / 128)):
            for ty in range(math.ceil(h / 128)):
                want[(d, tx, ty)] = (
                    tx * 128,
                    ty * 128,
                    min(128, w - tx * 128),
                    min(128, h - ty * 128),
                )
    got = {
        (r["doc_id"], r["tile_x"], r["tile_y"]): (r["x0"], r["y0"], r["tile_w"], r["tile_h"])
        for r in ops("multimodal-tile-grid")
    }
    assert got == want


def test_grouped_map_zscore(ops):
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice "
        f"FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    con.close()
    per: dict = {}
    for f, _o, _ln, p in rows:
        per.setdefault(f, []).append(p)
    stats = {
        f: (np.mean(v), np.std(v, ddof=1)) for f, v in per.items()
    }
    # (orderkey, linenumber) is NOT unique in the synthetic fixture, and
    # quantized multisets double-round at the 6-decimal boundary — so
    # compare per-key SORTED z lists with a tolerance instead
    want: dict = {}
    for f, o, ln, p in rows:
        mu, sd = stats[f]
        want.setdefault((f, o, ln), []).append((p - mu) / sd)
    got: dict = {}
    for r in ops("grouped-map-zscore"):
        got.setdefault(
            (r["l_returnflag"], r["l_orderkey"], r["l_linenumber"]), []
        ).append(r["price_z"])
    assert set(got) == set(want)
    for k, gz in got.items():
        wz = want[k]
        assert len(gz) == len(wz), k
        assert np.allclose(sorted(gz), sorted(wz), atol=2e-6), k
