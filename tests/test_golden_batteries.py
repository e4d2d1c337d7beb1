"""Batteries-module golden cross-checks (r8): the function-surface
batteries (array/map/null/regex/url/xpath/hash/bool), the join-semantics
demos and the window-frame pair recomputed in plain Python (re, hashlib,
json, bisect) from the raw parquet rows. With these, batteries joins
FORMULA_DENSE_MODULES.
"""

from __future__ import annotations

import hashlib
import json
import re as _re
from bisect import bisect_left, bisect_right
from collections import Counter

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
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


def test_agg_bitmap_builtin(ops, duck):
    rows = duck.execute("SELECT ts, user_id FROM events").fetchall()
    per: dict = {}
    for ts, uid in rows:
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        per.setdefault(day, set()).add(uid)
    got = {r["day"]: r["n_distinct_users"] for r in ops("agg-bitmap-builtin")}
    assert got == {d: len(s) for d, s in per.items()}


def test_agg_bool_battery(ops, duck):
    rows = duck.execute(
        "SELECT o_orderpriority, o_totalprice, o_orderstatus FROM orders"
    ).fetchall()
    per: dict = {}
    for pr, tp, st in rows:
        a = per.setdefault(pr, {"all": True, "any": False, "big": 0, "open": 0})
        a["all"] &= tp > 1000.0
        a["any"] |= st == "F"
        a["big"] += tp > 150000.0
        a["open"] += st == "O"
    got = {r["o_orderpriority"]: r for r in ops("agg-bool-battery")}
    assert set(got) == set(per)
    for pr, a in per.items():
        r = got[pr]
        assert (r["all_over_1k"], r["any_finished"], r["n_big"], r["n_open"]) == (
            a["all"], a["any"], a["big"], a["open"]
        )


def test_agg_collect_sorted(ops, duck):
    rows = duck.execute("SELECT n_regionkey, n_name FROM nation").fetchall()
    per: dict = {}
    for rk, name in rows:
        per.setdefault(rk, []).append(name)
    want = {rk: "|".join(sorted(v)) for rk, v in per.items()}
    got = {r["n_regionkey"]: r["nations"] for r in ops("agg-collect-sorted")}
    assert got == want


def test_fn_array_battery(ops, duck):
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    got = {r["doc_id"]: r for r in ops("fn-array-battery")}
    assert set(got) == {d for d, _ in rows}
    for d, t in rows:
        toks = t.split(" ")
        r = got[d]
        assert r["first5_sorted"] == "|".join(sorted(toks)[:5])
        assert r["last3_reversed"] == "|".join(toks[::-1][:3])
        assert r["n_long_tokens"] == sum(1 for x in toks if len(x) > 5)
        assert r["head_joined"] == "|".join(toks[:3])
        assert r["has_spark"] == ("spark" in toks)


def test_fn_hash_battery(ops, duck):
    rows = duck.execute(
        "SELECT p_partkey, p_name FROM part WHERE p_partkey <= 500"
    ).fetchall()
    got = {r["p_partkey"]: r for r in ops("fn-hash-battery")}
    assert set(got) == {k for k, _ in rows}
    for k, name in rows:
        r = got[k]
        md5 = hashlib.md5(name.encode()).hexdigest()
        assert r["h_md5"] == md5
        assert r["h_sha256"] == hashlib.sha256(name.encode()).hexdigest()
        p64 = int(md5[:15], 16)
        assert r["h_md5_prefix64"] == p64
        assert r["shard"] == p64 % 1024


def test_fn_map_battery(ops, duck):
    rows = duck.execute("SELECT event_id, props FROM events").fetchall()
    got = {r["event_id"]: r for r in ops("fn-map-battery")}
    for eid, props in rows:
        k = json.loads(props).get("k") if props else None
        r = got[eid]
        assert r["prop_keys"] == "k"
        assert r["n_props"] == 1
        if k is None:
            assert r["k_val"] is None
        else:
            close(r["k_val"], float(k), tol=1e-9)
            close(float(r["prop_vals"]), float(k), tol=1e-9)


def test_fn_null_battery(ops, duck):
    custs = dict(
        duck.execute("SELECT c_custkey, c_name FROM customer").fetchall()
    )
    rows = duck.execute("SELECT event_id, user_id, event_type FROM events").fetchall()
    got = {r["event_id"]: r for r in ops("fn-null-battery")}
    assert set(got) == {e for e, _u, _t in rows}
    for eid, uid, et in rows:
        r = got[eid]
        matched = uid in custs
        assert r["who"] == (custs[uid] if matched else "UNKNOWN")
        assert r["is_orphan"] == (not matched)
        assert r["type_or_null"] == (None if et == "error" else et)
        assert r["match_status"] == ("matched" if matched else "unmatched")


def test_fn_regex_battery(ops, duck):
    rows = duck.execute("SELECT doc_id, substring(text, 1, 40) AS t FROM documents").fetchall()
    got = {r["doc_id"]: r for r in ops("fn-regex-battery")}
    for d, t in rows:
        r = got[d]
        m = _re.search(r"([a-z]{5,})", t)
        assert (r["first_long_word"] or "") == (m.group(1) if m else "")
        assert r["has_double_table"] == bool(_re.search(r"table.*table", t))
        assert r["snaked_head"] == _re.sub(r"\s+", "_", t)


def test_fn_url_battery(ops, duck):
    ids = [d for (d,) in duck.execute("SELECT doc_id FROM documents").fetchall()]
    got = {r["doc_id"]: r for r in ops("fn-url-battery")}
    assert set(got) == set(ids)
    for d in ids:
        r = got[d]
        assert r["host"] == f"w{d % 4}.example.org"
        assert r["path"] == f"/p/{d % 7}"
        assert r["query"] == f"q={d % 3}&id={d}"
        assert r["id_param"] == str(d)


def test_fn_xpath_battery(ops, duck):
    rows = duck.execute("SELECT n_nationkey, n_name, n_regionkey FROM nation").fetchall()
    got = {r["n_nationkey"]: r for r in ops("fn-xpath-battery")}
    assert set(got) == {k for k, _n, _r in rows}
    for k, name, rk in rows:
        r = got[k]
        assert (r["xid"], r["xname"], r["xregion_attr"], r["n_stops"]) == (
            k, name, str(rk), 2
        )


def test_join_cross(ops, duck):
    regions = [n for (n,) in duck.execute("SELECT r_name FROM region").fetchall()]
    keys = dict(duck.execute("SELECT r_name, r_regionkey FROM region").fetchall())
    want = Counter(
        (a, b) for a in regions for b in regions if keys[a] != keys[b]
    )
    got = Counter((r["from_region"], r["to_region"]) for r in ops("join-cross"))
    assert got == want


def test_join_existence_multikey(ops, duck):
    rows = duck.execute(
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice FROM lineitem"
    ).fetchall()
    present = {(k, ln) for k, ln, _f, _p in rows}
    per: dict = {}
    for k, ln, f, p in rows:
        if (k, ln + 1) in present:
            n, s = per.get(f, (0, 0.0))
            per[f] = (n + 1, s + p)
    got = {r["l_returnflag"]: (r["n_with_successor"], r["rev"]) for r in ops("join-existence-multikey")}
    assert set(got) == set(per)
    for f, (n, s) in per.items():
        gn, gs = got[f]
        assert gn == n
        close(gs, s, tol=1e-1)


def test_join_full_outer(ops, duck):
    rows = duck.execute("SELECT o_custkey, o_orderstatus FROM orders").fetchall()
    fc: dict = {}
    oc: dict = {}
    for ck, st in rows:
        if st == "F":
            fc[ck] = fc.get(ck, 0) + 1
        elif st == "O":
            oc[ck] = oc.get(ck, 0) + 1
    want = {
        ck: (fc.get(ck, 0), oc.get(ck, 0)) for ck in fc.keys() | oc.keys()
    }
    got = {r["custkey"]: (r["n_f"], r["n_o"]) for r in ops("join-full-outer")}
    assert got == want


def test_window_percentile_frame(ops, duck):
    rows = duck.execute(
        "SELECT c_custkey, c_nationkey, c_acctbal FROM customer"
    ).fetchall()
    per: dict = {}
    for _ck, nk, b in rows:
        per.setdefault(nk, []).append(b)
    stats = {
        nk: (
            float(np.quantile(v, 0.5, method="linear")),
            float(np.quantile(v, 0.9, method="linear")),
        )
        for nk, v in per.items()
    }
    got = {r["c_custkey"]: r for r in ops("window-percentile-frame")}
    assert set(got) == {ck for ck, _n, _b in rows}
    for ck, nk, b in rows:
        r = got[ck]
        med, p90 = stats[nk]
        close(r["nation_median"], med, tol=1e-3)
        close(r["nation_p90"], p90, tol=1e-3)
        assert r["is_top_decile"] == (b > p90)


def test_window_range_frame(ops, duck):
    import datetime

    rows = duck.execute("SELECT user_id, event_id, ts FROM events").fetchall()
    per: dict = {}
    for uid, _eid, ts in rows:
        per.setdefault(uid, []).append(ts)
    for v in per.values():
        v.sort()
    got = {r["event_id"]: r["n_last_hour"] for r in ops("window-range-frame")}
    for uid, eid, ts in rows:
        tss = per[uid]
        want = bisect_right(tss, ts) - bisect_left(
            tss, ts - datetime.timedelta(hours=1)
        )
        assert got[eid] == want, (uid, eid)
