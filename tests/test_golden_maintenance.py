"""Maintenance/DQ-module golden cross-checks (r8): digests, profiles,
constraint counters, CDC/SCD2 diff algebra, z-order interleaving and
the refresh/compaction rollups — every remaining queries/maintenance.py
op recomputed in plain Python from the raw parquet rows. With these,
maintenance joins FORMULA_DENSE_MODULES.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
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


@pytest.fixture(scope="module")
def order_prices(duck):
    return dict(
        duck.execute("SELECT o_orderkey, o_totalprice FROM orders").fetchall()
    )


def _old_new(order_prices):
    """The shared CDC fixture: old = keys % 11 != 0, new = keys % 13 != 0
    with % 7 == 0 prices bumped by 1.0."""
    old = {k: p for k, p in order_prices.items() if k % 11 != 0}
    new = {
        k: (round(p + 1.0, 2) if k % 7 == 0 else p)
        for k, p in order_prices.items()
        if k % 13 != 0
    }
    return old, new


def test_cdc_snapshot_diff(ops, order_prices):
    old, new = _old_new(order_prices)
    want = Counter()
    for k in old.keys() | new.keys():
        if k not in old:
            want["insert"] += 1
        elif k not in new:
            want["delete"] += 1
        elif old[k] != new[k]:
            want["update"] += 1
        else:
            want["unchanged"] += 1
    got = {r["change_type"]: r["n"] for r in ops("cdc-snapshot-diff")}
    assert got == dict(want)


def test_scd2_apply_changes(ops, order_prices):
    old, new = _old_new(order_prices)
    want = Counter()
    for k in old.keys() | new.keys():
        if k not in old:
            want[(k, new[k], "current")] += 1
        elif k not in new:
            want[(k, old[k], "closed")] += 1
        elif old[k] != new[k]:
            want[(k, old[k], "closed")] += 1
            want[(k, new[k], "current")] += 1
        else:
            want[(k, old[k], "current")] += 1
    got = Counter(
        (r["o_orderkey"], r["price"], r["row_status"])
        for r in ops("scd2-apply-changes")
    )
    assert got == want


def test_tpch_refresh_sim(ops, duck):
    rows = duck.execute(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
    ).fetchall()
    agg: dict = {}
    for k, st, tp in rows:
        if k % 100 == 13:
            continue  # deleted
        n, s = agg.get(st, (0, 0.0))
        agg[st] = (n + 1, s + tp)
    for k, st, tp in rows:
        if k % 100 == 7:  # re-inserted with shifted key, same payload
            n, s = agg.get(st, (0, 0.0))
            agg[st] = (n + 1, s + tp)
    got = {r["o_orderstatus"]: (r["n_orders"], r["total_revenue"]) for r in ops("tpch-refresh-sim")}
    assert set(got) == set(agg)
    for st, (n, s) in agg.items():
        gn, gs = got[st]
        assert gn == n
        close(gs, s, tol=1e-1)


def test_layout_zorder_key(ops, duck):
    rows = duck.execute(
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem "
        "WHERE l_orderkey <= 64"
    ).fetchall()

    def interleave(zx: int, zy: int) -> int:
        z = 0
        for i in range(8):
            z |= ((zx >> i) & 1) << (2 * i)
            z |= ((zy >> i) & 1) << (2 * i + 1)
        return z

    want = Counter(
        (k, ln, pk % 256, sk % 256, interleave(pk % 256, sk % 256))
        for k, ln, pk, sk in rows
    )
    got = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["zx"], r["zy"], r["zkey"])
        for r in ops("layout-zorder-key")
    )
    assert got == want


def test_dq_partition_digest(ops, duck):
    rows = duck.execute(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate FROM orders"
    ).fetchall()
    per: dict = {}
    for k, ck, st, od in rows:
        month = od.strftime("%Y-%m")
        h = int(hashlib.md5(f"{k}|{ck}|{st}".encode()).hexdigest()[:12], 16) % 2147483647
        n, d = per.get(month, (0, 0))
        per[month] = (n + 1, d + h)
    got = {r["month"]: (r["n_rows"], r["digest"]) for r in ops("dq-partition-digest")}
    assert got == per


def test_dq_column_profile(ops, duck):
    specs = {
        "o_orderstatus": ("orders", "o_orderstatus"),
        "o_orderpriority": ("orders", "o_orderpriority"),
        "c_mktsegment": ("customer", "c_mktsegment"),
    }
    got = {r["column_name"]: r for r in ops("dq-column-profile")}
    for name, r in got.items():
        tbl, col = specs[name]
        vals = [v for (v,) in duck.execute(f"SELECT {col} FROM {tbl}").fetchall()]
        nn = [v for v in vals if v is not None]
        assert r["n_null"] == sum(1 for v in vals if v is None)
        assert r["n_distinct"] == len(set(nn))
        assert r["min_len"] == min(len(v) for v in nn)
        assert r["max_len"] == max(len(v) for v in nn)


def test_dq_constraint_check(ops, duck):
    li = duck.execute(
        "SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem"
    ).fetchall()
    orders = duck.execute("SELECT o_orderkey, o_orderdate FROM orders").fetchall()
    okeys = {k for k, _ in orders}
    odate = dict(orders)
    from collections import Counter as C

    okey_counts = C(k for k, _ in orders)
    want = {
        "l_orderkey_not_null": sum(1 for k, _q, _s in li if k is None),
        "li_no_orphans": sum(1 for k, _q, _s in li if k not in okeys),
        "o_orderkey_unique": sum(c - 1 for c in okey_counts.values() if c > 1),
        "l_quantity_in_range": sum(1 for _k, q, _s in li if q < 0 or q > 60),
        "l_shipdate_after_orderdate": sum(
            1 for k, _q, s in li if k in odate and s < odate[k]
        ),
    }
    got = {r["check_name"]: r["n_violations"] for r in ops("dq-constraint-check")}
    assert got == want


def test_dq_reconciliation(ops, duck):
    li = duck.execute(
        "SELECT l_orderkey, l_extendedprice, l_discount, l_tax FROM lineitem"
    ).fetchall()
    computed: dict = {}
    for k, p, d, t in li:
        computed[k] = computed.get(k, 0.0) + p * (1 - d) * (1 + t)
    orders = duck.execute("SELECT o_orderkey, o_totalprice FROM orders").fetchall()
    errs = [
        abs(tp - computed[k]) / tp for k, tp in orders if k in computed
    ]
    (row,) = ops("dq-reconciliation")
    assert row["n_orders"] == len(errs)
    assert row["n_mismatched"] == sum(1 for e in errs if e > 0.01)
    close(row["worst_rel_err"], max(errs), tol=1e-4)
    close(row["mean_rel_err"], sum(errs) / len(errs), tol=1e-4)


def test_dq_referential_integrity(ops, duck):
    fks = {
        "lineitem.l_orderkey -> orders": ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        "orders.o_custkey -> customer": ("orders", "o_custkey", "customer", "c_custkey"),
        "customer.c_nationkey -> nation": ("customer", "c_nationkey", "nation", "n_nationkey"),
        "supplier.s_nationkey -> nation": ("supplier", "s_nationkey", "nation", "n_nationkey"),
    }
    got = {r["fk"]: (r["n_orphans"], r["n_rows"]) for r in ops("dq-referential-integrity")}
    for fk, (go, gn) in got.items():
        ft, fc, pt, pc = fks[fk]
        child = [v for (v,) in duck.execute(f"SELECT {fc} FROM {ft}").fetchall()]
        parents = {v for (v,) in duck.execute(f"SELECT {pc} FROM {pt}").fetchall()}
        assert gn == len(child), fk
        assert go == sum(1 for v in child if v not in parents), fk


def test_maintenance_analyze_stats(ops, duck):
    rows = duck.execute("SELECT n_nationkey, n_regionkey FROM nation").fetchall()
    got = {r["column_name"]: r for r in ops("maintenance-analyze-stats")}
    for name, vals in (
        ("n_nationkey", [k for k, _ in rows]),
        ("n_regionkey", [r for _, r in rows]),
    ):
        r = got[name]
        # ndv is HLL++-approximate by design; the op emits the 5%
        # tolerance contract rather than the raw estimate
        assert r["ndv_within_5pct"] is True
        assert r["null_count"] == 0
        assert r["min_value"] == str(min(vals))
        assert r["max_value"] == str(max(vals))


def test_rollup_incremental_merge(ops, duck):
    rows = duck.execute("SELECT event_type, ts, value FROM events").fetchall()
    agg: dict = {}
    for et, ts, v in rows:
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        n, s = agg.get((et, day), (0, 0.0))
        agg[(et, day)] = (n + 1, s + v)
    got = {(r["event_type"], r["day"]): (r["n"], r["sum_value"]) for r in ops("rollup-incremental-merge")}
    assert set(got) == set(agg)
    for k, (n, s) in agg.items():
        gn, gs = got[k]
        assert gn == n
        close(gs, s, tol=1e-2)


def test_scan_merge_schema(ops, duck):
    rows = duck.execute("SELECT s_suppkey, s_acctbal FROM supplier").fetchall()
    per = {1: [0, 0.0], 2: [0, 0.0]}
    for k, b in rows:
        v = 1 if k % 2 == 0 else 2
        per[v][0] += 1
        if v == 2:
            per[v][1] += b
    got = {r["v"]: r for r in ops("scan-merge-schema")}
    assert set(got) == {1, 2}
    assert got[1]["n_suppliers"] == per[1][0]
    assert got[1]["n_null_acctbal"] == per[1][0]  # v=1 rows lack acctbal
    assert got[2]["n_suppliers"] == per[2][0]
    assert got[2]["n_null_acctbal"] == 0
    close(got[2]["total_bal"], per[2][1], tol=1e-1)


def test_sink_compaction(ops, duck):
    rows = duck.execute(
        "SELECT l_returnflag, l_extendedprice FROM lineitem"
    ).fetchall()
    agg: dict = {}
    for f, p in rows:
        n, s = agg.get(f, (0, 0.0))
        agg[f] = (n + 1, s + p)
    got = {r["l_returnflag"]: r for r in ops("sink-compaction")}
    assert set(got) == set(agg)
    for f, (n, s) in agg.items():
        r = got[f]
        assert r["n"] == n
        close(r["total"], s, tol=1e-1)
        assert (r["n_files_before"], r["n_files_after"]) == (64, 4)
