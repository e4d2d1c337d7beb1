#!/usr/bin/env python
"""Seeded rotating driver-style draw (VERDICT r7 task 6, upgraded per
VERDICT r9 task 1).

The external driver has only ever validated ~87 unique ops across nine
rounds (its 50-op sample keeps re-drawing the same names), and the only
round that sampled SURVEY §2 ops was r1 — where seven ops crashed the
driver's own pandas canonicalizer (``TypeError: unhashable type:
'list'`` on array-typed output columns, CORRECTNESS_r01.json) and were
reworked in r2 but never re-drawn. The local harness replicates the
driver check bit-for-bit (tests/oracle_harness.py: vanilla subprocess
session + the driver's canonicalizer failure modes — complex-typed
cells rejected, pandas-ns timestamp bounds asserted), so this module
defines a per-round seeded draw that

1. ALWAYS includes the never-re-drawn r1 red rows (RECERTIFY_OPS)
   until a local draw has certified them,
2. then every SURVEY §2 / §2.12 contract op neither the driver nor a
   prior local draw has validated green,
3. then tops up to k from the never-validated remainder of the
   registry (seeded by round number, reproducible).

Since r10 the recorded artifact is a per-op VERDICT map (op -> "pass" /
"FAIL: ..."), not just the drawn-name list — LOCAL_SIM_DRAWS.json holds
lists for r8/r9 and verdict dicts from r10 on; only "pass" entries
count as locally certified.

Draw size: 100/round since r9 (VERDICT r8 task 4).
"""

from __future__ import annotations

import json
import os
import pathlib
import random
import re
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent

# SURVEY.md §2 + §2.12 contract op ids (the judge's coverage table).
SURVEY_S2_OPS = [
    "scan-geojson", "scan-geojson-lib", "scan-glob", "scan-sql",
    "sink-geojson", "sink-csv-wkt", "sink-jdbc-batch", "sink-ddl",
    "source-wfs", "project-drop-geometry", "derive-route-length",
    "derive-source-file", "geo-reproject", "geom-to-wkt", "geom-to-ewkt",
    "wkt-to-geom", "rename-type-to-route-type", "schema-align",
    "derive-timestamps", "fn-os-grid-ref", "fn-basename-splitext",
    "fn-strftime", "fn-round", "fn-format-popup", "map-lookup-default",
    "coord-swap", "explode-multigeom", "filter-not-null", "filter-eq",
    "filter-valid-rows", "guard-empty", "join-broadcast-dim",
    "join-fk-chain", "agg-distinct-sorted", "agg-count",
    "agg-running-totals", "agg-bounds", "derive-surrogate-key",
    "window-latest-per-key", "sort-by-key", "topk-by-id", "union-by-name",
    "stream-file-source", "stream-append-sink", "stream-tumbling-agg",
    "stream-watermark", "stream-dedup",
    # §2.12 extension contract
    "dedup-exact", "dedup-near-minhash", "simsearch-topk", "text-analyze",
    "multimodal-cols",
]

# Ops whose ONLY driver record is the r1 harness crash (unhashable
# array-typed cells in the driver's canonicalizer); reworked to scalar
# output schemas in r2 but never re-drawn by the driver since.
RECERTIFY_OPS = [
    "agg-collect-sorted", "coord-swap", "dedup-minhash-signature",
    "explode-multigeom", "fn-array-battery", "fn-map-battery",
    "wkt-to-geom",
]


def _record_green(v: dict) -> bool:
    """A driver correctness record counts as validated only if it ran
    (no err) and no recorded match flag is false."""
    if v.get("err"):
        return False
    flags = [v.get(k) for k in ("rows_match", "schema_match", "hash_match")]
    if any(f is False for f in flags):
        return False
    # rows-only records carry no flags but do carry row counts
    return v.get("spark_rows") is not None or any(f is True for f in flags)


def driver_validated_ops(repo: pathlib.Path = REPO) -> set[str]:
    """Op ids the real driver has checked GREEN (CORRECTNESS_r*.json).
    Red records (e.g. the seven r1 canonicalizer crashes) don't count —
    those ops stay in the draw pool until a local draw certifies them."""
    ops: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except Exception:
            continue
        for op, v in data.items():
            if isinstance(v, dict) and _record_green(v):
                ops.add(op)
    return ops


def current_round(repo: pathlib.Path = REPO) -> int:
    """The round being built = max recorded correctness round + 1."""
    rounds = [
        int(m.group(1))
        for p in repo.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def locally_drawn_ops(repo: pathlib.Path = REPO, before_round: int | None = None) -> set[str]:
    """Ops already certified by PRIOR rounds' local rotating draws
    (LOCAL_SIM_DRAWS.json). Only rounds < before_round count, so
    re-running the current round's draw after round_close has recorded
    it reproduces the same names. r8/r9 entries are plain name lists;
    r10+ entries are verdict dicts, where only "pass" counts."""
    if before_round is None:
        before_round = current_round(repo)
    store_path = repo / "LOCAL_SIM_DRAWS.json"
    if not store_path.exists():
        return set()
    try:
        store = json.loads(store_path.read_text())
    except Exception:
        return set()
    ops: set[str] = set()
    for key, entry in store.items():
        m = re.match(r"r(\d+)$", key)
        if not (m and int(m.group(1)) < before_round):
            continue
        if isinstance(entry, dict):
            ops.update(op for op, verdict in entry.items() if verdict == "pass")
        else:
            ops.update(entry)
    return ops


def latest_local_pass_round(repo: pathlib.Path = REPO) -> dict[str, int]:
    """op -> most recent round whose LOCAL draw certified it green.
    r8/r9 name-list entries count as that round; r10+ dict entries count
    only where verdict == "pass"."""
    store_path = repo / "LOCAL_SIM_DRAWS.json"
    if not store_path.exists():
        return {}
    try:
        store = json.loads(store_path.read_text())
    except Exception:
        return {}
    latest: dict[str, int] = {}
    for key, entry in store.items():
        m = re.match(r"r(\d+)$", key)
        if not m:
            continue
        r = int(m.group(1))
        ops = (
            [op for op, v in entry.items() if v == "pass"]
            if isinstance(entry, dict)
            else entry
        )
        for op in ops:
            latest[op] = max(latest.get(op, 0), r)
    return latest


def rotating_draw(repo: pathlib.Path = REPO, k: int = 100) -> list[str]:
    """Priority-first seeded k-op sample (see module doc): r1-red
    re-certification ops, then never-validated SURVEY §2/§2.12 ops,
    then the FULL §2 contract block every round (VERDICT r10 task 7 —
    the 52 ids are the driver's contract surface and must never go
    stale), then a seeded sample of the never-validated remainder;
    topped up STALEST-FIRST from the already-drawn pool so the whole
    registry keeps re-certifying on a bounded cadence."""
    sys.path.insert(0, str(repo))
    from transit_scrape_spark.queries.registry import registry

    rnd = current_round(repo)
    reg = set(registry())
    local = locally_drawn_ops(repo, before_round=rnd)
    seen = driver_validated_ops(repo) | local
    # (1) r1 harness-crash rows: only a local certification retires them
    #     (their driver record is red forever)
    priority = [op for op in RECERTIFY_OPS if op in reg and op not in local]
    # (2) §2/§2.12 contract ops never validated green anywhere
    priority += [
        op for op in SURVEY_S2_OPS
        if op in reg and op not in seen and op not in priority
    ]
    # (3) the whole §2 block, every round (perpetually <= 1 round stale)
    priority += [
        op for op in SURVEY_S2_OPS if op in reg and op not in priority
    ]
    rng = random.Random(rnd)
    eligible = sorted(reg - seen - set(priority))
    draw = priority[:k]
    draw += rng.sample(eligible, min(k - len(draw), len(eligible)))
    if len(draw) < k:
        # stalest-first: oldest local certification re-runs first; ties
        # broken by seeded shuffle so same-round cohorts rotate
        latest = latest_local_pass_round(repo)
        refill = sorted(reg - set(draw))
        rng.shuffle(refill)
        refill.sort(key=lambda op: latest.get(op, 0))
        draw += refill[: k - len(draw)]
    return sorted(draw)


# Vanilla-subprocess sweep: the driver's exact shape (its own bare
# SparkSession, none of our session.py configs) + the driver's
# canonicalizer semantics (tests/oracle_harness.compare). Emits a
# per-op verdict JSON to {out!r}.
_SWEEP_VERDICTS = r"""
import json
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim-draw")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from oracle_harness import compare, duck_conn
from transit_scrape_spark.session import release_caches, persistent_rdd_count

sf = {sf_dir!r}
draw = {draw!r}
q, o = e.queries(), e.oracle_sql()
con = duck_conn(sf)
verdicts = {{}}
for op in sorted(draw):
    try:
        compare(q[op](spark, sf), con, o[op], op)
        verdicts[op] = "pass"
    except Exception as ex:
        verdicts[op] = "FAIL: " + str(ex)[:300]
        print("FAIL " + op + ": " + str(ex)[:300], flush=True)
    release_caches(spark)
    leftover = persistent_rdd_count(spark)
    if leftover:
        verdicts[op] = "FAIL: cache-hygiene %d persisted RDDs" % leftover
        print("FAIL cache-hygiene after " + op, flush=True)
json.dump(verdicts, open({out!r}, "w"), indent=1)
npass = sum(1 for v in verdicts.values() if v == "pass")
print("SWEEP %d/%d green" % (npass, len(verdicts)), flush=True)
sys.exit(0 if npass == len(verdicts) else 1)
"""


def certify_draw(
    repo: pathlib.Path = REPO,
    draw: list[str] | None = None,
    sf_dir: str = "/root/testdata/sf0.01",
    timeout: int = 2400,
) -> dict[str, str]:
    """Run the draw in one vanilla subprocess (the driver's exact shape
    + canonicalizer) and return {op: "pass" | "FAIL: ..."} verdicts."""
    if draw is None:
        draw = rotating_draw(repo)
    # mkstemp, not the TOCTOU-racy deprecated mktemp: concurrent
    # invocations must not collide on the verdict path (r10 advice)
    fd, out = tempfile.mkstemp(suffix=".json", prefix="draw_verdicts_")
    os.close(fd)
    code = _SWEEP_VERDICTS.format(
        repo=str(repo),
        tests=str(repo / "tests"),
        sf_dir=sf_dir,
        draw=draw,
        out=out,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=str(repo),
    )
    # mkstemp pre-creates the file, so "child died before verdicts" now
    # shows as an EMPTY file, not a missing one
    if not os.path.exists(out) or os.path.getsize(out) == 0:
        if os.path.exists(out):
            os.remove(out)
        tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-20:])
        raise RuntimeError(f"certify_draw subprocess died before verdicts:\n{tail}")
    verdicts = json.loads(open(out).read())
    os.remove(out)
    return verdicts


if __name__ == "__main__":
    draw = rotating_draw()
    print(
        json.dumps(
            {
                "round": current_round(),
                "driver_validated": len(driver_validated_ops()),
                "draw": draw,
            },
            indent=1,
        )
    )
