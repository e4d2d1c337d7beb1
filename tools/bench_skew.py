#!/usr/bin/env python
"""Zipfian-skew evidence axis (VERDICT r8 ask 2).

Runs the join/groupBy-heavy ops against BOTH the uniform sf0.1
warehouse and its zipf(1)-keyed variant (tools/gen_skew.py — same row
counts, same payloads, hottest key carries ~50% of fact rows) and
records, per op:

- ``parity_ok``: DuckDB oracle parity ON THE SKEWED WAREHOUSE (rows +
  schema + value hash) — correctness must not depend on the key
  distribution;
- ``uniform_sec`` / ``skew_sec`` / ``ratio``: median-of-reps timings at
  equal volume. Gate: ratio <= SKEW_RATIO_MAX (default 4) — same bytes,
  only the distribution moved, so a blowup means a plan that dies on
  hot keys (the 100 TB failure mode this axis exists to catch);
- an AQE probe for the shuffle-join ops: re-run with broadcast disabled
  and skew thresholds lowered to fixture scale (the production-default
  detector fires on real-size partitions; the lowered thresholds make
  the tiny fixture trip it the same way run_skew_fact_fact does) and
  assert OptimizeSkewedJoin split the hot partition
  (``skew=true`` in the final adaptive plan) for every op in
  EXPECT_SKEW_FIRE.

Output: BENCH_SKEW.json + one JSON summary line; exit 1 on any parity
failure, gate breach, or missing expected skew split.

Usage:
    python tools/gen_skew.py && python tools/bench_skew.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import (
    get_spark,
    quiet_bounded_window_warnings,
    release_caches,
)

UNIFORM = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKEW = os.environ.get("SKEW_DIR", os.path.join(REPO, ".skew"))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
RATIO_MAX = float(os.environ.get("SKEW_RATIO_MAX", "4"))

# join/groupBy-heavy ops whose keys the generator skews
SKEW_OPS = [
    "join-fk-chain",
    "join-fact-fact",
    "join-broadcast-dim",
    "join-skew-fact-fact-aqe",  # internal skew=true assert runs on zipf input
    "sessionize",
    "window-latest-per-key",
    "window-session-concurrency",
    "agg-running-totals",
    "tpch-q3",
    "tpch-q10",
    "tpch-q18",
    "graph-pagerank",
    "graph-components-iterative",
]

# ops whose skew/uniform ratio is RECORDED but not gated, with the
# measured-and-adjudicated reason (a silent blowup elsewhere still
# fails the gate; these are understood data-shape dependences)
RATIO_EXEMPT = {
    "graph-components-iterative": (
        "convergence-loop iteration count tracks graph diameter: the "
        "zipf warehouse's hot partkeys dodge the l_partkey%13 edge "
        "filter, giving a SPARSER nation graph (127 vs 600 edges) with "
        "more components and larger diameter, so label propagation "
        "needs more rounds — algorithmic data dependence, not a "
        "hot-key plan failure (edge-build input actually shrank "
        "46457 -> 1307 rows)"
    ),
}

# shuffle-join ops re-run under the AQE probe confs, executed eagerly
# via localCheckpoint so the op's OWN adaptive plan finalizes (a noop
# write runs a separate query execution and the df's plan never
# becomes final). Expectations pinned from measurement; a silent
# stop-firing is a regression:
# - tpch-q10 splits UNFORCED: its join output feeds a different-key
#   aggregate, so AQE can split the hot partition freely;
# - tpch-q3 splits only under forceOptimizeSkewedJoin=true: its
#   groupBy reuses the join key, and AQE's cost model refuses a split
#   that would add a shuffle unless forced — the production lever for
#   hot-key-dominated joins feeding same-key aggregates;
# - tpch-q18 NEVER splits (recorded, not expected): its final join's
#   left input is a BroadcastHashJoin output, not an immediate shuffle
#   read, so OptimizeSkewedJoin's SMJ(shuffle,shuffle) pattern cannot
#   match — at cluster scale the fix is repartitioning the semi-join
#   output or salting;
# - join-skew-fact-fact-aqe asserts skew=true INTERNALLY on every run
#   (it executes during the parity/timing sections above).
AQE_PROBE_OPS = ["tpch-q3", "tpch-q10", "tpch-q18"]
EXPECT_SKEW_FIRE = {
    ("tpch-q10", "unforced"),
    ("tpch-q3", "forced"),
    ("tpch-q10", "forced"),
}

_PROBE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _timed(fn, spark, sf_dir) -> float:
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        release_caches(spark)
    return statistics.median(runs)


def _aqe_probe(spark, fn, sf_dir, force: bool) -> bool:
    """Execute the op with broadcast disabled + lowered skew thresholds;
    True when the FINAL adaptive plan contains a skew-split join.
    localCheckpoint executes the df's own query execution (a noop write
    would run a separate one and leave this plan non-final)."""
    confs = dict(_PROBE_CONFS)
    confs["spark.sql.adaptive.forceOptimizeSkewedJoin"] = str(force).lower()
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        df = fn(spark, sf_dir)
        out = df.localCheckpoint()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.unpersist()
        release_caches(spark)
        return "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def main() -> None:
    from tests.oracle_harness import compare, duck_conn

    spark = get_spark("tss-bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    quiet_bounded_window_warnings(spark)
    reg = registry()

    # warm-up both warehouses' footers + codegen
    spark.read.parquet(f"{UNIFORM}/lineitem.parquet").count()
    spark.read.parquet(f"{SKEW}/lineitem.parquet").count()

    con = duck_conn(SKEW)
    results: dict[str, dict] = {}
    failures: list[str] = []
    for op_id in SKEW_OPS:
        spec = reg[op_id]
        row: dict = {}
        try:
            # float_sig=7: the ~300k-row hot keys accumulate
            # summation-order drift that can flip a rounded SUM's last
            # digit between engines (see compare's docstring)
            compare(spec.fn(spark, SKEW), con, spec.oracle, op_id, float_sig=7)
            row["parity_ok"] = True
        except Exception as exc:  # noqa: BLE001
            row["parity_ok"] = False
            row["parity_err"] = str(exc)[:300]
            failures.append(f"{op_id}: parity {str(exc)[:120]}")
        release_caches(spark)
        u = _timed(spec.fn, spark, UNIFORM)
        s = _timed(spec.fn, spark, SKEW)
        row.update(
            uniform_sec=round(u, 4),
            skew_sec=round(s, 4),
            ratio=round(s / u, 3) if u > 0 else None,
        )
        if op_id in RATIO_EXEMPT:
            row["ratio_exempt"] = RATIO_EXEMPT[op_id]
        elif u > 0 and s / u > RATIO_MAX:
            failures.append(f"{op_id}: ratio {s / u:.2f} > {RATIO_MAX}")
        results[op_id] = row
        print(
            f"# {op_id}: uniform {u:.3f}s skew {s:.3f}s "
            f"ratio {s / u:.2f} parity_ok={row['parity_ok']}",
            file=sys.stderr,
        )

    probe: dict[str, dict] = {}
    for op_id in AQE_PROBE_OPS:
        fired = {
            mode: _aqe_probe(spark, reg[op_id].fn, SKEW, force=(mode == "forced"))
            for mode in ("unforced", "forced")
        }
        probe[op_id] = fired
        print(f"# aqe-probe {op_id}: {fired}", file=sys.stderr)
        for mode, ok in fired.items():
            if (op_id, mode) in EXPECT_SKEW_FIRE and not ok:
                failures.append(
                    f"{op_id}: expected AQE skew split ({mode}) did not fire"
                )

    out = {
        "metric": "skew_vs_uniform_ratio",
        "unit": "ratio",
        "sf": 0.1,
        "reps": REPS,
        "ratio_max": RATIO_MAX,
        "zipf": "s=1 over the existing key domains (top key ~50% of rows)",
        "ops": results,
        "aqe_probe": probe,
        "worst_ratio": max(
            (r["ratio"] for r in results.values() if r.get("ratio")), default=None
        ),
        "worst_gated_ratio": max(
            (
                r["ratio"]
                for op, r in results.items()
                if r.get("ratio") and op not in RATIO_EXEMPT
            ),
            default=None,
        ),
        "failures": failures,
    }
    with open(os.path.join(REPO, "BENCH_SKEW.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k not in ("ops",)}))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
