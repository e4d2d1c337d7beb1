#!/usr/bin/env python
"""Fresh-process headline bench: each tracked query runs in its OWN
subprocess with its OWN SparkSession, median of N reps per query.

Why this exists (VERDICT r5 #3): the full sweep (bench.py) times 650+
ops in one shared JVM session, and that shared state has twice produced
phantom cross-round "regressions" (r3->r4 and r4->r5 dedup-near-minhash:
sweep said 1.24s -> 1.62s, isolated fresh-process A/B on byte-identical
op code said 1.14s -> 1.06s — see BENCH_REGRESSION_r4.md). Shared-session
noise sources: accumulated JVM heap/GC pressure, codegen cache state,
shuffle-file accumulation, and broadcast cleanup timing. A fresh process
per query removes all of them.

Protocol per query (inside the subprocess): build the session, one
warm-up execution (JVM + parquet footers + codegen are session one-time
costs, not op properties — same rationale as bench.py's global warm-up),
then N timed runs; report the median.

Usage:
    python tools/bench_isolated.py            # sf0.1, 3 reps
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_REPS=5 python tools/bench_isolated.py

Output: one JSON line on stdout + BENCH_ISOLATED.json next to bench.py.
Cross-round performance claims should cite THESE numbers; the sweep's
sec_per_op remains the registry-wide health metric.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch-q3", "tpch-q6", "tpch-q10", "tpch-q17",
    "join-fk-chain", "window-latest-per-key", "sessionize",
    "dedup-near-minhash", "simsearch-topk", "text-quality-score",
    "multimodal-cols", "stream-tumbling-agg",
    # r8: tracks the day-bucketed sweep rework (VERDICT r7 task 5)
    "window-session-concurrency",
    # r10: tracks the Arrow-gemm anchor-distance rewrite (VERDICT r9
    # task 3) across rounds in a clean process
    "embed-hubness",
]

_CHILD = r"""
import json, os, statistics, sys, time

sys.path.insert(0, {repo!r})
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import (
    get_spark, quiet_bounded_window_warnings, release_caches,
)

op_id = {op_id!r}
sf_dir = {sf_dir!r}
reps = {reps}

spark = get_spark("tss-bench-isolated")
spark.sparkContext.setLogLevel("ERROR")
quiet_bounded_window_warnings(spark)
spec = registry()[op_id]

# warm-up: two full executions (not timed). Two, not one: the r11
# dedup-near-minhash bisect (BENCH_REGRESSION_r10.md, experiment B)
# showed run 2 is still materially JIT-warming for stage-heavy ops —
# within-session runs decline monotonically past the first re-exec.
for _ in range(2):
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_caches(spark)

runs = []
for _ in range(reps):
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(time.perf_counter() - t0)
    release_caches(spark)

print(json.dumps({{"op": op_id, "median": statistics.median(runs),
                   "runs": runs}}))
"""


_ANCHOR_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from transit_scrape_spark.session import get_spark
from transit_scrape_spark.bench_anchor import run_anchor
spark = get_spark("tss-bench-anchor")
spark.sparkContext.setLogLevel("ERROR")
print(json.dumps(run_anchor(spark)))
"""


def run_anchor_subprocess() -> dict:
    """Frozen calibration anchor in its own fresh process (same
    protocol as every measured query here); see bench_anchor.py."""
    proc = subprocess.run(
        [sys.executable, "-c", _ANCHOR_CHILD.format(repo=REPO)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    if proc.returncode != 0:
        print(f"# anchor FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
        return {"anchor_sec": None, "box_factor": None}
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    anchor = run_anchor_subprocess()
    print(
        f"# anchor: {anchor['anchor_sec']}s (box_factor {anchor['box_factor']})",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}
    for op_id in HEADLINE:
        script = _CHILD.format(repo=REPO, op_id=op_id, sf_dir=sf_dir, reps=reps)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=600,
        )
        wall = time.perf_counter() - t0
        if proc.returncode != 0:
            print(f"# {op_id}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        # last stdout line is the child's JSON (Spark banners go to stderr)
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        timings[op_id] = round(payload["median"], 4)
        runs_detail[op_id] = [round(r, 4) for r in payload["runs"]]
        print(
            f"# {op_id}: {payload['median']:.3f}s isolated "
            f"(runs {runs_detail[op_id]}, proc wall {wall:.1f}s)",
            file=sys.stderr,
        )

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    bf = anchor.get("box_factor") or 1.0
    out = {
        "metric": "isolated_headline_median_sec",
        "unit": "sec",
        "sf": sf_val,
        "reps": reps,
        "queries": timings,
        # box-speed-adjusted (divided by box_factor): compare THESE
        # across rounds — see transit_scrape_spark/bench_anchor.py
        "queries_norm": {k: round(v / bf, 4) for k, v in timings.items()},
        **{k: v for k, v in anchor.items() if k != "anchor_runs"},
        "runs": runs_detail,
        "warmups": 2,
        "protocol": "fresh subprocess + fresh SparkSession per query, "
        "2 warm-ups + median of reps (warmups 1 -> 2 in r11, see "
        "BENCH_REGRESSION_r10.md); anchor: fresh process, 2 warm-ups "
        "+ min of 5 on the frozen pinned workload",
    }
    path = os.path.join(REPO, "BENCH_ISOLATED.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))


if __name__ == "__main__":
    main()
