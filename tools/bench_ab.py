#!/usr/bin/env python
"""Interleaved fresh-process ABBA A/B bench (VERDICT r11 task 8).

Measures a set of ops against TWO checkouts (base worktree vs the
working tree) with the bench_isolated protocol — fresh subprocess per
measurement, 2 untimed warm-ups, median of N timed runs — interleaved
in base/new/new/base order so slow box drift cancels to first order.

Usage:
    python tools/bench_ab.py --ops op-a,op-b --base /tmp/r12_base \
        [--new /root/repo] [--reps 3] [--out BENCH_AB_r12.json]

Cross-round/cross-tree performance claims in OPTIMIZATION_r12.md cite
these numbers; sweep medians are only the registry-health metric.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, statistics, sys, time

sys.path.insert(0, {repo!r})
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import (
    get_spark, quiet_bounded_window_warnings, release_caches,
)

op_id = {op_id!r}
sf_dir = {sf_dir!r}
reps = {reps}

spark = get_spark("tss-bench-ab")
spark.sparkContext.setLogLevel("ERROR")
quiet_bounded_window_warnings(spark)
spec = registry()[op_id]

# 2 untimed warm-ups (bench_isolated protocol: run 2 is still
# JIT-warming for stage-heavy ops)
for _ in range(2):
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_caches(spark)

runs = []
for _ in range(reps):
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(time.perf_counter() - t0)
    release_caches(spark)

print("ABJSON:" + json.dumps({{"median": statistics.median(runs),
                               "runs": runs}}))
"""


def run_child(repo: str, op_id: str, sf_dir: str, reps: int) -> dict:
    code = _CHILD.format(repo=repo, op_id=op_id, sf_dir=sf_dir, reps=reps)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=repo,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(
        f"{op_id} child in {repo} produced no result "
        f"(rc={p.returncode}):\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", required=True)
    ap.add_argument("--base", required=True)
    ap.add_argument("--new", default=REPO)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results: dict[str, dict] = {}
    for op in [o for o in args.ops.split(",") if o]:
        seq = []  # (label, median, runs) in ABBA order
        for label, repo in (("base", args.base), ("new", args.new),
                            ("new", args.new), ("base", args.base)):
            r = run_child(repo, op, args.sf_dir, args.reps)
            seq.append((label, r["median"], r["runs"]))
            print(f"# {op} {label}: {r['median']:.3f}s "
                  f"(runs {['%.3f' % x for x in r['runs']]})",
                  file=sys.stderr, flush=True)
        base = statistics.mean(m for lab, m, _ in seq if lab == "base")
        new = statistics.mean(m for lab, m, _ in seq if lab == "new")
        results[op] = {
            "base": base,
            "new": new,
            "ratio": round(new / base, 3) if base else None,
            "base_runs": [m for lab, m, _ in seq if lab == "base"],
            "new_runs": [m for lab, m, _ in seq if lab == "new"],
        }
        print(f"# {op}: base {base:.3f}s -> new {new:.3f}s "
              f"(x{results[op]['ratio']})", file=sys.stderr, flush=True)

    out = args.out or os.path.join(REPO, "BENCH_AB_r12.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({k: v["ratio"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
