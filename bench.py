#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {op_id: sec, ...}, "sf": ...}.

Timing = wall-clock of the full action (plan + execute + materialize
every output column via the noop datasource — a bare count() would let
Catalyst prune the projections being measured) after one warm-up to
absorb JVM/session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from transit_scrape_spark.queries.registry import registry
    from transit_scrape_spark.session import get_spark

    spark = get_spark("tss-bench")

    # warm-up: JVM, parquet footer reads, codegen
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for op_id, spec in sorted(registry().items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[op_id] = round(dt, 4)
        total += dt
        print(f"# {op_id}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "full_query_sweep_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
