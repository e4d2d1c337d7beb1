#!/usr/bin/env python
"""One-shot triage for the null-hostility axis: run every oracled batch
op on the hostile warehouse (sources/hostilegen.py) and dump pass/fail
plus the first value diff to /tmp/null_triage.json. Faster to iterate
than the pytest sweep while fixing; the sweep (tests/test_null_parity.py)
is the durable gate."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle_harness import compare, duck_conn  # noqa: E402
from transit_scrape_spark.queries.registry import registry  # noqa: E402
from transit_scrape_spark.session import get_spark, release_caches  # noqa: E402
from transit_scrape_spark.sources.hostilegen import (  # noqa: E402
    generate_hostile_warehouse,
    warehouse_needs_build,
)


def main() -> None:
    only = sys.argv[1:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("null-triage", shuffle_partitions=8)
    out = os.path.join(tempfile.gettempdir(), "hostile_sf001")
    if warehouse_needs_build(out):
        generate_hostile_warehouse(spark, sf_dir, out)
    duck = duck_conn(out)
    ops = sorted(k for k, s in registry().items() if s.oracle)
    if only:
        ops = [k for k in ops if k in set(only)]
    results: dict[str, dict] = {}
    path = os.environ.get(
        "TRIAGE_OUT", "/tmp/null_triage_sub.json" if only else "/tmp/null_triage.json"
    )
    if os.path.exists(path) and not only:
        results = json.load(open(path))
    for i, op in enumerate(ops):
        if op in results and results[op]["status"] == "pass" and not only:
            continue
        spec = registry()[op]
        try:
            compare(spec.fn(spark, out), duck, spec.oracle, op, float_sig=6)
            results[op] = {"status": "pass"}
        except Exception as e:
            msg = str(e)
            results[op] = {"status": "fail", "err": msg[:600]}
        finally:
            release_caches(spark)
        if (i + 1) % 25 == 0 or results[op]["status"] == "fail":
            print(f"[{i+1}/{len(ops)}] {op}: {results[op]['status']}", flush=True)
            json.dump(results, open(path, "w"), indent=1)
    json.dump(results, open(path, "w"), indent=1)
    fails = [k for k, v in results.items() if v["status"] == "fail"]
    print(f"\nDONE: {len(results) - len(fails)} pass, {len(fails)} fail")
    print("\n".join(fails))


if __name__ == "__main__":
    main()
