#!/usr/bin/env python
"""Dump .explain("formatted") output for named ops into plans/r11/.

Usage:
    python tools/dump_plans_r11.py <suffix> <op-id> [<op-id> ...]

<suffix> is "before" or "after"; files land in $PLANS_OUT (default
/root/repo/plans/r11) as <op>_<suffix>.txt. Run from any tree: the
registry import resolves against the tree this file lives in, so
running the copy inside a worktree at an older commit captures that
commit's plans (the judge compares _before/_after against code claims).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    ops = sys.argv[2:]
    out_dir = os.environ.get("PLANS_OUT", "/root/repo/plans/r11")
    os.makedirs(out_dir, exist_ok=True)

    from transit_scrape_spark.plans.inspect import formatted_plan
    from transit_scrape_spark.queries.registry import registry
    from transit_scrape_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump-plans-r11", shuffle_partitions=8)
    r = registry()
    for op in ops:
        path = os.path.join(out_dir, f"{op}_{suffix}.txt")
        try:
            df = r[op].fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as ex:  # keep going; record the failure
            plan = f"PLAN DUMP FAILED: {ex!r}"
        with open(path, "w") as fh:
            fh.write(f"# {op} ({suffix}) — tree: {REPO}\n\n{plan.strip()}\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
