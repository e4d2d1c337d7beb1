#!/usr/bin/env python
"""Generate a zipfian-key variant of the warehouse (VERDICT r8 ask 2).

Thin CLI over transit_scrape_spark/sources/skewgen.py (the remap
semantics and the scale rationale live there). Prints the resulting
top-3 key shares so a distribution regression is visible at a glance.

Usage:
    python tools/gen_skew.py                       # sf0.1 -> /root/repo/.skew
    SRC=/root/testdata/sf0.01 OUT=/tmp/skew001 python tools/gen_skew.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from transit_scrape_spark.session import get_spark
from transit_scrape_spark.sources.skewgen import generate_skew_warehouse

SRC = os.environ.get("SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT", "/root/repo/.skew")


def main() -> None:
    spark = get_spark("gen-skew")
    spark.sparkContext.setLogLevel("ERROR")
    generate_skew_warehouse(spark, SRC, OUT)

    for name, col in [("events", "user_id"), ("lineitem", "l_orderkey"),
                      ("orders", "o_custkey")]:
        df = spark.read.parquet(f"{OUT}/{name}.parquet")
        total = df.count()
        top = df.groupBy(col).count().orderBy(F.desc("count")).limit(3).collect()
        shares = ", ".join(f"{r[col]}:{r['count'] / total:.1%}" for r in top)
        print(f"# {name}.{col} top-3 shares: {shares}", file=sys.stderr)


if __name__ == "__main__":
    main()
