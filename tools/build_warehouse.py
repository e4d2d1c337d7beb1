#!/usr/bin/env python
"""Materialize the SCALING.md data layout from the flat fixture parquet:

- orders/lineitem bucketed on orderkey (co-located recurring join)
- customer partitioned by c_mktsegment (the reference's indexed filter
  column — partition pruning replaces the B-tree)
- events partitioned by event date (streaming append layout)

Usage: python tools/build_warehouse.py [--sf-dir DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir: str, out: str, n_buckets: int = 8) -> None:
    from pyspark.sql import functions as F

    from transit_scrape_spark.sources.tables import load_table

    shutil.rmtree(out, ignore_errors=True)

    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", f"{out}/{name}_bucketed")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(f"wh_{name}")
        )

    (
        load_table(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .partitionBy("c_mktsegment")
        .parquet(f"{out}/customer_by_segment")
    )

    (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(f"{out}/events_by_date")
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--out", default="/tmp/tss_warehouse")
    args = p.parse_args()

    from transit_scrape_spark.session import get_spark

    build(get_spark("build-warehouse"), args.sf_dir, args.out)
    print(f"warehouse built at {args.out}")


if __name__ == "__main__":
    main()
