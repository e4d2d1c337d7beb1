"""The SCALING.md layout actually delivers its plan properties: partition
pruning on the partitioned tables, bucket-pruned shuffle-free joins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_partition_pruning_and_bucketed_join(spark, sf_dir, tmp_path):
    from tools.build_warehouse import build
    from transit_scrape_spark.plans.inspect import exchange_count, executed_plan

    out = str(tmp_path / "wh")
    build(spark, sf_dir, out)

    # partition pruning: a segment filter reads one partition directory
    cust = spark.read.parquet(f"{out}/customer_by_segment")
    q = cust.filter(F.col("c_mktsegment") == "BUILDING")
    plan = executed_plan(q)
    # the scan's partition filter prunes to a single directory
    assert "c_mktsegment" in plan
    n_building = q.count()
    assert 0 < n_building < cust.count()

    # date-partitioned events: pruning by day
    ev = spark.read.parquet(f"{out}/events_by_date")
    one_day = ev.filter(F.col("event_date") == "2024-01-05")
    assert 0 < one_day.count() < ev.count()

    # bucketed join: no hash-partition exchange between the scans and join
    o = spark.table("wh_orders")
    li = spark.table("wh_lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
    assert "SelectedBucketsCount" in executed_plan(joined)
    # one exchange total (the final groupBy), none for the join
    assert exchange_count(joined) <= 1
