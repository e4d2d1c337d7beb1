"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference app's main query
re-expressed, ``/root/reference/app/app.py:65-74``: projection +
IS NOT NULL + equality filter + broadcast dim enrichment + ORDER BY id
LIMIT 1000) on sf0.001.

``queries()`` / ``oracle_sql()`` are generated from the operator
registry (``transit_scrape_spark.queries.registry``) — one entry per
implemented SURVEY.md §2 op; SQL-expressible ops carry a DuckDB oracle,
the rest (streaming-only/LSH internals) run the rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# defensive: the driver may import this module by file path; make the
# sibling package importable regardless of cwd/sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Tables load through the normalizing loader so o_orderdate is LTZ
    TimestampType regardless of the fixture generation's physical
    encoding (r1/r2 nanos vs r3 micros-NTZ) — keeps the entry schema
    stable across rounds."""
    from transit_scrape_spark.sources.tables import load_table

    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    dim = customer.select("c_custkey", "c_name", "c_mktsegment")
    return (
        orders.filter(
            F.col("o_orderstatus").isNotNull() & (F.col("o_orderpriority") == "1-URGENT")
        )
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            "c_mktsegment",
            "o_totalprice",
            "o_orderdate",
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from transit_scrape_spark.queries.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from transit_scrape_spark.queries.registry import all_oracles

    return all_oracles()
