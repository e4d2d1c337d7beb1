"""Physical-plan inspection utilities.

The engine's scale guarantees are plan properties (pushdown reached the
scan, the dim side broadcast, top-k avoided a global sort). These
helpers make those properties assertable in tests and inspectable in
notebooks — the `.explain("formatted")`-and-iterate loop as code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = executed_plan(df)
    for f in fragments:
        assert f in plan, f"expected {f!r} in plan:\n{plan[:4000]}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = executed_plan(df)
    for f in fragments:
        assert f not in plan, f"unexpected {f!r} in plan:\n{plan[:4000]}"


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters clauses from every scan in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:"):].strip())
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final plan (broadcast exchanges
    excluded) — the first number to check before a scale-up."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
