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


def global_window_count(plan: str) -> int:
    """Number of WindowExec nodes with NO partition spec — the
    single-partition scale hazard (`WindowExec: No Partition Defined`).

    Plan-text shape of a Window node is ``Window [exprs], [partition?],
    [order?]`` with empty specs omitted, so the bracket-group count
    alone is ambiguous: partitioned-without-order and global-ordered
    both show two groups. Disambiguate by content — an order spec
    carries ``ASC``/``DESC`` sort markers, a partition spec does not:

    - 3 groups: partitioned + ordered -> fine.
    - 2 groups, last has sort markers: global ordered -> FLAG.
    - 2 groups, no sort markers: partitioned, no order -> fine.
    - 1 group: empty partition, no order -> FLAG.

    A global window whose DIRECT child is ``TakeOrderedAndProject``
    (rank-filter rewritten to a top-k: input is exactly k rows) or
    ``WindowGroupLimit`` (per-partition prune: input is <= k rows per
    map partition) is NOT flagged — the plan itself bounds the serial
    input, which is how top-k-by-rank ops stay scale-safe.
    """
    import re

    n = 0
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow \[", line):
            continue
        if "windowspecdefinition" not in line:
            continue
        seps = line.count("], [")
        if seps >= 2:
            continue
        if seps == 1:
            last = line.rsplit("], [", 1)[1]
            if " ASC" not in last and " DESC" not in last:
                continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "TakeOrderedAndProject" in child or "WindowGroupLimit" in child:
            continue
        n += 1
    return n


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final plan (broadcast exchanges
    excluded) — the first number to check before a scale-up."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
