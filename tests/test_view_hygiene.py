"""Temp-view hygiene (VERDICT r4 item 3).

Ops that register temp views to exercise the SQL front door must (a)
prefix every view name (`tss_*`) so a shared long-lived session never
has a view shadowing a base-table name like `nation`, and (b) drop the
view before returning (spark.sql analyzes eagerly, so the returned
DataFrame stays valid after the drop).

The ordering test runs `sql-recursive-cte` (which historically
registered a view literally named `nation`) immediately before a
nation-scanning op in the SAME session and proves the later op still
reads the base table.
"""

from __future__ import annotations

import pytest

from transit_scrape_spark.queries.registry import registry

BASE_TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}

# every op that registers a temp view (grep createOrReplaceTempView)
_VIEW_OPS = [
    "scan-sql",
    "sink-ddl",
    "sql-recursive-cte",
    "variant-explode-agg",
    "sql-pipe-syntax",
    "agg-grouping-sets",
    "agg-listagg-ordered",
    "join-not-in-null-semantics",
    "rollup-timebucket",
    "text-udtf-bigrams",
    "text-udtf-table-arg",
]


def _temp_views(spark) -> set[str]:
    return {
        t.name
        for t in spark.catalog.listTables()
        if t.tableType == "TEMPORARY" or t.isTemporary
    }


@pytest.mark.parametrize("op_id", _VIEW_OPS)
def test_view_op_leaves_no_temp_views(spark, sf_dir, op_id):
    reg = registry()
    if op_id not in reg:
        pytest.skip(f"{op_id} not registered")
    before = _temp_views(spark)
    df = reg[op_id].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    leaked = _temp_views(spark) - before
    assert not leaked, f"{op_id} left temp views registered: {leaked}"
    assert not (leaked & BASE_TABLES)


def test_recursive_cte_does_not_shadow_nation(spark, sf_dir):
    """Sweep-order regression: sql-recursive-cte then a nation-scanning
    op in one session — the later op must see the base table (25 rows,
    real nation names), not any leftover view."""
    reg = registry()
    reg["sql-recursive-cte"].fn(spark, sf_dir).collect()
    assert "nation" not in _temp_views(spark)
    rows = reg["agg-distinct-sorted"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    # and a direct base-table read still resolves to parquet
    from transit_scrape_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "nation")
    assert n.count() == 25
