"""Empty-input totality sweep (r8): every batch op must run — not
necessarily return rows, but PLAN, EXECUTE and come back — against a
warehouse with the full schema and zero rows.

Why this matters at 100 TB: production pipelines constantly produce
legitimately-empty intermediates (a date partition with no late data, a
filter that matched nothing, a tenant with no events), and downstream
ops consume them unconditionally. An engine whose ops crash on empty
input (None from a collect'd aggregate, 1/n on an empty key range, [0]
on a missing query row) fails exactly when a scheduled DAG hits its
first quiet day. DuckDB parity never sees this case — it runs at
sf0.01 — so it gets its own gate.

The sweep found and fixed six real fragilities when introduced:
derive-surrogate-key (int(None) key range), observe-pipeline-metrics
(int/float(None) observed aggregates), graph-pagerank (1/0 teleport),
simsearch-ivf-probe (KeyError on absent seed vectors),
simsearch-lsh-multiprobe (IndexError on absent query row) and
join-skew-fact-fact-aqe (plan assert that can't hold without rows).

Exempt (documented below): ops whose FIRST step materializes their own
source files from table rows — with zero rows the derived fixture
itself degenerates (no files to glob, a JSON source whose schema can't
be inferred, a partitioned dataset with zero partition dirs). Those
failures are artifacts of self-contained testability, not of scan
logic: at scale the source files exist independently of row counts.
Streaming ops are excluded as in the other sweeps (replay tests +
live-plan audit cover them).
"""

from __future__ import annotations

import pytest

from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# fixture-bootstrap ops: each derives its own source files from table
# rows before scanning them, so an empty warehouse degenerates the
# FIXTURE, not the op's logic
_EXEMPT = {
    # zero nation rows -> zero .geojson files -> nothing to glob
    "derive-source-file",
    "scan-glob",
    # geojson features derived from nation rows: an empty feature array
    # JSON-infers to string, so the struct-field extraction can't bind
    "filter-valid-rows",
    "project-drop-geometry",
    "scan-geojson",
    "scan-geojson-lib",
    "sink-csv-wkt",
    "sink-geojson",
    "source-wfs",
    # corrupt-record CSV demo needs at least one record to salvage
    "scan-csv-robust",
    # partitioned-parquet round trip: zero rows -> zero partition dirs
    # -> read-back cannot infer a schema
    "scan-dynamic-partition-prune",
    "scan-partition-prune",
    "sink-parquet-partitioned",
}


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))
    return str(out)


def _covered():
    return sorted(
        k for k in registry() if not k.startswith("stream-") and k not in _EXEMPT
    )


@pytest.mark.parametrize("op_id", _covered())
def test_total_on_empty_input(op_id, spark, empty_sf):
    spec = registry()[op_id]
    try:
        n = spec.fn(spark, empty_sf).count()
    finally:
        release_caches(spark)
    assert n >= 0


def test_exempt_list_is_minimal(spark, empty_sf):
    """Every exempt op must actually FAIL on empty input — an entry that
    starts passing means a fix landed and the exemption is stale."""
    stale = []
    for op_id in sorted(_EXEMPT):
        try:
            registry()[op_id].fn(spark, empty_sf).count()
            stale.append(op_id)
        except Exception:
            pass
        finally:
            release_caches(spark)
    assert not stale, f"exempt ops now pass on empty input, remove: {stale}"
