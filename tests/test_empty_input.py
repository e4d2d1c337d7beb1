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

r9 removed the last 13 exemptions (fixture-bootstrap scan ops): their
failures were all schema INFERENCE degenerating on empty sources (an
empty feature array infers to nothing flattenable, a zero-partition
parquet dir has no footers to infer from). The fix — declared scan
schemas everywhere + a schema-complete empty file when a fixture has
zero rows — is the scale-correct design regardless: inference costs an
extra full pass over 100 TB and can flip types between runs. Streaming
ops are excluded as in the other sweeps (replay tests + live-plan audit
cover them).
"""

from __future__ import annotations

import pytest

from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches

# full-suite tier only (see pytest.ini): one of the exhaustive
# hostile-axis batteries — re-runs every registered op, so it is
# excluded from the default driver-budget tier and exercised by the
# once-per-round full run (pytest -m "").
pytestmark = pytest.mark.slow

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# r9: the list is EMPTY — the 13 r8 exemptions were all schema-inference
# casualties, fixed by declaring scan schemas (sources/geojson.py
# geojson_schema + declared parquet/CSV read-back schemas) and landing a
# schema-complete empty file when a fixture has zero rows — the
# scale-correct design anyway (inference costs an extra full pass at
# 100 TB and cannot bind on a legitimately-empty input).
_EXEMPT: set[str] = set()


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
