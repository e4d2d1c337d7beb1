"""Null-hostility parity sweep (r9): every batch op with a full DuckDB
oracle must produce ORACLE-IDENTICAL values on a warehouse variant with
10% deterministic NULLs in every payload column and 5% duplicated rows
(sources/hostilegen.py).

Why this matters at 100 TB: the base fixtures are NULL-free and
pk-unique — production data is neither. The axis targets divergence
classes invisible to every other sweep:
- Spark orders NULLS FIRST on ASC by default, DuckDB NULLS LAST: any
  window/sort over a nullable column that doesn't pin null placement
  explicitly disagrees between engines (and between THIS code and the
  documented SQL spec).
- Function-level null propagation differs (concat, greatest/least,
  string ops), aggregate null-skipping vs count(*), all-NULL groups,
  NULL join keys, NULL array payloads in vector ops.
- Duplicated pk rows break "unique key" assumptions silently; full-row
  duplicates are value-safe for comparison (any tie between the two
  copies is a tie between identical rows), so a mismatch here is a
  real nondeterminism or uniqueness-assumption bug, never a tie
  artifact.

Selection: EVERY op with a full oracle, streaming included — all
tables are modified by this axis, so no table-based narrowing applies,
and since r9 the hostility warehouses use the exact driver-testdata
layout (single parquet file per table) so the streaming file source
reads them natively. The streaming family's own catch from this axis:
NULL event-time rows belong to NO window (Spark's windowed streaming
agg drops them silently; DuckDB groups them) — pinned in the four
windowed oracles — and an unpinned top-k tie-break flipped between
NULLS FIRST (Spark) and NULLS LAST (DuckDB).

float_sig=6 (vs skew's 7, driver-strict 9): NULL injection changes
which rows enter float aggregates, and duplication doubles some, so
summation trees differ more between engines than on the base fixture;
6 significant digits still fails on any wrong-rows bug.

EXEMPT ops carry a per-op reason, same contract as the empty-input and
partition-invariance sweeps.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_conn
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches
from transit_scrape_spark.sources.hostilegen import generate_hostile_warehouse

# full-suite tier only (see pytest.ini): one of the exhaustive
# hostile-axis batteries — re-runs every registered op, so it is
# excluded from the default driver-budget tier and exercised by the
# once-per-round full run (pytest -m "").
pytestmark = pytest.mark.slow

# op_id -> reason. Populated only where the divergence is adjudicated
# as inherent to the hostile fixture rather than an op bug.
EXEMPT: dict[str, str] = {}


def _affected():
    return sorted(
        k
        for k, s in registry().items()
        if s.oracle
    )


@pytest.fixture(scope="module")
def hostile_sf(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hostile_sf"))
    generate_hostile_warehouse(spark, sf_dir, out)
    return out


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf):
    return duck_conn(hostile_sf)


@pytest.mark.parametrize("op_id", _affected())
def test_null_parity(op_id, spark, hostile_sf, hostile_duck):
    if op_id in EXEMPT:
        pytest.skip(f"exempt: {EXEMPT[op_id]}")
    spec = registry()[op_id]
    try:
        compare(spec.fn(spark, hostile_sf), hostile_duck, spec.oracle, op_id, float_sig=6)
    finally:
        release_caches(spark)
