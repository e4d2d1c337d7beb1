"""Extreme-values parity sweep (r9 evidence axis #3): every op
(streaming included) with a full DuckDB oracle must produce ORACLE-IDENTICAL values on a
warehouse variant whose payload VALUES are hostile
(sources/extremegen.py): empty / whitespace-padded / multilingual+emoji
strings (including malformed-JSON props), negated / x1e6 / zero
numerics, epoch-0 / pre-epoch / far-future timestamps, and zero-norm /
negated / x1e3 embedding vectors.

Why this matters at 100 TB: the null/dup axis broke PRESENCE
assumptions; this axis breaks VALUE-RANGE assumptions, and its
divergence classes are invisible to every other sweep:

- ANSI arithmetic: Spark hard-errors where DuckDB quietly NULLs
  (x/0, decimal/long overflow) — one bad row must not kill a stage,
  so every ratio over hostile-nullable denominators is pinned
  try_divide/NULL on both engines (46 ops failed on introduction).
- Function domains: DuckDB hard-errors where Spark quietly NaNs/NULLs
  (ln/sqrt of negatives) — domain guards are pinned explicitly.
- Bytes vs codepoints: binary substring/octet_length vs text
  substring/length silently diverge on multibyte text.
- Rendering: Spark's double->string flips to scientific notation at
  1e7, DuckDB's never does — display ops render via DECIMAL.
- Parsing: malformed JSON is NULL on Spark and a hard error in DuckDB
  without json_valid guards; raw string interpolation into JSON breaks
  on control characters (to_json, never format_string).
- Spark's sequence(1, n-1) is DESCENDING for n < 2 — element_at walks
  out of bounds on short/empty docs.
- binaryFile silently SKIPS zero-byte files (pinned as the ingest
  contract).

float_sig=6 (same as the null axis): magnitude outliers change
summation trees more than the base fixture; 6 significant digits still
fails on any wrong-rows bug.

EXEMPT ops carry a per-op reason, same contract as the other sweeps.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_conn
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches
from transit_scrape_spark.sources.extremegen import generate_extreme_warehouse

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
def extreme_sf(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extreme_sf"))
    generate_extreme_warehouse(spark, sf_dir, out)
    return out


@pytest.fixture(scope="module")
def extreme_duck(extreme_sf):
    return duck_conn(extreme_sf)


@pytest.mark.parametrize("op_id", _affected())
def test_extreme_parity(op_id, spark, extreme_sf, extreme_duck):
    if op_id in EXEMPT:
        pytest.skip(f"exempt: {EXEMPT[op_id]}")
    spec = registry()[op_id]
    try:
        compare(
            spec.fn(spark, extreme_sf), extreme_duck, spec.oracle, op_id, float_sig=6
        )
    finally:
        release_caches(spark)
