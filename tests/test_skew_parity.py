"""Distribution-robustness parity sweep (r9): every fact-table op with
a full DuckDB oracle must produce ORACLE-IDENTICAL values on a
zipf(1)-keyed variant of the warehouse (same rows, same payloads,
hottest key ~50% of fact rows — sources/skewgen.py).

Why this matters at 100 TB: production keys are zipfian (users, URLs,
SKUs), test fixtures are uniform. An op can be green on every uniform
sweep and still be wrong under skew, because a hot key densifies
per-key streams until latent boundary behavior fires. On introduction
this axis caught a REAL one registry-wide: five session/gap ops cast
timestamps to long (whole seconds) where the oracle compares exact
INTERVALs, so a sub-second boundary gap (1800.5s vs the 30-minute
threshold) split sessions differently — invisible on the sparse
uniform fixture where no user's events ever straddled the boundary,
deterministic failure under zipf where the hot user has ~5k events.

Selection: ops whose oracle references a skew-remapped fact table
(events / lineitem / orders), streaming included (the hot user's
~5k-event stream densifies sessions and windows). Ops reading only
dims/documents/embeddings see byte-identical inputs here, so
re-running them would duplicate test_oracle_parity.

float_sig=7 (vs the driver-strict 9): hot keys at this scale aggregate
~30k doubles per group, where engine summation-order drift can flip
the final digits of a rounded SUM — a float-associativity artifact the
uniform sweep never hits; 7 significant digits still fails on any
wrong-rows bug.
"""

from __future__ import annotations

import re

import pytest

from tests.oracle_harness import compare, duck_conn
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches
from transit_scrape_spark.sources.skewgen import generate_skew_warehouse

# full-suite tier only (see pytest.ini): one of the exhaustive
# hostile-axis batteries — re-runs every registered op, so it is
# excluded from the default driver-budget tier and exercised by the
# once-per-round full run (pytest -m "").
pytestmark = pytest.mark.slow

_FACT = re.compile(r"\b(events|lineitem|orders)\b")


def _affected():
    return sorted(
        k
        for k, s in registry().items()
        if s.oracle and _FACT.search(s.oracle)
    )


@pytest.fixture(scope="module")
def skew_sf(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skew_sf"))
    generate_skew_warehouse(spark, sf_dir, out)
    return out


@pytest.fixture(scope="module")
def skew_duck(skew_sf):
    return duck_conn(skew_sf)


@pytest.mark.parametrize("op_id", _affected())
def test_skew_parity(op_id, spark, skew_sf, skew_duck):
    spec = registry()[op_id]
    try:
        compare(spec.fn(spark, skew_sf), skew_duck, spec.oracle, op_id, float_sig=7)
    finally:
        release_caches(spark)
