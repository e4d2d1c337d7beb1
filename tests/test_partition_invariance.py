"""Physical-partitioning invariance sweep (r8, full-registry since r9):
an op's RESULT must not depend on shuffle partition count, scan split
size, or AQE — the property that makes a plan give the same answer on 8
threads and on 1000 executors. Neither the DuckDB parity gate (one
engine config) nor the golden suites (value math) certify it; this
sweep does, directly: each covered op runs twice in the same session —
once under the suite config (AQE on, shuffle=8, 4 MB-floor scan splits)
and once under a deliberately hostile contrast (AQE off, shuffle=3,
64 KB scan splits so every parquet file shatters into many input
partitions) — and the two results must canonically match
value-for-value.

What this would catch that nothing else can: a window/row_number whose
ORDER BY under-specifies ties (partition layout then picks the winner),
a first()/head-style aggregate that inherits scan order, float
reductions whose tolerance-violating reassociation differs across
partition trees, an accidental dependence on
spark.sql.shuffle.partitions in bucketing math.

Coverage (r9, VERDICT r8 task 3): ALL batch ops — the r8 sweep sampled
76/624; the empty-input sweep proved full-registry sweeps are
affordable. Streaming ops are excluded as before — their invariance
evidence is the replay tests plus the live-plan audit (PLAN_AUDIT.md);
conf flips mid-checkpoint would test the harness, not the ops.
Legitimately layout-sensitive ops are pinned in _EXEMPT with per-op
reasons, and test_exempt_list_is_minimal fails if an exemption goes
stale (same discipline as the empty-input sweep).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import _norm
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches

# full-suite tier only (see pytest.ini): one of the exhaustive
# hostile-axis batteries — re-runs every registered op, so it is
# excluded from the default driver-budget tier and exercised by the
# once-per-round full run (pytest -m "").
pytestmark = pytest.mark.slow

# the contrast knobs: every value chosen to maximally perturb physical
# layout while leaving logical semantics untouched
_CONTRAST = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.files.openCostInBytes": "0",
}

# Ops whose OUTPUT legitimately depends on physical layout, each with
# the reason it is exempt rather than fixed. Kept as small as honest;
# test_exempt_list_is_minimal proves every entry still diverges under
# the contrast config (a stale exemption fails the suite).
_EXEMPT: dict[str, str] = {}


def _covered_ops() -> list[str]:
    return sorted(
        k
        for k in registry()
        if not k.startswith("stream-") and k not in _EXEMPT
    )


def _canon(df, op_id):
    cols = sorted(df.columns)
    rows = df.collect()
    return sorted(
        (tuple(_norm(r[c], op_id) for c in cols) for r in rows), key=repr
    )


def _run_contrast_pair(spark, sf_dir, op_id):
    spec = registry()[op_id]
    saved = {k: spark.conf.get(k) for k in _CONTRAST}
    base = _canon(spec.fn(spark, sf_dir), op_id)
    release_caches(spark)
    try:
        for k, v in _CONTRAST.items():
            spark.conf.set(k, v)
        contrast = _canon(spec.fn(spark, sf_dir), op_id)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        release_caches(spark)
    return base, contrast


@pytest.mark.parametrize("op_id", _covered_ops())
def test_partition_invariance(op_id, spark, sf_dir):
    base, contrast = _run_contrast_pair(spark, sf_dir, op_id)
    assert len(base) == len(contrast), (
        f"[{op_id}] row count changed under contrast partitioning: "
        f"{len(base)} vs {len(contrast)}"
    )
    if base != contrast:
        diffs = [(a, b) for a, b in zip(base, contrast) if a != b][:5]
        raise AssertionError(
            f"[{op_id}] result depends on physical partitioning, "
            f"first diffs: {diffs}"
        )


def test_exempt_list_is_minimal(spark, sf_dir):
    """Every exempt op must actually DIVERGE under the contrast config —
    an entry that starts matching means a fix landed and the exemption
    is stale."""
    stale = []
    for op_id in sorted(_EXEMPT):
        try:
            base, contrast = _run_contrast_pair(spark, sf_dir, op_id)
        except Exception:
            continue  # an error is still "not invariant-certifiable"
        if base == contrast:
            stale.append(op_id)
    assert not stale, (
        f"exempt ops now partition-invariant, remove from _EXEMPT: {stale}"
    )
