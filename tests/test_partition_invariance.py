"""Physical-partitioning invariance sweep (r8): an op's RESULT must not
depend on shuffle partition count, scan split size, or AQE — the
property that makes a plan give the same answer on 8 threads and on
1000 executors. Neither the DuckDB parity gate (one engine config) nor
the golden suites (value math) certify it; this sweep does, directly:
each covered op runs twice in the same session — once under the suite
config (AQE on, shuffle=8, 4 MB-floor scan splits) and once under a
deliberately hostile contrast (AQE off, shuffle=3, 64 KB scan splits so
every parquet file shatters into many input partitions) — and the two
results must canonically match value-for-value.

What this would catch that nothing else can: a window/row_number whose
ORDER BY under-specifies ties (partition layout then picks the winner),
a first()/head-style aggregate that inherits scan order, float
reductions whose tolerance-violating reassociation differs across
partition trees, an accidental dependence on
spark.sql.shuffle.partitions in bucketing math.

Coverage = a pinned core (the headline queries plus the known
tie-break-sensitive machinery: global-order ranking, ntile deciles,
running windows) + a seeded rotating sample over the rest of the batch
registry (seed = the round number, same scheme as tools/driver_draw.py)
so the certified set grows round over round. Streaming ops are excluded
— their invariance evidence is the replay tests plus the live-plan
audit (PLAN_AUDIT.md); conf flips mid-checkpoint would test the harness,
not the ops.
"""

from __future__ import annotations

import random

import pytest

from tests.oracle_harness import _norm
from transit_scrape_spark.queries.registry import registry
from transit_scrape_spark.session import release_caches

# the contrast knobs: every value chosen to maximally perturb physical
# layout while leaving logical semantics untouched
_CONTRAST = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.files.openCostInBytes": "0",
}

# always-run core: the isolated-bench headliners + ops built on the
# machinery where a tie-break bug would live (with_global_order prefix
# ranking, ntile deciles, running/sessionized windows, LSH banding)
_CORE = [
    "tpch-q3",
    "tpch-q6",
    "tpch-q10",
    "tpch-q17",
    "join-fk-chain",
    "window-latest-per-key",
    "sessionize",
    "dedup-near-minhash",
    "simsearch-topk",
    "text-quality-score",
    "multimodal-cols",
    "analytics-rfm",
    "abc-revenue-deciles",
    "window-running-distinct",
    "window-session-concurrency",
    "agg-running-totals",
]

_SAMPLE_K = 60


def _round_seed() -> int:
    from tools.driver_draw import current_round

    return current_round()


def _covered_ops() -> list[str]:
    reg = registry()
    batch = sorted(k for k in reg if not k.startswith("stream-"))
    for op in _CORE:
        assert op in reg, f"pinned core op {op} missing from registry"
    pool = [k for k in batch if k not in _CORE]
    rng = random.Random(_round_seed())
    sample = rng.sample(pool, min(_SAMPLE_K, len(pool)))
    return _CORE + sorted(sample)


def _canon(df, op_id):
    cols = sorted(df.columns)
    rows = df.collect()
    return sorted(
        (tuple(_norm(r[c], op_id) for c in cols) for r in rows), key=repr
    )


@pytest.mark.parametrize("op_id", _covered_ops())
def test_partition_invariance(op_id, spark, sf_dir):
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
