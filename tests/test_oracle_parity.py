"""The primary correctness gate: every registered op with an oracle must
hash-match DuckDB on the same parquet (mirrors the driver's t2 check).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import assert_driver_safe_schema, compare, duck_conn
from transit_scrape_spark.queries.registry import registry


def _specs():
    return sorted(registry().values(), key=lambda s: s.op_id)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.op_id)
def test_oracle_parity(spec, spark, sf_dir, con):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only check (matches the driver's weaker gate); schema must
        # still be driver-safe — the driver materializes these results too
        assert_driver_safe_schema(df, spec.op_id)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
    else:
        compare(df, con, spec.oracle, spec.op_id)
