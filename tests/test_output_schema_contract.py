"""Registry-wide output-schema contract (VERDICT r10 task 5).

The 7 red rows in the r1 driver draw were not engine bugs: the DRIVER
HARNESS's pandas canonicalizer crashes on array-typed output columns
(``TypeError: unhashable type: 'list'`` — driver-side trace in
CORRECTNESS_r01.json). Outputs were reworked to scalar types in r2
(e.g. ``queries/geo.py`` wkt-to-geom serializes coordinate arrays back
to WKT strings — nested arrays stay internal), and the oracle-parity
harness asserts the same contract on every executed result — but only
when the op under test actually executes. This test locks the contract
STRUCTURALLY for all registered ops at once: every op's declared output
schema must contain only scalar top-level columns, so a future op can't
re-introduce the crash class no matter which ops the driver happens to
draw.

Schema-only by design: ``spec.fn`` builds the plan (cheap at sf0.001)
and ``df.schema`` needs no job — except for the handful of ops that
collect during plan construction (iterative training loops, streaming
bootstraps), which still run at the smallest fixture.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from transit_scrape_spark.queries.registry import registry

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = (T.ArrayType, T.MapType, T.StructType)


def _specs():
    return sorted(registry().values(), key=lambda s: s.op_id)


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.op_id)
def test_output_schema_is_driver_safe(spec, spark):
    df = spec.fn(spark, SF_DIR)
    for f in df.schema.fields:
        assert not isinstance(f.dataType, FORBIDDEN), (
            f"[{spec.op_id}] output column '{f.name}' is "
            f"{f.dataType.simpleString()} — the driver's pandas "
            "canonicalizer crashes on complex top-level types "
            "(CORRECTNESS_r01.json); serialize with to_json / "
            "array_join / WKT before returning (see queries/geo.py "
            "wkt-to-geom for the documented contract)"
        )
