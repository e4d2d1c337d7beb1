"""Vector expression library (similarity search building blocks).

Dot products / norms / cosine over ``array<float|double>`` columns as
built-in higher-order functions (zip_with + aggregate) — JVM-side,
codegen'd, no Python. For very wide vectors or batched matrix math a
pandas_udf + numpy path can be swapped in; at 64-dim the expression
path wins (no Arrow serialization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # Zero-norm vectors make cosine undefined: emit NULL rather than
    # ANSI-erroring the whole job (a single bad embedding at 100 TB must
    # not kill the stage). try_divide(x, 0) -> NULL matches DuckDB's
    # x/0 -> NULL, and NULLS sort last under desc in BOTH engines, so
    # undefined rows fall out of top-k identically.
    return F.try_divide(dot(a, b), norm(a) * norm(b))
