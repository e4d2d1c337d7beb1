"""Extreme-values hostile warehouse generator (r9 evidence axis #3).

The null-and-duplicate axis (hostilegen.py) broke the *presence*
assumptions (no NULLs, unique keys). This axis breaks the *value-range*
assumptions every prior fixture silently guaranteed: strings are
non-empty ASCII without surrounding whitespace, numerics are positive
and moderately sized, timestamps live in a narrow modern window, JSON
payloads parse, and vectors have nonzero norm. Production data at
100 TB violates all of these — scraped text is full of empty/unicode/
whitespace-padded fields, sensor feeds emit zeros and sign flips,
clock bugs produce epoch-0 and far-future timestamps, and upstream
serializers truncate JSON mid-object.

Mutations are deterministic and content-derived: each payload column
draws ``h = pmod(hash(pk…, colname, '__ext'), 100)`` independently per
column, and rows with h < 9 get one of three type-specific hostile
variants (3% each):

- **string**: ``''`` (empty — distinct from NULL), whitespace-padded
  (``'  ' || v || ' \\t'``), or a fixed multilingual literal
  (Latin-1 + CJK + a 4-byte emoji + Greek). The literal deliberately
  avoids case-special codepoints (ß, ligatures) whose upper()
  semantics legitimately differ between Java and ICU — the axis
  targets op bugs, not engine Unicode-table trivia. For JSON-carrying
  columns (events.props) all three variants are malformed JSON, which
  DuckDB's json_extract hard-errors on while Spark silently NULLs —
  ops must pin the "treat unparseable as absent" contract explicitly
  on both engines.
- **double**: negated, ×1e6 (magnitude outlier), or exactly 0.0.
- **int** (non-key): negated, ×1000 (int32-safe), or 0.
- **timestamp**: epoch 0 (1970-01-01), pre-epoch (1905-03-17, a
  negative Unix timestamp), or far future (2200-06-15 — inside the
  pandas ns range so the comparison harness stays exact).
- **array<float>**: all-zero vector (zero norm — cosine guards),
  negated, or ×1e3 (dot products at 1e6 scale; exact in float32
  for the fixture's value range).

Key / identity columns stay protected (same PROTECTED map as the null
axis) so joins and cardinalities remain meaningful. No NULLs and no
duplicate rows are introduced — the axes stay orthogonal so a failure
here is attributable to value hostility alone.

Consumed by tests/test_extreme_parity.py (registry-wide oracle parity
on the extreme warehouse) and tools/triage_extreme.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transit_scrape_spark.sources.hostilegen import (
    PROTECTED,
    TABLES,
    write_table_like_testdata,
)

# Multilingual but case-stable: ü/é/Δ upper-case identically in Java and
# ICU; 東京/🚇 are caseless. 4-byte emoji exercises codepoint-vs-byte
# length assumptions (both engines count codepoints).
UNICODE_LIT = "Zürich 東京 🚇 café Δδ"


def _mutate(col: F.Column, dtype: T.DataType, h: F.Column) -> F.Column:
    a, b, c = h < 3, (h >= 3) & (h < 6), (h >= 6) & (h < 9)
    if isinstance(dtype, T.StringType):
        return (
            F.when(a, F.lit(""))
            .when(b, F.concat(F.lit("  "), col, F.lit(" \t")))
            .when(c, F.lit(UNICODE_LIT))
            .otherwise(col)
        )
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return (
            F.when(a, -col).when(b, col * F.lit(1e6)).when(c, F.lit(0.0)).otherwise(col)
        )
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        # ×1000 computed in decimal(24,0) and clamped to the column's own
        # type bounds: on the current fixtures every value is int32-scale
        # so the clamp is a no-op, but a future fixture widening value
        # ranges (or ANSI mode) must degrade to a saturated outlier, not
        # wrap/error and silently weaken the axis (r9 advice).
        mx = {
            T.ShortType: 32767,
            T.IntegerType: 2147483647,
            T.LongType: 9223372036854775807,
        }[type(dtype)]
        big = (col.cast("decimal(24,0)") * F.lit(1000)).cast("decimal(24,0)")
        clamped = F.least(
            F.greatest(big, F.lit(-mx - 1).cast("decimal(24,0)")),
            F.lit(mx).cast("decimal(24,0)"),
        )
        return (
            F.when(a, -col)
            .when(b, clamped.cast(dtype))
            .when(c, F.lit(0))
            .otherwise(col)
            .cast(dtype)
        )
    if isinstance(dtype, T.TimestampType):
        return (
            F.when(a, F.lit("1970-01-01 00:00:00").cast("timestamp"))
            .when(b, F.lit("1905-03-17 07:26:39").cast("timestamp"))
            .when(c, F.lit("2200-06-15 12:34:56").cast("timestamp"))
            .otherwise(col)
        )
    if isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, (T.FloatType, T.DoubleType)
    ):
        elem = dtype.elementType.simpleString()
        zero = F.transform(col, lambda x: F.lit(0.0).cast(elem))
        neg = F.transform(col, lambda x: -x)
        big = F.transform(col, lambda x: (x * F.lit(1e3)).cast(elem))
        return F.when(a, zero).when(b, neg).when(c, big).otherwise(col)
    return col


def generate_extreme_warehouse(
    spark: SparkSession,
    src: str,
    out: str,
) -> None:
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        keys = [F.col(k) for k in PROTECTED[name]]
        for field in df.schema.fields:
            if field.name in PROTECTED[name]:
                continue
            h = F.pmod(F.hash(*keys, F.lit(field.name), F.lit("__ext")), F.lit(100))
            df = df.withColumn(field.name, _mutate(F.col(field.name), field.dataType, h))
        write_table_like_testdata(df, out, name)
    # completion sentinel LAST — warehouse_needs_build requires it so a
    # mid-generation crash triggers a rebuild (r10 advice; see
    # hostilegen.warehouse_needs_build)
    with open(os.path.join(out, "_SUCCESS"), "w") as fh:
        fh.write("")
