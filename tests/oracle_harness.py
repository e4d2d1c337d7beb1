"""Local replica of the driver's correctness gate: run the Spark plan and
the DuckDB oracle side-by-side, compare row count + column names +
order-insensitive values (floats with tolerance, everything else exact).

Also replicates the driver's pandas canonicalizer failure modes (the r1
harness gap — it tuple-ized lists, so ops whose output columns the
driver cannot hash passed locally and failed the real gate):
- ArrayType/MapType/StructType output columns -> pandas "unhashable
  type" crash: rejected up front by schema inspection.
- Timestamps outside pandas' ns range (1677-09-21 .. 2262-04-11) ->
  OutOfBoundsDatetime: every datetime value is bounds-checked.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

# pandas datetime64[ns] representable range (driver canonicalizes
# through ns-resolution pandas timestamps); bounds slightly conservative
_PD_TS_MIN = datetime(1677, 9, 22)
_PD_TS_MAX = datetime(2262, 4, 11)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written multi-file table (e.g. the .skew/.sf1
            # warehouses): glob the part files
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v, op_id="?", float_sig=9):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # quantize to float_sig significant digits so last-bit drift
        # can't differ (default 9 = the driver-equivalent strictness)
        return float(f"{v:.{float_sig}g}")
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        # driver canonicalizes through pandas ns timestamps — a value
        # outside this range crashes its gate (OutOfBoundsDatetime)
        assert _PD_TS_MIN <= v <= _PD_TS_MAX, (
            f"[{op_id}] timestamp {v} outside pandas ns range "
            f"({_PD_TS_MIN.date()}..{_PD_TS_MAX.date()}) — driver gate would crash"
        )
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)):
        # driver's pandas canonicalizer hashes cell values — lists/dicts
        # are unhashable and crash it (the 7 red rows of round 1)
        raise AssertionError(
            f"[{op_id}] complex-typed cell value {type(v).__name__} — driver "
            "gate would crash (unhashable); serialize with to_json/array_join"
        )
    return v


def assert_driver_safe_schema(sdf, op_id: str = "?") -> None:
    """Reject output schemas the driver's pandas canonicalizer can't hash."""
    from pyspark.sql import types as T

    for f in sdf.schema.fields:
        assert not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
            f"[{op_id}] output column '{f.name}' is {f.dataType.simpleString()} — "
            "driver's pandas canonicalizer crashes on complex types; "
            "serialize with to_json/array_join before returning"
        )


def compare(spark_df, con, sql: str, op_id: str = "?", float_sig: int = 9) -> None:
    """float_sig: significant digits floats are quantized to before
    comparison. 9 (default) matches the driver's strictness on the
    uniform fixtures. The zipf skew axis passes 7: its ~300k-row hot
    keys accumulate engine-summation-order drift that can flip the last
    digits of a rounded SUM (e.g. tpch-q3 revenue 1290248.3 vs .2) —
    a float-associativity artifact, not a correctness signal; 7 digits
    still catches any real wrong-rows bug."""
    sdf = spark_df
    assert_driver_safe_schema(sdf, op_id)
    spark_cols = sorted(sdf.columns)
    srows = sdf.collect()

    ddf = con.execute(sql)
    duck_cols = sorted(d[0] for d in ddf.description)
    drows = ddf.fetchall()
    duck_colnames = [d[0] for d in ddf.description]

    assert spark_cols == duck_cols, (
        f"[{op_id}] column mismatch: spark={spark_cols} duck={duck_cols}"
    )
    assert len(srows) == len(drows), (
        f"[{op_id}] row count mismatch: spark={len(srows)} duck={len(drows)}"
    )

    s_set = sorted(
        (tuple(_norm(r[c], op_id, float_sig) for c in spark_cols) for r in srows), key=repr
    )
    idx = [duck_colnames.index(c) for c in duck_cols]
    d_set = sorted((tuple(_norm(r[i], op_id, float_sig) for i in idx) for r in drows), key=repr)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(f"[{op_id}] value mismatch, first diffs: {diffs}")
