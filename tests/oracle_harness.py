"""Local replica of the driver's correctness gate: run the Spark plan and
the DuckDB oracle side-by-side, compare row count + column names +
order-insensitive values (floats with tolerance, everything else exact).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # quantize to 9 significant digits so last-bit drift can't differ
        return float(f"{v:.9g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def compare(spark_df, con, sql: str, op_id: str = "?") -> None:
    sdf = spark_df
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
        (tuple(_norm(r[c]) for c in spark_cols) for r in srows), key=repr
    )
    idx = [duck_colnames.index(c) for c in duck_cols]
    d_set = sorted((tuple(_norm(r[i]) for i in idx) for r in drows), key=repr)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(f"[{op_id}] value mismatch, first diffs: {diffs}")
