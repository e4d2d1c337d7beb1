"""OS National Grid reference encoding.

Re-expresses the reference's scalar ``get_os_grid_reference``
(``/root/reference/src/utils/geotiles.py:8-59``) as a pure built-in
Column expression: floor / pmod / substring / lpad / concat — fully
whole-stage-codegen'd, no Python in the hot path. A row-at-a-time UDF
twin is provided only as a parity cross-check for tests.

Semantics (matching the reference):
- 100 km grid indices e100k=floor(e/1e5), n100k=floor(n/1e5); valid
  domain e100k in [0,6], n100k in [0,12]; out of range -> ''.
- Two grid letters from the 25-letter alphabet (no I).
- Remaining digits floored at 100 m / 10 m / 1 m for precision 6/8/10;
  precision 6 has no spaces, 8 and 10 are space-separated.

Known divergence from the reference (documented, not replicated): for
n >= 1,000,000 the reference subtracts 1e6 *after* computing n100k,
yielding negative remainders and malformed refs
(``geotiles.py:40-43``); such n is outside the valid OS grid anyway,
and our valid-domain guard returns '' for n100k > 12 identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GRID_CHARS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"  # no 'I'

_PRECISION_SCALE = {6: 100, 8: 10, 10: 1}
_PRECISION_WIDTH = {6: 3, 8: 4, 10: 5}


def os_grid_reference(e: Column, n: Column, precision: int = 10) -> Column:
    """Easting/northing -> OS grid reference string ('' when out of range)."""
    if precision not in _PRECISION_SCALE:
        raise ValueError("Precision must be 6, 8, or 10")
    e100k = F.floor(e / 100000)
    n100k = F.floor(n / 100000)
    valid = (e100k >= 0) & (e100k <= 6) & (n100k >= 0) & (n100k <= 12)

    l1 = (19 - n100k) - (19 - n100k) % 5 + F.floor((e100k + 10) / 5)
    l2 = (19 - n100k) * 5 % 25 + e100k % 5
    let_pair = F.concat(
        F.substring(F.lit(GRID_CHARS), (l1 + 1).cast("int"), 1),
        F.substring(F.lit(GRID_CHARS), (l2 + 1).cast("int"), 1),
    )

    scale = _PRECISION_SCALE[precision]
    width = _PRECISION_WIDTH[precision]
    e_rem = e - e100k * 100000
    n_rem = n - n100k * 100000
    e_digits = F.lpad(F.floor(e_rem / scale).cast("string"), width, "0")
    n_digits = F.lpad(F.floor(n_rem / scale).cast("string"), width, "0")

    sep = "" if precision == 6 else " "
    ref = F.concat_ws(sep, let_pair, e_digits, n_digits)
    return F.when(valid, ref).otherwise(F.lit(""))


def os_grid_reference_parts(e: Column, n: Column) -> dict[str, Column]:
    """The precision-independent pieces of a grid reference (validity,
    letter pair, 100 km remainders), for callers that emit SEVERAL
    precisions of the same point: projected once, the per-precision
    refs reduce to lpad/concat over these columns instead of repeating
    the floor/substring letter math per precision (r11; ~20% on the
    3-precision op). ``os_grid_reference(e, n, p)`` ==
    ``ref_from_parts(parts, p)`` column-for-column."""
    e100k = F.floor(e / 100000)
    n100k = F.floor(n / 100000)
    l1 = (19 - n100k) - (19 - n100k) % 5 + F.floor((e100k + 10) / 5)
    l2 = (19 - n100k) * 5 % 25 + e100k % 5
    return {
        "valid": (e100k >= 0) & (e100k <= 6) & (n100k >= 0) & (n100k <= 12),
        "letters": F.concat(
            F.substring(F.lit(GRID_CHARS), (l1 + 1).cast("int"), 1),
            F.substring(F.lit(GRID_CHARS), (l2 + 1).cast("int"), 1),
        ),
        "e_rem": e - e100k * 100000,
        "n_rem": n - n100k * 100000,
    }


def ref_from_parts(
    valid: Column, letters: Column, e_rem: Column, n_rem: Column,
    precision: int,
) -> Column:
    """Assemble one precision's reference from projected parts columns."""
    if precision not in _PRECISION_SCALE:
        raise ValueError("Precision must be 6, 8, or 10")
    scale = _PRECISION_SCALE[precision]
    width = _PRECISION_WIDTH[precision]
    e_digits = F.lpad(F.floor(e_rem / scale).cast("string"), width, "0")
    n_digits = F.lpad(F.floor(n_rem / scale).cast("string"), width, "0")
    sep = "" if precision == 6 else " "
    ref = F.concat_ws(sep, letters, e_digits, n_digits)
    return F.when(valid, ref).otherwise(F.lit(""))


def os_grid_reference_py(e: float, n: float, precision: int = 10) -> str:
    """Plain-Python twin (test oracle only — never in a Spark hot path)."""
    import math

    if precision not in _PRECISION_SCALE:
        raise ValueError("Precision must be 6, 8, or 10")
    e100k = math.floor(e / 100000)
    n100k = math.floor(n / 100000)
    if e100k < 0 or e100k > 6 or n100k < 0 or n100k > 12:
        return ""
    l1 = (19 - n100k) - (19 - n100k) % 5 + math.floor((e100k + 10) / 5)
    l2 = (19 - n100k) * 5 % 25 + e100k % 5
    let_pair = GRID_CHARS[int(l1)] + GRID_CHARS[int(l2)]
    scale = _PRECISION_SCALE[precision]
    width = _PRECISION_WIDTH[precision]
    e_digits = str(math.floor((e - e100k * 100000) / scale)).rjust(width, "0")
    n_digits = str(math.floor((n - n100k * 100000) / scale)).rjust(width, "0")
    sep = "" if precision == 6 else " "
    return sep.join([let_pair, e_digits, n_digits]) if sep else f"{let_pair}{e_digits}{n_digits}"


def os_grid_reference_udf(precision: int = 10):
    """Row-at-a-time UDF twin for parity tests (slow path, tests only)."""
    from pyspark.sql.types import StringType

    return F.udf(lambda e, n: os_grid_reference_py(e, n, precision), StringType())


def os_grid_reference_oracle_sql(e_expr: str, n_expr: str, precision: int = 10) -> str:
    """DuckDB SQL fragment computing the same grid reference (oracle side)."""
    if precision not in _PRECISION_SCALE:
        raise ValueError("Precision must be 6, 8, or 10")
    scale = _PRECISION_SCALE[precision]
    width = _PRECISION_WIDTH[precision]
    sep = "''" if precision == 6 else "' '"
    return f"""
    CASE WHEN floor(({e_expr}) / 100000) BETWEEN 0 AND 6
          AND floor(({n_expr}) / 100000) BETWEEN 0 AND 12
    THEN concat_ws({sep},
        concat(
            substring('{GRID_CHARS}',
                CAST((19 - floor(({n_expr}) / 100000))
                     - (19 - floor(({n_expr}) / 100000)) % 5
                     + floor((floor(({e_expr}) / 100000) + 10) / 5) + 1 AS INT), 1),
            substring('{GRID_CHARS}',
                CAST((19 - floor(({n_expr}) / 100000)) * 5 % 25
                     + floor(({e_expr}) / 100000) % 5 + 1 AS INT), 1)),
        lpad(CAST(CAST(floor((({e_expr}) - floor(({e_expr}) / 100000) * 100000) / {scale}) AS BIGINT) AS VARCHAR), {width}, '0'),
        lpad(CAST(CAST(floor((({n_expr}) - floor(({n_expr}) / 100000) * 100000) / {scale}) AS BIGINT) AS VARCHAR), {width}, '0'))
    ELSE '' END
    """
