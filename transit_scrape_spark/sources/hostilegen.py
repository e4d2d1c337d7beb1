"""Null-and-duplicate-hostile warehouse generator (r9 evidence axis).

The base warehouse is NULL-free and primary-key-unique — two properties
production data never has at 100 TB. This generator produces a variant
of the warehouse that deliberately breaks both, deterministically:

1. **NULL injection** — every non-key payload column gets NULLs at
   ``null_pct``% of rows, selected by ``pmod(hash(pk…, colname), 100)``
   so the pattern is content-derived (stable across runs, partitioning,
   and engines) and *independent per column* (a row may have any subset
   of its payload columns nulled). Key / identity columns are protected
   so referential integrity and join cardinalities stay meaningful.

2. **Full-row duplication** — ``dup_pct``% of rows (selected by a pk
   hash, *after* null injection) are appended a second time, so the
   "primary key" columns are no longer unique. Full-row duplicates are
   value-safe for order-insensitive comparison: any tie between the two
   copies is a tie between identical rows, so whichever copy an engine
   picks, the emitted values match.

Why this axis matters: it targets the cross-engine divergence classes
no uniform/zipfian fixture can reach —
- NULL *ordering* defaults differ (Spark ASC ⇒ NULLS FIRST, DuckDB
  ASC ⇒ NULLS LAST), so any window/sort op over a nullable column that
  does not pin null placement explicitly silently disagrees;
- NULL *propagation* differs per function (Spark ``concat`` is
  null-annihilating, DuckDB ``concat`` null-skipping; ``greatest`` /
  ``least`` skip NULLs in one engine and not in historic versions of
  the other);
- aggregate null-skipping vs ``count(*)``, all-NULL groups, NULL join
  keys dropped by equi-joins, NULL array payloads for every vector op.
An op that is green on every existing sweep can still be wrong on all
of these, because the base fixtures simply contain no NULLs.

Consumed by tests/test_null_parity.py (registry-wide oracle parity on
the hostile warehouse) — the same totality posture as the zipfian-skew
axis (sources/skewgen.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Identity columns: never nulled, and used as the row-selection hash for
# duplication. Everything else is a nullable payload.
PROTECTED = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def write_table_like_testdata(df, out: str, name: str) -> None:
    """Write one table in the EXACT driver-testdata layout: a single
    parquet FILE named ``{name}.parquet`` directly under ``out``.

    The hostility warehouses must be drop-in ``sf_dir`` replacements:
    the streaming file source streams ``sf_dir`` with a
    ``pathGlobFilter='events.parquet'`` that only matches a plain file
    (a multi-file directory silently streams ZERO rows), and several
    fixture bootstraps open the path as a file. Layout hostility
    (multi-file, tiny splits) is the partition-invariance sweep's job,
    not this one's — these warehouses vary the DATA, not the layout.
    """
    import glob
    import shutil

    tmp = f"{out}/_tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dest = f"{out}/{name}.parquet"
    # a pre-r9 directory-layout leftover at dest would make shutil.move
    # nest the new part file INSIDE it, silently mixing stale part files
    # into the table (r9 advice) — clear any existing dest first
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    elif os.path.exists(dest):
        os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


def warehouse_needs_build(out: str) -> bool:
    """True if ``out`` lacks a current single-FILE-layout warehouse.

    The r9 layout change made ``{out}/events.parquet`` a plain file;
    checking ``isdir`` (the pre-r9 layout) both regenerated on every run
    AND let a stale directory-layout warehouse pass, silently running
    triage against a layout where streaming ops stream zero rows (r9
    advice). A stale directory marker wipes the whole out dir so the
    rebuild starts clean."""
    import shutil

    marker = os.path.join(out, "events.parquet")
    # completion sentinel (r10 advice): events.parquet alone is not
    # proof the whole warehouse was written — a generator crash after
    # some tables leaves a partial warehouse that would never rebuild.
    # The sentinel is written as the generator's LAST step; warehouses
    # predating it (no sentinel) rebuild once and gain it.
    sentinel = os.path.join(out, "_SUCCESS")
    if os.path.isfile(marker) and os.path.isfile(sentinel):
        return False
    if os.path.isdir(marker):
        shutil.rmtree(out, ignore_errors=True)
    return True


def generate_hostile_warehouse(
    spark: SparkSession,
    src: str,
    out: str,
    null_pct: int = 10,
    dup_pct: int = 5,
) -> None:
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        keys = [F.col(k) for k in PROTECTED[name]]
        for c in df.columns:
            if c in PROTECTED[name]:
                continue
            keep = F.pmod(F.hash(*keys, F.lit(c)), F.lit(100)) >= null_pct
            df = df.withColumn(c, F.when(keep, F.col(c)))
        dup = df.filter(F.pmod(F.hash(*keys, F.lit("__dup")), F.lit(100)) < dup_pct)
        df = df.unionAll(dup)
        write_table_like_testdata(df, out, name)
    # completion sentinel LAST: warehouse_needs_build keys on this, so a
    # generator crash mid-way leaves a warehouse that rebuilds instead
    # of a partial one that passes the presence check (r10 advice)
    with open(os.path.join(out, "_SUCCESS"), "w") as fh:
        fh.write("")
