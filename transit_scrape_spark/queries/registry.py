"""Operator registry: op_id -> (Spark plan builder, DuckDB oracle SQL).

This is the single source of truth the driver contract
(``__spark_entry__.py``) is generated from. Every operator from
SURVEY.md §2 that is implemented registers here; SQL-expressible ops
carry an ANSI-SQL oracle string (run by DuckDB on the same parquet),
non-SQL-expressible ops (streaming, LSH, reprojection) register with
``oracle=None`` and get the driver's weaker rows-only check.

Conventions (driver compares row count + schema + order-insensitive
value hash, sorting columns by name):

- Alias EVERY computed column identically on both sides.
- Type discipline: Spark ``size``/``length``/``row_number``/``ascii``
  return int — cast to long; DuckDB ``sum(BIGINT)`` returns HUGEINT —
  cast to BIGINT; double aggregates are rounded identically on both
  sides to absorb summation-order last-bit drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    op_id: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def _pin_session_confs(spark: SparkSession) -> None:
    """Runtime confs every op depends on, set defensively because the
    driver supplies its OWN session:

    - UTC session timezone: timestamp literals in filters and collected
      timestamp values are session-TZ-dependent; the DuckDB oracle is
      TZ-naive UTC, so a non-UTC session would shift every timestamp.
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS) (see
      sources/tables.py).
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def query(op_id: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame plan builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if op_id in _REGISTRY:
            raise ValueError(f"duplicate op_id {op_id!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__module__ = fn.__module__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[op_id] = QuerySpec(op_id, wrapped, oracle, doc, tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registrations run."""
    from transit_scrape_spark.queries import (  # noqa: F401
        advanced,
        analytics,
        asof,
        batteries,
        curation,
        frontier,
        geo,
        graph,
        maintenance,
        minhash,
        mlprep,
        mlprep_eval,
        mlprep_inference,
        mlprep_survival,
        multimodal,
        privacy,
        relational,
        scalar,
        scale_demo,
        sketches,
        sources_sinks,
        stats,
        stats_distributions,
        stats_tests,
        timeseries,
        tpch,
        tpch_full,
        streaming,
        text,
        vectors,
    )


def registry() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in registry().items() if v.oracle is not None}
