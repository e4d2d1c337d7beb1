"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a partition-parallel synthetic route feed.

Re-expresses the reference's scrape step (``src/scrape.py`` intent: pull
route features from an external feed) as a FIRST-CLASS Spark source
instead of a driver-side download loop: the source declares N input
partitions, each executor generates its own deterministic slice, and
Catalyst treats the result like any other scan (prunable, joinable).
This is the pattern a real WFS/API connector follows — swap the
deterministic generator for paged HTTP fetches per partition and the
plan shape is unchanged (each InputPartition = one page range, fetched
where the data is consumed, never through the driver).

Rows are pure functions of route_id so the DuckDB oracle regenerates
the identical feed from range().
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class RouteFeedDataSource(DataSource):
    """``spark.read.format("route_feed").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "route_feed"

    def schema(self) -> str:
        return "route_id bigint, region int, length_m double, n_stops int"

    def reader(self, schema) -> "RouteFeedReader":
        return RouteFeedReader(self.options)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RouteFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        step = max(1, (self.n + self.num_partitions - 1) // self.num_partitions)
        return [
            _Slice(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice):
        # deterministic per-id feature synthesis — executor-side, no
        # driver round-trip; a real connector pages an API here instead.
        # Yield ONE Arrow batch per partition instead of per-row tuples:
        # the Python DataSource path then transfers columnar buffers
        # (no per-row pickling) — the same reason the engine's other
        # Python touchpoints are pandas_udf/mapInArrow.
        import numpy as np
        import pyarrow as pa

        rid = np.arange(partition.start, partition.end, dtype=np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(rid, type=pa.int64()),
                pa.array((rid % 9).astype(np.int32), type=pa.int32()),
                pa.array(((rid * 37) % 100000) / 10.0, type=pa.float64()),
                pa.array((2 + (rid * 13) % 40).astype(np.int32), type=pa.int32()),
            ],
            names=["route_id", "region", "length_m", "n_stops"],
        )


class JsonlSinkDataSource(DataSource):
    """Custom Python data SINK (``df.write.format("jsonl_sink")``): the
    write-side twin of the reader above — executors serialize their
    partitions to JSON-lines files in a staging directory, and the
    driver-side commit atomically renames the staging dir into place
    (or abort discards it), the same two-phase protocol every
    production sink (S3 committers, JDBC batches, search-index bulk
    loaders) follows. Swap the file write for an HTTP bulk call and
    the plan/commit shape is unchanged."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlSinkWriter(self.options, [f.name for f in schema.fields], overwrite)


@dataclass
class _JsonlCommit(WriterCommitMessage):
    file: str
    count: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, field_names, overwrite: bool = True):
        self.path = options["path"]
        self.field_names = field_names
        self.overwrite = overwrite

    def write(self, iterator):
        """Runs on executors, once per partition."""
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        out = os.path.join(staging, f"part-{pid:05d}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {k: row[k] for k in self.field_names}, sort_keys=True
                    )
                    + "\n"
                )
                n += 1
        return _JsonlCommit(file=out, count=n)

    def commit(self, messages):
        """Driver-side: finalize only after EVERY partition succeeded.

        Honors the save mode: overwrite clears the target first so a
        re-run with fewer partitions cannot leave stale part files that
        corrupt read-back; append renames parts to fresh indices past the
        existing ones. Staging is removed after a successful commit."""
        import os
        import shutil

        final = os.path.join(self.path, "data")
        if self.overwrite and os.path.isdir(final):
            shutil.rmtree(final)
        os.makedirs(final, exist_ok=True)
        existing = sorted(n for n in os.listdir(final) if n.startswith("part-"))
        base = len(existing)
        total = 0
        for i, m in enumerate(sorted(messages, key=lambda m: m.file)):
            os.rename(m.file, os.path.join(final, f"part-{base + i:05d}.jsonl"))
            total += m.count
        succ = os.path.join(final, "_SUCCESS")
        if not self.overwrite and os.path.exists(succ):
            with open(succ) as f:
                total += int(f.read() or 0)
        with open(succ, "w") as f:
            f.write(str(total))
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
