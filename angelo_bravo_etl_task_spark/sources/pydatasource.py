"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) — the
V2 connector surface in pure Python.

``RangeSensorDataSource`` is a deterministic synthetic source: ``n_rows``
readings split across ``n_parts`` PARTITIONED ranges (each partition is an
independent read task — the parallelism contract real connectors implement),
with every value derived arithmetically from the row id, so an SQL oracle
can reproduce the full output. This is the template for wrapping any
Python-reachable system (REST pages, message queues, bespoke file formats)
as a first-class ``spark.read.format(...)`` source: partitions() defines
the split points, read(partition) yields tuples for one split.

The reference's HTTP fetch (Angelo_ETL_Task.py:135-145) stays a driver-side
staging step by design (two small files); this shows the scale path a REAL
distributed feed would take.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class RangeSensorReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 4))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _RangePartition(a, b) for a, b in zip(bounds, bounds[1:]) if a < b
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            # deterministic arithmetic -> SQL-reproducible
            yield (i, i % 7, (i * i) % 1000)


class RangeSensorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_sensor"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id bigint, value bigint"

    def reader(self, schema: StructType) -> DataSourceReader:
        return RangeSensorReader(self.options)


class RangeSensorStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of ``RangeSensorReader`` (Spark 4
    ``SimpleDataSourceStreamReader``): the offset is a row position, each
    micro-batch advances it by ``step`` rows, and ``readBetweenOffsets``
    replays any offset range exactly — the REPLAYABILITY contract that
    makes a custom streaming source recoverable from a checkpoint. Row
    content is the same id arithmetic as the batch reader, so an SQL
    oracle reproduces the union of all micro-batches regardless of how
    the stream was chunked."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.step = int(options.get("step", 100))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, a: int, b: int):
        return [(i, i % 7, (i * i) % 1000) for i in range(a, b)]

    def read(self, start):
        a = start["pos"]
        b = min(a + self.step, self.n_rows)
        return (iter(self._rows(a, b)), {"pos": b})

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["pos"], end["pos"]))


class RangeSensorStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_sensor_stream"

    def schema(self) -> str:
        return "reading_id bigint, sensor_id bigint, value bigint"

    def simpleStreamReader(self, schema: StructType):
        return RangeSensorStreamReader(self.options)


class _CommitMsg(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class RowLogWriter(DataSourceWriter):
    """Per-task writer half of the two-phase commit protocol: each task
    writes an UNCOMMITTED ``.jsonl.tmp`` file and reports it in its
    commit message; only the DRIVER's commit() publishes the file list
    into ``_manifest.json``. A reader that honors the manifest never
    sees a torn write — the exact protocol every real table format
    (and Spark's own FileOutputCommitter) implements."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rowlog sink requires option('path', ...)")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        name = f"task-{pid}-{_uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(_os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _CommitMsg(name, n)

    def commit(self, messages):
        import json as _json
        import os as _os

        files = sorted(
            (m.filename, m.n_rows) for m in messages if m is not None
        )
        manifest = {
            "files": [f for f, _ in files],
            "total_rows": sum(n for _, n in files),
        }
        with open(_os.path.join(self.path, "_manifest.json"), "w") as fh:
            _json.dump(manifest, fh)

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self.path, m.filename))
                except OSError:
                    pass


class RowLogSinkDataSource(DataSource):
    """Batch-write half of the Python DataSource surface (src7 reads,
    src9 stream-reads, THIS writes) — pure-Python V2 connector with a
    manifest-based two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "rowlog_sink"

    def writer(self, schema: StructType, overwrite: bool):
        return RowLogWriter(self.options)


class RowLogStreamWriter(DataSourceStreamWriter):
    """Streaming half of the two-phase commit (wave 112): identical task
    protocol to :class:`RowLogWriter` (uncommitted per-task files, commit
    message carries the name), but the DRIVER publishes one
    ``_manifest-<batchId>.json`` PER MICRO-BATCH. Replaying a batch
    overwrites its own manifest — commit is idempotent per batch id, so
    a restarted stream cannot double-publish; aborted attempts remove
    their task files and publish nothing."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rowlog stream sink requires option('path')")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        name = f"task-{pid}-{_uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(_os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _CommitMsg(name, n)

    def commit(self, messages, batchId):
        import json as _json
        import os as _os

        files = sorted(
            (m.filename, m.n_rows) for m in messages if m is not None
        )
        manifest = {
            "batch_id": batchId,
            "files": [f for f, _ in files],
            "total_rows": sum(n for _, n in files),
        }
        with open(
            _os.path.join(self.path, f"_manifest-{batchId}.json"), "w"
        ) as fh:
            _json.dump(manifest, fh)

    def abort(self, messages, batchId):
        import os as _os

        for m in messages:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self.path, m.filename))
                except OSError:
                    pass


class RowLogStreamSinkDataSource(DataSource):
    """Streaming-write face of the pure-Python V2 connector — with this
    the matrix is complete: src7 batch read, src9 stream read, src14
    batch write, src16 STREAM write."""

    @classmethod
    def name(cls) -> str:
        return "rowlog_stream_sink"

    def streamWriter(self, schema: StructType, overwrite: bool):
        return RowLogStreamWriter(self.options)
