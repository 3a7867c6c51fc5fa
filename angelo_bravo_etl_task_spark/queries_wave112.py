r"""Round-8 wave 112: Python DataSource STREAMING writer (src16) — the
last face of the pure-Python V2 connector matrix (src7 batch read, src9
stream read, src14 batch write, src16 stream write).

A real multi-batch stream writes through the Python
``DataSourceStreamWriter`` with per-micro-batch two-phase commit: tasks
land uncommitted files, the driver publishes one manifest PER BATCH ID
(idempotent — a replayed batch overwrites its own manifest, so restarts
cannot double-publish). The read-back honors manifests only; a planted
orphan task file is asserted invisible, and the reassembled sink rides
the driver's hash against the batch oracle.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries import _register, _t
from .operators.localframe import local_rows_df

_SRC16_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
FROM events WHERE event_id % 7 <> 0
GROUP BY event_type
"""


@_register("src16_python_stream_writer", _SRC16_SQL)
def src16_python_stream_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-write through the pure-Python connector, then certify the
    committed sink contents against batch truth.

    4 parquet tranches under maxFilesPerTrigger=2 force >= 2 micro-
    batches; each batch runs the two-phase protocol (per-task
    ``.jsonl.tmp`` files -> driver-side ``_manifest-<batchId>.json``).
    The read-back lists MANIFESTED files only: a planted orphan task
    file (the artifact of a failed attempt) is asserted invisible, the
    per-batch manifests must cover >= 2 batch ids, and the reassembled
    rows aggregate to the event totals the DuckDB oracle computes — the
    write path, commit protocol, and manifest-honoring read are all on
    the hash path.

    100 TB shape: task outputs never touch the driver — only O(#tasks)
    commit messages per batch do; per-batch manifests make the sink
    exactly-once under replay (same batch id -> same manifest, not a
    second publication) and give readers a transactional file listing,
    which is precisely the loop every real lake sink (and e18's staged
    commit) implements."""
    from .sources.pydatasource import RowLogStreamSinkDataSource

    try:
        spark.dataSource.register(RowLogStreamSinkDataSource)
    except Exception:
        pass  # already registered in this session

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") % 7 != 0)
        .select("event_id", "event_type")
    )
    base = tempfile.mkdtemp(prefix="sg_src16_")
    indir, outdir, ckpt = (
        os.path.join(base, "in"),
        os.path.join(base, "out"),
        os.path.join(base, "ckpt"),
    )
    os.makedirs(outdir)
    try:
        for t in range(4):
            ev.where(F.col("event_id") % 4 == t).repartition(1).write.mode(
                "append"
            ).parquet(indir)
        # the failed-attempt artifact: on disk, never manifested
        with open(os.path.join(outdir, "task-99-orphan.jsonl.tmp"), "w") as fh:
            fh.write('{"event_id": 999999999, "event_type": "ghost"}\n')

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(indir)
            .writeStream.format("rowlog_stream_sink")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

        manifests = sorted(glob.glob(os.path.join(outdir, "_manifest-*.json")))
        assert len(manifests) >= 2, f"expected multi-batch run: {manifests}"
        listed: list[str] = []
        total_declared = 0
        for mf in manifests:
            with open(mf) as fh:
                m = json.load(fh)
            listed += [os.path.join(outdir, f) for f in m["files"]]
            total_declared += m["total_rows"]
        assert not any("orphan" in f for f in listed), "orphan manifested"
        on_disk = set(glob.glob(os.path.join(outdir, "task-*.jsonl.tmp")))
        assert os.path.join(outdir, "task-99-orphan.jsonl.tmp") in on_disk

        back = spark.read.schema(schema).json(listed)
        assert back.count() == total_declared == ev.count()
        # materialize before the temp dir vanishes (the frame is lazy)
        rows = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum("event_id").cast("bigint").alias("sum_event_ids"),
            )
            .collect()
        )
        return local_rows_df(spark, 
            rows, "event_type string, n_events bigint, sum_event_ids bigint"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
