r"""Round-8 wave 103: Python DataSource batch WRITE (src14) — the last
face of the pure-Python V2 connector surface (src7 batch read, src9
stream read, now write), with the two-phase commit protocol on the hash
path.

Every real sink — JDBC, object stores, table formats — lives or dies by
its commit protocol: task attempts write uncommitted artifacts, the
driver publishes the survivors atomically. The Python DataSource writer
API exposes exactly that (write() per task returning a commit message,
commit()/abort() on the driver), so the protocol itself is testable in
pure Python.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

_SRC14_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM events
GROUP BY event_type
"""


def _register_rowlog(spark: SparkSession) -> None:
    from .sources.pydatasource import RowLogSinkDataSource

    try:
        spark.dataSource.register(RowLogSinkDataSource)
    except Exception:
        pass  # already registered in this session


@_register("src14_python_datasource_writer", _SRC14_SQL)
def src14_python_datasource_writer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write events through the pure-Python ``rowlog_sink`` connector,
    then read back ONLY what its manifest committed and certify parity
    with the source (``sources/pydatasource.py::RowLogWriter``).

    The round-trip puts the whole commit protocol on the hash path:
    - every task's rows reach its own uncommitted file (write());
    - the driver manifest lists exactly the committed files and their
      total row count (commit());
    - the read-back honors the manifest, not the directory listing — a
      planted orphan file (a simulated failed task attempt that never
      reached commit) is asserted invisible.

    100 TB shape: task outputs never funnel through the driver — only
    the O(#tasks) commit messages do, same as every production sink.
    The JSONL body is the demo payload; the protocol is the point.
    """
    _register_rowlog(spark)
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="sg_src14_")
    try:
        (
            ev.repartition(4)
            .write.format("rowlog_sink")
            .option("path", base)
            .mode("append")
            .save()
        )
        # a failed attempt's leftover: present on disk, absent from the
        # manifest — the reader below must never see it
        with open(
            os.path.join(base, "task-9-deadbeef.jsonl.tmp"), "w"
        ) as fh:
            fh.write(json.dumps({"event_id": -1, "event_type": "ORPHAN"}))
            fh.write("\n")
        manifest = json.load(open(os.path.join(base, "_manifest.json")))
        files = manifest["files"]
        assert len(files) == 4, files
        assert "task-9-deadbeef.jsonl.tmp" not in files
        assert manifest["total_rows"] == ev.count()
        back = spark.read.json(
            [os.path.join(base, f) for f in files],
            schema="event_id bigint, event_type string",
        )
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_ids"),
        )
        res = out.collect()
        assert all(r["event_type"] != "ORPHAN" for r in res)
        return local_rows_df(spark, res, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
