"""Wave-103 properties: the rowlog Python-DataSource writer's two-phase
commit protocol — commit publishes exactly the task files, abort
retracts them, and a mid-job task failure never publishes a manifest."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import QUERIES
from angelo_bravo_etl_task_spark.sources.pydatasource import RowLogWriter


def test_src14_roundtrip_matches_source(spark, sf_dir):
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    got = {
        r["event_type"]: (r["n_rows"], r["sum_ids"])
        for r in QUERIES["src14_python_datasource_writer"][0](
            spark, sf_dir
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert got == want


def test_rowlog_writer_commit_and_abort_unit(tmp_path):
    """Protocol unit test without Spark tasks: write() lands a file and
    reports it; commit() publishes exactly the reported files; abort()
    removes them."""
    w = RowLogWriter({"path": str(tmp_path)})
    msg = w.write(iter([Row(a=1), Row(a=2)]))
    assert msg.n_rows == 2
    assert os.path.exists(tmp_path / msg.filename)

    w.commit([msg])
    manifest = json.load(open(tmp_path / "_manifest.json"))
    assert manifest == {"files": [msg.filename], "total_rows": 2}

    msg2 = w.write(iter([Row(a=3)]))
    w.abort([msg2])
    assert not os.path.exists(tmp_path / msg2.filename)
    # the committed file is untouched by the abort of a later attempt
    assert os.path.exists(tmp_path / msg.filename)


def test_rowlog_failed_job_publishes_no_manifest(spark, tmp_path):
    """End-to-end abort: a task that throws mid-write (ANSI div-by-zero
    planted in one row) must fail the job WITHOUT a _manifest.json —
    readers honoring the manifest can never observe a half-committed
    write."""
    from angelo_bravo_etl_task_spark.sources.pydatasource import (
        RowLogSinkDataSource,
    )

    try:
        spark.dataSource.register(RowLogSinkDataSource)
    except Exception:
        pass
    df = spark.range(0, 100).select(
        (F.lit(1000) / (F.col("id") - 50)).alias("poison"),
        F.col("id").alias("event_id"),
    )
    with pytest.raises(Exception):
        (
            df.repartition(4)
            .write.format("rowlog_sink")
            .option("path", str(tmp_path))
            .mode("append")
            .save()
        )
    assert not os.path.exists(tmp_path / "_manifest.json")
