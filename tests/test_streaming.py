"""Structured Streaming tests: the readStream variants of the window
operators, run hermetically with availableNow triggers + memory sink."""

from __future__ import annotations

import shutil

import pytest

from angelo_bravo_etl_task_spark.sources.readers import load_table
from angelo_bravo_etl_task_spark.streaming.windows import (
    session_window_agg,
    stream_events,
    streaming_dedup,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    # re-write events as micro-timestamped parquet the stream reader can use
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _run_to_memory(df, name: str, output_mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_stream_dir):
    stream = stream_events(spark, events_stream_dir, watermark="1 minute")
    _run_to_memory(
        tumbling_window_agg(stream, "10 minutes"), "tumbling_sink", "append"
    )
    got = spark.sql(
        "SELECT window_start, event_type, n_events FROM tumbling_sink"
    ).collect()
    batch = tumbling_window_agg(
        load_table(spark, sf_dir, "events"), "10 minutes"
    ).collect()
    # watermark may hold back the final windows; everything emitted must
    # match the batch result exactly
    batch_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r["window_start"], r["event_type"])] == r["n_events"]


def test_streaming_session_windows(spark, events_stream_dir):
    stream = stream_events(spark, events_stream_dir, watermark="1 minute")
    _run_to_memory(
        session_window_agg(stream, gap="30 minutes"), "session_sink", "append"
    )
    rows = spark.sql("SELECT * FROM session_sink").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_sliding_windows(spark, sf_dir, events_stream_dir):
    from angelo_bravo_etl_task_spark.streaming.windows import sliding_window_agg

    stream = stream_events(spark, events_stream_dir, watermark="1 minute")
    _run_to_memory(
        sliding_window_agg(stream, "10 minutes", "5 minutes"), "sliding_sink", "append"
    )
    got = spark.sql("SELECT window_start, event_type, n_events FROM sliding_sink").collect()
    batch = sliding_window_agg(
        load_table(spark, sf_dir, "events"), "10 minutes", "5 minutes"
    ).collect()
    batch_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r["window_start"], r["event_type"])] == r["n_events"]


def test_streaming_to_parquet_sink(spark, events_stream_dir, tmp_path):
    """Production sink shape: availableNow → parquet with checkpoint; the
    same writeStream works against object storage on a cluster."""
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_events(spark, events_stream_dir, watermark="1 minute")
    q = (
        tumbling_window_agg(stream, "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        "sum_value",
    }


def test_streaming_dedup(spark, events_stream_dir):
    stream = stream_events(spark, events_stream_dir, watermark="1 minute")
    _run_to_memory(streaming_dedup(stream, ["event_id"]), "dedup_sink", "append")
    n = spark.sql("SELECT count(*) AS c FROM dedup_sink").collect()[0]["c"]
    total = spark.read.parquet(events_stream_dir).count()
    assert n == total  # event_id is unique → nothing dropped, nothing dup'd
