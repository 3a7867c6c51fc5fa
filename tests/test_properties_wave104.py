"""Wave-104 property: the streaming observe() fold equals the batch
truth AND the sink's own totals — input/sink reconciliation with zero
extra scans. The in-query assert already forces >= 3 micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_obs2_observed_equals_sink_equals_batch(spark, sf_dir):
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    row = QUERIES["obs2_stream_observe"][0](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("s"),
        F.count_distinct("event_type").alias("t"),
    ).collect()[0]
    assert row["observed_rows"] == want["n"]
    assert row["observed_sum_ids"] == want["s"]
    assert row["sink_rows"] == want["n"]
    assert row["sink_types"] == want["t"]
