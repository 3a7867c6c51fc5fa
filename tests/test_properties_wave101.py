"""Wave-101 properties: dedup-state restart (e16) and rate-limited
backfill (e17). Negative controls prove the certified mechanisms are
load-bearing: a FRESH checkpoint re-emits replayed keys, and an
uncapped availableNow drain takes ONE batch."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from angelo_bravo_etl_task_spark.queries import QUERIES

_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _events(spark, sf_dir):
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )


def test_e16_matches_batch_distinct(spark, sf_dir):
    got = {
        r["event_type"]: r["n_first_seen"]
        for r in QUERIES["e16_dedup_state_restart"][0](
            spark, sf_dir
        ).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert len(got) >= 2


def test_e16_fresh_checkpoint_reemits_replayed_keys(spark, sf_dir, tmp_path):
    """Negative control: the same tranche-B-with-replays input against a
    FRESH checkpoint (no seen-keys state from tranche A) re-emits the
    replayed keys — so e16's equality with the batch answer genuinely
    certifies the state restore."""
    ev = _events(spark, sf_dir)
    odd = ev.where(F.col("event_id") % 2 == 1)
    dup_keys = ev.where(F.col("event_id") % 10 == 0)  # even: unseen here
    indir = str(tmp_path / "in")
    odd.unionAll(dup_keys).write.parquet(indir)
    q = (
        spark.readStream.schema(_EV_SCHEMA)
        .parquet(indir)
        .dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName("e16_negative_control")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    n = spark.table("e16_negative_control").count()
    # without restored state the even replay keys are 'new' -> extra rows
    assert n == odd.count() + dup_keys.count()
    assert n > odd.count()


def test_e17_matches_batch_aggregate(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_events"], r["sum_event_ids"])
        for r in QUERIES["e17_bounded_backfill"][0](
            spark, sf_dir
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("s"),
        )
        .collect()
    }
    assert got == want


def test_e17_uncapped_drain_is_single_batch(spark, sf_dir, tmp_path):
    """Negative control: WITHOUT maxFilesPerTrigger, availableNow drains
    the same 6-file backlog in one batch — the cap (not the trigger) is
    what bounds per-batch input, which is e17's certified claim."""
    ev = _events(spark, sf_dir)
    indir = str(tmp_path / "in")
    ev.repartition(6).write.parquet(indir)
    q = (
        spark.readStream.schema(_EV_SCHEMA)
        .parquet(indir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("e17_negative_control")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    data_batches = sum(
        1
        for p in (q.recentProgress or [])
        if p and int(p["numInputRows"]) > 0
    )
    q.stop()
    assert data_batches == 1, data_batches
