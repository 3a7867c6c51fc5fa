"""Wave-102 properties: read-path fault tolerance. The in-query asserts
already prove the strict default throws on the planted fault (the
lenient path is load-bearing); these tests pin the surviving-row
semantics against independently computed answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import QUERIES


def _events(spark, sf_dir):
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )


def test_src12_lenient_read_returns_all_good_rows(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_rows_readable"], r["sum_readable_ids"])
        for r in QUERIES["src12_corrupt_parquet"][0](
            spark, sf_dir
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert got == want


def test_src12_flag_is_noop_on_clean_directory(spark, sf_dir, tmp_path):
    """ignoreCorruptFiles must not DROP anything from a healthy dataset
    — the lenient read's equality in src12 certifies corrupt-skip, not
    an unconditional row loss."""
    ev = _events(spark, sf_dir)
    path = str(tmp_path / "clean")
    ev.repartition(3).write.parquet(path)
    strict = spark.read.parquet(path).count()
    lenient = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(path)
        .count()
    )
    assert strict == lenient == ev.count()


def test_src13_survivors_are_exactly_non_deleted_partitions(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_surviving"], r["sum_surviving_ids"])
        for r in QUERIES["src13_ignore_missing_files"][0](
            spark, sf_dir
        ).collect()
    }
    ev = _events(spark, sf_dir)
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.where(F.col("event_id") % 4 != 3)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert got == want
    # the deleted slice is genuinely non-empty at every SF
    assert ev.where(F.col("event_id") % 4 == 3).count() > 0
