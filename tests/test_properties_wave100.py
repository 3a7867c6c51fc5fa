"""Wave-100 properties: checkpoint/restore (e15), nested schema
evolution (src11), and the law-based oracle upgrades of qt2/a2
(verdict r7 items 5 and 6).

The law-certification queries emit booleans the oracle predicts TRUE —
so these tests prove the booleans are COMPUTED, not vacuous: the same
law expression evaluated on a planted out-of-contract value must flip
to FALSE (the x3/f25 planting rule applied to laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import QUERIES


# ------------------------------------------------------------------ e15


def test_e15_restart_matches_batch_and_processed_split(spark, sf_dir):
    """Post-restart complete-mode output == the batch aggregate over ALL
    events. The in-query asserts already guarantee the two runs split
    the input (n_a + n_b == total, n_b < total); here the returned frame
    is checked against an independently computed batch answer."""
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    got = {
        r["event_type"]: (r["n_events"], r["sum_event_ids"])
        for r in QUERIES["e15_checkpoint_restore"][0](
            spark, sf_dir
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("s"),
        )
        .collect()
    }
    assert got == want
    assert len(got) >= 2, "need multiple groups for a meaningful state"


def test_e15_fresh_checkpoint_would_undercount(spark, sf_dir, tmp_path):
    """Negative control for the state-restore claim: running ONLY the
    second tranche against a FRESH checkpoint (no restored state) yields
    strictly smaller counts than the full answer — i.e. e15's equality
    with the batch oracle genuinely certifies the restore, it is not a
    property any restart would satisfy."""
    from pyspark.sql import types as T

    from angelo_bravo_etl_task_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )
    indir = str(tmp_path / "in")
    ev.where(F.col("event_id") % 2 == 1).write.parquet(indir)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    q = (
        spark.readStream.schema(schema)
        .parquet(indir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .writeStream.format("memory")
        .queryName("e15_negative_control")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    only_b = {
        r["event_type"]: r["n_events"]
        for r in spark.table("e15_negative_control").collect()
    }
    full = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(only_b.values()) < sum(full.values())


# ---------------------------------------------------------------- src11


def test_src11_merges_both_nesting_depths(spark, sf_dir):
    rows = QUERIES["src11_nested_schema_evolution"][0](
        spark, sf_dir
    ).collect()
    b1 = [r for r in rows if r["batch"] == 1]
    b2 = [r for r in rows if r["batch"] == 2]
    assert b1 and b2, "both batches must contribute rows"
    # batch-1 rows: evolved fields NULL-extended at BOTH depths
    assert all(r["status"] is None and r["inner_y"] is None for r in b1)
    # batch-2 rows: both evolved fields populated
    assert all(r["status"] is not None for r in b2)
    assert all(
        r["inner_y"] == r["o_orderkey"] % 11 for r in b2
    )
    # the pre-existing fields survive the merge at both depths
    assert all(r["inner_x"] == r["o_orderkey"] % 7 for r in rows)
    assert all(r["custkey"] is not None for r in rows)


def test_src11_merged_read_schema_is_recursive_union(spark, sf_dir):
    """The scan itself (not the projection) must expose the recursively
    merged struct — proving mergeSchema reconciled nested types rather
    than the select fabricating columns."""
    import os

    QUERIES["src11_nested_schema_evolution"][0](spark, sf_dir)  # write
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "src11_" + os.path.basename(sf_dir.rstrip("/")),
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    meta = merged.schema["meta"].dataType
    assert set(meta.fieldNames()) == {"custkey", "status", "inner"}
    inner = meta["inner"].dataType
    assert set(inner.fieldNames()) == {"x", "y"}


# ------------------------------------------------------- qt2/a2 law tests


def test_qt2_law_boolean_is_computed_not_vacuous(spark):
    """Replicate qt2's rank-interval law over a planted frame where the
    'sketch' value is deliberately out of contract: 100 values 1..100,
    claimed q=0.5 answer v=99 (occupied ranks [99,99], target 50,
    err=1) -> the law must evaluate FALSE; the true median 50 -> TRUE."""
    df = spark.range(1, 101).select(F.col("id").alias("v"))

    def law(claimed: int) -> bool:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v") < claimed, 1).otherwise(0)).alias(
                "r_lt"
            ),
            F.sum(F.when(F.col("v") <= claimed, 1).otherwise(0)).alias(
                "r_le"
            ),
        ).collect()[0]
        n, r_lt, r_le = row["n"], row["r_lt"], row["r_le"]
        target = -(-n * 1 // 2)  # ceil(0.5 * n)
        err = n // 10000 + 1
        return r_le >= target - err and r_lt + 1 <= target + err

    assert law(50) is True
    assert law(99) is False


def test_a2_law_boolean_is_computed_not_vacuous(spark):
    """a2's tolerance law over planted counts: estimate within
    exact*8//100+1 passes, far-off estimate fails."""
    exact = 1000
    tol = exact * 8 // 100 + 1
    assert abs(1050 - exact) <= tol  # healthy sketch (5% off)
    assert not abs(2000 - exact) <= tol  # broken sketch


def test_qt2_and_a2_certifications_all_true(spark, sf_dir):
    qt2 = QUERIES["qt2_approx_quantiles"][0](spark, sf_dir).collect()
    assert qt2 and all(r["within_bound"] for r in qt2)
    # law columns are non-degenerate
    assert all(1 <= r["target_rank"] <= r["n_vals"] for r in qt2)
    assert all(r["max_rank_err"] >= 1 for r in qt2)
    a2 = QUERIES["a2_approx_distinct"][0](spark, sf_dir).collect()
    assert a2 and all(r["within_tolerance"] for r in a2)
    assert all(r["tolerance"] >= 1 for r in a2)
