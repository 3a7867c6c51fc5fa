"""Wave-128 properties: d14's planted-clone SimHash recall theorem and
px9's composed maintenance-loop invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries_wave128 import (
    _D14_OFFSET,
    d14_simhash_recall,
    px9_table_maintenance,
)


def test_d14_every_planted_clone_found_at_hamming_zero(spark, sf_dir):
    rows = d14_simhash_recall(spark, sf_dir).collect()
    # the theorem: identical text => identical fingerprint => hamming 0,
    # quadrant blocking cannot miss it — so ALL 100 planted pairs appear
    assert len(rows) == 100
    assert {r["doc_id"] for r in rows} == set(range(100))
    for r in rows:
        assert r["clone_id"] == r["doc_id"] + _D14_OFFSET, r
        assert r["hamming"] == 0, r


def test_d14_theorem_holds_on_constructed_docs(spark):
    # operator-level form of the same law, independent of the testdata:
    # exact text clones are flagged at hamming 0 for ANY text
    from angelo_bravo_etl_task_spark.operators.dedup import simhash_near_dups

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "a",  # single-token edge: shingle window shorter than n
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)]
        + [(100 + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(df, "text", "doc_id").collect()
    }
    for i in range(len(texts)):
        assert pairs.get((i, 100 + i)) == 0, (i, pairs)


def test_px9_maintenance_loop_invariants(spark, sf_dir):
    rows = {r["stage"]: r for r in px9_table_maintenance(spark, sf_dir).collect()}
    assert set(rows) == {"v1", "v2", "v3", "v4", "v4_post_vacuum"}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_orders = orders.count()
    n_ins = orders.where(F.col("o_orderkey") % 11 == 0).count()

    # v1 is the untouched base; the MERGE only grows it by the inserts
    assert rows["v1"]["n_rows"] == n_orders
    assert rows["v2"]["n_rows"] == n_orders + n_ins
    # the DELETE strictly shrinks; compaction and vacuum preserve content
    assert rows["v3"]["n_rows"] < rows["v2"]["n_rows"]
    for a, b in (("v3", "v4"), ("v4", "v4_post_vacuum")):
        assert rows[a]["n_rows"] == rows[b]["n_rows"], (a, b)
        assert rows[a]["sum_c"] == rows[b]["sum_c"], (a, b)

    # manifest file accounting: 4 base / +2 appends +1 DV / +1 DV / 2
    # compacted; vacuum removes the 8 expired-only files, keeps 2
    assert {s: rows[s]["n_files"] for s in rows} == {
        "v1": 4, "v2": 7, "v3": 8, "v4": 2, "v4_post_vacuum": 2,
    }
    for r in rows.values():
        assert r["files_deleted"] == 8
        assert r["files_kept"] == 2
        assert r["never_deleted_live"] is True
