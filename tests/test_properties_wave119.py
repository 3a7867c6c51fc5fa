"""Wave-119 properties: d13's planted-clone law, kn1's probability-mass
bounds, kappa1's confusion-cell non-vacuity, unpivot1's cardinality law."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries_wave119 import (
    d13_incremental_dedup,
    kappa1_agreement,
    kn1_kneser_ney,
    unpivot1_wide_to_long,
)


def test_d13_planted_clones_matched(spark, sf_dir):
    """Every planted clone (id >= 1_000_000) is an exact duplicate of its
    source, so it must come back is_novel=0 with match_id = source id."""
    out = d13_incremental_dedup(spark, sf_dir)
    clones = out.where(F.col("doc_id") >= 1000000).collect()
    assert clones, "planting produced no clones — fixture drift"
    for r in clones:
        assert r["is_novel"] == 0, r
        # min-id corpus match; the source itself qualifies (jaccard 1.0),
        # so the match can never be missing, and it is <= the source id
        assert 0 <= r["match_id"] <= r["doc_id"] - 1000000, r


def test_d13_decisions_are_total(spark, sf_dir):
    out = d13_incremental_dedup(spark, sf_dir)
    bad = out.where(
        ~F.col("is_novel").isin(0, 1)
        | (F.col("is_novel") == 1) & (F.col("match_id") != -1)
        | (F.col("is_novel") == 0) & (F.col("match_id") < 0)
    ).count()
    assert bad == 0


def test_kn1_probability_bounds(spark, sf_dir):
    """Each released P_KN is a genuine probability component: num/den in
    (0, 1]; and the discounted term alone never exceeds c12/c1."""
    rows = kn1_kneser_ney(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["p_num"] <= r["p_den"], r
        assert 0 < r["p_kn_x1e6"] <= 1_000_000, r
        # min-support filter respected
        assert r["c_xy"] >= 5


def test_kappa1_cells_and_range(spark, sf_dir):
    r = kappa1_agreement(spark, sf_dir).collect()[0]
    # planted noise (doc_id % 41) guarantees disagreement cells fire;
    # correlated features guarantee agreement dominates chance
    assert r["n11"] > 0 and r["n00"] > 0 and r["n10"] > 0 and r["n01"] > 0
    assert r["n"] == r["n11"] + r["n00"] + r["n10"] + r["n01"]
    assert 0 < r["kappa_x1e6"] < 1_000_000
    assert r["kappa_den"] > 0


def test_unpivot1_cardinality(spark, sf_dir):
    out = unpivot1_wide_to_long(spark, sf_dir)
    n_flags = out.select("l_returnflag").distinct().count()
    assert out.count() == 3 * n_flags
    metrics = {r["metric"] for r in out.select("metric").distinct().collect()}
    assert metrics == {"qty_c", "price_c", "n_rows"}
