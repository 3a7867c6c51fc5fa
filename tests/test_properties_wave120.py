"""Wave-120 properties: gq1's branch coverage + planted-doc routing,
fim1's reassembly/segment laws, dom1's cap conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries_wave120 import (
    dom1_source_caps,
    fim1_fill_in_middle,
    gq1_gopher_repetition,
)


def test_gq1_both_reject_branches_fire(spark, sf_dir):
    g = {
        r["label"]: r["n_docs"]
        for r in gq1_gopher_repetition(spark, sf_dir).collect()
    }
    assert g.get("reject_top2", 0) > 0, g
    assert g.get("reject_dup5", 0) > 0, g
    assert g.get("keep", 0) > g.get("reject_top2", 0) + g.get(
        "reject_dup5", 0
    ), "rejects should be the planted minority"


def test_fim1_reassembly_and_segments(spark, sf_dir):
    out = fim1_fill_in_middle(spark, sf_dir)
    assert out.where(F.col("reassembles") != 1).count() == 0
    bad = out.where(
        (F.col("n_pre") + F.col("n_mid") + F.col("n_suf") != F.col("n_total"))
        | (F.col("n_mid") <= 0)
    ).count()
    assert bad == 0
    modes = {r["mode"] for r in out.select("mode").distinct().collect()}
    assert modes == {"psm", "spm"}


def test_dom1_cap_conservation(spark, sf_dir):
    rows = dom1_source_caps(spark, sf_dir).collect()
    n_sources = len(rows)
    n_total = sum(r["n_docs"] for r in rows)
    hot = [r for r in rows if r["src"] == "srcHOT"]
    assert hot and hot[0]["dropped"] > 0, "planted hot source must be capped"
    for r in rows:
        assert r["kept"] + r["dropped"] == r["n_docs"], r
        # the cap: kept <= n_total/n_sources (cross-multiplied)
        assert r["kept"] * n_sources <= n_total, r
