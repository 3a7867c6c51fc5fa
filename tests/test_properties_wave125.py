"""Wave-125 properties: mrl1's agreement-measure laws and bon1's
selection laws (reward extrema, packing round-trip, completeness)."""

from __future__ import annotations

from angelo_bravo_etl_task_spark.queries_wave125 import (
    bon1_best_of_n,
    mrl1_matryoshka_topk,
)


def test_mrl1_agreement_laws(spark, sf_dir):
    rows = mrl1_matryoshka_topk(spark, sf_dir).collect()
    assert len(rows) == 30  # one row per query vector
    for r in rows:
        # overlap is a set-intersection size of two 5-element sets
        assert 0 <= r["overlap_5"] <= 5, r
        # a cosine (scaled) stays in [-1e4, 1e4]
        assert -10000 <= r["pfx_top1_sim_x1e4"] <= 10000, r
        assert r["full_top1"] != r["query_id"]
        assert r["pfx_top1"] != r["query_id"]
        # when the two top-1s agree, overlap must count it
        if r["full_top1"] == r["pfx_top1"]:
            assert r["overlap_5"] >= 1, r


def test_bon1_selection_laws(spark, sf_dir):
    from pyspark.sql import functions as F

    from angelo_bravo_etl_task_spark.sources.readers import load_table

    rows = bon1_best_of_n(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs // 4  # complete 4-candidate groups only
    for r in rows:
        assert r["n_cands"] == 4
        # chosen/rejected come from the prompt's own candidate slots
        assert r["chosen_doc"] // 4 == r["prompt_id"], r
        assert r["rejected_doc"] // 4 == r["prompt_id"], r
        assert r["chosen_reward"] >= r["rejected_reward"], r
        # on a reward tie the packing must resolve both to the MIN doc id
        if r["chosen_reward"] == r["rejected_reward"]:
            assert r["chosen_doc"] == r["rejected_doc"], r
    # spot-check one prompt against a direct recompute
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 4)
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda t: F.length(t) > 0,
    )
    direct = {
        row["doc_id"]: row["reward"]
        for row in d.select(
            "doc_id",
            F.size(F.array_distinct(toks)).alias("nd"),
            F.size(toks).alias("nw"),
        ).selectExpr(
            "doc_id", "CAST((1000 * nd) DIV (nw + 1) AS BIGINT) AS reward"
        ).collect()
    }
    p0 = next(r for r in rows if r["prompt_id"] == 0)
    best = max(direct.items(), key=lambda kv: (kv[1], -kv[0]))
    worst = min(direct.items(), key=lambda kv: (kv[1], kv[0]))
    assert p0["chosen_doc"] == best[0] and p0["chosen_reward"] == best[1]
    assert p0["rejected_doc"] == worst[0] and p0["rejected_reward"] == worst[1]
