"""Wave-129 properties: preference fitting, data selection, linkage
weights, group normalization, chunk coverage, padding accounting, and
fertility laws — the invariants the oracle hash compare can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.operators.text import tokens
from angelo_bravo_etl_task_spark.queries import _t
from angelo_bravo_etl_task_spark.queries_wave129 import (
    _BT_PLAYERS,
    _BT_UNIT,
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _PAD_MAX,
    bt1_bradley_terry,
    chunk1_sliding_chunks,
    dsir1_importance_resampling,
    fert1_tokenizer_fertility,
    fs1_fellegi_sunter,
    grp1_group_reward_norm,
    pad1_padding_waste,
)


def test_bt1_normalization_and_strength_ordering(spark, sf_dir):
    rows = {r["player_id"]: r for r in bt1_bradley_terry(spark, sf_dir).collect()}
    assert set(rows) == set(range(_BT_PLAYERS))
    total = sum(r["strength_micro"] for r in rows.values())
    # each round renormalizes to 5e6 with per-player truncation: the total
    # can only fall short by < |P| micro-units
    assert _BT_PLAYERS * _BT_UNIT - _BT_PLAYERS <= total <= _BT_PLAYERS * _BT_UNIT
    for r in rows.values():
        assert r["strength_micro"] >= 1000
        assert 0 <= r["wins"] <= r["games"]
    # generation law: P(player a beats b) = (5 + a - b)/10, so player 4 is
    # genuinely far stronger than player 0 — the fit must recover that
    assert rows[_BT_PLAYERS - 1]["strength_micro"] > rows[0]["strength_micro"]


def test_dsir_scores_separate_disjoint_vocabularies(spark):
    # On the registry's synthetic corpus every language shares one word
    # pool, so "en scores higher" is NOT a property of that data. The
    # importance-weighting law itself is tested here on constructed docs
    # with disjoint vocabularies: target docs' grams land in buckets
    # whose target share is ~1 (weight ~1e6), non-target grams in
    # buckets with target count 0 (weight ~1e6/(c+1)) — so per-gram mean
    # scores must separate cleanly (deterministic: md5 bucketing of
    # fixed strings).
    from angelo_bravo_etl_task_spark.queries_wave129 import dsir_scores

    tgt_words = ["alpha", "bravo", "carol", "delta", "echo", "fox"]
    raw_words = ["golf", "hotel", "india", "julie", "kilo", "lima"]
    rows = []
    for i in range(8):
        rot = tgt_words[i % 6 :] + tgt_words[: i % 6]
        rows.append((i, " ".join(rot * 3), True))
    for i in range(8, 16):
        rot = raw_words[i % 6 :] + raw_words[: i % 6]
        rows.append((i, " ".join(rot * 3), False))
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    scored = {
        r["doc_id"]: r
        for r in dsir_scores(docs, F.col("is_t")).collect()
    }
    per_gram = {
        i: scored[i]["dsir_score"] / scored[i]["n_bigrams"] for i in scored
    }
    assert min(per_gram[i] for i in range(8)) > max(
        per_gram[i] for i in range(8, 16)
    )


def test_dsir1_accounting_and_selection(spark, sf_dir):
    scored = dsir1_importance_resampling(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # n_bigrams accounting: docs with w words contribute w-1 gram tokens
    wc = docs.select(
        "doc_id", (F.size(tokens(F.col("text"))) - 1).alias("expect")
    ).where(F.col("expect") >= 1)
    bad = (
        scored.join(wc, "doc_id")
        .where(F.col("n_bigrams") != F.col("expect"))
        .count()
    )
    assert bad == 0
    # the mean threshold always selects a nonempty, proper subset
    n_sel = scored.where(F.col("selected") == 1).count()
    assert 1 <= n_sel <= scored.count()


def test_fs1_field_weights_discriminate(spark, sf_dir):
    rows = {r["field"]: r for r in fs1_fellegi_sunter(spark, sf_dir).collect()}
    assert set(rows) == {"name", "acctbal_band", "name_last_char"}
    for r in rows.values():
        assert r["n_match_pairs"] >= 1  # planted clones exist in-block
        assert r["n_nonmatch_pairs"] >= 1
    # clones agree on name and acctbal band BY CONSTRUCTION ($50 < $100);
    # Laplace smoothing caps the estimate at (n+1)/(n+2), so with n >= 2
    # labeled pairs m_ppm >= 750000
    assert rows["name"]["m_ppm"] >= 750_000
    assert rows["acctbal_band"]["m_ppm"] >= 750_000
    assert rows["name"]["m_ppm"] == rows["acctbal_band"]["m_ppm"]
    # names are unique in the base table, so natural agreement is ~0
    assert rows["name"]["u_ppm"] < 50_000
    # exact-name evidence must dominate a 1-in-10 last-char coincidence
    assert rows["name"]["weight_scaled"] > rows["name_last_char"]["weight_scaled"]


def test_grp1_group_advantages_center_to_zero(spark, sf_dir):
    adv = grp1_group_reward_norm(spark, sf_dir)
    sums = (
        adv.groupBy("prompt_id")
        .agg(F.sum("advantage").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(sums) >= 10
    for r in sums:
        assert abs(r["s"]) < 1e-9 * max(r["n"], 1), r
    # z-scores of an 8-sample group are bounded by sqrt(n-1)
    mx = adv.agg(F.max(F.abs("advantage"))).first()[0]
    assert mx <= math.sqrt(8 - 1) + 1e-12


def test_chunk1_full_coverage_and_sizes(spark, sf_dir):
    chunks = chunk1_sliding_chunks(spark, sf_dir)
    lens = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .where(F.col("n") >= 1)
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.max(F.col("start_tok") + F.col("n_tok") - 1).alias("covered"),
        F.max("n_tok").alias("max_tok"),
    )
    j = per_doc.join(lens, "doc_id").collect()
    assert j, "no documents chunked"
    for r in j:
        # every token lands in some chunk, and chunk count matches stride
        assert r["covered"] == r["n"], r
        assert r["k"] == (r["n"] - 1) // _CHUNK_STRIDE + 1, r
        assert r["max_tok"] <= _CHUNK_SIZE, r


def test_pad1_accounting_closes(spark, sf_dir):
    rows = pad1_padding_waste(spark, sf_dir).collect()
    caps = {r["bucket_cap"] for r in rows}
    assert caps <= {16, 32, 64, 128, 256, 512, _PAD_MAX}
    n_docs = _t(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        # padding + real tokens exactly fill n_docs * cap
        assert r["sum_padding"] + r["sum_tokens"] == r["n_docs"] * r["bucket_cap"]
        assert 0 <= r["waste_per_mille"] < 1000


def test_fert1_fertility_at_least_one_token_per_word(spark, sf_dir):
    rows = fert1_tokenizer_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # any non-space word produces >= 1 BPE-ish token (letters, digits,
        # or symbol fallback all match) — fertility >= 1.0 is a theorem
        assert r["n_tokens"] >= r["n_words"] >= r["n_docs"]
        assert r["fertility_per_mille"] >= 1000
