"""Wave-131 properties: decontamination span laws and hubness sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import _t
from angelo_bravo_etl_task_spark.queries_wave131 import (
    _CT2_N,
    _HUB_K,
    _HUB_PANEL,
    ct2_decontam_spans,
    hub1_embedding_hubness,
)


def test_ct2_span_laws(spark, sf_dir):
    rows = ct2_decontam_spans(spark, sf_dir).collect()
    assert rows, "no contaminated docs found — the planted slice must hit"
    for r in rows:
        # a doc with h hit grams covers at least N tokens (one gram) and
        # at most min(h * N, n_tokens) — the span-union law
        assert _CT2_N <= r["covered_tokens"] <= min(
            r["n_hit_grams"] * _CT2_N, r["n_tokens"]
        ), r
        assert 0 < r["covered_per_mille"] <= 1000, r
        # disposition thresholds replay exactly
        frac5 = r["covered_tokens"] * 5
        if frac5 >= r["n_tokens"] * 4:
            assert r["disposition"] == "drop", r
        elif frac5 >= r["n_tokens"]:
            assert r["disposition"] == "split", r
        else:
            assert r["disposition"] == "keep", r
    # benchmark docs themselves are never released
    assert all(r["doc_id"] % 50 != 0 for r in rows)


def test_ct2_full_duplicate_is_dropped(spark):
    # operator-level: a doc that IS a benchmark doc verbatim must come
    # back 100% covered and 'drop' — build a tiny corpus where doc 50 is
    # the benchmark (id % 50 == 0) and doc 1 is its verbatim copy, doc 2
    # is clean
    import tempfile

    rows = [
        (50, "alpha bravo carol delta echo foxtrot golf hotel"),
        (1, "alpha bravo carol delta echo foxtrot golf hotel"),
        (2, "one two three four five six seven eight"),
    ]
    with tempfile.TemporaryDirectory(prefix="sg_ct2_") as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{d}/documents.parquet"
        )
        out = {r["doc_id"]: r for r in ct2_decontam_spans(spark, d).collect()}
    assert set(out) == {1}
    assert out[1]["covered_per_mille"] == 1000
    assert out[1]["disposition"] == "drop"


def test_hub1_occurrence_conservation(spark, sf_dir):
    rows = hub1_embedding_hubness(spark, sf_dir).collect()
    n_panel = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _HUB_PANEL)
        .count()
    )
    # total k-occurrences across ALL corpus vectors is exactly panel * K;
    # the released >= 2 subset can account for at most that
    released = sum(r["k_occurrence"] for r in rows)
    assert released <= n_panel * _HUB_K
    for r in rows:
        assert 2 <= r["k_occurrence"] <= n_panel, r
