"""Wave-123 properties: sd1's planted-class routing and coverage laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries_wave123 import sd1_substring_dedup


def test_sd1_planted_classes_and_laws(spark, sf_dir):
    out = sd1_substring_dedup(spark, sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    # %61 docs: fully boilerplate (12 tokens), all 3 windows repeated
    # across the class, full coverage, flagged
    full = [r for i, r in rows.items() if i % 61 == 0]
    assert full
    for r in full:
        assert r["n_toks"] == 12 and r["covered_tokens"] == 12
        assert r["repeated_windows"] == 3 and r["flagged"] == 1, r
    # %13 (non-%61) docs: the 12-token prefix guarantees >= 3 repeated
    # windows and >= 12 covered tokens
    pre = [r for i, r in rows.items() if i % 13 == 0 and i % 61 != 0]
    assert pre
    for r in pre:
        assert r["repeated_windows"] >= 3 and r["covered_tokens"] >= 12, r
    # coverage laws hold everywhere
    bad = out.where(
        (F.col("covered_tokens") > F.col("n_toks"))
        | (F.col("covered_tokens") < 0)
        | ((F.col("repeated_windows") > 0) & (F.col("covered_tokens") < 10))
    ).count()
    assert bad == 0
    # negatives exist: most docs carry no cross-doc repeated window
    assert out.where(F.col("repeated_windows") == 0).count() > out.count() / 2
