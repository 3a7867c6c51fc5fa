"""The Arrow-vectorized simhash fast path must produce EXACTLY the
fingerprints of the pure Column-expression spec implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.operators.dedup import (
    _simhash_quadrants_arrow,
    shingles,
    simhash_quadrants,
)


def test_arrow_matches_expression_spec(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different words about query engines and shuffles"),
        (3, "singleword"),
        (4, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    hashed = df.select(
        "doc_id",
        F.transform(shingles(F.col("text"), 2), lambda s: F.xxhash64(s)).alias(
            "_bh"
        ),
    )
    jvm = {
        r["doc_id"]: r["fp"]
        for r in hashed.select(
            "doc_id", simhash_quadrants(F.col("_bh")).alias("fp")
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["fp"]
        for r in hashed.select(
            "doc_id", _simhash_quadrants_arrow()(F.col("_bh")).alias("fp")
        ).collect()
    }
    assert jvm == arrow
