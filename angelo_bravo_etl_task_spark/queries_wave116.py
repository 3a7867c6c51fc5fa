r"""Round-8 wave 116: frequency-weighted soft deduplication (d12) — the
modern alternative to hard dedup: instead of dropping duplicates, keep
ONE representative per near-dup cluster carrying the cluster's
multiplicity as a WEIGHT, so the training loss (or a later sampler) can
down-weight repeated content without losing it entirely (the
count-based reweighting used by several large-corpus recipes).

Pure composition of certified machinery: d7's full-scale cluster
pipeline (banded MinHash-LSH -> exact Jaccard confirm -> connected
components) followed by one aggregate. The oracle extends d7's exact
ground-truth SQL with the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register
from .queries_px import _D7_SQL, d7_lsh_dedup_e2e

_D12_SQL = f"""
    WITH clusters AS ({_D7_SQL})
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM clusters GROUP BY cluster_id
    """


@_register("d12_soft_dedup_weights", _D12_SQL)
def d12_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: one row per near-dup CLUSTER — the min-id
    representative plus ``dup_count``, the multiplicity a loss function
    or sampler uses to down-weight repeated content (weight 1/dup_count
    reproduces hard-dedup's gradient in expectation; intermediate
    policies interpolate). Unique documents pass through with
    dup_count = 1, so the output is a complete, re-weighted corpus
    manifest, not a filtered one.

    Built entirely from d7's certified cluster pipeline (LSH candidates
    -> exact confirm -> connected components) plus ONE aggregate on
    cluster_id; the oracle wraps d7's exact inverted-gram-index SQL in
    the same aggregate, so the hash certifies the composition end to
    end.

    100 TB shape: adds a single map-side-combinable aggregate (min, count
    per cluster) to d7's already-bounded pipeline — the weight
    computation is free relative to the clustering it rides on."""
    clusters = d7_lsh_dedup_e2e(spark, sf_dir)
    return clusters.groupBy("cluster_id").agg(
        F.min("doc_id").cast("bigint").alias("doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("dup_count"),
    ).select("doc_id", "dup_count")
