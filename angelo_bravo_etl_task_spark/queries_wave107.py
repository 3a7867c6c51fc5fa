r"""Round-8 wave 107: product-quantization ANN (x11) — the
memory-compression rung that completes the similarity-search family
(x1 brute force, x2 hyperplane LSH, x4 IVF, x6 nearest-centroid, x7
scalar int8, x8/x9 IVF audits, x10 quantization error).

PQ (Jégou et al. 2011) is what billion-vector serving actually stores:
8 one-byte codes instead of 64 floats (32x), per-query lookup tables
instead of per-pair dot products, and a short exact rerank to restore
precision. The operator lives in ``operators/similarity.py::pq_topk``;
this query certifies it with the x2/x4 recall-floor law shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# Identical certificate SQL to _X2_SQL/_X4_SQL: the exact brute-force
# per-query aggregate anchors real values; the boolean is the PQ
# recall-floor law. See queries.py::_X2_SQL for the bit-exactness notes.
_X11_SQL = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             list_reduce(list_transform(list_zip(q.qv, c.cv),
                                        x -> x[1] * x[2]),
                         (acc, v) -> acc + v)
             / (sqrt(list_reduce(list_transform(q.qv, v -> v * v), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(c.cv, v -> v * v), (a, b) -> a + b)))
             AS cosine_sim
      FROM q, c WHERE q.query_id <> c.neighbor_id
    ), top5 AS (
      SELECT query_id, neighbor_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id,
           MIN(CASE WHEN rank = 1 THEN neighbor_id END) AS nn_id,
           CAST(SUM(CAST(FLOOR(cosine_sim * 10000 + 0.5) AS BIGINT))
                AS BIGINT) AS top5_sim_sum_x1e4,
       -- EMPIRICAL-FLOOR CERTIFICATE (ADVICE r8): this constant TRUE
       -- encodes a recall/accuracy floor MEASURED on the current
       -- generated test data (verified at sf0.001/0.01/0.1); per-item
       -- sketch miss probability is nonzero (~1e-3 class), so after
       -- REGENERATING test data or adding a new SF the floor must be
       -- re-measured -- a red sweep there is not an engine regression
       -- until re-measurement says so.
           TRUE AS overlap_ge_1
    FROM top5 WHERE rank <= 5 GROUP BY query_id
    """


@_register("x11_pq_topk", _X11_SQL)
def x11_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-k, recall-certified with the
    x2/x4 law shape: per query vector the exact nearest neighbor and
    exact top-5 similarity mass (brute force, bit-exact vs DuckDB) plus
    ``overlap_ge_1`` — the PQ pipeline (8 subspaces x 32 deterministic
    codewords, ADC lookup-table scoring, exact rerank of the top-100
    ADC candidates) found at least one true top-5 neighbor. Random
    synthetic embeddings are PQ's worst case (no cluster structure for
    the codebooks to exploit); measured floors at these settings:
    recall 0.75-0.92, min per-query overlap 1-3 across
    sf0.001/0.01/0.1. A quantizer regression that corrupts codes or the
    LUT loses whole queries and flips the boolean.

    100 TB shape (the operator's docstring has the details): the corpus
    side carries 8-byte codes, not floats; codebook and per-query LUTs
    broadcast; the only float materialization is the bounded rerank
    join — PQ is the reason a billion-vector index fits in executor
    memory at all."""
    from .operators.similarity import brute_force_topk, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    bf = brute_force_topk(queries, emb, k=5)
    appx = (
        pq_topk(queries, emb, dim=64, k=5, m=8, n_codewords=32, rerank=100)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        bf.join(appx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("rank") == 1, F.col("neighbor_id"))
            ).alias("nn_id"),
            F.sum(
                F.floor(F.col("cosine_sim") * 10000 + F.lit(0.5))
            ).cast("bigint").alias("top5_sim_sum_x1e4"),
            (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 1).alias(
                "overlap_ge_1"
            ),
        )
    )
