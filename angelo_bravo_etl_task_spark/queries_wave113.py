r"""Round-8 wave 113: in-batch contrastive alignment evaluation (mm8) —
the dual-encoder (CLIP-style) training/eval metric: for a batch of
paired embeddings from two modalities, how often is the TRUE partner the
nearest neighbor among all in-batch candidates (retrieval@1), and what
rank does it hold?

The second modality is synthesized deterministically from the first
(0.5x self + rotate-by-one mix — a planted alignment structure both
engines replay bit-for-bit), so the full Q x B similarity matrix, the
true-pair ranks, and the @1 hits are exactly SQL-reproducible — no
recall-floor law needed, the values themselves ride the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_BATCH = 64

_MM8_SQL = f"""
    WITH a AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS av
      FROM embeddings WHERE vec_id < {_BATCH}
    ), b AS (
      SELECT vec_id AS cand_id,
             list_transform(
               list_zip(CAST(embedding AS DOUBLE[]),
                        list_concat(CAST(embedding AS DOUBLE[])[2:],
                                    CAST(embedding AS DOUBLE[])[1:1])),
               p -> 0.5 * p[1] + p[2]) AS bv
      FROM embeddings WHERE vec_id < {_BATCH}
    ), scored AS (
      SELECT a.vec_id AS pair_id, b.cand_id,
             list_reduce(list_transform(list_zip(a.av, b.bv),
                                        x -> x[1] * x[2]),
                         (acc, v) -> acc + v)
             / (sqrt(list_reduce(list_transform(a.av, v -> v * v),
                                 (p, q) -> p + q))
                * sqrt(list_reduce(list_transform(b.bv, v -> v * v),
                                   (p, q) -> p + q))) AS sim
      FROM a, b
    ), ranked AS (
      SELECT pair_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY pair_id
                                ORDER BY sim DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT pair_id,
           CAST(MIN(CASE WHEN cand_id = pair_id THEN rnk END) AS BIGINT)
             AS true_rank,
           MIN(CASE WHEN cand_id = pair_id THEN rnk END) = 1 AS correct_at_1
    FROM ranked GROUP BY pair_id
    """


@_register("mm8_contrastive_alignment", _MM8_SQL)
def mm8_contrastive_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch contrastive retrieval eval: modality A = the raw
    embedding; modality B = 0.5*A + rotate-by-one(A), a deterministic
    stand-in for a paired encoder. The mix factor is chosen so the true
    partner is USUALLY nearest but loses retrieval@1 on ~10% of pairs
    (measured; a 0.1 rotation mix left every rank at 1 — the vacuous
    all-TRUE column the planted-violation rule exists to prevent).
    Every (i, j) in-batch cosine is computed (the B x B matrix a
    dual-encoder's contrastive loss is built on), the true pair's rank
    extracted per row, and retrieval@1 released — values bit-exact vs
    the oracle because both the perturbation arithmetic and the cosine
    fold are replayed identically in DuckDB.

    100 TB shape: contrastive eval is batched BY CONSTRUCTION — the
    matrix is B x B per batch (here one 64-pair batch, bounded), never
    corpus-wide; at scale batches map 1:1 to tasks and the per-batch
    matrix never leaves its executor. The full-corpus version of 'find
    my partner' is exactly x1/x4's ANN problem, already covered."""
    from .operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") < _BATCH).select(
        F.col("vec_id").alias("pair_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("_av"),
    )
    rot = F.concat(
        F.slice(F.col("embedding"), 2, 63), F.slice(F.col("embedding"), 1, 1)
    )
    b = emb.where(F.col("vec_id") < _BATCH).select(
        F.col("vec_id").alias("cand_id"),
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.transform(rot, lambda x: x.cast("double")),
            lambda x, y: F.lit(0.5) * x + y,
        ).alias("_bv"),
    )
    scored = a.crossJoin(F.broadcast(b)).select(
        "pair_id",
        "cand_id",
        cosine(F.col("_av"), F.col("_bv")).alias("_sim"),
    )
    from .operators.windows import with_row_number

    ranked = with_row_number(
        scored,
        ["pair_id"],
        [F.col("_sim").desc(), F.col("cand_id").asc()],
        "_rnk",
    )
    return ranked.groupBy("pair_id").agg(
        F.min(F.when(F.col("cand_id") == F.col("pair_id"), F.col("_rnk")))
        .cast("bigint")
        .alias("true_rank"),
        (
            F.min(
                F.when(F.col("cand_id") == F.col("pair_id"), F.col("_rnk"))
            )
            == 1
        ).alias("correct_at_1"),
    )
