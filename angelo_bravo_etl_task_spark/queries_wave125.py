r"""Round-10 wave 125: Matryoshka prefix-dimension retrieval agreement
(mrl1) and best-of-n preference-pair selection (bon1) — two more
LLM-data-pipeline verbs.

mrl1 measures what Matryoshka representation learning promises at
serving time: how much of the exact full-dimension top-k a 16-of-64
prefix-dimension search preserves. bon1 is the rejection-sampling /
DPO-pair assembly step: per prompt group, pick the best and worst
candidate by a deterministic reward with an exact packed-integer
argmax (no nondeterministic max_by ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_PREFIX_DIMS = 16  # Matryoshka prefix (of the 64-dim embeddings)

# ==========================================================================
# mrl1: prefix-dimension vs full-dimension exact top-5 agreement
# ==========================================================================

# Both rankings are EXACT brute force (x1's bit-exact left-fold), one over
# the full 64 dims and one over the first 16 — so the agreement numbers
# are deterministic measurements, not sketch internals, and hash-compare
# directly. FLOOR(sim*1e4 + 0.5) as everywhere.
_MRL1_SQL = f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 30),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    pairs AS (
      SELECT q.query_id, c.neighbor_id, q.qv, c.cv,
             list_slice(q.qv, 1, {_PREFIX_DIMS}) AS qp,
             list_slice(c.cv, 1, {_PREFIX_DIMS}) AS cp
      FROM q, c WHERE q.query_id <> c.neighbor_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             list_reduce(list_transform(list_zip(qv, cv), x -> x[1] * x[2]),
                         (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(qv, v -> v * v), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(cv, v -> v * v), (a, b) -> a + b)))
               AS full_sim,
             list_reduce(list_transform(list_zip(qp, cp), x -> x[1] * x[2]),
                         (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(qp, v -> v * v), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(cp, v -> v * v), (a, b) -> a + b)))
               AS pfx_sim
      FROM pairs
    ), full5 AS (
      SELECT query_id, neighbor_id, full_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY full_sim DESC, neighbor_id) AS r
      FROM scored
    ), pfx5 AS (
      SELECT query_id, neighbor_id, pfx_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY pfx_sim DESC, neighbor_id) AS r
      FROM scored
    )
    SELECT f.query_id,
           MIN(CASE WHEN f.r = 1 THEN f.neighbor_id END) AS full_top1,
           MIN(p1.pid) AS pfx_top1,
           CAST(COALESCE(SUM(CASE WHEN p.neighbor_id IS NOT NULL
                                  THEN 1 END), 0) AS BIGINT) AS overlap_5,
           CAST(MIN(p1.s1) AS BIGINT) AS pfx_top1_sim_x1e4
    FROM full5 f
    LEFT JOIN (SELECT query_id, neighbor_id FROM pfx5 WHERE r <= 5) p
      ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
    JOIN (SELECT query_id, neighbor_id AS pid,
                 FLOOR(pfx_sim * 10000 + 0.5) AS s1
          FROM pfx5 WHERE r = 1) p1
      ON f.query_id = p1.query_id
    WHERE f.r <= 5
    GROUP BY f.query_id
    """


@_register("mrl1_matryoshka_topk", _MRL1_SQL)
def mrl1_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) prefix-dimension retrieval agreement: exact cosine
    top-5 under the FIRST 16 of 64 embedding dimensions, compared per
    query against the exact full-dimension top-5 — released as the
    overlap count, both top-1 ids, and the prefix top-1 similarity.
    This is the measurement a team makes before switching ANN serving
    to truncated MRL embeddings: overlap_5 IS the retained recall, and
    because both rankings are exact brute force (x1's bit-exact fold on
    both engines) the numbers are deterministic measurements, not
    sketch internals — no certificate needed.

    100 TB shape: the prefix scan reads 4x fewer vector bytes and does
    4x fewer multiply-adds per pair — the whole point of MRL truncation;
    production serves prefix-dim ANN (IVF/LSH over 16-dim, x4/x2's
    shapes) then reranks survivors with full vectors, and this query is
    the OFFLINE agreement audit for that switch. Queries broadcast
    (bounded probe set, x1's documented shape); one scan computes both
    similarities per pair (the slice is a per-row array op, no second
    pass). Reference parity: extends the x-family similarity surface
    (SURVEY.md §2.4); no reference analogue (Angelo_ETL_Task.py is
    row-wise ETL only)."""
    from .operators.partitioning import spread
    from .operators.similarity import dot
    from .operators.windows import top_k_per_group

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qv"),
    )
    c = spread(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("_cv"),
        )
    )

    def cos(a, b):
        return dot(a, b) / (
            F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
        )

    qp = F.slice("_qv", 1, _PREFIX_DIMS)
    cp = F.slice("_cv", 1, _PREFIX_DIMS)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos(F.col("_qv"), F.col("_cv")).alias("full_sim"),
            cos(qp, cp).alias("pfx_sim"),
        )
        .localCheckpoint(eager=True)  # feeds both rankings
    )
    full5 = top_k_per_group(
        scored.select("query_id", "neighbor_id", "full_sim"),
        ["query_id"],
        [F.col("full_sim").desc(), F.col("neighbor_id").asc()],
        5,
        alias="r",
    )
    pfx5 = top_k_per_group(
        scored.select("query_id", "neighbor_id", "pfx_sim"),
        ["query_id"],
        [F.col("pfx_sim").desc(), F.col("neighbor_id").asc()],
        5,
        alias="r",
    )
    p1 = pfx5.where(F.col("r") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("_pid"),
        F.floor(F.col("pfx_sim") * 10000 + F.lit(0.5)).alias("_s1"),
    )
    pin = pfx5.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    return (
        full5.join(pin, ["query_id", "neighbor_id"], "left")
        .join(F.broadcast(p1), "query_id")
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("r") == 1, F.col("neighbor_id"))).alias(
                "full_top1"
            ),
            F.min("_pid").alias("pfx_top1"),
            F.coalesce(F.sum(F.when(F.col("_hit") == 1, 1)), F.lit(0))
            .cast("bigint")
            .alias("overlap_5"),
            F.min("_s1").cast("bigint").alias("pfx_top1_sim_x1e4"),
        )
    )


# ==========================================================================
# bon1: best-of-n preference-pair selection (rejection sampling / DPO prep)
# ==========================================================================

# Candidates synthesized deterministically: prompt = doc_id div 4,
# candidate slot = doc_id % 4; reward = integer lexical-diversity proxy
# (1000 * distinct words) div (words + 1). Chosen = max reward (tie: min
# doc_id), rejected = min reward (tie: min doc_id) — both via EXACT
# packed-integer extrema (pack = reward * 1e7 +/- doc arithmetic), never
# a nondeterministic max_by tie. Only complete 4-candidate groups count.
_BON1_SQL = r"""
WITH cand AS (
  SELECT doc_id // 4 AS prompt_id, doc_id,
         CAST((1000 * len(list_distinct(list_filter(
                  regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))),
                                        '\s+'),
                  t -> LENGTH(t) > 0))))
              // (len(list_filter(
                  regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))),
                                        '\s+'),
                  t -> LENGTH(t) > 0)) + 1) AS BIGINT) AS reward
  FROM documents
), complete AS (
  SELECT prompt_id FROM cand GROUP BY prompt_id HAVING COUNT(*) = 4
), packed AS (
  SELECT c.prompt_id,
         MAX(c.reward * 10000000 + (9999999 - c.doc_id)) AS best_pack,
         MIN(c.reward * 10000000 + c.doc_id) AS worst_pack,
         CAST(COUNT(*) AS BIGINT) AS n_cands
  FROM cand c JOIN complete k ON c.prompt_id = k.prompt_id
  GROUP BY c.prompt_id
)
SELECT prompt_id,
       CAST(9999999 - best_pack % 10000000 AS BIGINT) AS chosen_doc,
       CAST(best_pack // 10000000 AS BIGINT) AS chosen_reward,
       CAST(worst_pack % 10000000 AS BIGINT) AS rejected_doc,
       CAST(worst_pack // 10000000 AS BIGINT) AS rejected_reward,
       n_cands
FROM packed
"""


@_register("bon1_best_of_n", _BON1_SQL)
def bon1_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n selection for preference data (rejection sampling / DPO
    pair assembly): documents group into 4-candidate prompt groups
    (prompt = doc_id div 4), each candidate scores a deterministic
    integer reward (lexical-diversity proxy — in production, a reward
    model's score lands in exactly this shape), and per prompt the BEST
    candidate is chosen and the WORST rejected. Argmax/argmin run as
    packed-integer MAX/MIN — pack = reward * 1e7 + (9999999 - doc_id)
    for best (tie -> lower doc id wins), reward * 1e7 + doc_id for worst
    — so ties never fall to a nondeterministic max_by and both engines
    decode identical winners. Incomplete trailing groups are excluded
    (chat1's completeness gate). The doc-id guard keeps the packing
    collision-free.

    100 TB shape: ONE map-side-combinable aggregate over the candidate
    frame (two integer extrema + a count per prompt) — the canonical
    reduce; no window, no join but the group-completeness semi-join on
    the aggregated prompt frame. Reward scoring is a pure-Column scan.
    Reference parity: extends the training-data-prep family (ft1/pref1,
    SURVEY.md §2.4); no reference analogue."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # packed-argmax guard: doc ids must fit the 1e7 packing space
    _max_id = d.agg(F.max("doc_id")).first()[0]
    if _max_id is None or _max_id >= 9_999_999:
        raise RuntimeError(
            f"bon1 packed-argmax space overflow (max doc_id {_max_id} >= "
            "9999999); widen the packing multiplier on BOTH engine and "
            "oracle"
        )
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda t: F.length(t) > 0,
    )
    cand = d.select(
        F.expr("doc_id div 4").alias("prompt_id"),
        "doc_id",
        F.size(F.array_distinct(toks)).cast("bigint").alias("_nd"),
        F.size(toks).cast("bigint").alias("_nw"),
    ).select(
        "prompt_id",
        "doc_id",
        # exact integer division (both operands nonnegative, so Spark DIV
        # and DuckDB // agree)
        F.expr("CAST((1000 * _nd) DIV (_nw + 1) AS BIGINT)").alias("reward"),
    )
    complete = (
        cand.groupBy("prompt_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == 4)
        .select("prompt_id")
    )
    packed = (
        cand.join(complete, "prompt_id")
        .groupBy("prompt_id")
        .agg(
            F.max(
                F.col("reward") * 10000000 + (F.lit(9999999) - F.col("doc_id"))
            ).alias("best_pack"),
            F.min(F.col("reward") * 10000000 + F.col("doc_id")).alias(
                "worst_pack"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_cands"),
        )
    )
    return packed.select(
        "prompt_id",
        (F.lit(9999999) - F.col("best_pack") % 10000000)
        .cast("bigint")
        .alias("chosen_doc"),
        F.expr("best_pack div 10000000").cast("bigint").alias(
            "chosen_reward"
        ),
        (F.col("worst_pack") % 10000000).cast("bigint").alias("rejected_doc"),
        F.expr("worst_pack div 10000000").cast("bigint").alias(
            "rejected_reward"
        ),
        "n_cands",
    )
