r"""Round-8 wave 106: SemDeDup-style semantic deduplication (sdd1) — the
embedding-space near-dup pass (Abbas et al. 2023, "SemDeDup") that
complements the lexical family (d1-d9): documents whose EMBEDDINGS are
nearly collinear are semantic duplicates even when their n-grams differ,
and the scale trick is identical to IVF's — cluster first, compare
within clusters only, never all-pairs.

Deterministic end to end (fixed coarse centroids, exact cosine, greedy
min-id survivor), so the full pipeline — assignment, within-cell dup
detection, survivor choice — is SQL-expressible and hash-green, unlike
the LSH families whose candidate sets are hash-internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# The oracle replays the exact pipeline: argmax-cosine assignment to the
# fixed centroids (tie-break cell_id ASC), within-cell pairs above 0.95,
# greedy keep-min-id survivors. Cosine is the x1 left-fold construction —
# bit-identical doubles in both engines.
_SDD1_SQL = """
    WITH cent AS (
      SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id % 100 = 0
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id % 97 = 0
    ), scored AS (
      SELECT v.vec_id, c.cell_id, v.ev,
             list_reduce(list_transform(list_zip(v.ev, c.cv),
                                        x -> x[1] * x[2]),
                         (acc, y) -> acc + y)
             / (sqrt(list_reduce(list_transform(v.ev, y -> y * y),
                                 (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(c.cv, y -> y * y),
                                   (a, b) -> a + b))) AS sim
      FROM v, cent c
    ), assigned AS (
      SELECT vec_id, cell_id, ev FROM (
        SELECT vec_id, cell_id, ev,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ), dup AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM assigned a JOIN assigned b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(list_zip(a.ev, b.ev),
                                       x -> x[1] * x[2]),
                        (acc, y) -> acc + y)
            / (sqrt(list_reduce(list_transform(a.ev, y -> y * y),
                                (p, q) -> p + q))
               * sqrt(list_reduce(list_transform(b.ev, y -> y * y),
                                  (p, q) -> p + q))) > 0.95
    )
    SELECT vec_id, cell_id,
           vec_id NOT IN (SELECT dup_id FROM dup) AS is_kept
    FROM assigned
    """


@_register("sdd1_semantic_dedup", _SDD1_SQL)
def sdd1_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: coarse-cluster embeddings, detect near-collinear pairs
    WITHIN each cluster, keep the min-id survivor per duplicate relation.

    Pipeline: (1) assign every vector to its nearest fixed coarse
    centroid (every 100th vector, broadcast) by exact cosine, tie-break
    cell_id ASC — the IVF assignment shape; (2) within-cell pairs
    (equi-join on cell_id, id_a < id_b) with cosine > 0.95 are semantic
    duplicates; (3) greedy survivor: any vector that appears as the
    HIGHER id of a dup pair is dropped — deterministic, single-pass,
    and exactly what SemDeDup does with "keep one random element per
    group" made reproducible.

    100 TB shape: centroids broadcast (|C| ≈ √N in production, here the
    deterministic %100 spine); assignment is a map over the corpus — no
    shuffle; the dup join is equi on cell_id so pair cost is bounded by
    Σ|cell|², the SemDeDup contract (clusters bound the quadratic term;
    with balanced cells that is N·mean|cell|, not N²). The survivor
    anti-join shuffles only the (tiny) dup-id list. Assignment frame is
    eagerly checkpointed before the self-join — both sides reuse ONE
    materialization (the minhash-signature lesson).

    The synthetic embeddings are pairwise far apart (no within-cell pair
    exceeds 0.95), which would leave the dup/survivor branches vacuously
    green — the planted-violation rule (the dp2/bloom1/mm7 lesson): every
    vec_id % 97 == 0 vector is UNIONED back in as a clone at id+1_000_000
    (identically in the oracle), so each clone lands in its source's cell
    at cosine ~1.0 and is dropped while its lower-id source survives.
    Clone ids stay off the %100 centroid spine by construction (the only
    %9700 collision is vec_id 0, and centroids are drawn from the
    ORIGINAL table before the union on both sides). The +1_000_000 clone
    offset assumes real ids stay below it; at a larger SF a collision
    would break assignment-uniqueness IDENTICALLY in both engines (hash
    stays green), so the query asserts max(vec_id) < 1_000_000 up front
    and fails loudly instead of silently certifying a collision
    (ADVICE r8)."""
    from .operators.partitioning import spread
    from .operators.similarity import cosine
    from .operators.windows import top_k_per_group

    emb = _t(spark, sf_dir, "embeddings")
    # bounded 1-row agg collect: guard the clone-offset invariant before
    # planting clones — a real-id collision would be replayed identically
    # by the oracle and certify garbage
    _max_id = emb.agg(F.max("vec_id")).first()[0]
    # explicit raise, not `assert`: invariant guards must survive
    # `python -O` (ADVICE r9)
    if _max_id is None or _max_id >= 1_000_000:
        raise RuntimeError(
            f"sdd1 clone offset 1_000_000 collides with real vec_id space "
            f"(max={_max_id}); raise the offset on BOTH engine and oracle"
        )
    cent = (
        emb.where(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("_cv"))
    )
    base = emb.select("vec_id", F.col("embedding").alias("_ev"))
    clones = emb.where(F.col("vec_id") % 97 == 0).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.col("embedding").alias("_ev"),
    )
    v = spread(base.unionByName(clones))
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell_id",
        "_ev",
        cosine(F.col("_ev"), F.col("_cv")).alias("_sim"),
    )
    assigned = (
        top_k_per_group(
            scored,
            ["vec_id"],
            [F.col("_sim").desc(), F.col("cell_id").asc()],
            1,
        )
        .select("vec_id", "cell_id", "_ev")
        .localCheckpoint(eager=True)
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("cell_id").alias("_ca"),
        F.col("_ev").alias("_ea"),
    )
    b = assigned.select(
        F.col("vec_id").alias("dup_id"),
        F.col("cell_id").alias("_cb"),
        F.col("_ev").alias("_eb"),
    )
    dup = (
        a.join(
            b,
            on=[
                F.col("_ca") == F.col("_cb"),
                F.col("id_a") < F.col("dup_id"),
            ],
        )
        .where(cosine(F.col("_ea"), F.col("_eb")) > 0.95)
        .select("dup_id")
        .distinct()
    )
    return (
        assigned.join(dup, assigned["vec_id"] == dup["dup_id"], "left")
        .select(
            "vec_id",
            "cell_id",
            F.col("dup_id").isNull().alias("is_kept"),
        )
    )
