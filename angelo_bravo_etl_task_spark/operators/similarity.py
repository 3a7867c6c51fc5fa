"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k — exact, O(Q×N); correct baseline and fine when
  the query set is bounded (Q ≪ N). The N side streams; only Q broadcasts.
- LSH-bucketed (random hyperplane signs) — candidates share a bucket, so the
  join is equi on the signature; the scale path for N×N all-pairs at 100 TB.

All arithmetic is JVM-side higher-order functions (zip_with/aggregate) in
IEEE double with a fixed left-fold order — deterministic and reproducible
across engines, which the oracle harness relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .partitioning import spread as _spread
from .windows import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Broadcast the (small) query side against the (huge) corpus: the corpus
    never shuffles for the join; the only shuffle is the per-query top-k,
    keyed on query id. Output: (query_id, neighbor_id, cosine_sim, rank).
    """
    # norms materialize once per vector, not once per pair (identical IEEE
    # value — same fold over the same inputs — but Q+N sqrt-folds instead of
    # Q×N)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", norm(F.col("_qv")))
    c = _spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    ).withColumn("_cn", norm(F.col("_cv")))
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
                "cosine_sim"
            ),
        )
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        alias="rank",
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random coefficients in [-1, 1], derived from
    md5(seed, plane, i) — pure function of the parameters, so identical on
    every executor and every run, with no RNG state to ship."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{plane}:{i}".encode()).digest()
        v = int.from_bytes(h[:8], "big", signed=True)
        out.append(v / float(2**63))
    return out


def random_hyperplane_signature(
    vec: Column, dim: int, num_planes: int = 16, seed: int = 42
) -> Column:
    """Sign-of-projection LSH signature (array<int> of 0/1, len num_planes).

    Coefficients are precomputed on the driver and embedded as LITERAL
    arrays — per-row cost is just num_planes × dim multiply-adds; nothing is
    re-derived per row.
    """

    def plane_bit(p: int) -> Column:
        coeffs = F.array(*[F.lit(w) for w in _hyperplane(dim, p, seed)])
        proj = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, 1).otherwise(0)

    return F.array(*[plane_bit(p) for p in range(num_planes)])


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH.

    Standard (L tables × b planes) construction: a candidate pair must share
    all b plane signs in at least ONE of the L tables. Each table's bucket
    join is equi on (table_id, signature) → shuffled hash join keyed by
    bucket; cost scales with real collisions, not N². Recall rises with L,
    precision (bucket selectivity) with b.

    Both sides explode to L rows each; the join + distinct bounds the exact
    cosine evaluations to true bucket collisions — the 100 TB path where
    brute force's Q×N product is unpayable.
    """

    def with_sigs(df: DataFrame, out_id: str) -> DataFrame:
        return _spread(df).select(
            F.col(id_col).alias(out_id),
            F.posexplode(
                F.array(
                    *[
                        random_hyperplane_signature(
                            F.col(vec_col), dim, num_planes, seed=42 + 1000 * t
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("_table", "_sig"),
        )

    cand = (
        with_sigs(queries, "query_id")
        .join(with_sigs(corpus, "neighbor_id").persist(), on=["_table", "_sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine_sim"),
        )
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        alias="rank",
    )
