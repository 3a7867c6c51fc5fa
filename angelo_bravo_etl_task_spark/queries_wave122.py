r"""Round-9 wave 122: construction-guaranteed LSH recall (x12) and
exchange-reuse certification (exch1).

x12 upgrades the weakest oracle class in the registry (ADVICE r8: the
constant-TRUE certificates are only as strong as recall floors measured
on the current data): here the expected answer is guaranteed by the
CONSTRUCTION — an exact duplicate hashes to the identical signature in
every LSH table, so its candidacy is deterministic, not empirical — the
sdd1 principle applied to the ANN family. exch1 certifies Catalyst's
ReuseExchange: a self-joined aggregate must pay its shuffle ONCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

# ==========================================================================
# x12: planted-duplicate LSH recall — TRUE by construction, not measurement
# ==========================================================================

# The oracle derives the expected rows from the SAME construction the
# engine executes: every query vector (vec_id < 50) gets an exact clone
# planted at vec_id + 2_000_000; an identical vector produces the
# identical hyperplane signature in EVERY table, so the clone is a
# guaranteed LSH candidate, and exact-cosine ranking puts it at rank 1
# (cosine ~1.0; released as FLOOR(sim*1e4 + 0.5) = 10000 exactly, robust
# to the 1-ULP self-cosine rounding found on px5). Unlike x2's measured
# recall floor, a regenerated dataset CANNOT red this without an engine
# bug: the law is signature determinism itself.
_X12_SQL = """
SELECT vec_id AS query_id,
       CAST(vec_id + 2000000 AS BIGINT) AS top1_id,
       CAST(10000 AS BIGINT) AS top1_sim_x1e4
FROM embeddings WHERE vec_id < 50
"""


@_register("x12_lsh_planted_recall", _X12_SQL)
def x12_lsh_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction-guaranteed LSH recall law: plant an exact clone of
    every query vector into the corpus (vec_id + 2_000_000) and assert —
    through the driver hash, not an assert statement — that multi-table
    hyperplane LSH returns the clone as top-1 for every query. The
    guarantee is deterministic: identical vectors produce identical
    per-table signatures, so the clone collides in EVERY bucket its
    query occupies; the exact-cosine ranking then places it first
    (cosine ~1.0 vs the corpus's natural similarity ceiling far below).
    This is the sdd1 principle applied to x2's family: the oracle
    computes the expected answer from the construction rather than
    hardcoding a measured recall floor (ADVICE r8) — a data regeneration
    cannot red it without a real LSH regression (lost bucket, broken
    signature, wrong ranking).

    100 TB shape: identical to lsh_topk's (the (table, signature)
    equi-join; candidates ∝ true collisions); the planted clones add
    |queries| rows to the corpus side — noise at scale. The released
    sim rides FLOOR(x*1e4 + 0.5) so the 1-ULP self-cosine rounding
    (sqrt(Σv²)·sqrt(Σv²) ≠ Σv² exactly — the px5 finding) never touches
    the hash."""
    from .operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # bounded 1-row agg: guard the clone-offset invariant before planting
    # (the sdd1 pattern, ADVICE r9)
    _max_id = emb.agg(F.max("vec_id")).first()[0]
    if _max_id is None or _max_id >= 2_000_000:
        raise RuntimeError(
            f"x12 clone offset 2_000_000 collides with real vec_id space "
            f"(max={_max_id}); raise the offset on BOTH engine and oracle"
        )
    queries = emb.where(F.col("vec_id") < 50)
    clones = queries.select(
        (F.col("vec_id") + F.lit(2000000)).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(clones)
    top = lsh_topk(queries, corpus, dim=64, k=1, num_planes=6,
                   num_tables=24)
    return top.where(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").cast("bigint").alias("top1_id"),
        F.floor(F.col("cosine_sim") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("top1_sim_x1e4"),
    )


# ==========================================================================
# exch1: ReuseExchange certification — a self-joined aggregate shuffles once
# ==========================================================================

_EXCH1_SQL = """
WITH yearly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS total_c,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), best AS (
  SELECT yr AS best_yr, total_c AS best_total_c, n_orders AS best_n_orders
  FROM yearly ORDER BY total_c DESC, yr LIMIT 1
)
SELECT y.yr, y.total_c, y.n_orders,
       b.best_yr, b.best_total_c, b.best_n_orders,
       CAST(b.best_total_c - y.total_c AS BIGINT) AS gap_c
FROM yearly y CROSS JOIN best b
"""


@_register("exch1_reused_exchange", _EXCH1_SQL)
def exch1_reused_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every year's revenue against the BEST year — and the certification
    that Catalyst pays the yearly aggregate's shuffle ONCE: the main
    reference and the top-1 reference are the identical
    Exchange+HashAggregate subplan, so ReuseExchange must appear in the
    executed plan (asserted after materialization). Without reuse the
    fact-table scan + shuffle + aggregate runs twice — at 100 TB the
    difference between one pass over the table and two. The values ride
    the driver hash, so the reused stage is also proven value-correct.

    Plan-shape subtlety found live (documented for the next such
    query): a year-over-year SELF-JOIN (cur.yr = prev.yr + 1) does NOT
    reuse — column pruning and the shifted join-key null filter
    specialize the two sides into structurally different subplans.
    Reuse requires both references to need the SAME columns under the
    SAME predicates, which the vs-best shape guarantees by selecting
    every aggregate output on both sides.

    100 TB shape: one shuffle on year (map-side combined); the best-row
    side is a TakeOrderedAndProject over the same stage output, then a
    1-row broadcast — the second reference costs nothing. This is the
    guarantee analytics layers built on WITH-clauses silently rely on —
    certified here the way rtf1 certified bloom pruning and skew2 the
    skew split."""
    o = _t(spark, sf_dir, "orders")
    price_c = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    yearly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(
        F.sum(price_c).cast("bigint").alias("total_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    best = (
        yearly.orderBy(F.col("total_c").desc(), F.col("yr"))
        .limit(1)
        .select(
            F.col("yr").alias("best_yr"),
            F.col("total_c").alias("best_total_c"),
            F.col("n_orders").alias("best_n_orders"),
        )
    )
    out = yearly.crossJoin(F.broadcast(best)).select(
        "yr",
        "total_c",
        "n_orders",
        "best_yr",
        "best_total_c",
        "best_n_orders",
        (F.col("best_total_c") - F.col("total_c"))
        .cast("bigint")
        .alias("gap_c"),
    )
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # explicit raise, not `assert`: plan certifications must survive
    # `python -O` (ADVICE r9)
    if "ReusedExchange" not in plan and "ReusedQueryStage" not in plan:
        raise RuntimeError(
            "the twice-referenced aggregate did not reuse its exchange:\n"
            + plan[:2000]
        )
    return local_rows_df(spark, 
        rows,
        "yr bigint, total_c bigint, n_orders bigint, best_yr bigint,"
        " best_total_c bigint, best_n_orders bigint, gap_c bigint",
    )
