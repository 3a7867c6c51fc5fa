r"""Round-5 wave 84: rank-biased overlap in exact rationals, int8
quantization error audit.

- rbo1: the top-weighted ranking-similarity measure (RBO, Webber et
  al.) between the revenue and quantity rankers, computed EXACTLY:
  with persistence p = 1/2 every depth weight is dyadic, and clearing
  the per-depth /d with L = lcm(1..10) = 2520 makes every
  contribution an integer — the final score is ONE IEEE division of
  exact BIGINTs (num / (2520·1023)), the hll1 portable-float
  discipline. Emitted per depth with the two defining laws certified:
  overlap_d ≤ d and overlap monotone in d (prefix intersections only
  grow).
- x10: the audit behind every int8 embedding deployment: symmetric
  per-vector quantization q = floor(x·127/s) with the data-derived
  scale s = max|x|, and the reconstruction-error LAW certified per
  vector: max|x − q·s/127| ≤ s/127 (one floor step). floor() is
  IEEE-exact and cross-engine bit-identical (the sqrt rule's
  sibling); every arithmetic step keeps the same operation order on
  both engines.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no ranking-eval or vector surface; these extend the IR-evaluation
family (ndcg1, kap1, rk1, il1) and the quantized-vector family (x7)
with the comparison measure and the error certification production
systems run before shipping an int8 index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

_L = 2520  # lcm(1..10): clears every /d into an integer
_DEN = _L * 1023  # max possible numerator: sum_d d*(L/d)*2^(10-d) = L*1023

# =========================================================================
# rbo1: RBO(p=1/2)@10 between revenue and quantity rankers, exact
# =========================================================================

_RBO1_SQL = f"""
WITH agg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS revenue,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
), ra AS (
  SELECT l_partkey, rnk FROM (
    SELECT l_partkey,
           ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey) AS rnk
    FROM agg) WHERE rnk <= 10
), rb AS (
  SELECT l_partkey, rnk FROM (
    SELECT l_partkey,
           ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey) AS rnk
    FROM agg) WHERE rnk <= 10
), depths AS (
  SELECT unnest(range(1, 11)) AS d
), ov AS (
  SELECT d.d,
         CAST((SELECT COUNT(*) FROM ra a JOIN rb b
               ON a.l_partkey = b.l_partkey
               WHERE a.rnk <= d.d AND b.rnk <= d.d) AS BIGINT) AS overlap_d
  FROM depths d
), contrib AS (
  SELECT d, overlap_d,
         CAST(overlap_d * ({_L} // d) * (1 << (10 - d)) AS BIGINT)
           AS contrib_num
  FROM ov
)
SELECT d, overlap_d,
       (overlap_d <= d) AS bounded_ok,
       (overlap_d >= COALESCE(LAG(overlap_d) OVER (ORDER BY d), 0))
         AS mono_ok,
       contrib_num,
       CAST(SUM(contrib_num) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_num,
       CAST(SUM(contrib_num) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         / {_DEN} AS running_rbo
FROM contrib
"""


@_register("rbo1_rank_biased_overlap", _RBO1_SQL)
def rbo1_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap at p = 1/2 between the revenue and quantity
    top-10 rankers (il1's pair), computed in EXACT integers: RBO's
    per-depth term is weight·|A_d ∩ B_d|/d with dyadic weights 2^-d;
    multiplying through by lcm(1..10)·2^10 turns every contribution
    into the BIGINT overlap_d·(2520 DIV d)·2^(10−d), the prefix sum is
    exact, and the reported running_rbo is one IEEE division by the
    constant 2520·1023 (= the perfect-agreement numerator) — the
    portable-float pattern hll1 established (dyadic/rational sums,
    never pow()). Both defining laws ride as columns: `bounded_ok`
    (overlap ≤ depth) and `mono_ok` (prefix intersections only grow).
    Plan shape: one combinable aggregate, two 10-row
    TakeOrderedAndProject rankers broadcast into a 10-row depth spine —
    everything after the aggregate is constant-size. At 100 TB ranker
    comparison cost is the aggregate, full stop."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("revenue"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
    )
    ra = (
        agg.select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.col("revenue").desc(), "l_partkey"))
            .alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
    )
    rb = (
        agg.select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.col("qty").desc(), "l_partkey"))
            .alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
    )
    pairs = ra.alias("a").join(
        rb.alias("b"), F.col("a.l_partkey") == F.col("b.l_partkey")
    ).select(
        F.greatest(F.col("a.rnk"), F.col("b.rnk")).alias("min_depth")
    )
    depths = spark.range(1, 11).select(F.col("id").alias("d"))
    ov = (
        F.broadcast(depths)
        .join(pairs, F.col("min_depth") <= F.col("d"), "left")
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("min_depth").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("overlap_d")
        )
    )
    contrib = ov.select(
        "d",
        "overlap_d",
        # shiftleft takes a PYTHON int count, not a Column — data-
        # dependent shifts go through expr (the documented gotcha)
        F.expr(
            f"CAST(overlap_d * ({_L} DIV d)"
            " * shiftleft(1L, CAST(10 - d AS INT)) AS BIGINT)"
        ).alias("contrib_num"),
    )
    w = Window.orderBy("d")
    run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return contrib.select(
        "d",
        "overlap_d",
        (F.col("overlap_d") <= F.col("d")).alias("bounded_ok"),
        (
            F.col("overlap_d")
            >= F.coalesce(F.lag("overlap_d").over(w), F.lit(0))
        ).alias("mono_ok"),
        "contrib_num",
        F.sum("contrib_num").over(run).cast("bigint").alias("running_num"),
        (F.sum("contrib_num").over(run).cast("bigint") / F.lit(_DEN)).alias(
            "running_rbo"
        ),
    )


# =========================================================================
# x10: symmetric int8 quantization with the one-step error law
# =========================================================================

_X10_SQL = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id < 100
), s AS (
  SELECT vec_id, e,
         list_reduce(list_transform(e, x -> abs(x)),
                     (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS scale
  FROM v
), err AS (
  SELECT vec_id, scale,
         list_reduce(
           list_transform(e, x ->
             abs(x - (floor(x * 127 / scale) * scale) / 127)),
           (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS max_abs_err,
         CAST(len(e) AS BIGINT) AS dim
  FROM s WHERE scale > 0
)
SELECT vec_id, dim, scale, max_abs_err,
       scale / 127 AS err_bound,
       (max_abs_err <= scale / 127) AS within_bound_ok
FROM err
"""


@_register("x10_quantization_error", _X10_SQL)
def x10_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization error audit — the certification a
    production system runs before swapping an fp32 embedding index for
    int8 (x7's quantized cosine assumes it): per vector, the
    data-derived scale s = max|x|, the worst reconstruction error of
    q = floor(x·127/s) dequantized as (q·s)/127, and the ERROR LAW
    max|x − (q·s)/127| ≤ s/127 certified per row (floor moves a value
    at most one quantization step down). Every float step is
    cross-engine bit-identical: floor is IEEE-exact (the sqrt rule's
    sibling — unlike round(), whose tie behavior differs), both
    engines evaluate the identical expression tree left-to-right, and
    the max-reductions are order-insensitive. Plan shape: map-side
    per-vector array folds over a bounded 100-vector audit sample —
    the nightly-audit pattern (x8's rule: evaluate on a fixed probe
    set, not the corpus)."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    scale = F.aggregate(
        F.transform(F.col("e"), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda a, b: F.when(b > a, b).otherwise(a),
    )
    s = emb.select("vec_id", "e", scale.alias("scale")).where(
        F.col("scale") > 0
    )
    err = F.aggregate(
        F.transform(
            F.col("e"),
            lambda x: F.abs(
                x
                - (
                    F.floor(x * 127 / F.col("scale")) * F.col("scale")
                )
                / 127
            ),
        ),
        F.lit(0.0),
        lambda a, b: F.when(b > a, b).otherwise(a),
    )
    return s.select(
        "vec_id",
        F.size("e").cast("bigint").alias("dim"),
        "scale",
        err.alias("max_abs_err"),
        (F.col("scale") / 127).alias("err_bound"),
        (err <= F.col("scale") / 127).alias("within_bound_ok"),
    )
