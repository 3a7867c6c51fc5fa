r"""Round-7 wave 98: KMV bottom-k sketch SET ALGEBRA — the missing rung of
the sketch family.

kmv1 certified the single-set cardinality estimator ((k-1)·2^32 / h_(k));
hll2 certified sketch UNION. What neither covers is the set-expression
algebra real sketch deployments exist for: estimating |A∪B| and |A∩B| of
two sets from their bottom-k sketches alone — audience overlap, dedup-rate
forecasting, join-cardinality-from-sketches. The portable formulation is
the shared-threshold (theta) argument: with theta = min(theta_A, theta_B)
(each side's k-th minimum hash), EVERY element of either set hashing below
theta is guaranteed captured by its sketch, so below theta the two
sketches form a complete, exact mini-universe — set operations down there
are exact COUNTS, and scaling by 2^32/theta estimates the full universe.
All integers until the final IEEE division (kmv1's release discipline);
the factor-2 honesty flags are pure bigint cross-multiplications.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_POW32 = 4294967296  # 2^32, the hash-space size (kmv1's width)

_KMV2_SQL = """
WITH u AS (
  SELECT o_orderkey AS key,
         CAST('0x' || substr(md5('a:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 < 60 AS ma,
         CAST('0x' || substr(md5('b:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 < 50 AS mb,
         CAST('0x' || substr(md5('kmv2:' || CAST(o_orderkey AS VARCHAR)),
                             1, 8) AS BIGINT) AS h
  FROM orders
), uni AS (
  SELECT * FROM u WHERE ma OR mb
), tha AS (
  SELECT MAX(h) AS th
  FROM (SELECT h FROM uni WHERE ma ORDER BY h LIMIT 64)
), thb AS (
  SELECT MAX(h) AS th
  FROM (SELECT h FROM uni WHERE mb ORDER BY h LIMIT 64)
), th AS (
  SELECT LEAST(tha.th, thb.th) AS theta FROM tha, thb
)
SELECT CAST(64 AS BIGINT) AS k,
       CAST(MIN(th.theta) AS BIGINT) AS theta,
       CAST(SUM(CASE WHEN ma THEN 1 ELSE 0 END) AS BIGINT) AS n_a_exact,
       CAST(SUM(CASE WHEN mb THEN 1 ELSE 0 END) AS BIGINT) AS n_b_exact,
       CAST(COUNT(*) AS BIGINT) AS n_union_exact,
       CAST(SUM(CASE WHEN ma AND mb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inter_exact,
       CAST(SUM(CASE WHEN h < th.theta THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below_union,
       CAST(SUM(CASE WHEN ma AND mb AND h < th.theta THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below_inter,
       CAST(SUM(CASE WHEN h < th.theta THEN 1 ELSE 0 END) AS BIGINT)
         * 4294967296 / CAST(MIN(th.theta) AS BIGINT) AS est_union,
       CAST(SUM(CASE WHEN ma AND mb AND h < th.theta THEN 1 ELSE 0 END)
            AS BIGINT)
         * 4294967296 / CAST(MIN(th.theta) AS BIGINT) AS est_inter,
       (CAST(SUM(CASE WHEN h < th.theta THEN 1 ELSE 0 END) AS BIGINT)
          * 4294967296 <= 2 * COUNT(*) * CAST(MIN(th.theta) AS BIGINT)
        AND 2 * CAST(SUM(CASE WHEN h < th.theta THEN 1 ELSE 0 END)
                     AS BIGINT) * 4294967296
            >= COUNT(*) * CAST(MIN(th.theta) AS BIGINT)) AS union_est_ok,
       (CAST(SUM(CASE WHEN ma AND mb AND h < th.theta THEN 1 ELSE 0 END)
             AS BIGINT) * 4294967296
          <= 2 * CAST(SUM(CASE WHEN ma AND mb THEN 1 ELSE 0 END) AS BIGINT)
              * CAST(MIN(th.theta) AS BIGINT)
        AND 2 * CAST(SUM(CASE WHEN ma AND mb AND h < th.theta
                         THEN 1 ELSE 0 END) AS BIGINT) * 4294967296
            >= CAST(SUM(CASE WHEN ma AND mb THEN 1 ELSE 0 END) AS BIGINT)
              * CAST(MIN(th.theta) AS BIGINT)) AS inter_est_ok
FROM uni CROSS JOIN th
"""


@_register("kmv2_sketch_set_algebra", _KMV2_SQL)
def kmv2_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-expression cardinality from bottom-k sketches: two md5-coined
    60%/50% subsets A, B of the order keys (independent coins, so the
    overlap is genuine set algebra, not a nested slice), one shared
    32-bit hash, k = 64. theta = min of the two sides' k-th minimum
    hashes; below theta both sketches are COMPLETE (h < theta <= own
    theta_k puts the element inside its own bottom-k), so
    n_below_union / n_below_inter are exact sub-universe counts — the
    query computes them relationally and the wave's property test
    proves they equal the counts derived from the two 64-element
    sketches alone. Estimates scale by 2^32/theta as one IEEE division
    of exact integers (kmv1's discipline); the factor-2 honesty flags
    are bigint cross-multiplications (~5 sigma at k = 64 for the union,
    ~4 sigma for the intersection — wide enough to survive any driver
    regeneration, tight enough that a broken estimator fails them).
    100 TB shape: each k-th minimum is a bottom-k — per-partition
    partial top-k merged at k (TakeOrderedAndProject), never a global
    sort; theta travels as a 1-row broadcast; the release is one
    map-side-combinable conditional-sum aggregate. MAX over the k-set
    makes theta tie-safe: a hash collision straddling the k boundary
    picks either copy, same maximum."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")

    def _coin(prefix: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(prefix),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        )

    u = o.select(
        (_coin("a:") < 60).alias("ma"),
        (_coin("b:") < 50).alias("mb"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kmv2:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    ).where(F.col("ma") | F.col("mb"))
    tha = (
        u.where("ma").orderBy("h").limit(64).agg(F.max("h").alias("tha"))
    )
    thb = (
        u.where("mb").orderBy("h").limit(64).agg(F.max("h").alias("thb"))
    )
    th = tha.crossJoin(thb).select(
        F.least("tha", "thb").alias("theta")
    )
    agg = (
        u.crossJoin(F.broadcast(th))
        .agg(
            F.min("theta").cast("bigint").alias("theta"),
            F.sum(F.col("ma").cast("long")).cast("bigint").alias("n_a_exact"),
            F.sum(F.col("mb").cast("long")).cast("bigint").alias("n_b_exact"),
            F.count(F.lit(1)).cast("bigint").alias("n_union_exact"),
            F.sum((F.col("ma") & F.col("mb")).cast("long"))
            .cast("bigint")
            .alias("n_inter_exact"),
            F.sum((F.col("h") < F.col("theta")).cast("long"))
            .cast("bigint")
            .alias("n_below_union"),
            F.sum(
                (F.col("ma") & F.col("mb") & (F.col("h") < F.col("theta")))
                .cast("long")
            )
            .cast("bigint")
            .alias("n_below_inter"),
        )
    )
    p32 = F.lit(_POW32).cast("bigint")
    return agg.select(
        F.lit(64).cast("bigint").alias("k"),
        "theta",
        "n_a_exact",
        "n_b_exact",
        "n_union_exact",
        "n_inter_exact",
        "n_below_union",
        "n_below_inter",
        (F.col("n_below_union") * p32 / F.col("theta")).alias("est_union"),
        (F.col("n_below_inter") * p32 / F.col("theta")).alias("est_inter"),
        (
            (F.col("n_below_union") * p32
             <= 2 * F.col("n_union_exact") * F.col("theta"))
            & (2 * F.col("n_below_union") * p32
               >= F.col("n_union_exact") * F.col("theta"))
        ).alias("union_est_ok"),
        (
            (F.col("n_below_inter") * p32
             <= 2 * F.col("n_inter_exact") * F.col("theta"))
            & (2 * F.col("n_below_inter") * p32
               >= F.col("n_inter_exact") * F.col("theta"))
        ).alias("inter_est_ok"),
    )
