r"""Round-5 wave 89: change-point detection by exact binary
segmentation, Mann–Kendall trend test.

- seg2: the first step of binary segmentation — the single split of
  the weekly order-count series maximizing between-segment sum of
  squares — with the objective in EXACT integers: maximizing
  BSS(s) ∝ (n₂·S₁ − n₁·S₂)²/(n₁·n₂) needs only prefix sums, the
  numerator stays under 2^63 at any SF here, and the terminal IEEE
  division of exact integers is deterministic, so the argmax (with
  an s tiebreak) is cross-engine stable. The top-5 candidate splits
  are emitted with the maximality law certified per row (the best
  row's objective equals the global max).
- mk2: the nonparametric trend test for the same series —
  Mann–Kendall's S = Σ_{i<j} sign(x_j − x_i) over the ~80-month
  aggregated frame (the bounded pair join lives on the aggregate,
  never the corpus — mw1's discipline), tie-corrected variance as an
  exact integer numerator over 18, and the z statistic via the two
  portable float ops (one division, one sqrt). The combinatorial
  bound |S| ≤ n(n−1)/2 and the sign-coherence law (z and S share
  sign) ride as columns.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no time-series surface; these extend the analytics family (fc1
seasonal baseline, xc1 cross-correlation, mw1 rank test, ewma1) with
the two change/trend questions every metrics review asks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# seg2: best single split of the weekly series, exact objective
# =========================================================================

_SEG2_SQL = """
WITH rows_ AS (
  SELECT CAST(o_orderdate AS DATE) AS d FROM orders
), mind AS (
  SELECT MIN(d) AS d0 FROM rows_
), weekly AS (
  SELECT (d - (SELECT d0 FROM mind)) // 7 AS wk,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM rows_ GROUP BY 1
), pre AS (
  SELECT wk, c,
         CAST(SUM(c) OVER (ORDER BY wk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS s1,
         CAST(ROW_NUMBER() OVER (ORDER BY wk) AS BIGINT) AS n1
  FROM weekly
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS st, CAST(COUNT(*) AS BIGINT) AS nt
  FROM weekly
), scored AS (
  SELECT p.wk AS split_wk, p.n1, t.nt - p.n1 AS n2,
         p.s1, t.st - p.s1 AS s2,
         ((t.nt - p.n1) * p.s1 - p.n1 * (t.st - p.s1))
           * ((t.nt - p.n1) * p.s1 - p.n1 * (t.st - p.s1)) AS obj_num,
         p.n1 * (t.nt - p.n1) AS obj_den
  FROM pre p CROSS JOIN tot t
  WHERE p.n1 < t.nt
), ranked AS (
  SELECT split_wk, n1, n2, s1, s2,
         CAST(obj_num AS BIGINT) AS obj_num,
         CAST(obj_den AS BIGINT) AS obj_den,
         obj_num / obj_den AS objective,
         ROW_NUMBER() OVER (ORDER BY obj_num / obj_den DESC, split_wk)
           AS rnk,
         MAX(obj_num / obj_den) OVER () AS best_obj
  FROM scored
)
SELECT split_wk, n1, n2, s1, s2, obj_num, obj_den, objective,
       CAST(rnk AS BIGINT) AS rnk,
       (rnk > 1 OR objective = best_obj) AS is_max_ok
FROM ranked WHERE rnk <= 5
"""


@_register("seg2_changepoint", _SEG2_SQL)
def seg2_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change point over the weekly order-count
    series: for every candidate split s, the between-segment objective
    (n₂S₁ − n₁S₂)²/(n₁n₂) — the monotone transform of the two-segment
    BSS — is computed from ONE pass of prefix sums over the
    week-aggregated frame (~350 rows at any SF: the date span is
    fixed), the integer numerator stays well under 2^63, and the
    objective is a single IEEE division of exact integers so the
    (objective DESC, wk) ranking is cross-engine stable. Top-5 splits
    are emitted with the maximality certificate on rank 1 (its
    objective equals the window max). Aggregate-first discipline: the
    corpus costs one combinable weekly count; every window runs on the
    season-sized frame. At 100 TB the recursion (segment again left
    and right) reuses the same prefix-sum frame with segment bounds —
    no rescan."""
    o = _t(spark, sf_dir, "orders")
    rows_ = o.select(F.col("o_orderdate").cast("date").alias("d"))
    mind = rows_.agg(F.min("d").alias("d0"))
    weekly = (
        rows_.crossJoin(F.broadcast(mind))
        .select((F.datediff("d", "d0") / 7).cast("bigint").alias("wk"))
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w_run = Window.orderBy("wk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = weekly.select(
        "wk",
        "c",
        F.sum("c").over(w_run).cast("bigint").alias("s1"),
        F.row_number().over(Window.orderBy("wk")).cast("bigint").alias("n1"),
    )
    tot = weekly.agg(
        F.sum("c").cast("bigint").alias("st"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    scored = (
        pre.crossJoin(F.broadcast(tot))
        .where(F.col("n1") < F.col("nt"))
        .select(
            F.col("wk").alias("split_wk"),
            "n1",
            (F.col("nt") - F.col("n1")).alias("n2"),
            "s1",
            (F.col("st") - F.col("s1")).alias("s2"),
            (
                (
                    (F.col("nt") - F.col("n1")) * F.col("s1")
                    - F.col("n1") * (F.col("st") - F.col("s1"))
                )
                * (
                    (F.col("nt") - F.col("n1")) * F.col("s1")
                    - F.col("n1") * (F.col("st") - F.col("s1"))
                )
            )
            .cast("bigint")
            .alias("obj_num"),
            (F.col("n1") * (F.col("nt") - F.col("n1")))
            .cast("bigint")
            .alias("obj_den"),
        )
    )
    obj = F.col("obj_num") / F.col("obj_den")
    w_rank = Window.orderBy(obj.desc(), "split_wk")
    w_all = Window.partitionBy()
    ranked = scored.select(
        "split_wk",
        "n1",
        "n2",
        "s1",
        "s2",
        "obj_num",
        "obj_den",
        obj.alias("objective"),
        F.row_number().over(w_rank).cast("bigint").alias("rnk"),
        F.max(obj).over(w_all).alias("best_obj"),
    )
    return ranked.where(F.col("rnk") <= 5).select(
        "split_wk",
        "n1",
        "n2",
        "s1",
        "s2",
        "obj_num",
        "obj_den",
        "objective",
        "rnk",
        ((F.col("rnk") > 1) | (F.col("objective") == F.col("best_obj"))).alias(
            "is_max_ok"
        ),
    )


# =========================================================================
# mk2: Mann–Kendall S, tie-corrected variance, z — exact then portable
# =========================================================================

_MK2_SQL = """
WITH monthly AS (
  SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
), pairs AS (
  SELECT CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sg
  FROM monthly a JOIN monthly b ON a.m < b.m
), s_ AS (
  SELECT CAST(SUM(sg) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs
), n_ AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly
), ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM monthly GROUP BY c)
  WHERE t > 1
)
SELECT n_.n, s_.s, s_.n_pairs,
       (s_.n_pairs = n_.n * (n_.n - 1) // 2
        AND ABS(s_.s) <= s_.n_pairs) AS bound_ok,
       CAST(n_.n * (n_.n - 1) * (2 * n_.n + 5) - ties.tie_term AS BIGINT)
         AS var_num,
       (CASE WHEN s_.s > 0 THEN s_.s - 1
             WHEN s_.s < 0 THEN s_.s + 1
             ELSE 0 END)
         / sqrt((n_.n * (n_.n - 1) * (2 * n_.n + 5) - ties.tie_term) / 18.0)
         AS z,
       ((s_.s > 0 AND (CASE WHEN s_.s > 0 THEN s_.s - 1
                            WHEN s_.s < 0 THEN s_.s + 1
                            ELSE 0 END) >= 0)
        OR (s_.s < 0 AND (CASE WHEN s_.s > 0 THEN s_.s - 1
                               WHEN s_.s < 0 THEN s_.s + 1
                               ELSE 0 END) <= 0)
        OR s_.s = 0) AS sign_coherent_ok
FROM s_ CROSS JOIN n_ CROSS JOIN ties
"""


@_register("mk2_mann_kendall", _MK2_SQL)
def mk2_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on the monthly order-count series:
    S = Σ_{i<j} sign(x_j − x_i) over the ~80-month AGGREGATED frame —
    the pair join is bounded by seasons, never rows (mw1's rank-test
    discipline) — the tie-corrected variance numerator
    n(n−1)(2n+5) − Σ t(t−1)(2t+5) stays exact BIGINT, and the z
    statistic spends exactly the two portable float operations: one
    division (by 18, of an exact integer) and one sqrt (IEEE
    correctly-rounded — the only libm function both engines compute
    identically). Laws: the combinatorial bound |S| ≤ n(n−1)/2 with
    the pair count verified against n, and sign coherence between S
    and the continuity-corrected numerator. One corpus scan, one
    monthly count; everything after is season-sized."""
    o = _t(spark, sf_dir, "orders")
    monthly = (
        o.select(
            F.substring(
                F.col("o_orderdate").cast("date").cast("string"), 1, 7
            ).alias("m")
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a = monthly.select(
        F.col("m").alias("ma"), F.col("c").alias("ca")
    )
    b = monthly.select(
        F.col("m").alias("mb"), F.col("c").alias("cb")
    )
    pairs = a.join(F.broadcast(b), F.col("ma") < F.col("mb")).select(
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
        .alias("sg")
    )
    s_ = pairs.agg(
        F.sum("sg").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    n_ = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        monthly.groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    j = s_.crossJoin(F.broadcast(n_)).crossJoin(F.broadcast(ties))
    corr = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    var_num = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ).cast("bigint")
    return j.select(
        "n",
        "s",
        "n_pairs",
        (
            (F.col("n_pairs") == F.expr("n * (n - 1) DIV 2"))
            & (F.abs(F.col("s")) <= F.col("n_pairs"))
        ).alias("bound_ok"),
        var_num.alias("var_num"),
        (corr / F.sqrt(var_num / F.lit(18.0))).alias("z"),
        (
            ((F.col("s") > 0) & (corr >= 0))
            | ((F.col("s") < 0) & (corr <= 0))
            | (F.col("s") == 0)
        ).alias("sign_coherent_ok"),
    )
