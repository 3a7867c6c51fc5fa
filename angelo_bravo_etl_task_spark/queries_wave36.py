"""Round-3 wave 36: online learning as a sequential fold, and fiscal
calendar arithmetic.

- ml2: one perceptron epoch — the seventh member of the sequential-fold
  family (ewma1, seq2, tb1, iu1, db1, sv1): the weight vector after
  sample t depends on every prior mistake, so no window expresses it;
  with +/-1 integer features the entire trajectory is exact integers.
- fis1: the 4-4-5 fiscal calendar (retail/finance standard) as pure
  epoch-day arithmetic — weeks, 4/4/5-week periods, and quarters from
  integer div/mod, no calendar dimension table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# ml2: one perceptron epoch as an exact integer fold
# =========================================================================

_ML2_SQL = """
WITH RECURSIVE feats AS (
  SELECT c_custkey AS k,
         CAST(2 * (c_custkey % 2) - 1 AS BIGINT) AS xa,
         CAST(2 * (c_nationkey % 2) - 1 AS BIGINT) AS xb,
         CAST(CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) * 100 > 500000
                   THEN 1 ELSE -1 END AS BIGINT) AS xc
  FROM customer WHERE c_custkey < 100
), labeled AS (
  SELECT k, xa, xb, xc,
         CAST(CASE WHEN xa + xb + xc > 0 THEN 1 ELSE -1 END AS BIGINT) AS y,
         CAST(ROW_NUMBER() OVER (ORDER BY k) AS BIGINT) AS i
  FROM feats
), r AS (
  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS w0,
         CAST(0 AS BIGINT) AS wa, CAST(0 AS BIGINT) AS wb,
         CAST(0 AS BIGINT) AS wc, CAST(0 AS BIGINT) AS mistakes
  UNION ALL
  SELECT l.i,
         CASE WHEN l.y * (r.w0 + r.wa * l.xa + r.wb * l.xb + r.wc * l.xc)
                   <= 0
              THEN r.w0 + l.y ELSE r.w0 END,
         CASE WHEN l.y * (r.w0 + r.wa * l.xa + r.wb * l.xb + r.wc * l.xc)
                   <= 0
              THEN r.wa + l.y * l.xa ELSE r.wa END,
         CASE WHEN l.y * (r.w0 + r.wa * l.xa + r.wb * l.xb + r.wc * l.xc)
                   <= 0
              THEN r.wb + l.y * l.xb ELSE r.wb END,
         CASE WHEN l.y * (r.w0 + r.wa * l.xa + r.wb * l.xb + r.wc * l.xc)
                   <= 0
              THEN r.wc + l.y * l.xc ELSE r.wc END,
         CASE WHEN l.y * (r.w0 + r.wa * l.xa + r.wb * l.xb + r.wc * l.xc)
                   <= 0
              THEN r.mistakes + 1 ELSE r.mistakes END
  FROM r JOIN labeled l ON l.i = r.i + 1
)
SELECT CAST((SELECT COUNT(*) FROM labeled) AS BIGINT) AS n,
       w0, wa, wb, wc, mistakes
FROM r WHERE i = (SELECT MAX(i) FROM labeled)
"""


@_register("ml2_perceptron_epoch", _ML2_SQL)
def ml2_perceptron_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One perceptron training epoch, exact: +/-1 integer features
    (key parity, nation parity, balance threshold) with bias, labels
    from the majority concept sign(xa+xb+xc) (odd sum of three +/-1
    terms — never zero), samples visited in key order, the classic
    update w += y*x on margin <= 0. The weight trajectory is ORDER
    DEPENDENT state (every mistake reshapes all later decisions), so
    this is the sequential-fold family's online-learning member: Spark
    materializes the sorted sample array and runs ONE F.aggregate with
    a (w0, wa, wb, wc, mistakes) struct accumulator; the oracle replays
    the identical recurrence as a recursive CTE. Everything stays in
    BIGINT. At 100 TB this shape trains per-key micro-models (the
    per-group fold), or feeds mistake counts into the convergence check
    of a parallel averaged-perceptron — the per-partition epoch is this
    exact fold."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    labeled = c.select(
        F.col("c_custkey").alias("k"),
        (2 * (F.col("c_custkey") % 2) - 1).cast("bigint").alias("xa"),
        (2 * (F.col("c_nationkey") % 2) - 1).cast("bigint").alias("xb"),
        F.when(
            F.col("c_acctbal").cast("decimal(18,2)") * 100 > 500000, 1
        )
        .otherwise(-1)
        .cast("bigint")
        .alias("xc"),
    ).withColumn(
        "y",
        F.when(F.col("xa") + F.col("xb") + F.col("xc") > 0, 1)
        .otherwise(-1)
        .cast("bigint"),
    )
    series = labeled.agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(
            F.collect_list(F.struct("k", "y", "xa", "xb", "xc"))
        ).alias("s"),
    )
    acc0 = F.expr(
        "named_struct('w0', CAST(0 AS BIGINT), 'wa', CAST(0 AS BIGINT),"
        " 'wb', CAST(0 AS BIGINT), 'wc', CAST(0 AS BIGINT),"
        " 'mistakes', CAST(0 AS BIGINT))"
    )

    def step(acc, v):
        margin = v["y"] * (
            acc["w0"]
            + acc["wa"] * v["xa"]
            + acc["wb"] * v["xb"]
            + acc["wc"] * v["xc"]
        )
        miss = margin <= 0
        return F.struct(
            F.when(miss, acc["w0"] + v["y"]).otherwise(acc["w0"]).alias("w0"),
            F.when(miss, acc["wa"] + v["y"] * v["xa"])
            .otherwise(acc["wa"])
            .alias("wa"),
            F.when(miss, acc["wb"] + v["y"] * v["xb"])
            .otherwise(acc["wb"])
            .alias("wb"),
            F.when(miss, acc["wc"] + v["y"] * v["xc"])
            .otherwise(acc["wc"])
            .alias("wc"),
            F.when(miss, acc["mistakes"] + 1)
            .otherwise(acc["mistakes"])
            .alias("mistakes"),
        )

    folded = series.select(
        "n", F.aggregate("s", acc0, step).alias("m")
    )
    return folded.select(
        "n",
        F.col("m.w0").alias("w0"),
        F.col("m.wa").alias("wa"),
        F.col("m.wb").alias("wb"),
        F.col("m.wc").alias("wc"),
        F.col("m.mistakes").alias("mistakes"),
    )


# =========================================================================
# fis1: 4-4-5 fiscal calendar mapping
# =========================================================================

_FIS1_SQL = """
WITH mapped AS (
  SELECT o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '2024-01-01' AS BIGINT)
           AS fy_day,
         CAST(CAST(o_orderdate AS DATE) - DATE '2024-01-01' AS BIGINT) // 7
           AS fy_week,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders
), periods AS (
  SELECT o_orderkey, cents, fy_week,
         fy_week // 13 AS fq,
         fy_week % 13 AS wq,
         CASE WHEN fy_week % 13 < 4 THEN 0
              WHEN fy_week % 13 < 8 THEN 1
              ELSE 2 END AS pq
  FROM mapped
)
SELECT CAST(fq + 1 AS BIGINT) AS fiscal_quarter,
       CAST(3 * fq + pq + 1 AS BIGINT) AS fiscal_period,
       CAST(MIN(fy_week) AS BIGINT) AS first_week,
       CAST(MAX(fy_week) AS BIGINT) AS last_week,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM periods
GROUP BY fq, pq
"""


@_register("fis1_fiscal_445", _FIS1_SQL)
def fis1_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar rollup — the retail/finance standard where
    each quarter is a 4-week, 4-week, 5-week period triple — computed
    as PURE integer arithmetic on days since the fiscal year start
    (week = day div 7; quarter = week div 13; period index by the
    4/4/5 split of week-in-quarter), no calendar dimension table to
    build, version, or join. Orders roll up to exact-cent revenue per
    fiscal period with the period's week span alongside. At 100 TB the
    mapping is a narrow projection fused into the scan; the rollup is
    one combinable aggregate — compare cal1, which materializes a spine
    when the calendar has irregular business rules."""
    o = _t(spark, sf_dir, "orders")
    mapped = o.select(
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE),"
            " DATE '2024-01-01') div 7 AS BIGINT)"
        ).alias("fy_week"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    periods = mapped.select(
        "cents",
        "fy_week",
        F.expr("fy_week div 13").alias("fq"),
        F.expr(
            "CASE WHEN fy_week % 13 < 4 THEN 0"
            " WHEN fy_week % 13 < 8 THEN 1 ELSE 2 END"
        ).alias("pq"),
    )
    return periods.groupBy("fq", "pq").agg(
        F.min("fy_week").alias("first_week"),
        F.max("fy_week").alias("last_week"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    ).select(
        (F.col("fq") + 1).cast("bigint").alias("fiscal_quarter"),
        (3 * F.col("fq") + F.col("pq") + 1).cast("bigint").alias(
            "fiscal_period"
        ),
        "first_week",
        "last_week",
        "n_orders",
        "revenue_cents",
    )
