"""Round-3 wave 67: mergeable moments, rolling-origin backtest.

- stats4: the mergeability law behind every distributed aggregation —
  per-partition partial moments (n, Σq, Σq²) merged by plain SUM must
  equal the direct single-level aggregation. This is THE property that
  makes map-side combine correct at 100 TB (partial aggregation is
  exactly this algebra); here it is certified cross-engine in exact
  BIGINT arithmetic, with population variance/stddev derived from the
  merged moments by ONE portable double division and an IEEE-exact
  sqrt (the only two float ops, both bit-stable across engines).
- cv2: rolling-origin forecast backtesting — the time-series analogue
  of cross-validation. Daily event counts per type on a DENSE per-type
  calendar spine (sequence() inside the aggregate — no cross join),
  naive (lag 1) vs seasonal-naive (lag 7) forecasts, absolute errors
  in exact BIGINT, per-type MAE as one terminal division, and the
  model-selection verdict decided on the INTEGER error sums so the
  winner column is float-free.

Reference parity note: the reference script (Angelo_ETL_Task.py) has no
statistics surface; these extend SURVEY.md §2.4's analytics family
(stats1-stats3, fc1) with the mergeable-aggregate law and backtesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# stats4: mergeable moments — partial aggregation certified
# =========================================================================

_STATS4_SQL = """
WITH q AS (
  SELECT l_returnflag,
         l_orderkey % 8 AS bucket,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
), partials AS (                       -- per-(flag, bucket) partial moments
  SELECT l_returnflag, bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q * q) AS BIGINT) AS s2
  FROM q GROUP BY l_returnflag, bucket
), merged AS (                         -- merge = plain SUM of partials
  SELECT l_returnflag,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s1) AS BIGINT) AS s1,
         CAST(SUM(s2) AS BIGINT) AS s2
  FROM partials GROUP BY l_returnflag
), direct AS (                         -- single-level reference aggregation
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q * q) AS BIGINT) AS s2
  FROM q GROUP BY l_returnflag
)
SELECT m.l_returnflag,
       m.n AS n_rows,
       m.s1 AS sum_q,
       m.s2 AS sum_q2,
       CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
         / CAST(m.n * m.n AS DOUBLE) AS var_pop_q,
       sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
            / CAST(m.n * m.n AS DOUBLE)) AS std_q,
       (m.n = d.n AND m.s1 = d.s1 AND m.s2 = d.s2) AS merge_ok
FROM merged m JOIN direct d ON m.l_returnflag = d.l_returnflag
ORDER BY m.l_returnflag
"""


@_register("stats4_mergeable_moments", _STATS4_SQL)
def stats4_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable (n, Σq, Σq²) moment aggregation: per-(flag, bucket)
    partials merged by SUM vs the direct per-flag aggregation, with the
    mergeability law asserted row by row (merge_ok). l_quantity is
    integral-valued (1..50) so the BIGINT cast is exact on both engines;
    n*s2 and s1² stay far inside BIGINT through sf10 (bounds in the
    docstring math: s1 <= 50·6M, s1² <= 9e16 < 2^63). Variance is
    computed from the merged moments by the (nΣq² − (Σq)²)/n² identity:
    one double division (IEEE-portable) and one sqrt (correctly rounded
    per IEEE-754, hence bit-identical cross-engine — the fe7 lesson).
    At 100 TB this shape IS Spark's partial aggregation: the bucket
    level stands in for map-side combiners, the merge level for the
    final exchange — certifying the algebra certifies the scale plan."""
    q = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_orderkey") % F.lit(8)).alias("bucket"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    partials = q.groupBy("l_returnflag", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.sum("n").alias("n"), F.sum("s1").alias("s1"), F.sum("s2").alias("s2")
    )
    direct = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    m, d = merged.alias("m"), direct.alias("d")
    num = (F.col("m.n") * F.col("m.s2") - F.col("m.s1") * F.col("m.s1")).cast(
        "double"
    )
    den = (F.col("m.n") * F.col("m.n")).cast("double")
    return (
        m.join(d, F.col("m.l_returnflag") == F.col("d.l_returnflag"))
        .select(
            F.col("m.l_returnflag").alias("l_returnflag"),
            F.col("m.n").alias("n_rows"),
            F.col("m.s1").alias("sum_q"),
            F.col("m.s2").alias("sum_q2"),
            (num / den).alias("var_pop_q"),
            F.sqrt(num / den).alias("std_q"),
            (
                (F.col("m.n") == F.col("d.n"))
                & (F.col("m.s1") == F.col("d.s1"))
                & (F.col("m.s2") == F.col("d.s2"))
            ).alias("merge_ok"),
        )
        .orderBy("l_returnflag")
    )


# =========================================================================
# cv2: rolling-origin backtest — naive vs seasonal-naive
# =========================================================================

_CV2_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), bounds AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
  FROM daily GROUP BY event_type
), spine AS (                           -- dense per-type calendar spine
  SELECT event_type,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), filled AS (
  SELECT s.event_type, s.day, COALESCE(d.cnt, 0) AS cnt
  FROM spine s LEFT JOIN daily d
    ON s.event_type = d.event_type AND s.day = d.day
), lagged AS (
  SELECT event_type, day, cnt,
         lag(cnt, 1) OVER w AS f_naive,
         lag(cnt, 7) OVER w AS f_seasonal
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), ev AS (                              -- evaluation window: both defined
  SELECT * FROM lagged WHERE f_seasonal IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(ABS(cnt - f_naive)) AS BIGINT) AS sae_naive,
       CAST(SUM(ABS(cnt - f_seasonal)) AS BIGINT) AS sae_seasonal,
       CAST(SUM(ABS(cnt - f_naive)) AS DOUBLE) / COUNT(*) AS mae_naive,
       CAST(SUM(ABS(cnt - f_seasonal)) AS DOUBLE) / COUNT(*) AS mae_seasonal,
       CASE WHEN SUM(ABS(cnt - f_seasonal)) < SUM(ABS(cnt - f_naive))
              THEN 'seasonal'
            WHEN SUM(ABS(cnt - f_naive)) < SUM(ABS(cnt - f_seasonal))
              THEN 'naive'
            ELSE 'tie' END AS winner
FROM ev
GROUP BY event_type
ORDER BY event_type
"""


@_register("cv2_rolling_origin", _CV2_SQL)
def cv2_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of two per-type daily forecasters: naive
    (yesterday's count) vs seasonal-naive (same weekday last week). The
    per-type calendar spine comes from sequence(min(day), max(day))
    INSIDE the aggregate — dense days per group with zero cross joins,
    so row-lag equals calendar-lag by construction (missing days are
    filled with 0 before lagging). Errors are |BIGINT − BIGINT|; the
    per-type MAE is one terminal double division; the winner verdict
    compares the INTEGER error sums so model selection never touches a
    float. Day grain emits DATE on both engines (the date_trunc trap).
    At scale the daily pre-aggregation collapses the event volume to
    (types × days) rows before any window runs — the window cost is
    independent of raw event count."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("cnt"))
    spine = (
        daily.groupBy("event_type")
        .agg(F.sequence(F.min("day"), F.max("day")).alias("days"))
        .select("event_type", F.explode("days").alias("day"))
    )
    filled = (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = filled.select(
        "event_type",
        "day",
        "cnt",
        F.lag("cnt", 1).over(w).alias("f_naive"),
        F.lag("cnt", 7).over(w).alias("f_seasonal"),
    ).filter(F.col("f_seasonal").isNotNull())
    sae_n = F.sum(F.abs(F.col("cnt") - F.col("f_naive")))
    sae_s = F.sum(F.abs(F.col("cnt") - F.col("f_seasonal")))
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            sae_n.alias("sae_naive"),
            sae_s.alias("sae_seasonal"),
            (sae_n.cast("double") / F.count(F.lit(1))).alias("mae_naive"),
            (sae_s.cast("double") / F.count(F.lit(1))).alias("mae_seasonal"),
            F.when(sae_s < sae_n, F.lit("seasonal"))
            .when(sae_n < sae_s, F.lit("naive"))
            .otherwise(F.lit("tie"))
            .alias("winner"),
        )
        .orderBy("event_type")
    )
