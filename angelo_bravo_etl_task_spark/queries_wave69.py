"""Round-3 wave 69: exact half-life decay, leakage-free label construction.

- decay1: a trending-content leaderboard under exponential time decay
  computed ENTIRELY in integers — per-(type, day) counts weighted by
  1024 >> min(age_days, 10) (half-life = 1 day, 10-bit resolution), so
  the decayed score is an exact BIGINT on both engines and the usual
  pow(0.5, age) libm hazard never arises (the hll1/fe7 dyadic-rational
  lesson applied to time decay). Raw-count rank emitted beside the
  decayed rank with the integer rank shift, showing what recency
  re-ordering actually changed.
- lbl1: point-in-time training-label construction — the leakage
  discipline every supervised pipeline at 100 TB depends on. A single
  conditional aggregation over orders builds per-customer features
  STRICTLY before a data-derived cutoff (max order day − 90) and the
  repurchase label STRICTLY after it, so feature and label windows are
  provably disjoint by construction; customers with no history keep
  zero/NULL features and a false label (no row is dropped — the
  training frame covers the full entity universe).

Reference parity note: the reference script (Angelo_ETL_Task.py) has no
ML-data surface; these extend the training-data family (px2, ft1, cv1,
fe1-fe7) and the analytics family (ewma1's float smoothing gets an
exact integer sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# decay1: half-life leaderboard in exact integer arithmetic
# =========================================================================

_DECAY1_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), ref AS (
  SELECT MAX(day) AS ref_day FROM daily
), weighted AS (
  SELECT d.event_type,
         CAST(SUM(d.cnt * (1024 >> LEAST(date_diff('day', d.day, r.ref_day),
                                         10))) AS BIGINT) AS decayed_score,
         CAST(SUM(d.cnt) AS BIGINT) AS raw_count
  FROM daily d CROSS JOIN ref r
  GROUP BY d.event_type
)
SELECT event_type, decayed_score, raw_count,
       CAST(ROW_NUMBER() OVER (ORDER BY decayed_score DESC, event_type)
            AS BIGINT) AS rank_decayed,
       CAST(ROW_NUMBER() OVER (ORDER BY raw_count DESC, event_type)
            AS BIGINT) AS rank_raw,
       CAST(ROW_NUMBER() OVER (ORDER BY raw_count DESC, event_type)
            - ROW_NUMBER() OVER (ORDER BY decayed_score DESC, event_type)
            AS BIGINT) AS rank_shift
FROM weighted
ORDER BY event_type
"""


@_register("decay1_halflife_leaderboard", _DECAY1_SQL)
def decay1_halflife_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type leaderboard under one-day half-life decay: weight
    1024 >> min(age_days, 10) per event (ages past 10 days keep weight
    1 — the shift saturates instead of underflowing to a float), summed
    in exact BIGINT. The decayed score is a dyadic-rational sum scaled
    by 2^10, so NO floating point exists anywhere in the query — the
    portable alternative to pow(0.5, age/halflife), whose libm rounding
    differs across engines. Volume collapses to (types × days) rows via
    the daily pre-aggregation BEFORE the decay math and the 1-row ref
    day broadcasts, so at 100 TB the expensive scan feeds one map-side-
    combinable count and everything after is constant-size. Ranks by
    decayed score and raw count share the deterministic event_type
    tiebreak; rank_shift shows recency's actual effect."""
    daily = (
        _t(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ref = daily.agg(F.max("day").alias("ref_day"))
    weighted = (
        daily.crossJoin(F.broadcast(ref))
        .withColumn("age", F.datediff(F.col("ref_day"), F.col("day")))
        .withColumn(
            "w",
            F.expr("shiftright(1024, CAST(LEAST(age, 10) AS INT))").cast(
                "long"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("decayed_score"),
            F.sum("cnt").alias("raw_count"),
        )
    )
    w_dec = Window.orderBy(F.col("decayed_score").desc(), F.col("event_type"))
    w_raw = Window.orderBy(F.col("raw_count").desc(), F.col("event_type"))
    return (
        weighted.select(
            "event_type",
            "decayed_score",
            "raw_count",
            F.row_number().over(w_dec).cast("long").alias("rank_decayed"),
            F.row_number().over(w_raw).cast("long").alias("rank_raw"),
            (F.row_number().over(w_raw) - F.row_number().over(w_dec))
            .cast("long")
            .alias("rank_shift"),
        )
        .orderBy("event_type")
    )


# =========================================================================
# lbl1: leakage-free point-in-time labels
# =========================================================================

_LBL1_SQL = """
WITH bounds AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) - 90 AS cutoff FROM orders
), hist AS (
  SELECT o.o_custkey,
         CAST(COUNT(CASE WHEN CAST(o.o_orderdate AS DATE) <= b.cutoff
                         THEN 1 END) AS BIGINT) AS n_orders_before,
         CAST(COALESCE(SUM(CASE WHEN CAST(o.o_orderdate AS DATE) <= b.cutoff
                                THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                                END), 0) AS DOUBLE) AS total_before,
         MAX(CASE WHEN CAST(o.o_orderdate AS DATE) <= b.cutoff
                  THEN CAST(o.o_orderdate AS DATE) END) AS last_before,
         MAX(CASE WHEN CAST(o.o_orderdate AS DATE) > b.cutoff
                  THEN 1 ELSE 0 END) AS lbl,
         MAX(b.cutoff) AS cutoff
  FROM orders o CROSS JOIN bounds b
  GROUP BY o.o_custkey
)
SELECT c.c_custkey,
       COALESCE(h.n_orders_before, 0) AS n_orders_before,
       COALESCE(h.total_before, 0.0) AS total_before,
       CAST(date_diff('day', h.last_before, h.cutoff) AS BIGINT)
         AS days_since_last,
       COALESCE(h.lbl = 1, FALSE) AS label
FROM customer c LEFT JOIN hist h ON c.c_custkey = h.o_custkey
ORDER BY c.c_custkey
"""


@_register("lbl1_leakage_free_labels", _LBL1_SQL)
def lbl1_leakage_free_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer training frame with features computed STRICTLY at or
    before a point-in-time cutoff (max order day − 90, data-derived so
    both label branches fire at every SF — the dp2/bloom1 rule) and the
    repurchase label strictly after it: window disjointness is enforced
    by the CASE predicates inside ONE conditional aggregation, so a
    single shuffle on o_custkey produces features AND label with no
    second scan and no self-join. Money sums go through DECIMAL(18,2)
    before the terminal double cast (order-insensitive, cross-engine
    exact); recency is an integer day difference; customers with no
    pre-cutoff history survive the left join with zero/NULL features
    and a false label, keeping the training frame total over the entity
    universe. This is the point-in-time discipline (pt1's join cousin)
    that prevents target leakage in any supervised pipeline at scale."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    bounds = orders.agg(F.date_sub(F.max("d"), 90).alias("cutoff"))
    before = F.col("d") <= F.col("cutoff")
    hist = (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy("o_custkey")
        .agg(
            F.count(F.when(before, F.lit(1))).alias("n_orders_before"),
            F.coalesce(
                F.sum(F.when(before, F.col("price"))),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("total_before"),
            F.max(F.when(before, F.col("d"))).alias("last_before"),
            F.max(F.when(before, F.lit(0)).otherwise(F.lit(1))).alias("lbl"),
            F.max("cutoff").alias("cutoff"),
        )
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(hist, cust.c_custkey == hist.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_orders_before"), F.lit(0).cast("long")).alias(
                "n_orders_before"
            ),
            F.coalesce(F.col("total_before"), F.lit(0.0)).alias(
                "total_before"
            ),
            F.datediff(F.col("cutoff"), F.col("last_before"))
            .cast("long")
            .alias("days_since_last"),
            F.coalesce(F.col("lbl") == 1, F.lit(False)).alias("label"),
        )
        .orderBy("c_custkey")
    )
