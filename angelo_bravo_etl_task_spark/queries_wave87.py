r"""Round-5 wave 87: business-day latency, effective-dated currency
conversion.

- ts5: SLA reporting the way operations actually counts — BUSINESS
  days between order and ship dates, in pure integer arithmetic: the
  weekday census wd(x) = 5·(x DIV 7) + LEAST(x MOD 7, 5) over
  Monday-aligned epoch days turns "weekdays in an interval" into a
  difference of two closed forms — no calendar UDF, no loops, no
  libm. The business count is certified against the calendar count
  per month (never exceeds it; at least 5/7 of it minus the weekend
  fringe).
- fx1: the money join every multinational ledger runs — an
  EFFECTIVE-DATED rate table (rates published only on even quarters;
  later quarters inherit the latest preceding publication — a true
  as-of semantics on a synthesized dimension) applied in exact
  integer ppm arithmetic: converted = cents·rate_ppm DIV 10⁶, with
  the effective-dating law (publication ≤ order quarter, staleness
  ≤ 1 quarter) and the truncation bound (the group loses less than
  one minor unit per order) certified per group.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no calendar or currency surface; these extend the temporal family
(cal1, f13 timezones, j3/j7/j9 as-of joins, pt1) with the two
business-calendar operations warehouse teams re-implement endlessly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# ts5: business days between order and ship, integer closed form
# =========================================================================

# wd(x) counts weekdays in [0, x) over MONDAY-aligned day numbers:
# each full week holds 5, a partial week's first min(r, 5) days are
# weekdays. Epoch day 0 = Thursday, so +3 aligns to Monday; the extra
# +1 (total +4) shifts the difference to the half-open (od, sd] the
# SLA convention counts — exclude the order day, include the ship day.
_WD = "(5 * (({x}) // 7) + LEAST(({x}) % 7, 5))"
_WD_SPARK = "(5 * (({x}) DIV 7) + LEAST(({x}) % 7, 5))"

_TS5_SQL = f"""
WITH base AS (
  SELECT substr(CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR), 1, 7)
           AS order_month,
         CAST(o.o_orderdate AS DATE) AS od,
         CAST(l.l_shipdate AS DATE) AS sd
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
), days_ AS (
  SELECT order_month,
         CAST(sd - od AS BIGINT) AS caldays,
         CAST({_WD.format(x="(sd - DATE '1970-01-01') + 4")}
              - {_WD.format(x="(od - DATE '1970-01-01') + 4")}
              AS BIGINT) AS busdays
  FROM base
)
SELECT order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(caldays) AS BIGINT) AS sum_caldays,
       CAST(SUM(busdays) AS BIGINT) AS sum_busdays,
       CAST(SUM(caldays) AS BIGINT) / COUNT(*) AS avg_caldays,
       CAST(SUM(busdays) AS BIGINT) / COUNT(*) AS avg_busdays,
       (SUM(busdays) <= SUM(caldays)) AS bus_le_cal_ok,
       (7 * SUM(busdays) + 2 * COUNT(*) * 7 >= 5 * SUM(caldays))
         AS weekday_share_ok
FROM days_ GROUP BY order_month
"""


@_register("ts5_business_days", _TS5_SQL)
def ts5_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day order→ship latency per order month, zero calendar
    UDFs: with Monday-aligned day numbers (epoch day + 3; epoch day 0
    is a Thursday), the closed form wd(x) = 5·(x DIV 7) + LEAST(x MOD
    7, 5) counts weekdays in [0, x), so weekdays in the SLA interval
    (order day excluded, ship day included) is wd(sd+1) − wd(od+1) —
    two integer expressions per row, map-side, exact on both
    engines. Certified per month: `bus_le_cal_ok` (business ≤
    calendar days) and `weekday_share_ok` (business days cover at
    least 5/7 of calendar days minus the ≤2-day weekend fringe per
    interval, cross-multiplied to stay integer). Averages are IEEE
    divisions of exact sums. The property layer replays with Python's
    real weekday() as independent ground truth. Plan shape: one
    broadcast-joined scan + one combinable aggregate by month."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("sd") >= F.col("od"))
        .select(
            F.substring(F.col("od").cast("string"), 1, 7).alias(
                "order_month"
            ),
            F.datediff("sd", F.lit("1970-01-01").cast("date")).alias("sdd"),
            F.datediff("od", F.lit("1970-01-01").cast("date")).alias("odd"),
        )
    )
    wd_hi = F.expr(_WD_SPARK.format(x="sdd + 4"))
    wd_lo = F.expr(_WD_SPARK.format(x="odd + 4"))
    days_ = base.select(
        "order_month",
        (F.col("sdd") - F.col("odd")).cast("bigint").alias("caldays"),
        (wd_hi - wd_lo).cast("bigint").alias("busdays"),
    )
    return days_.groupBy("order_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("caldays").cast("bigint").alias("sum_caldays"),
        F.sum("busdays").cast("bigint").alias("sum_busdays"),
        (F.sum("caldays").cast("bigint") / F.count(F.lit(1))).alias(
            "avg_caldays"
        ),
        (F.sum("busdays").cast("bigint") / F.count(F.lit(1))).alias(
            "avg_busdays"
        ),
        (F.sum("busdays") <= F.sum("caldays")).alias("bus_le_cal_ok"),
        (
            7 * F.sum("busdays") + 2 * F.count(F.lit(1)) * 7
            >= 5 * F.sum("caldays")
        ).alias("weekday_share_ok"),
    )


# =========================================================================
# fx1: effective-dated ppm rates, exact conversion with truncation law
# =========================================================================

_FX1_SQL = """
WITH ord AS (
  SELECT o.o_orderkey, c.c_nationkey AS nk,
         CAST((EXTRACT(YEAR FROM o.o_orderdate) - 1992) * 4
              + (EXTRACT(QUARTER FROM o.o_orderdate) - 1) AS BIGINT) AS q,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), pubs AS (
  SELECT nk, pub_q,
         CAST(800000 + CAST('0x' || substr(md5('fx:' || CAST(nk AS VARCHAR)
                 || ':' || CAST(pub_q AS VARCHAR)), 1, 8) AS BIGINT)
              % 400000 AS BIGINT) AS rate_ppm
  FROM (SELECT DISTINCT c_nationkey AS nk FROM customer) n
  CROSS JOIN (SELECT unnest(range(0, 60, 2)) AS pub_q) s
), resolved AS (
  SELECT o.o_orderkey, o.nk, o.q, o.cents, p.pub_q, p.rate_ppm
  FROM ord o JOIN pubs p ON p.nk = o.nk AND p.pub_q = 2 * (o.q // 2)
)
SELECT nk, q, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(pub_q) AS BIGINT) AS pub_q,
       CAST(MAX(rate_ppm) AS BIGINT) AS rate_ppm,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM((cents * rate_ppm) // 1000000) AS BIGINT) AS sum_converted,
       (MAX(pub_q) <= MAX(q) AND MAX(q) - MAX(pub_q) <= 1) AS effective_ok,
       (1000000 * SUM((cents * rate_ppm) // 1000000)
          <= SUM(cents * rate_ppm)
        AND SUM(cents * rate_ppm)
          < 1000000 * (SUM((cents * rate_ppm) // 1000000) + COUNT(*)))
         AS truncation_ok
FROM resolved GROUP BY nk, q
"""


@_register("fx1_effective_rates", _FX1_SQL)
def fx1_effective_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated currency conversion: rates exist only for EVEN
    quarters (the publication calendar, a grid generous enough for any
    driver data generation), each order uses the latest publication at
    or before its quarter — resolved in closed form
    (pub_q = 2·(q DIV 2), the as-of join reduced to arithmetic because
    the publication grid is regular; j3/j7/j9 cover the irregular
    case) — and money converts in exact integer ppm:
    converted = cents·rate_ppm DIV 10⁶ (products ≤ ~6·10¹³, safely
    int64). Two laws per (nation, quarter) group: `effective_ok`
    (publication ≤ order quarter, staleness ≤ 1 — no future rate ever
    leaks in) and `truncation_ok` (the whole group loses less than one
    minor unit per order to DIV — the ledger reconciliation bound,
    cross-multiplied to stay integer). Rates are deterministic md5 ppm
    in [0.8, 1.2). Plan shape: customer join broadcasts; the rate grid
    is nations × 14 publications, dimension-sized; one combinable
    aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ord_ = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nk"),
            (
                (F.year("o_orderdate") - 1992) * 4
                + (F.quarter("o_orderdate") - 1)
            )
            .cast("bigint")
            .alias("q"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    pub_q = F.expr("2 * (q DIV 2)")
    rate = F.expr(
        "CAST(800000 + CAST(CONV(SUBSTRING(MD5(CONCAT('fx:', "
        "CAST(nk AS STRING), ':', CAST(2 * (q DIV 2) AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 400000 AS BIGINT)"
    )
    asof = ord_.select(
        "nk",
        "q",
        "cents",
        pub_q.alias("pub_q"),
        rate.alias("rate_ppm"),
    )
    conv = F.expr("(cents * rate_ppm) DIV 1000000")
    return asof.groupBy("nk", "q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max("pub_q").cast("bigint").alias("pub_q"),
        F.max("rate_ppm").cast("bigint").alias("rate_ppm"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.sum(conv).cast("bigint").alias("sum_converted"),
        (
            (F.max("pub_q") <= F.max("q"))
            & (F.max("q") - F.max("pub_q") <= 1)
        ).alias("effective_ok"),
        (
            (
                1000000 * F.sum(conv)
                <= F.sum(F.col("cents") * F.col("rate_ppm"))
            )
            & (
                F.sum(F.col("cents") * F.col("rate_ppm"))
                < 1000000 * (F.sum(conv) + F.count(F.lit(1)))
            )
        ).alias("truncation_ok"),
    )
