"""Round-3 wave 29: optimizer-facing table statistics with a broadcast
advisor, item-item collaborative filtering, and business-day arithmetic.

- stats2: the ANALYZE TABLE pass — row counts, estimated byte widths,
  key cardinalities — plus the decision CBO makes with them (does this
  dimension broadcast?). The advisor thresholds are the ones that
  matter on a real cluster; exact integers end to end.
- cf1: mb1's basket-keyed pair supports normalized to cosine item-item
  similarity (sqrt is the ONE portable libm function) and served as
  per-item top-3 neighbor lists — the collaborative-filtering artifact.
- cal2: NETWORKDAYS-style business-day counting as pure epoch-day
  arithmetic (1970-01-01 is a Thursday, so weekend = epoch_day % 7 in
  {2, 3}) with an in-cell filtered sequence — no calendar table needed,
  and the sequence bound is guarded (Spark's sequence() DESCENDS when
  the bound inverts — the mm5 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# stats2: ANALYZE TABLE + broadcast advisor
# =========================================================================

_STATS2_SQL = """
WITH c AS (
  SELECT 'customer' AS table_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(LENGTH(c_name) + LENGTH(c_mktsegment) + 24) AS BIGINT)
           AS est_bytes,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_key
  FROM customer
), s AS (
  SELECT 'supplier',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(LENGTH(s_name) + 20) AS BIGINT),
         CAST(COUNT(DISTINCT s_suppkey) AS BIGINT)
  FROM supplier
), p AS (
  SELECT 'part',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(LENGTH(p_name) + LENGTH(p_brand) + LENGTH(p_type) + 20)
              AS BIGINT),
         CAST(COUNT(DISTINCT p_partkey) AS BIGINT)
  FROM part
), o AS (
  SELECT 'orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(LENGTH(o_orderstatus) + LENGTH(o_orderpriority) + 32)
              AS BIGINT),
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
), l AS (
  SELECT 'lineitem',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(LENGTH(l_returnflag) + LENGTH(l_linestatus) + 64)
              AS BIGINT),
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
  FROM lineitem
), u AS (
  SELECT * FROM c UNION ALL SELECT * FROM s UNION ALL SELECT * FROM p
  UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
)
SELECT table_name, n_rows, est_bytes, n_distinct_key,
       (est_bytes < 10485760) AS fits_broadcast,
       (n_rows = n_distinct_key) AS key_is_unique
FROM u
"""


@_register("stats2_analyze_tables", _STATS2_SQL)
def stats2_analyze_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE for the star schema: per table, the row count, the
    estimated in-memory byte width (measured string lengths + fixed
    numeric widths — the same estimate a cost-based optimizer keeps),
    the join-key cardinality, and the two verdicts planners derive from
    them: fits_broadcast (est_bytes under the 10 MB autoBroadcast
    threshold — true for the dimensions, false for the facts at bench
    scale, so both branches fire) and key_is_unique (n_rows ==
    n_distinct_key: true for every primary key, false for lineitem's
    l_orderkey — the fan-out warning a join planner wants). Each table
    contributes ONE map-side-combinable aggregate; the output is five
    rows. This is the statistics pass the scale notes in SCALE.md keep
    referring to, made an explicit operator."""
    specs = [
        ("customer", "c_custkey",
         F.length("c_name") + F.length("c_mktsegment") + 24),
        ("supplier", "s_suppkey", F.length("s_name") + 20),
        ("part", "p_partkey",
         F.length("p_name") + F.length("p_brand") + F.length("p_type") + 20),
        ("orders", "o_orderkey",
         F.length("o_orderstatus") + F.length("o_orderpriority") + 32),
        ("lineitem", "l_orderkey",
         F.length("l_returnflag") + F.length("l_linestatus") + 64),
    ]
    out = None
    for tname, key, width in specs:
        t = _t(spark, sf_dir, tname)
        agg = t.agg(
            F.lit(tname).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(width.cast("bigint")).alias("est_bytes"),
            F.countDistinct(key).cast("bigint").alias("n_distinct_key"),
        )
        out = agg if out is None else out.unionAll(agg)
    return out.select(
        "table_name",
        "n_rows",
        "est_bytes",
        "n_distinct_key",
        (F.col("est_bytes") < 10485760).alias("fits_broadcast"),
        (F.col("n_rows") == F.col("n_distinct_key")).alias("key_is_unique"),
    )


# =========================================================================
# cf1: item-item collaborative filtering (cosine-normalized co-occurrence)
# =========================================================================

_CF1_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), marg AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), sym AS (
  SELECT pa AS item, pb AS other, c_ab FROM pairs
  UNION ALL
  SELECT pb AS item, pa AS other, c_ab FROM pairs
), simed AS (
  SELECT s.item, s.other, s.c_ab,
         CAST(s.c_ab AS DOUBLE) / sqrt(CAST(ma.c * mb.c AS DOUBLE)) AS sim
  FROM sym s
  JOIN marg ma ON ma.l_partkey = s.item
  JOIN marg mb ON mb.l_partkey = s.other
  WHERE s.c_ab >= 2
)
SELECT item, other, c_ab, sim, rank FROM (
  SELECT item, other, c_ab, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY item
                                 ORDER BY sim DESC, other) AS BIGINT) AS rank
  FROM simed
) WHERE rank <= 3
"""


@_register("cf1_item_item", _CF1_SQL)
def cf1_item_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: mb1's basket-keyed pair
    supports, cosine-normalized (c_ab / sqrt(c_a * c_b) — sqrt is
    IEEE-correctly-rounded hence portable; everything under it is exact
    integers) and served as per-item top-3 neighbor lists with
    min-support 2 — the precomputed artifact an item-page recommender
    actually reads. The pair join is keyed on the BASKET so fan-out is
    lines-per-basket choose 2, never catalog squared; the symmetric
    orientation is restored by a cheap union of the halved pair frame.
    At 100 TB: one basket-keyed self-join, one combinable count, two
    marginal joins (broadcast — the item marginal frame is
    catalog-sized), one per-item top-k window."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    marg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("other"), "c_ab"
    ).unionAll(
        pairs.select(
            F.col("pb").alias("item"), F.col("pa").alias("other"), "c_ab"
        )
    )
    ma = marg.select(F.col("l_partkey").alias("item"), F.col("c").alias("ca"))
    mb = marg.select(F.col("l_partkey").alias("other"), F.col("c").alias("cb"))
    simed = (
        sym.where(F.col("c_ab") >= 2)
        .join(F.broadcast(ma), "item")
        .join(F.broadcast(mb), "other")
        .select(
            "item",
            "other",
            "c_ab",
            (
                F.col("c_ab").cast("double")
                / F.sqrt((F.col("ca") * F.col("cb")).cast("double"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("sim").desc(), "other")
    return (
        simed.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select("item", "other", "c_ab", "sim", "rank")
    )


# =========================================================================
# cal2: business-day arithmetic (NETWORKDAYS without a calendar table)
# =========================================================================

_CAL2_SQL = """
WITH ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
  FROM lineitem GROUP BY 1
), spans AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS d0,
         s.first_ship AS d1,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS e0,
         CAST(s.first_ship - DATE '1970-01-01' AS BIGINT) AS e1
  FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
)
SELECT o_orderkey, d0, d1,
       CAST(e1 - e0 AS BIGINT) AS calendar_days,
       CAST(CASE WHEN e1 >= e0 + 1 THEN
         len(list_filter(generate_series(e0 + 1, e1),
                         d -> d % 7 NOT IN (2, 3)))
       ELSE 0 END AS BIGINT) AS business_days
FROM spans
WHERE o_orderkey % 10 = 0
"""


@_register("cal2_business_days", _CAL2_SQL)
def cal2_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business days between order and first ship date — NETWORKDAYS
    without a calendar dimension: 1970-01-01 is a Thursday, so weekend
    is simply epoch_day % 7 IN (2, 3), and the count is an in-cell
    filtered integer sequence (bounded by the span length, ~30 days) —
    pure arithmetic, identical in both engines, no holiday table join.
    The sequence bound is GUARDED (e1 >= e0 + 1): Spark's sequence()
    silently DESCENDS when the upper bound drops below the lower
    (the mm5 boundary lesson), where DuckDB's generate_series returns
    empty — unguarded, same-day orders would diverge. Every 10th order
    keeps the output bounded; at 100 TB this is one projection after
    the min-shipdate rollup."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    spans = (
        o.join(ship, o["o_orderkey"] == ship["l_orderkey"])
        .where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("d0"),
            F.col("first_ship").alias("d1"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("e0"),
            F.datediff("first_ship", F.lit("1970-01-01"))
            .cast("bigint")
            .alias("e1"),
        )
    )
    return spans.select(
        "o_orderkey",
        "d0",
        "d1",
        (F.col("e1") - F.col("e0")).alias("calendar_days"),
        F.when(
            F.col("e1") >= F.col("e0") + 1,
            F.size(
                F.filter(
                    F.sequence(F.col("e0") + 1, F.col("e1")),
                    lambda d: ~((d % 7).isin(2, 3)),
                )
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("business_days"),
    )
