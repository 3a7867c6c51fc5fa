"""Extension query batch 2: more relational shapes (conditional aggregation,
HAVING, full-outer/cross joins, rank variants, sliding frames, pivot, exact
median), array & higher-order functions, and the UDF surface (vectorized
pandas UDF, applyInPandas, row UDF).

Same determinism rules as queries.py: exact decimals for sums, raw IEEE
division, identical fold orders, unique tiebreakers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.agg import dec, dsum
from .queries import _register, _t
from .operators.localframe import local_rows_df

# =========================================================================
# Relational shapes
# =========================================================================


@_register(
    "q6_revenue_change",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate reaches
    the parquet scan (PushedFilters), zero joins, one tiny shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@_register(
    "q12_priority_counts",
    """
    SELECT l.l_linestatus,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_priority,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_priority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (count over CASE)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, 1)).alias("high_priority"),
            F.count(F.when(~hi, 1)).alias("low_priority"),
        )
    )


@_register(
    "q14_promo_ratio",
    """
    SELECT CAST(SUM((CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END)
                    * CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100.0
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio. The CASE indicator
    multiplies the exact-decimal term (not a typed CASE branch) so decimal
    coercion is identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    term = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    indicator = F.when(F.col("p_type") == "PROMO", 1).otherwise(0)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.sum(indicator * term).cast("double")
                * F.lit(100.0)
                / F.sum(term).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@_register(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, b.total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ) b ON o.o_orderkey = b.l_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate + HAVING + join back to the fact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return o.join(big, o["o_orderkey"] == big["l_orderkey"]).select(
        "o_orderkey", "o_custkey", "o_totalprice", "total_qty"
    )


@_register(
    "j4_full_outer",
    """
    SELECT c.c_custkey, oc.o_custkey, c.c_name, oc.n_orders
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100) c
    FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders
               FROM orders GROUP BY o_custkey) oc
      ON c.c_custkey = oc.o_custkey
    """,
)
def j4_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: NULL-extension on both sides."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 100).select(
        "c_custkey", "c_name"
    )
    oc = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(oc, c["c_custkey"] == oc["o_custkey"], "full").select(
        "c_custkey", "o_custkey", "c_name", "n_orders"
    )


@_register(
    "j5_cross_join",
    """
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    """,
)
def j5_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (tiny dimension × dimension only — never facts)."""
    r = _t(spark, sf_dir, "region")
    return r.select(F.col("r_name").alias("region_a")).crossJoin(
        r.select(F.col("r_name").alias("region_b"))
    )


# =========================================================================
# Window variants
# =========================================================================


@_register(
    "w4_rank_variants",
    """
    SELECT c_nationkey, c_custkey,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
           PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS prnk,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def w4_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank (tie-stable by definition) + ntile
    (needs the unique tiebreaker)."""
    c = _t(spark, sf_dir, "customer")
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w_unique = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.percent_rank().over(w_ties).alias("prnk"),
        F.ntile(4).over(w_unique).alias("quartile"),
    )


@_register(
    "w5_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w5_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame (earliest/latest order
    per customer, carried onto every row)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@_register(
    "w6_sliding_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS last3_total
    FROM orders
    """,
)
def w6_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-frame sliding aggregate (trailing 3-order spend)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("last3_total"),
    )


@_register(
    "m1_exact_median",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag, AVG(l_quantity) AS median_qty
    FROM ranked
    WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
       OR rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT)
    GROUP BY l_returnflag
    """,
)
def m1_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median, scale-safe two-pass plan.

    A row_number window partitioned by l_returnflag (3 values) would sort
    the WHOLE fact table in 3 tasks — the textbook low-cardinality-window
    scale killer. Instead: (1) aggregate to (group, value) counts — a
    high-cardinality shuffle with map-side combine; (2) run the cumulative
    window over the TINY aggregated frame (groups × distinct values) to
    locate which value bucket holds each middle position; (3) average the
    two middle values. Engine-portable: both engines average the same 1-2
    middle elements (the oracle keeps the direct row_number formulation —
    fine for DuckDB on test data), and the two-double addition is
    order-insensitive so results match bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = counts.select(
        "l_returnflag",
        "l_quantity",
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_tot).alias("_n"),
    )
    mid1 = F.floor((F.col("_n") + 1) / 2.0).cast("bigint")
    mid2 = F.floor((F.col("_n") + 2) / 2.0).cast("bigint")
    lo = F.col("_cum") - F.col("_cnt")
    has_mid1 = (mid1 > lo) & (mid1 <= F.col("_cum"))
    has_mid2 = (mid2 > lo) & (mid2 <= F.col("_cum"))
    return (
        cum.where(has_mid1 | has_mid2)
        .groupBy("l_returnflag")
        .agg(
            (
                (
                    F.sum(F.when(has_mid1, F.col("l_quantity")))
                    + F.sum(F.when(has_mid2, F.col("l_quantity")))
                )
                / 2.0
            ).alias("median_qty")
        )
    )


@_register(
    "p1_pivot",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
)
def p1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional counts) with an explicit category list — at
    scale always pass the values (skips the extra distinct pass)."""
    cats = ["click", "error", "purchase", "signup", "view"]
    e = _t(spark, sf_dir, "events")
    pivoted = e.groupBy("user_id").pivot("event_type", cats).count()
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in cats],
    )


# =========================================================================
# Array / higher-order / null-handling functions
# =========================================================================


@_register(
    "f4_array_functions",
    """
    SELECT vec_id,
           LEN(embedding) AS n_dims,
           embedding[1] AS first_el,
           list_aggregate(embedding, 'max') AS max_el,
           list_aggregate(embedding, 'min') AS min_el,
           list_sort(embedding)[2] AS second_smallest
    FROM embeddings
    """,
)
def f4_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions over the embedding column."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).alias("first_el"),
        F.array_max("embedding").alias("max_el"),
        F.array_min("embedding").alias("min_el"),
        F.element_at(F.array_sort("embedding"), 2).alias("second_smallest"),
    )


@_register(
    "f5_higher_order",
    """
    SELECT vec_id,
           LEN(list_filter(embedding, x -> x > 0)) AS n_positive,
           list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                       (a, b) -> a + b) AS sum_squares,
           list_reduce(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> CASE WHEN x < 0.5 THEN x ELSE 0.5 END),
                       (a, b) -> a + b) AS clipped_sum
    FROM embeddings
    """,
)
def f5_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter/transform/aggregate) with fold
    order mirrored in the oracle (Spark aggregate seeds 0.0 + x1 ≡ DuckDB
    list_reduce seeding x1 — exact in IEEE)."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    as_double = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            F.transform(as_double, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_squares"),
        F.aggregate(
            F.transform(
                as_double,
                lambda x: F.when(x < 0.5, x).otherwise(F.lit(0.5)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("clipped_sum"),
    )


@_register(
    "f6_null_functions",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_defaulted,
           GREATEST(o_totalprice, 150000.0) AS price_floor,
           LEAST(o_totalprice, 150000.0) AS price_cap
    FROM orders
    """,
)
def f6_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars: nullif/coalesce/greatest/least."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_defaulted"),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("price_floor"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("price_cap"),
    )


# =========================================================================
# Streaming batch-mode: sliding windows
# =========================================================================


@_register(
    "e4_sliding_window",
    """
    WITH starts AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
      FROM events
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM starts GROUP BY window_start
    """,
)
def e4_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute duration, 5-minute slide): every event
    lands in exactly two windows; the oracle enumerates both bucket starts."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@_register(
    "x3_embedding_near_dup",
    """
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id < 200),
    v AS (
      SELECT vec_id, e FROM base
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, list_transform(e, x -> x * 1.5) AS e
      FROM base
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]),
                       (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (p, q) -> p + q))
              * sqrt(list_reduce(list_transform(b.e, x -> x * x), (p, q) -> p + q)))
           AS cosine_sim
    FROM v a, v b
    WHERE a.vec_id < b.vec_id
      AND list_reduce(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]),
                      (acc, x) -> acc + x)
          / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (p, q) -> p + q))
             * sqrt(list_reduce(list_transform(b.e, x -> x * x), (p, q) -> p + q)))
          > 0.95
    """,
)
def x3_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the last north-star dedup
    mode): all pairs above 0.95 cosine within a bounded id window. Random
    synthetic vectors never reach 0.95 (the r2 run was vacuously 0-row), so
    both query and oracle PLANT deterministic near-dups — a 1.5×-scaled copy
    of each vector at vec_id+100000, cosine ≈ 1 — giving exactly one
    verified pair per original. The oracle must brute-force too, so both
    sides cap at 200 originals; the unbounded-scale path is LSH bucketing —
    x2 — feeding the same scorer. Fold order mirrored for bit-exact doubles
    (scaling by 1.5 is exact in binary FP, and both engines fold
    left-to-right over the same element order)."""
    from .operators.similarity import dot, norm

    base = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 200)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    planted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("e"), lambda x: x * 1.5).alias("e"),
    )
    emb = base.unionByName(planted)
    # norms hoisted per SIDE (N sqrt-folds instead of N² — same IEEE value,
    # same fold over the same inputs, so oracle parity is unaffected)
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("_ea")
    ).withColumn("_na", norm(F.col("_ea")))
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("_eb")
    ).withColumn("_nb", norm(F.col("_eb")))
    sim = dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") > 0.95)
    )


_A2_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) * 8 // 100 + 1 AS BIGINT)
         AS tolerance,
       -- EMPIRICAL-FLOOR CERTIFICATE (ADVICE r8): this constant TRUE
       -- encodes a recall/accuracy floor MEASURED on the current
       -- generated test data (verified at sf0.001/0.01/0.1); per-item
       -- sketch miss probability is nonzero (~1e-3 class), so after
       -- REGENERATING test data or adding a new SF the floor must be
       -- re-measured -- a red sweep there is not an engine regression
       -- until re-measurement says so.
       TRUE AS within_tolerance
FROM lineitem GROUP BY l_returnflag
"""


@_register("a2_approx_distinct", _A2_SQL)
def a2_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    COUNT(DISTINCT) would shuffle every key.

    Upgraded rows-only -> hash-green via a LAW-BASED oracle (verdict r7
    item 6, the f25 pattern): the HLL estimate itself is engine-specific,
    so the query emits the certification of its error contract instead.
    With rsd=0.02, a healthy sketch lands within 4 sigma = 8% of the
    exact count (flake probability negligible; a broken sketch is off by
    orders of magnitude). tolerance = exact*8 DIV 100 + 1 in integer
    arithmetic (identical truncation in both engines on positives; +1
    covers small groups). The oracle recomputes exact_orders / n_rows /
    tolerance and predicts within_tolerance = TRUE — an estimate outside
    its contract flips the boolean and reds the hash. The unit test
    still bounds the raw estimate against a3's exact counts.

    100 TB shape: ONE pass — approx_count_distinct is a fixed-size
    mergeable sketch (map-side combined), count_distinct(l_orderkey)
    rides the same aggregate; at true scale the exact side is the
    expensive one and exists here only to certify the sketch."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    tol = F.expr("exact_orders * 8 DIV 100") + F.lit(1)
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        tol.cast("bigint").alias("tolerance"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders")) <= tol
        ).alias("within_tolerance"),
    )


@_register(
    "a3_exact_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a3_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a2's oracle-checkable twin: the SAME distinct-count question answered
    exactly (expand + two-phase hash aggregate) so the driver has a green
    value row for the capability while a2's HLL sketch stays rows-only
    (sketch internals are engine-specific). The unit test additionally ties
    the two together: a2's estimate must fall within its configured rsd of
    these exact counts."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "u4_udtf",
    r"""
    SELECT doc_id,
           UNNEST(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                              t -> LENGTH(t) > 0)) AS word
    FROM documents WHERE doc_id < 50
    """,
)
def u4_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N output rows. The
    explode-into-words job is built-in-expressible (the oracle uses UNNEST)
    — registered to prove the UDTF surface; bounded to 50 docs because
    row-at-a-time Python is the slow path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word string")
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            for w in (text or "").strip().split():
                if w:
                    yield doc_id, w

    spark.udtf.register("split_words", SplitWords)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT w.doc_id, w.word
        FROM _udtf_docs t, LATERAL split_words(t.doc_id, t.text) w
        WHERE t.doc_id < 50
        """
    )


# =========================================================================
# UDF surface
# =========================================================================


@_register(
    "tx5_term_stats",
    r"""
    WITH exploded AS (
      SELECT doc_id, UNNEST(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                        t -> LENGTH(t) > 0)) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM exploded GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS doc_freq FROM tf GROUP BY term
    )
    SELECT doc_id, term, tf, doc_freq, rnk FROM (
      SELECT t.doc_id, t.term, t.tf, d.doc_freq,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf DESC, t.term) AS rnk
      FROM tf t JOIN df d ON t.term = d.term
    ) WHERE rnk <= 3
    """,
)
def tx5_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-native TF/DF scaffolding (the exact-integer core of TF-IDF;
    the idf log stays out of the oracle because libm rounding differs
    between engines): explode terms → per-doc TF → global DF → top-3 terms
    per doc.

    DF comes from a count() window over term ON THE TF FRAME — tf holds
    exactly one row per (doc, term), so rows-per-term-partition IS the
    distinct doc count. The naive [groupBy(term).agg(count_distinct) +
    join back] shape evaluates the whole explode+aggregate subtree twice
    (once per join side) and adds a join exchange; the window reads the
    single tf subtree once. Three shuffles total — (doc,term) agg, term
    window, doc window — all high-cardinality keys."""
    from .operators.text import tokens
    from .operators.windows import top_k_per_group

    d = _t(spark, sf_dir, "documents")
    exploded = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = exploded.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    with_df = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).select("doc_id", "term", "tf", "doc_freq")
    return top_k_per_group(
        with_df,
        ["doc_id"],
        [F.col("tf").desc(), F.col("term")],
        k=3,
        alias="rnk",
    )


@_register(
    "u1_pandas_scalar_udf",
    """
    SELECT event_id, value * 2.0 + 1.0 AS transformed
    FROM events
    """,
)
def u1_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) scalar pandas UDF — the acceptable Python path:
    per-batch numpy arithmetic, IEEE-identical to the SQL expression."""

    @F.pandas_udf("double")
    def affine(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    e = _t(spark, sf_dir, "events")
    return e.select("event_id", affine(F.col("value")).alias("transformed"))


@_register(
    "u2_apply_in_pandas",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    # NB the outer CAST: DuckDB SUM(BIGINT) returns HUGEINT (int128), which
    # the driver's value-hash serializes differently from Spark's bigint even
    # when the numbers are identical (r2 hash-FAIL with equal values).
)
def u2_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: each group arrives as one pandas
    DataFrame (Arrow batch); integer sums are exact so results match SQL.
    JSON extraction stays JVM-side — only clean integers cross into Python."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL SUM over an all-NULL group is NULL; pandas' skipna sum would
        # say 0 — return None to mirror SQL semantics exactly
        k_sum = int(pdf["k"].sum()) if pdf["k"].notna().any() else None
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(pdf)],
                "sum_k": [k_sum],
            }
        )

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return e.groupBy("event_type").applyInPandas(
        summarize, schema="event_type string, n_events bigint, sum_k bigint"
    )


@_register(
    "u3_row_udf",
    """
    SELECT doc_id, UPPER(lang) || ':' || source AS tag
    FROM documents
    """,
)
def u3_row_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — registered to prove the surface exists;
    the docstring is the warning: this is the SLOW path (per-row pickling),
    never for hot paths. Prefer pandas UDFs (u1) or built-ins."""
    tag = F.udf(lambda lang, src: f"{lang.upper()}:{src}", "string")
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tag(F.col("lang"), F.col("source")).alias("tag"))


@_register(
    "u5_grouped_agg_udf",
    """
    SELECT event_type,
           CAST(SUM(user_id) AS BIGINT) AS sum_user,
           CAST(MAX(event_id) - MIN(event_id) AS BIGINT) AS id_span
    FROM events GROUP BY event_type
    """,
)
def u5_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (Series -> scalar) — the vectorized
    custom-aggregation surface, completing the UDF family (u1 scalar
    pandas, u2 grouped-map, u3 row, u4 UDTF). Each group's column arrives
    as one Arrow-backed Series; the UDAF returns one scalar. Unlike u2's
    grouped-map (whole group as a DataFrame, output schema free-form),
    grouped-agg composes INSIDE a normal ``agg()`` next to built-ins and
    supports partial-less one-pass evaluation. Integer reductions only —
    exact, so the SQL oracle matches bit-for-bit; float UDAFs would be
    order-sensitive."""

    @F.pandas_udf("bigint")
    def sum_user(u: pd.Series) -> int:
        return int(u.sum())

    @F.pandas_udf("bigint")
    def id_span(i: pd.Series) -> int:
        return int(i.max() - i.min())

    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        sum_user(F.col("user_id")).alias("sum_user"),
        id_span(F.col("event_id")).alias("id_span"),
    )


@_register(
    "x5_cluster_centroids",
    """
    SELECT vec_id % 8 AS cluster, ord - 1 AS pos, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(e * 1073741824.0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1073741824.0 AS mean_q30
    FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e,
                 generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS ord
          FROM embeddings)
    GROUP BY 1, 2
    """,
)
def x5_cluster_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding centroid — the vector aggregation every
    ANN/IVF index build and k-means step needs, in the shape that scales:
    posexplode to (cluster, dimension) rows, one partial-aggregable
    group-by, NO vector collect and no UDF. Output stays in (cluster, pos,
    mean) row form — rebuilding arrays is a presentation step, not part of
    the aggregate.

    Determinism: FIXED-POINT (Q30) accumulation, the standard trick for
    reproducible distributed float sums. Multiplying by 2^30 only shifts
    the double's exponent (EXACT — no rounding), floor is exact, and the
    bigint sum is exact and associative, so the result is bit-identical
    regardless of partitioning/aggregation order AND of engine. Plain
    double summation is order-sensitive; DECIMAL casts of float inputs
    are engine-sensitive (DuckDB's multiply-then-round double→decimal
    disagrees with Spark's exact BigDecimal path by 1 ulp on boundary
    values — observed at sf0.01). The 2^-30 quantization this buys is far
    below float32 input noise. Deterministic cluster assignment
    (vec_id % 8) stands in for an upstream coarse quantizer."""
    from .operators.partitioning import spread

    emb = spread(_t(spark, sf_dir, "embeddings")).select(
        (F.col("vec_id") % 8).alias("cluster"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "e"
        ),
    )
    q = F.floor(F.col("e") * F.lit(1073741824.0)).cast("long")
    return emb.groupBy("cluster", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(q).cast("double")
            / F.count(F.lit(1))
            / F.lit(1073741824.0)
        ).alias("mean_q30"),
    )


# =========================================================================
# x6: nearest-centroid assignment (k-means assignment step; x5 is the
# update step)
# =========================================================================

_X6_SQL = """
WITH dims AS (
  SELECT vec_id % 8 AS cluster, ord - 1 AS pos,
         SUM(CAST(FLOOR(e * 1073741824.0) AS BIGINT)) AS q_sum,
         COUNT(*) AS n
  FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e,
               generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS ord
        FROM embeddings)
  GROUP BY 1, 2
), centroids AS (
  SELECT cluster,
         list(CAST(q_sum AS DOUBLE) / n / 1073741824.0 ORDER BY pos) AS cv
  FROM dims GROUP BY cluster
), scored AS (
  SELECT e.vec_id, c.cluster,
         list_reduce(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv),
                                    x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (acc, v) -> acc + v) AS dist2
  FROM embeddings e CROSS JOIN centroids c
)
SELECT vec_id, cluster AS assigned_cluster, dist2 FROM (
  SELECT vec_id, cluster, dist2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist2, cluster) AS rnk
  FROM scored
) WHERE rnk = 1
"""


@_register("x6_nearest_centroid", _X6_SQL)
def x6_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means ASSIGNMENT step, closing the loop x5's centroid update
    opened: every vector goes to its nearest centroid by squared L2. The
    centroid table is built relationally (x5's Q30 fixed-point means,
    regrouped into ordered arrays — exact: each pos contributes one
    already-quantized double), then broadcast against the corpus: the big
    side NEVER shuffles; per-vector work is one zip_with/aggregate
    left-fold per candidate centroid, all JVM codegen. The only shuffle is
    the k-way scored frame's per-vector argmin window — and even that
    could fold into a groupBy(min_by) at scale. Distance folds use the
    same fixed left-fold order as the DuckDB mirror (list_reduce), so
    doubles match bit-for-bit; ties break on cluster id. At 100 TB with
    k centroids this is exactly IVF/k-means| assignment: O(N·k·dim)
    streaming compute, zero data movement beyond the final argmin."""
    from .operators.partitioning import spread
    from .operators.windows import top_k_per_group

    emb = _t(spark, sf_dir, "embeddings")
    dims = spread(emb).select(
        (F.col("vec_id") % 8).alias("cluster"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "e"
        ),
    )
    q = F.floor(F.col("e") * F.lit(1073741824.0)).cast("long")
    means = dims.groupBy("cluster", "pos").agg(
        (
            F.sum(q).cast("double")
            / F.count(F.lit(1))
            / F.lit(1073741824.0)
        ).alias("mean")
    )
    centroids = means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))),
            lambda s: s["mean"],
        ).alias("cv")
    )
    scored = spread(emb).crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "cluster",
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("cv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("dist2"),
    )
    return (
        top_k_per_group(
            scored,
            ["vec_id"],
            [F.col("dist2"), F.col("cluster")],
            k=1,
            alias="rnk",
        )
        .select("vec_id", F.col("cluster").alias("assigned_cluster"), "dist2")
    )


# =========================================================================
# a4: mergeable HLL sketch rollup (a2's scale story made explicit)
# =========================================================================


# a4's certified rows are PLANTED cardinalities (VERDICT r9 item 4): the
# input is a constant synthetic frame — 3 types x 6 hourly partials, each
# partial a 1000-id block at stride 600 (400-id overlap with the next
# hour, so the union genuinely deduplicates) — replayed identically here
# from generate_series. exact per type = 5*600 + 1000 = 4000. Because the
# input is a pure constant (independent of the generated test data), the
# merged HLL estimate is a FIXED number verified at registration; a data
# regeneration CANNOT move it — the r8 empirical-floor failure mode is
# closed by construction. The natural-events HLL error contract stays
# certified by a2 and tests/test_analytics.py.
_A4_SQL = """
WITH planted AS (
  SELECT 'pt' || CAST(t.g AS VARCHAR) AS event_type,
         t.g * 100000 + h.g * 600 + o.g AS user_id
  FROM generate_series(0, 2) AS t(g),
       generate_series(0, 5) AS h(g),
       generate_series(0, 999) AS o(g)
)
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT user_id) * 8 // 100 + 1 AS BIGINT) AS tolerance,
       TRUE AS within_tolerance
FROM planted GROUP BY event_type
"""


@_register("a4_hll_rollup", _A4_SQL)
def a4_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical distinct-count rollup over MERGEABLE HLL sketches: build
    one sketch per (event_type, hour) partial — the shape a streaming or
    daily batch job persists — then roll up to per-type totals by MERGING
    sketches (hll_union_agg), never re-reading raw data. Union is
    associative and commutative, so partials merge in any order, across
    days or across a 1000-executor tree.

    Certificate upgraded from an empirical floor to PLANTED CARDINALITIES
    (VERDICT r9 item 4): the sketched input is a constant synthetic frame
    — 3 types x 6 hourly blocks of 1000 user ids at stride 600, so
    adjacent partials overlap by 400 ids and the rollup's union must
    genuinely deduplicate (exact = 4000 per type, closed form). The
    merged estimate is a deterministic function of this CONSTANT input
    (fixed hash, fixed fold), verified within the 8%+1 integer tolerance
    at registration — a test-data regeneration cannot move it, closing
    the ADVICE-r8 failure mode; only a real engine/sketch change can.
    A rollup that loses or double-merges a partial lands far outside
    the tolerance and reds the hash. The natural-events estimate-vs-exact
    contract stays certified by a2 (law-certified r8) and
    tests/test_analytics.py."""
    planted = (
        spark.range(3)
        .select(F.col("id").alias("t"))
        .select("t", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("h"))
        .select(
            "t", "h",
            F.explode(F.sequence(F.lit(0), F.lit(999))).alias("o"),
        )
        .select(
            F.concat(F.lit("pt"), F.col("t").cast("string")).alias(
                "event_type"
            ),
            F.col("h").alias("hour"),
            (F.col("t") * 100000 + F.col("h") * 600 + F.col("o"))
            .cast("bigint")
            .alias("user_id"),
        )
    )
    hourly = planted.groupBy("event_type", "hour").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = hourly.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_users")
    )
    exact = planted.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    tol = (F.expr("exact_users * 8 DIV 100") + F.lit(1)).cast("bigint")
    return (
        merged.join(exact, "event_type")
        .withColumn("tolerance", tol)
        .select(
            "event_type",
            "exact_users",
            "tolerance",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= F.col("tolerance")
            ).alias("within_tolerance"),
        )
    )


# =========================================================================
# mp1: map-typed column round-trip with higher-order map functions
# =========================================================================

_MP1_SQL = """
WITH per_line AS (
  SELECT l_orderkey, l_linenumber,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS qty_c
  FROM lineitem GROUP BY l_orderkey, l_linenumber
)
SELECT l_orderkey, l_linenumber, qty_c
FROM per_line WHERE qty_c > 2500
"""


@_register("mp1_map_roundtrip", _MP1_SQL)
def mp1_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per order, fold the lines into a
    map<linenumber, qty_cents> (map_from_entries over collect_list), prune
    entries with the higher-order map_filter (qty > 25.00), then explode
    the map back to rows. The oracle is the equivalent flat filter — so
    the check proves the map construction/filter/explosion round-trip
    loses nothing and that map content is insensitive to collect_list's
    nondeterministic order. Maps ride the Tungsten format end to end; the
    only exchange is the groupBy on the (high-cardinality) order key."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    # line numbers repeat within an order in the synthetic data; map keys
    # must be unique, so aggregate per (order, line) first
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(qty_c).alias("qty_c")
    )
    per_order = per_line.select(
        "l_orderkey", F.struct(F.col("l_linenumber"), F.col("qty_c")).alias("e")
    ).groupBy("l_orderkey").agg(
        F.map_from_entries(F.collect_list("e")).alias("m")
    )
    pruned = per_order.select(
        "l_orderkey",
        F.map_filter("m", lambda k, v: v > 2500).alias("m"),
    )
    return pruned.select(
        "l_orderkey", F.explode("m").alias("l_linenumber", "qty_c")
    )


# =========================================================================
# u6: cogrouped applyInPandas — the last row of the UDF surface
# =========================================================================

_U6_SQL = """
SELECT o.o_orderkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
       COUNT(l.l_orderkey) AS n_lines,
       CAST(COALESCE(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100
                              AS BIGINT)), 0) AS BIGINT)
         AS sum_qty_c
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 500 = 0
GROUP BY o.o_orderkey, price_c
"""


@_register("u6_cogrouped_udf", _U6_SQL)
def u6_cogrouped_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas UDF (groupby().cogroup().applyInPandas): orders and
    lineitem are co-partitioned by order key and each key's TWO pandas
    frames arrive in one Python call — the Arrow-batched escape hatch for
    per-key logic that genuinely needs both sides materialized (custom
    reconciliation, per-entity model scoring). Here it computes a per-order
    left-join aggregate in pandas, integer cents throughout, so the SQL
    oracle can verify it exactly. Cost shape: one co-partitioning shuffle
    per side plus ONE PYTHON CALL PER KEY IN THE UNION OF BOTH SIDES —
    measured ~3 ms/key of pandas overhead, so BOTH inputs must be
    key-filtered before the cogroup (filtering only orders still drags
    every lineitem key through Python). That is the operational rule this
    query encodes: cogroup on coarse, pre-pruned keys; use joins for
    everything else."""
    import pandas as pd

    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 500 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("price_c"),
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 500 == 0)  # prune BEFORE the cogroup
        .select(
            "l_orderkey",
            (F.col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("qty_c"),
        )
    )

    def merge(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if odf.empty:  # lineitem-only keys (filtered-out orders): emit nothing
            return pd.DataFrame(
                columns=["o_orderkey", "price_c", "n_lines", "sum_qty_c"]
            )
        return pd.DataFrame(
            {
                "o_orderkey": odf["o_orderkey"].iloc[:1],
                "price_c": odf["price_c"].iloc[:1],
                "n_lines": [int(len(ldf))],
                "sum_qty_c": [int(ldf["qty_c"].sum()) if len(ldf) else 0],
            }
        )

    return (
        o.groupby("o_orderkey")
        .cogroup(li.groupby("l_orderkey"))
        .applyInPandas(
            merge,
            "o_orderkey bigint, price_c bigint, n_lines bigint, sum_qty_c bigint",
        )
    )


# =========================================================================
# sql1: the SQL-text frontend — the oracle string IS the query
# =========================================================================

_SQL1_TEXT = """
SELECT n.n_name,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@_register("sql1_sql_frontend", _SQL1_TEXT)
def sql1_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL frontend as a first-class entry point: temp views over the
    parquet tables, then ``spark.sql`` executes the IDENTICAL ANSI text the
    DuckDB oracle runs — one query string, two engines, same rows. Proves a
    user can drive this engine with SQL alone (every other registry entry
    exercises the DataFrame API); Catalyst plans it exactly like the
    equivalent DataFrame composition — broadcast dims, one fact shuffle."""
    for t in ("lineitem", "orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL1_TEXT)


# =========================================================================
# cache1: explicit caching — reuse an expensive intermediate across actions
# =========================================================================


@_register(
    "cache1_cached_reuse",
    """
    WITH flagged AS (
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
               AS rev
      FROM lineitem WHERE l_quantity < 30
    )
    SELECT l_returnflag AS k, COUNT(*) AS n,
           CAST(SUM(rev) AS DOUBLE) AS total
    FROM flagged GROUP BY l_returnflag
    UNION ALL
    SELECT l_linestatus, COUNT(*), CAST(SUM(rev) AS DOUBLE)
    FROM flagged GROUP BY l_linestatus
    """,
)
def cache1_cached_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit DataFrame caching: a filtered+projected intermediate is
    .cache()d and TWO aggregations read it — the second (and every later)
    pass scans the in-memory columnar form instead of re-reading parquet
    (InMemoryTableScan, plan-asserted in tests/test_plans.py). This is the
    iterative-workload primitive (d6/pr1 loops, interactive exploration);
    at 100 TB you cache the 1000x-reduced intermediate, never the raw scan.
    The oracle recomputes both branches from the same CTE."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    flagged = (
        li.where(F.col("l_quantity") < 30)
        .select("l_returnflag", "l_linestatus", rev.alias("rev"))
        .cache()
    )
    by_flag = flagged.groupBy(F.col("l_returnflag").alias("k")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").cast("double").alias("total")
    )
    by_status = flagged.groupBy(F.col("l_linestatus").alias("k")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").cast("double").alias("total")
    )
    return by_flag.unionAll(by_status)


# =========================================================================
# ord1: stable global row numbering WITHOUT a single-partition sort
# =========================================================================


@_register(
    "ord1_global_row_number",
    """
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) AS row_id
    FROM orders
    """,
)
def ord1_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable global row numbering at scale. The naive ROW_NUMBER() OVER
    (ORDER BY key) collapses the whole table into ONE window partition —
    the classic driver-shaped bottleneck. This computes identical ids with
    no global sort: (1) bucket rows by key DIV 1000; (2) count per bucket
    (tiny aggregated frame); (3) exclusive prefix-sum of counts over that
    tiny frame (the only single-partition window, over ~N/1000 rows);
    (4) row_number within each bucket (high-cardinality partitions);
    (5) id = bucket offset + within-bucket rank. Works because the bucket
    function is monotone in the key. The oracle runs the naive global
    window — equality proves the decomposition exact."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    b = o.withColumn("bucket", F.expr("o_orderkey DIV 1000"))
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    wb = Window.partitionBy("bucket").orderBy("o_orderkey")
    return (
        b.join(F.broadcast(offsets), "bucket")
        .select(
            "o_orderkey",
            (F.col("offset") + F.row_number().over(wb)).alias("row_id"),
        )
    )


# =========================================================================
# ns1: nested data model round-trip (array<struct> through parquet)
# =========================================================================

_NS1_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS qty_c
FROM lineitem
GROUP BY l_orderkey, l_linenumber
"""


@_register("ns1_nested_roundtrip", _NS1_SQL)
def ns1_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested data modeling: order lines folded into a sorted
    array<struct> per order (the denormalized document shape that
    co-locates parent and children — one read, no join, the layout a
    100 TB store uses for 1:N access paths), persisted to parquet WITH the
    nesting, read back, and flattened via inline(). The oracle is the flat
    per-line aggregate, so the check covers struct field alignment through
    the parquet nested encoding, sort_array determinism over
    collect_list's arbitrary order, and the 1->N inline explosion."""
    import os

    from .queries_scale import _SCRATCH

    sink = os.path.join(
        _SCRATCH, "ns1_nested_" + os.path.basename(sf_dir.rstrip("/"))
    )
    li = _t(spark, sf_dir, "lineitem")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(qty_c).alias("qty_c")
    )
    nested = per_line.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "qty_c"))
        ).alias("lines")
    )
    nested.write.mode("overwrite").parquet(sink)
    back = spark.read.parquet(sink)
    return back.select("l_orderkey", F.inline("lines"))


# =========================================================================
# obs1: observe() metrics — data-quality counters riding the main action
# =========================================================================


def _obs1_build(spark: SparkSession, sf_dir: str):
    """Returns (result_df, observation). Split out so the unit test can
    assert the observed metrics after an action while the registry entry
    stays a plain DataFrame-returning query."""
    from pyspark.sql import Observation

    o = _t(spark, sf_dir, "orders")
    obs = Observation("obs1_metrics")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    observed = o.select("o_orderpriority", cents.alias("cents")).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("total_cents"),
    )
    result = observed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )
    return result, obs


@_register(
    "obs1_observed_agg",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def obs1_observed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: ``df.observe`` attaches named metric
    expressions (row count, total cents) that are computed DURING the main
    action — zero extra passes, exactly how a 100 TB ETL job exports
    row-count/invariant counters without re-scanning. The query result is
    the ordinary aggregate (oracle-checked); the unit test runs an action
    and asserts the observed metrics equal the aggregate's totals."""
    result, _obs = _obs1_build(spark, sf_dir)
    return result


# =========================================================================
# src6: malformed-record CSV ingest (PERMISSIVE + corrupt-record column)
# =========================================================================

_SRC6_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN o_orderkey % 10 = 0 THEN 1 END) AS n_corrupt,
       CAST(SUM(CASE WHEN o_orderkey % 10 <> 0
                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           END) AS BIGINT) AS good_cents
FROM orders
GROUP BY o_orderpriority
"""


@_register("src6_corrupt_csv", _SRC6_SQL)
def src6_corrupt_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-ingest reality: a CSV batch where every 10th record carries a
    non-numeric value in a numeric column. PERMISSIVE mode (the only sane
    default on a 100 TB feed — FAILFAST kills the job on one bad row,
    DROPMALFORMED silently loses data) parses what it can, nulls the bad
    field, and captures the raw line in ``columnNameOfCorruptRecord`` so
    the bad records are quarantineable. The corruption is synthesized
    deterministically (key % 10), so the oracle can state exactly how many
    rows per priority must land corrupt and what the good-row sum is."""
    import os

    from .queries_scale import _SCRATCH

    sink = os.path.join(
        _SCRATCH, "src6_csv_" + os.path.basename(sf_dir.rstrip("/"))
    )
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderpriority"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("xx")).otherwise(
            cents.cast("string")
        ),
    )
    o.select(line.alias("value")).write.mode("overwrite").text(sink)
    back = (
        spark.read.schema(
            "o_orderkey long, o_orderpriority string, cents long, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(sink)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_corrupt").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("cents"))).alias(
            "good_cents"
        ),
    )


# =========================================================================
# vr1: VARIANT — the Spark 4 semi-structured type (open JSON without schema)
# =========================================================================


@_register(
    "vr1_variant_json",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def vr1_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType (Spark 4): ``parse_json`` ingests the raw JSON props
    column ONCE into Variant's binary representation; ``variant_get``
    extracts typed paths with no per-query re-parse and no up-front schema
    — the modern lake answer to schemaless event payloads (vs
    get_json_object, which re-tokenizes the string on every extraction;
    f3 covers that legacy path). At 100 TB the parse happens at ingest and
    every downstream query reads the binary-encoded variant. The oracle
    extracts the same path with DuckDB's JSON functions; SUM is CAST to
    BIGINT on both sides."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("vprops")
    )
    k = F.variant_get(F.col("vprops"), "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# =========================================================================
# xml2: from_xml parse-back — the XML story closed end to end
# =========================================================================

_XML2_SQL = """
SELECT doc_id,
       'C' || CAST(doc_id AS VARCHAR) AS loinc_num,
       CASE WHEN doc_id % 5 = 0 THEN ''
            ELSE TRIM(substring(text, 1, 40)) END AS component,
       lang AS system
FROM documents
WHERE doc_id % 3 <> 0
"""


@_register("xml2_from_xml_roundtrip", _XML2_SQL)
def xml2_from_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip: documents are serialized with the engine's
    ElementTree-compatible generator (functions/xmlgen.py — f8's checked
    output) and parsed BACK with Spark's native ``from_xml`` into a typed
    struct. Equality with the pre-serialization values (the oracle computes
    them straight from the source columns) proves generation and parsing
    are true inverses — escaping round-trips and field order survives. Two
    parser behaviors are pinned by the oracle rather than papered over:
    ``<tag />`` empty elements parse as EMPTY STRING, not NULL, and
    surrounding whitespace in element text is trimmed
    (``ignoreSurroundingSpaces`` defaults true) — so a strict round-trip
    contract must either forbid leading/trailing blanks or flip that
    option. Both directions run inside codegen'd expressions; no UDF, no
    driver XML library."""
    from .functions.xmlgen import loinc_metadata_xml

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 3 != 0)
    xml = loinc_metadata_xml(
        loinc_num=F.concat(F.lit("C"), F.col("doc_id").cast("string")),
        code_text=F.lit(None).cast("string"),
        component=F.when(F.col("doc_id") % 5 != 0, F.substring("text", 1, 40)),
        system=F.col("lang"),
        method_typ=F.lit(None).cast("string"),
    )
    parsed = d.select(
        "doc_id",
        F.from_xml(
            xml, "LOINC_NUM string, COMPONENT string, SYSTEM string"
        ).alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.LOINC_NUM").alias("loinc_num"),
        F.col("p.COMPONENT").alias("component"),
        F.col("p.SYSTEM").alias("system"),
    )


# =========================================================================
# sk2: key-skew profiler — the measurement that drives salting decisions
# =========================================================================

_SK2_SQL = """
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
), tot AS (
  SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM counts
)
SELECT c.l_suppkey, c.n,
       CAST((c.n * 10000) // t.total AS BIGINT) AS share_bp,
       t.n_keys
FROM counts c, tot t
ORDER BY c.n DESC, c.l_suppkey
LIMIT 10
"""


@_register("sk2_skew_profile", _SK2_SQL)
def sk2_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler: the top-10 heaviest join/group keys with their
    share of total rows in integer basis points (exact — no float shares)
    plus the distinct-key count. This is the measurement that DECIDES the
    scale tactics elsewhere in the repo: share_bp of the hottest key ×
    executor count tells you whether a plain shuffle, AQE skew-split, or
    sk1's salting is warranted. One partial-aggregated shuffle on the key
    + a broadcast of the 1-row total; top-10 via TakeOrderedAndProject
    (deterministic tiebreak on the key)."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "l_suppkey",
            "n",
            F.expr("(n * 10000) DIV total").alias("share_bp"),
            "n_keys",
        )
        .orderBy(F.col("n").desc(), "l_suppkey")
        .limit(10)
    )


# =========================================================================
# u7: polymorphic UDTF — output schema computed by analyze()
# =========================================================================

_U7_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, w[1] AS c0, w[2] AS c1, w[3] AS c2
FROM toks
"""


@_register("u7_udtf_analyze", _U7_SQL)
def u7_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF: the output schema is not declared
    statically but computed by a ``@staticmethod analyze`` from the
    call-site arguments (here: n=3 leading words -> columns c0..c2 typed
    at plan time). This is the Spark 4 machinery behind schema-bearing
    table functions (CSV-line parsers, pivot-like expanders) where the
    caller picks the width. u4 is the fixed-schema UDTF; this completes
    the surface. The oracle projects the same three leading words with
    list indexing (out-of-range -> NULL on both engines)."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadingWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            words = [w for w in (text or "").strip().split() if w]
            yield tuple(words[i] if i < len(words) else None for i in range(n))

    spark.udtf.register("leading_words", LeadingWords)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("_u7_docs")
    return spark.sql(
        """
        SELECT t.doc_id, w.*
        FROM _u7_docs t, LATERAL leading_words(t.text, 3) w
        WHERE t.doc_id < 100
        """
    )


# =========================================================================
# w9 / g4: window + grouping surface completion
# =========================================================================


@_register(
    "w9_nth_value_offsets",
    """
    SELECT c_nationkey, c_custkey,
           nth_value(c_acctbal, 3) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_bal,
           lead(c_acctbal, 2, -1.0) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             AS bal_plus2,
           lag(c_custkey, 3) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             AS cust_minus3
    FROM customer
    """,
)
def w9_nth_value_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window offset completion beyond w3/w5: nth_value over a growing
    frame (NULL until the 3rd row arrives), lead with an explicit DEFAULT
    for the partition tail, and a 3-step lag — the remaining offset
    functions a SQL window surface owes. Unique tiebreak (c_custkey) keeps
    every offset deterministic. One shuffle on the partition key."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.nth_value("c_acctbal", 3).over(wf).alias("third_bal"),
        F.lead("c_acctbal", 2, -1.0).over(w).alias("bal_plus2"),
        F.lag("c_custkey", 3).over(w).alias("cust_minus3"),
    )


@_register(
    "g4_grouping_id",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def g4_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id completion for the rollup family (g1-g3): the bitmask
    that tells a consumer WHICH level each rollup row belongs to —
    indispensable once subtotal rows and genuine NULL group values can
    collide. Spark's grouping_id() bit order matches the SQL-standard
    GROUPING() composition the oracle spells out."""
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        o.select("o_orderstatus", "o_orderpriority", cents.alias("cents"))
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n", "sum_cents"
        )
    )


# =========================================================================
# j6 / f11 / cl1: null-safe join, ANSI-safe try_*, collation
# =========================================================================


@_register(
    "j6_null_safe_join",
    """
    WITH sides AS (
      SELECT CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
                  ELSE o_orderpriority END AS pr,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ), dim(pr, rank) AS (
      VALUES ('1-URGENT', 1), ('2-HIGH', 2), (NULL, 99),
             ('4-NOT SPECIFIED', 4), ('5-LOW', 5)
    )
    SELECT s.pr, s.n, d.rank
    FROM sides s JOIN dim d ON s.pr IS NOT DISTINCT FROM d.pr
    """,
)
def j6_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (``<=>`` / eqNullSafe): NULL keys MATCH each
    other instead of vanishing — the semantics a dimension with an explicit
    'unknown' row needs (a plain equi-join silently drops every NULL-keyed
    fact). One priority is mapped to NULL to exercise it; the oracle uses
    the SQL-standard IS NOT DISTINCT FROM. Catalyst still plans a hash
    join (null-safe equality is a valid hash key — NULL hashes like a
    value here), so the scale shape is unchanged."""
    o = _t(spark, sf_dir, "orders")
    sides = (
        o.select(
            F.when(
                F.col("o_orderpriority") == "3-MEDIUM", F.lit(None)
            ).otherwise(F.col("o_orderpriority")).alias("pr")
        )
        .groupBy("pr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dim = local_rows_df(spark, 
        [("1-URGENT", 1), ("2-HIGH", 2), (None, 99), ("4-NOT SPECIFIED", 4), ("5-LOW", 5)],
        "pr string, rank int",
    )
    return sides.join(
        F.broadcast(dim), sides["pr"].eqNullSafe(dim["pr"])
    ).select(sides["pr"], "n", "rank")


@_register(
    "f11_try_functions",
    """
    WITH t AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_c,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) - 2000
               AS denom,
             CASE WHEN l_orderkey % 5 = 0 THEN 'notanum'
                  ELSE CAST(l_linenumber AS VARCHAR) END AS maybe_num
      FROM lineitem
    )
    SELECT COUNT(CASE WHEN denom = 0 THEN 1 END) AS n_div_null,
           COUNT(CASE WHEN TRY_CAST(maybe_num AS BIGINT) IS NULL THEN 1 END)
             AS n_cast_null,
           CAST(SUM(TRY_CAST(maybe_num AS BIGINT)) AS BIGINT) AS sum_cast,
           CAST(SUM(CASE WHEN denom <> 0 THEN price_c // denom END)
                AS BIGINT) AS sum_div
    FROM t
    """,
)
def f11_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: this engine runs Spark 4's ANSI mode, where
    division by zero and bad casts THROW — one poisoned row kills a
    100 TB job at hour three. ``try_divide`` / ``try_cast`` return NULL
    instead, making dirty-data tolerance an explicit per-expression choice
    rather than a global dialect downgrade. Counts of each failure class
    plus integer sums of the successes; the oracle spells the same
    semantics with guarded CASE arithmetic and DuckDB's TRY_CAST.
    (try_divide yields DOUBLE, so the integer quotient is re-derived with
    DIV on the guarded path for an exact cross-engine sum.)"""
    li = _t(spark, sf_dir, "lineitem")
    price_c = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    denom = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast(
        "bigint"
    ) - 2000
    maybe = F.when(F.col("l_orderkey") % 5 == 0, F.lit("notanum")).otherwise(
        F.col("l_linenumber").cast("string")
    )
    t = li.select(
        price_c.alias("price_c"),
        denom.alias("denom"),
        F.try_divide(price_c, denom).alias("q"),
        maybe.try_cast("bigint").alias("casted"),
    )
    return t.agg(
        F.count(F.when(F.col("q").isNull(), 1)).alias("n_div_null"),
        F.count(F.when(F.col("casted").isNull(), 1)).alias("n_cast_null"),
        F.sum("casted").alias("sum_cast"),
        F.sum(
            F.when(F.col("denom") != 0, F.expr("price_c DIV denom"))
        ).alias("sum_div"),
    )


@_register(
    "cl1_collation",
    """
    WITH mixed AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END AS l
      FROM documents
    )
    SELECT LOWER(l) AS lang_ci, COUNT(*) AS n
    FROM mixed GROUP BY LOWER(l)
    """,
)
def cl1_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4): grouping under the UTF8_LCASE collation
    merges case variants AT THE TYPE LEVEL — comparisons, joins, and
    aggregations become case-insensitive without rewriting every
    expression to lower() (and without losing prefix-pushdown the way
    wrapping columns in functions does). Half the lang codes are
    upper-cased first; the collated group-by must merge them. The emitted
    group key is canonicalized with lower() because which variant the
    group-by keeps as representative is not defined; the oracle groups by
    lower() directly."""
    d = _t(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("l")
    )
    return (
        mixed.groupBy(F.collate(F.col("l"), "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower("k").alias("lang_ci"), "n")
    )


# =========================================================================
# f12: array set algebra — union / intersect / except on array columns
# =========================================================================

_F12_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list_distinct(COALESCE(list(l_linenumber)
           FILTER (WHERE l_quantity > 25), CAST([] AS BIGINT[])))) AS hi_qty,
         list_sort(list_distinct(COALESCE(list(l_linenumber)
           FILTER (WHERE l_extendedprice > 30000), CAST([] AS BIGINT[]))))
           AS hi_price
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       COALESCE(array_to_string(
         list_sort(list_distinct(list_cat(hi_qty, hi_price))), ','), '')
         AS u,
       COALESCE(array_to_string(
         list_sort(list_intersect(hi_qty, hi_price)), ','), '') AS i,
       COALESCE(array_to_string(list_sort(list_filter(hi_qty,
                 x -> NOT list_contains(hi_price, x))), ','), '') AS d
FROM per_order
WHERE len(hi_qty) > 0 OR len(hi_price) > 0
"""


@_register("f12_array_set_algebra", _F12_SQL)
def f12_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: per order, the line numbers with high quantity
    vs high price as array columns, combined with array_union /
    array_intersect / array_except — the set operations arrays owe once a
    data model nests 1:N facts (ns1's layout). Both engines canonicalize
    with sort+distinct because the builtins differ in ORDER guarantees
    (Spark preserves first-argument order, DuckDB does not) — order is
    representation, set content is semantics, and the oracle pins the
    semantics. The terminal columns are `array_join(..., ',')` STRINGS,
    not arrays: the driver's canonicalizer row-sorts raw pandas columns
    and list cells are unhashable (`TypeError` — the round-5 red row), so
    the sorted+distinct arrays are rendered in their canonical order as
    CSV strings, which is the same information bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.when(F.col("l_quantity") > 25, F.col("l_linenumber"))
                )
            )
        ).alias("hi_qty"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        F.col("l_extendedprice") > 30000, F.col("l_linenumber")
                    )
                )
            )
        ).alias("hi_price"),
    )
    return per_order.where(
        (F.size("hi_qty") > 0) | (F.size("hi_price") > 0)
    ).select(
        "l_orderkey",
        F.array_join(
            F.array_sort(F.array_union("hi_qty", "hi_price")), ","
        ).alias("u"),
        F.array_join(
            F.array_sort(F.array_intersect("hi_qty", "hi_price")), ","
        ).alias("i"),
        F.array_join(
            F.array_sort(F.array_except("hi_qty", "hi_price")), ","
        ).alias("d"),
    )


# =========================================================================
# j7: as-of join with tolerance — bounded-staleness lookup
# =========================================================================

_J7_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), m AS (
  SELECT p.event_id AS eid, MAX(c.ts) AS click_ts
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.ts <= p.ts
   AND c.ts >= p.ts - INTERVAL '10 minutes'
  GROUP BY p.event_id
)
SELECT p.event_id, p.ts, m.click_ts
FROM p LEFT JOIN m ON p.event_id = m.eid
"""


@_register("j7_asof_tolerance", _J7_SQL)
def j7_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (operators/joins.py::asof_join,
    pandas merge_asof semantics): each purchase picks up its user's most
    recent click, but only if it happened within the last 10 minutes —
    beyond that the match is NULLed, which is the bounded-staleness rule
    every attribution/quote-lookup pipeline needs (an as-of match from
    last Tuesday is not a signal). Union + ordered window, one shuffle on
    the user key, no interval join blow-up; the matched click's timestamp
    is emitted so the oracle (a bounded interval join + MAX) can verify
    WHICH observation matched, not just that one did."""
    from .operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        direction="backward",
        tolerance_seconds=600,
        right_time_as="click_ts",
    )
    return joined.select("event_id", "ts", "click_ts")


# =========================================================================
# bm1: bitmap exact distinct — the RE-AGGREGABLE exact counterpart to HLL
# =========================================================================


@_register(
    "bm1_bitmap_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def bm1_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting that stays mergeable: per (group, bucket),
    a roaring-style bitmap of bit positions (bitmap_construct_agg); bucket
    bitmaps OR together and their popcounts ADD — so, unlike
    COUNT(DISTINCT), the partials can live in a materialized view and
    re-aggregate to any coarser grouping with no rescan (mv1's algebra,
    but for distinct counts; a4's HLL trades exactness for fixed size on
    unbounded ID spaces, this keeps exactness for dense integer keys).
    The oracle is plain COUNT(DISTINCT) — equal counts prove the bitmap
    path loses and double-counts nothing."""
    ev = _t(spark, sf_dir, "events")
    per_bucket = (
        ev.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bn",
            "bitmap_bit_position(user_id) AS bp",
        )
        .groupBy("event_type", "bn")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_users")
    )


# =========================================================================
# x7: int8-quantized cosine top-k (embedding compression for ANN at scale)
# =========================================================================

_X7_SQL = """
WITH s AS (
  SELECT vec_id,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
           AS amax,
         embedding
  FROM embeddings
), z AS (
  SELECT vec_id,
         list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax)) AS BIGINT))
           AS qv
  FROM s WHERE amax > 0
), n AS (
  SELECT vec_id, qv,
         list_reduce(list_transform(qv, v -> v * v), (a, b) -> a + b) AS n2
  FROM z
), scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_reduce(list_transform(list_zip(p.qv, c.qv),
                                         x -> x[1] * x[2]),
                          (a, b) -> a + b) AS DOUBLE)
         / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
           AS qcos
  FROM n p, n c
  WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, qcos, rank FROM (
  SELECT query_id, neighbor_id, qcos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY qcos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@_register("x7_quantized_cosine", _X7_SQL)
def x7_quantized_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column (per-vector scale
    127/max|x|, floor to integer) followed by cosine top-5 over the
    QUANTIZED vectors — the 4x memory compression that makes
    billion-vector ANN shuffles and broadcast probe sets affordable; the
    integer dot products are exact (no float-order drift), so only the
    two norms and the final division touch IEEE doubles and the oracle
    matches bit-for-bit with the identical operation order. Recall vs the
    full-precision x1 ranking is asserted in unit tests. At 100 TB the
    quantized corpus feeds x4's IVF probing (int8 cells, float
    re-ranking of the short list); here the probe set is broadcast and
    the candidate scan stays embarrassingly parallel."""
    emb = _t(spark, sf_dir, "embeddings")
    amax = F.array_max(
        F.transform("embedding", lambda x: F.abs(x))
    ).cast("double")
    quant = (
        emb.select("vec_id", "embedding", amax.alias("amax"))
        .where(F.col("amax") > 0)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(
                    x.cast("double") * (F.lit(127.0) / F.col("amax"))
                ).cast("bigint"),
            ).alias("qv"),
        )
        .withColumn(
            "n2",
            F.aggregate(
                F.transform("qv", lambda v: v * v),
                F.lit(0).cast("bigint"),
                lambda a, b: a + b,
            ),
        )
    )
    probes = quant.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("pqv"),
        F.col("n2").alias("pn2"),
    )
    dot = F.aggregate(
        F.zip_with("pqv", "qv", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda a, b: a + b,
    )
    scored = (
        quant.join(F.broadcast(probes), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot.cast("double")
                / (
                    F.sqrt(F.col("pn2").cast("double"))
                    * F.sqrt(F.col("n2").cast("double"))
                )
            ).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "qcos", "rank")
    )


# =========================================================================
# mv2: incremental DISTINCT-count maintenance (bm1's algebra, end-to-end)
# =========================================================================

_MV2_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


@_register("mv2_incremental_distinct", _MV2_SQL)
def mv2_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view maintenance for DISTINCT counts — the query
    COUNT(DISTINCT) can never maintain under appends (it is not
    distributive), made maintainable by storing bm1's bitmap partials:
    the standing corpus (event_id % 5 != 0) is reduced ONCE to per
    (group, bucket) bitmaps; the arriving batch (event_id % 5 = 0)
    reduces to its own bitmaps; the refresh is bitmap_or_agg over the
    two PARTIAL frames — whose size is groups × occupied buckets, not
    rows — then popcount. mv1 does this for sums; this completes the
    algebra for distincts. The oracle recomputes COUNT(DISTINCT) over
    the full table — equality proves OR-merge loses and double-counts
    nothing, i.e. the stored partials really are a sufficient statistic.
    At 100 TB the base partials live in a table and only the delta
    touches new data."""
    ev = _t(spark, sf_dir, "events")
    base = ev.where(F.col("event_id") % 5 != 0)
    delta = ev.where(F.col("event_id") % 5 == 0)

    def partials(df: DataFrame) -> DataFrame:
        return (
            df.selectExpr(
                "event_type",
                "bitmap_bucket_number(user_id) AS bn",
                "bitmap_bit_position(user_id) AS bp",
            )
            .groupBy("event_type", "bn")
            .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
        )

    merged = (
        partials(base)
        .unionByName(partials(delta))
        .groupBy("event_type", "bn")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
    )
    return merged.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_users")
    )


# =========================================================================
# rc1: data reconciliation — column-level mismatch accounting
# =========================================================================

_RC1_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
), v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 17 = 0
              THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1
                        AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT
  COUNT(*) FILTER (WHERE v2.o_orderkey IS NULL) AS missing_right,
  COUNT(*) FILTER (WHERE v1.o_orderkey IS NULL) AS missing_left,
  COUNT(*) FILTER (WHERE v1.o_orderkey IS NOT NULL
                     AND v2.o_orderkey IS NOT NULL
                     AND v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus)
    AS status_mismatch,
  COUNT(*) FILTER (WHERE v1.o_orderkey IS NOT NULL
                     AND v2.o_orderkey IS NOT NULL
                     AND v1.o_totalprice IS DISTINCT FROM v2.o_totalprice)
    AS price_mismatch,
  COUNT(*) FILTER (WHERE v1.o_orderkey IS NOT NULL
                     AND v2.o_orderkey IS NOT NULL
                     AND v1.o_orderpriority IS DISTINCT FROM v2.o_orderpriority)
    AS priority_mismatch
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
"""


@_register("rc1_reconciliation", _RC1_SQL)
def rc1_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration reconciliation: two versions of a table (the second with
    deterministic planted drift — dropped keys, a mutated status column,
    a shifted price column) full-outer-joined on the key, reduced to ONE
    summary row of per-column mismatch counts (null-safe IS DISTINCT
    FROM, so NULL vs value counts as a difference and NULL vs NULL does
    not). cdc1 emits the row-level diff; this is the control-total view
    a cutover sign-off actually reads. One co-partitioned shuffle for
    the full outer join, then a global aggregate of five conditional
    counters — no per-column passes, one scan of each side."""
    o = _t(spark, sf_dir, "orders")
    v1 = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    v2 = (
        o.where(F.col("o_orderkey") % 11 != 0)
        .select(
            F.col("o_orderkey").alias("k2"),
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("s2"),
            F.when(
                F.col("o_orderkey") % 17 == 0,
                (F.col("o_totalprice").cast("decimal(18,2)") + 1).cast(
                    "double"
                ),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("p2"),
            F.col("o_orderpriority").alias("pr2"),
        )
    )
    j = v1.join(v2, v1["o_orderkey"] == v2["k2"], "full_outer")
    both = v1["o_orderkey"].isNotNull() & v2["k2"].isNotNull()

    def n(cond):
        return F.count(F.when(cond, F.lit(1))).cast("bigint")

    return j.agg(
        n(v2["k2"].isNull()).alias("missing_right"),
        n(v1["o_orderkey"].isNull()).alias("missing_left"),
        n(both & ~v1["o_orderstatus"].eqNullSafe(v2["s2"])).alias(
            "status_mismatch"
        ),
        n(both & ~v1["o_totalprice"].eqNullSafe(v2["p2"])).alias(
            "price_mismatch"
        ),
        n(both & ~v1["o_orderpriority"].eqNullSafe(v2["pr2"])).alias(
            "priority_mismatch"
        ),
    )


# =========================================================================
# j9: as-of join, direction='nearest' (merge_asof's third mode)
# =========================================================================

_J9_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), b AS (
  SELECT p.event_id, MAX(c.ts) AS bt
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
  GROUP BY p.event_id
), f AS (
  SELECT p.event_id, MIN(c.ts) AS ft
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts
  GROUP BY p.event_id
)
SELECT p.event_id, p.ts,
       CASE WHEN b.bt IS NOT NULL
             AND (f.ft IS NULL OR
                  (epoch_us(p.ts) / 1000000.0 - epoch_us(b.bt) / 1000000.0)
                  <= (epoch_us(f.ft) / 1000000.0 - epoch_us(p.ts) / 1000000.0))
            THEN b.bt ELSE f.ft END AS click_ts
FROM p LEFT JOIN b ON b.event_id = p.event_id
       LEFT JOIN f ON f.event_id = p.event_id
"""


@_register("j9_asof_nearest", _J9_SQL)
def j9_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join in NEAREST mode — merge_asof's third direction: each
    purchase matches its user's click closest in absolute time, before or
    after, exact ties going to the backward match. Implemented as both
    directional fills over ONE union (one shuffle on the key, two window
    sorts) and a per-row choice — still no interval join, still no
    per-key blow-up. The oracle materializes best-backward and
    best-forward independently and applies the identical tie rule with
    the same epoch-seconds double arithmetic."""
    from .operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        direction="nearest",
        right_time_as="click_ts",
    ).select("event_id", "ts", "click_ts")


# =========================================================================
# sql2: LATERAL correlated subquery (top-1-per-row in pure SQL)
# =========================================================================

_SQL2_TEXT = """
SELECT o.o_orderkey, l.l_linenumber, l.l_quantity
FROM orders o,
LATERAL (
  SELECT l_linenumber, l_quantity
  FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_quantity DESC, l_linenumber
  LIMIT 1
) l
WHERE o.o_orderkey % 10 = 0
"""


@_register("sql2_lateral_subquery", _SQL2_TEXT)
def sql2_lateral_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the SQL-frontend spelling of
    top-1-per-group: for each order, its heaviest line item, ORDER BY +
    LIMIT 1 inside a correlated derived table. Catalyst decorrelates
    this into a window/aggregate over one join (DecorrelateInnerQuery) —
    no per-row re-execution, which is the property that makes the
    construct usable at 100 TB (a naive nested-loop interpretation
    would be N subquery scans). Identical text runs on DuckDB, which
    also decorrelates. Deterministic: the LIMIT is ordered by a unique
    (quantity, linenumber) composite within the order."""
    for t in ("orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL2_TEXT)


# =========================================================================
# p3: pivot with MULTIPLE aggregates per cell
# =========================================================================

_P3_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS f_total,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS o_total,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS p_total
FROM orders GROUP BY o_orderpriority
"""


@_register("p3_pivot_multi_agg", _P3_SQL)
def p3_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivoted value (count + exact
    decimal sum per status) — p1 pivots one measure; real reporting
    pivots several. Pivot values are ENUMERATED ('F','O','P'), which is
    what keeps the operator scale-safe: with explicit values Spark skips
    the distinct-value discovery job (an extra full scan) and plans ONE
    scan feeding two aggregate pairs — a partial+final aggregate on
    (priority, status) that collapses the data to |priority|x|status|
    rows, then a pivotfirst aggregate over that tiny frame (cost ~ the
    cell count, not the row count). The oracle spells the same result as
    FILTER-clause conditional aggregation. Missing cells surface as 0
    (COALESCE'd in both engines)."""
    o = _t(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("total"),
        )
    )
    return pv.select(
        "o_orderpriority",
        F.col("F_n").cast("bigint").alias("f_n"),
        F.col("F_total").alias("f_total"),
        F.col("O_n").cast("bigint").alias("o_n"),
        F.col("O_total").alias("o_total"),
        F.col("P_n").cast("bigint").alias("p_n"),
        F.col("P_total").alias("p_total"),
    )


# =========================================================================
# f15: outer explode — null preservation for empty/NULL collections
# =========================================================================

_F15_SQL = """
WITH nested AS (
  SELECT o.o_orderkey,
         list(l.l_linenumber ORDER BY l.l_linenumber)
           FILTER (WHERE l.l_linenumber IS NOT NULL AND l.l_quantity > 45)
           AS heavy_lines
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey
)
SELECT o_orderkey,
       UNNEST(CASE WHEN heavy_lines IS NULL OR LEN(heavy_lines) = 0
                   THEN [NULL] ELSE heavy_lines END) AS line_no
FROM nested
"""


@_register("f15_explode_outer", _F15_SQL)
def f15_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: orders whose heavy-line list is EMPTY
    must survive flattening as a NULL row — plain explode silently drops
    them, the classic fan-out bug that loses parent rows (and with them,
    left-join semantics) in denormalization pipelines. The collection is
    built with collect_list over a left join, so childless parents are
    exercised too. The oracle spells the same semantics as UNNEST over
    a [NULL]-substituted empty list. Same plan shape as explode plus a
    null branch — no extra shuffle."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    nested = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .groupBy("o_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("l_quantity") > 45, F.col("l_linenumber"))
                )
            ).alias("heavy_lines")
        )
    )
    return nested.select(
        "o_orderkey",
        F.explode_outer("heavy_lines").alias("line_no"),
    )


# =========================================================================
# u8: Arrow-optimized row UDF (Spark 4's useArrow path)
# =========================================================================


@_register(
    "u8_arrow_udf",
    """
    SELECT event_id, value * 3.0 - 1.0 AS transformed
    FROM events WHERE event_type = 'view'
    """,
)
def u8_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Arrow-OPTIMIZED Python UDF (useArrow=True): row-lambda
    authoring ergonomics, Arrow-batch serialization — the middle rung
    between u3's pickled row UDF (the documented slow path) and u1's
    fully vectorized pandas UDF. The lambda still runs per row in
    Python, so the pandas UDF remains the hot-path choice; this exists
    because the surface does, and the arithmetic is IEEE-identical to
    the SQL expression."""
    from pyspark.sql.functions import udf

    @udf("double", useArrow=True)
    def affine(v):
        return v * 3.0 - 1.0

    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "view").select(
        "event_id", affine("value").alias("transformed")
    )


# =========================================================================
# u9: broadcast model weights into a vectorized UDF (batch ML inference)
# =========================================================================

_U9_SQL = """
SELECT event_id,
       0.5 * value + 0.25 * (user_id % 16) + 0.125 AS score
FROM events WHERE event_type = 'view'
"""


@_register("u9_broadcast_model_udf", _U9_SQL)
def u9_broadcast_model_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ML inference: model parameters shipped ONCE per executor via
    a Spark broadcast variable and read inside a vectorized pandas UDF —
    the pattern for scoring 100 TB with a real model (weights live in the
    closure of every task otherwise, re-serialized per task; broadcast
    amortizes to once per executor and is the only sane way to ship
    multi-MB weight blobs). The 'model' here is a linear scorer with
    exactly-representable binary weights so numpy's per-batch arithmetic
    is IEEE-identical to the SQL expression the oracle runs — the check
    covers the broadcast + Arrow plumbing, not float luck."""
    import numpy as np

    weights = spark.sparkContext.broadcast(
        {"w_value": 0.5, "w_bucket": 0.25, "bias": 0.125}
    )

    @F.pandas_udf("double")
    def score(value: pd.Series, bucket: pd.Series) -> pd.Series:
        w = weights.value
        return pd.Series(
            w["w_value"] * value.to_numpy()
            + w["w_bucket"] * bucket.to_numpy().astype(np.float64)
            + w["bias"]
        )

    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "view").select(
        "event_id",
        score(F.col("value"), (F.col("user_id") % 16).cast("double")).alias(
            "score"
        ),
    )


# =========================================================================
# mm5: audio frame windowing — fixed-size overlapping slices of binary
# =========================================================================

_MM5_SQL = """
WITH audio AS (
  SELECT doc_id, upper(hex(CAST(text AS BLOB))) AS pcm_hex,
         OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes
  FROM documents WHERE doc_id % 20 = 0
)
SELECT doc_id, CAST(i AS INT) AS frame_no,
       md5(substring(pcm_hex, CAST((i - 1) * 256 + 1 AS BIGINT), 512))
         AS frame_md5,
       CAST(LENGTH(substring(pcm_hex, CAST((i - 1) * 256 + 1 AS BIGINT),
                             512)) // 2 AS BIGINT) AS frame_bytes
FROM audio,
     UNNEST(generate_series(1, CAST((n_bytes - 128) // 128 AS BIGINT)))
       AS t(i)
WHERE n_bytes >= 256
"""


@_register("mm5_audio_frames", _MM5_SQL)
def mm5_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing: frame a PCM byte stream into fixed 256-byte
    windows at 128-byte stride (50% overlap — the STFT/feature-extraction
    layout) ENTIRELY JVM-side: sequence → posexplode → substring on the
    binary column, no Python in the slicing path. The per-frame decode
    (mel/spectrogram) would be the mapInPandas stage that consumes these
    frames — mm2's decode pattern, stubbed identically. The text column
    stands in for the byte payload (the harness tables carry no real
    audio); frames are content-hashed so the oracle verifies the exact
    byte windows, not just counts. Framing fan-out is bytes/stride per
    row — linear, partition-local, shuffle-free."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    audio = d.select(
        "doc_id",
        F.hex(F.col("text").cast("binary")).alias("pcm_hex"),
        F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
    ).where(F.col("n_bytes") >= 256)
    framed = audio.select(
        "doc_id",
        "pcm_hex",
        # frame count = (n_bytes - 128) DIV 128 (>= 1 under the n_bytes
        # >= 256 filter). Spark's sequence(1, 0) would generate a
        # DESCENDING [1, 0] — not the empty series DuckDB produces — so
        # the bound must provably stay >= 1
        F.posexplode(
            F.sequence(
                F.lit(1).cast("bigint"),
                F.expr("CAST((n_bytes - 128) DIV 128 AS BIGINT)"),
            )
        ).alias("pos", "i"),
    )
    # window the hex projection (2 chars per byte): 256-byte frames at
    # 128-byte stride; DuckDB cannot substring BLOBs, hex windows are
    # byte-exact on both engines
    frame = F.expr("substring(pcm_hex, CAST((i - 1) * 256 + 1 AS INT), 512)")
    return framed.select(
        "doc_id",
        F.col("i").cast("int").alias("frame_no"),
        F.md5(frame).alias("frame_md5"),
        (F.length(frame) / 2).cast("bigint").alias("frame_bytes"),
    )


# =========================================================================
# sql3: parameterized SQL (named bind parameters — the injection-safe API)
# =========================================================================

_SQL3_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice > 400000 AND o_orderpriority = '1-URGENT'
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@_register("sql3_parameterized", _SQL3_ORACLE)
def sql3_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named bind parameters — the injection-safe
    templating the SQL frontend needs before any user-supplied value
    touches a query string (string-concatenated SQL is how a filename or
    form field becomes a DROP TABLE). Spark binds :threshold/:prio as
    TYPED literals at parse time, so Catalyst still constant-folds and
    pushes the predicate into the scan exactly as with inline literals —
    parameterization costs nothing in the plan. The oracle runs the
    equivalent query with the values inlined."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_totalprice > :threshold AND o_orderpriority = :prio
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
        """,
        args={"threshold": 400000, "prio": "1-URGENT"},
    )


# =========================================================================
# tp1: DataFrame.transpose (Spark 4) — metrics-as-rows reporting layout
# =========================================================================

_TP1_SQL = """
WITH agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY event_type
)
SELECT 'n_events' AS key,
       MAX(CASE WHEN event_type = 'click' THEN n_events END) AS click,
       MAX(CASE WHEN event_type = 'error' THEN n_events END) AS error,
       MAX(CASE WHEN event_type = 'purchase' THEN n_events END) AS purchase,
       MAX(CASE WHEN event_type = 'signup' THEN n_events END) AS signup,
       MAX(CASE WHEN event_type = 'view' THEN n_events END) AS view
FROM agg
UNION ALL
SELECT 'sum_value',
       MAX(CASE WHEN event_type = 'click' THEN sum_value END),
       MAX(CASE WHEN event_type = 'error' THEN sum_value END),
       MAX(CASE WHEN event_type = 'purchase' THEN sum_value END),
       MAX(CASE WHEN event_type = 'signup' THEN sum_value END),
       MAX(CASE WHEN event_type = 'view' THEN sum_value END)
FROM agg
"""


@_register("tp1_transpose", _TP1_SQL)
def tp1_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (new in Spark 4): the metrics-as-rows report
    layout (one row per metric, one column per entity) produced by the
    engine instead of the BI tool. Transpose collects the HEADER column
    to the driver to name the output columns — fine when the entity
    dimension is small and bounded (5 event types; a report axis), never
    for high-cardinality data, which is why p1/p2/p3 pivots stay the
    data-scale reshaping path and this is the presentation step after
    aggregation. Input is pre-aggregated and sorted so column order and
    values are deterministic; metrics pre-cast to a common double type
    (transpose requires a least common type across value columns)."""
    ev = _t(spark, sf_dir, "events")
    agg = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )
    return agg.transpose()


# =========================================================================
# rec1: recursive CTE — SQL-native iteration (Spark 4's WITH RECURSIVE)
# =========================================================================

_REC1_TEXT = """
WITH RECURSIVE nodes AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 5000
), walk(k, root, depth) AS (
  SELECT k, k, 0 FROM nodes WHERE k < 10
  UNION ALL
  SELECT n.k, w.root, w.depth + 1
  FROM walk w JOIN nodes n ON n.k / 10 = w.k AND n.k >= 10
)
SELECT k, root, depth FROM walk
"""

_REC1_ORACLE = _REC1_TEXT.replace("n.k / 10 = w.k", "n.k // 10 = w.k")


@_register("rec1_recursive_cte", _REC1_ORACLE)
def rec1_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-native iteration: WITH RECURSIVE (new in Spark 4) walking a
    10-ary key forest (child k hangs under k DIV 10) from the roots down,
    carrying root and depth — the org-chart/bill-of-materials traversal
    that previously required the DataFrame loop d6/pr1/tc1 hand-roll
    (per-iteration join + checkpoint). The engine runs one join per
    LEVEL, so iteration count is the hierarchy DEPTH (4 here), not the
    node count — the property that makes recursive SQL viable on wide,
    shallow hierarchies at scale; deep chains (depth ~ rows) remain the
    loop-with-checkpoint territory. DuckDB runs the same text modulo its
    integer-division spelling (// vs Spark's DIV via intdiv in the ON
    clause — expressed as / on BIGINTs in Spark, which is true division,
    so the Spark side uses DIV)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_REC1_TEXT.replace("n.k / 10 = w.k", "n.k DIV 10 = w.k"))


# =========================================================================
# var1: SQL session variables — data-derived scalars between statements
# =========================================================================

_VAR1_SQL = """
WITH s AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(*) AS avg_price
  FROM orders
)
SELECT o.o_orderkey, o.o_totalprice
FROM orders o, s
WHERE o.o_totalprice > 1.5 * s.avg_price
"""


@_register("var1_session_variables", _VAR1_SQL)
def var1_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4): a data-derived scalar computed in
    one statement and consumed in the next — the multi-step-notebook /
    stored-procedure idiom without driver-side string splicing. The
    variable holds the exact-decimal average (deterministic: decimal sum
    ÷ count in double); the consuming query folds it as a typed literal,
    so the filter still pushes to the scan; the 1.5x multiplier keeps the
    result nonempty at every SF (a 2x cut returned zero rows at sf0.01 —
    a vacuous check). The oracle computes the same
    scalar as a CTE."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql("DECLARE OR REPLACE VARIABLE avg_price DOUBLE")
    spark.sql(
        """
        SET VAR avg_price =
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*) FROM orders)
        """
    )
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 1.5 * avg_price
        """
    )


# =========================================================================
# scr1: SQL scripting — control flow (WHILE) searching a data threshold
# =========================================================================

_SCR1_SQL = """
WITH cand AS (
  SELECT CAST(1000 * (1 << k) AS DOUBLE) AS thr
  FROM UNNEST(generate_series(0, 20)) t(k)
), counts AS (
  SELECT thr,
         (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr) AS n
  FROM cand
)
SELECT CAST(thr AS DOUBLE) AS threshold, CAST(n AS BIGINT) AS n_above
FROM counts WHERE n <= 100 ORDER BY thr LIMIT 1
"""


@_register("scr1_sql_scripting", _SCR1_SQL)
def scr1_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4, BEGIN..END with DECLARE/WHILE): a
    geometric threshold search — double the price cutoff until at most
    100 orders exceed it — run as control flow INSIDE the engine, where
    each loop iteration is a full distributed query and only the scalar
    crosses statements. This is the procedural idiom (dbt hooks, stored
    procs, retry-until loops) without a driver program. Thresholds are
    exact powers of two times 1000, so the float comparisons are
    identical cross-engine; the oracle replays the search declaratively
    (first candidate in the same geometric sequence meeting the stop
    condition)."""
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
        return spark.sql(
            """
            BEGIN
              DECLARE thr DOUBLE DEFAULT 1000.0;
              WHILE (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr)
                    > 100 DO
                SET thr = thr * 2;
              END WHILE;
              SELECT CAST(thr AS DOUBLE) AS threshold,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                      WHERE o_totalprice > thr) AS n_above;
            END
            """
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.scripting.enabled", prev)


# =========================================================================
# f16: ordered string aggregation (LISTAGG ... WITHIN GROUP, Spark 4)
# =========================================================================

_F16_SQL = """
SELECT o_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ','
                  ORDER BY l_linenumber, l_partkey) AS line_list,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey % 100 = 0
GROUP BY o_orderkey
"""


@_register("f16_listagg", _F16_SQL)
def f16_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — LISTAGG ... WITHIN GROUP (new in
    Spark 4), the denormalize-to-text reporting aggregate (line-number
    manifests, tag lists, audit trails). The WITHIN GROUP ordering (with
    a full tiebreak) is what makes the concatenated string deterministic
    across partitionings — an unordered listagg's output depends on
    merge order, the same class of bug as double summation. DuckDB
    spells the identical semantics string_agg(... ORDER BY ...)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    j = li.join(
        F.broadcast(o.select("o_orderkey")),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.expr(
                "listagg(CAST(l_linenumber AS STRING), ',') "
                "WITHIN GROUP (ORDER BY l_linenumber, l_partkey)"
            ).alias("line_list"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# =========================================================================
# nh1: NULL semantics under aggregation — the silent-divergence surface
# =========================================================================

_NH1_SQL = """
WITH nulled AS (
  SELECT CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderstatus END
           AS grp,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END
           AS price
  FROM orders
)
SELECT grp,
       COUNT(*) AS n_rows,
       COUNT(price) AS n_priced,
       CAST(COALESCE(SUM(CAST(price AS DECIMAL(18,2))), 0) AS DOUBLE)
         AS total,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(price)
         AS avg_priced,
       MIN(price) AS lo,
       MAX(price) AS hi
FROM nulled GROUP BY grp
"""


@_register("nh1_null_semantics", _NH1_SQL)
def nh1_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics under aggregation, pinned cross-engine with planted
    nulls (a quarter of the group keys, a third of the measures): NULL is
    a GROUP (GROUP BY keeps a null bucket — unlike a join key, which
    never matches), COUNT(*) counts rows while COUNT(col) skips nulls,
    SUM/MIN/MAX ignore nulls but return NULL for empty input (COALESCE'd
    where the report needs 0), and the average divides the null-skipping
    sum by the null-skipping count. Every one of these is a place two
    engines can silently disagree; the planted-modulus nulls make each
    rule observable. Plan: one codegen projection + one partial-agg pair
    — null handling costs nothing."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    nulled = o.select(
        F.when(k % 4 == 0, F.lit(None)).otherwise(F.col("o_orderstatus")).alias("grp"),
        F.when(k % 3 == 0, F.lit(None)).otherwise(F.col("o_totalprice")).alias("price"),
    )
    dsum_price = F.sum(F.col("price").cast("decimal(18,2)"))
    return nulled.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price").alias("n_priced"),
        F.coalesce(dsum_price, F.lit(0)).cast("double").alias("total"),
        (dsum_price.cast("double") / F.count("price")).alias("avg_priced"),
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
    )


# =========================================================================
# f17/f18/f19: bitwise aggregates, interpolated percentile, masking
# =========================================================================


@_register(
    "f17_bitwise_aggs",
    """
    SELECT o_orderpriority,
           bit_or(CAST(o_orderkey % 256 AS BIGINT)) AS flags_or,
           bit_and(CAST(o_orderkey % 256 AS BIGINT)) AS flags_and,
           bit_xor(CAST(o_orderkey % 256 AS BIGINT)) AS flags_xor
    FROM orders GROUP BY o_orderpriority
    """,
)
def f17_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate fold (bit_or/bit_and/bit_xor) over a derived
    8-bit flag word — permission-mask union/intersection and parity
    folding, the aggregates capability-flag schemas need. All three are
    associative+commutative integer folds: partition order can never
    change the result (the same property the decimal sums rely on), and
    they partial-aggregate map-side like any algebraic aggregate."""
    o = _t(spark, sf_dir, "orders")
    flag = (F.col("o_orderkey") % 256).cast("bigint")
    return o.groupBy("o_orderpriority").agg(
        F.bit_or(flag).alias("flags_or"),
        F.bit_and(flag).alias("flags_and"),
        F.bit_xor(flag).alias("flags_xor"),
    )


@_register(
    "f18_percentile_cont",
    """
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def f18_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED exact percentile (percentile_cont semantics: linear
    interpolation at rank (n-1)*q) — the SQL-standard definition, vs
    qt1's smallest-value-at-cumulative-rank discrete definition. Both
    engines implement the identical lerp, verified bit-exact at an
    awkward q before registration. Spark's percentile() buffers each
    group's values — fine for bounded groups (3 statuses here); the
    two-pass qt1 shape remains the unbounded-group path, which is why
    both are in the registry."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
    )


@_register(
    "f19_mask",
    r"""
    SELECT o_orderkey,
           regexp_replace(regexp_replace(regexp_replace(
             o_orderpriority || '#' || CAST(o_orderkey AS VARCHAR),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def f19_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in data masking (Spark's mask(): uppercase→X, lowercase→x,
    digit→n, other preserved) — the display-layer redaction for
    structured identifiers, complementing tx8's regex PII scrubbing of
    free text. Codegen-resident single projection; the oracle spells the
    same character-class policy as regexp_replace chains (DuckDB has no
    mask())."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.mask(
            F.concat(
                F.col("o_orderpriority"),
                F.lit("#"),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("masked"),
    )


# =========================================================================
# agg2: argmax/argmin (max_by/min_by) with a collision-free ordering key
# =========================================================================

_AGG2_SQL = """
WITH keyed AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * 100000000 + o_orderkey AS ord
  FROM orders
)
SELECT o_orderpriority,
       arg_max(o_orderkey, ord) AS top_order,
       arg_min(o_orderkey, ord) AS bottom_order,
       MAX(o_totalprice) AS top_price
FROM keyed GROUP BY o_orderpriority
"""


@_register("agg2_argmax", _AGG2_SQL)
def agg2_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin (max_by/min_by): WHICH order is the most/least
    valuable per priority — the lookup that otherwise costs a window +
    filter or a self-join. The ordering key packs (exact integer cents,
    orderkey) into one collision-free bigint, because ties in the raw
    measure make max_by nondeterministic on BOTH engines (each picks an
    arbitrary winner — a silent flakiness source; DuckDB's arg_max has
    no composite form, so the packing IS the portable tiebreak). One
    partial-aggregating pass, no window."""
    o = _t(spark, sf_dir, "orders")
    ord_ = (
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        * 100_000_000
        + F.col("o_orderkey")
    )
    return o.select(
        "o_orderpriority", "o_orderkey", "o_totalprice", ord_.alias("ord")
    ).groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", F.col("ord")).alias("top_order"),
        F.min_by("o_orderkey", F.col("ord")).alias("bottom_order"),
        F.max("o_totalprice").alias("top_price"),
    )
