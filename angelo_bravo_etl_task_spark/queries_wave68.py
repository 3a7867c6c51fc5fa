"""Round-3 wave 68: mergeable top-k, ntile decile analysis.

- tk2: the mergeability law behind distributed top-k — per-bucket
  top-k computed independently, unioned (B×k rows), and re-topped must
  equal the direct global top-k. This is exactly what Spark's
  TakeOrderedAndProject does (per-partition limit, then a single-
  partition merge), certified cross-engine with a deterministic
  (o_totalprice DESC, o_orderkey) tiebreak so the answer is unique.
- w14: ntile(10) deciles — the one ranking window the registry lacked.
  Per-segment account-balance deciles with BOTH defining laws emitted
  as columns: the size law (tiles 1..(n mod 10) get ⌈n/10⌉ rows, the
  rest ⌊n/10⌋) and the boundary law (each decile's min ≥ the previous
  decile's max under an ascending order), so the oracle hash certifies
  the tile assignment itself, not just the aggregates.

Reference parity note: the reference script (Angelo_ETL_Task.py) has no
ranking surface; these extend SURVEY.md §2.4's window family (w1-w13)
and the sort/limit/top-k family (t1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# tk2: mergeable top-k — the TakeOrderedAndProject algebra certified
# =========================================================================

_TK2_SQL = """
WITH direct AS (
  SELECT o_orderkey, o_totalprice, rnk FROM (
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
  ) WHERE rnk <= 20
), bucketed AS (                       -- per-bucket (map-side) top-k
  SELECT o_orderkey, o_totalprice FROM (
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderkey % 8
                              ORDER BY o_totalprice DESC, o_orderkey) AS brnk
    FROM orders
  ) WHERE brnk <= 20
), merged AS (                         -- merge = re-top-k over B*k rows
  SELECT o_orderkey, o_totalprice, rnk FROM (
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM bucketed
  ) WHERE rnk <= 20
)
SELECT m.rnk AS rank,
       m.o_orderkey AS o_orderkey,
       m.o_totalprice AS o_totalprice,
       (m.o_orderkey = d.o_orderkey) AS agree
FROM merged m JOIN direct d ON m.rnk = d.rnk
ORDER BY m.rnk
"""


@_register("tk2_mergeable_topk", _TK2_SQL)
def tk2_mergeable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase top-20 orders by price: per-(o_orderkey % 8) bucket
    top-20, union the 8×20 survivors, re-rank, and certify row-by-row
    agreement with the direct global top-20 (agree flag). The tiebreak
    (o_totalprice DESC, o_orderkey ASC) makes the answer a unique row
    set, so the law is exact — no ties can smuggle different-but-valid
    answers past the hash. o_totalprice is only COMPARED, never summed,
    so the double column is bit-stable cross-engine (same parquet bits,
    comparison is exact). At 100 TB this IS the plan Spark picks for
    ORDER BY ... LIMIT k: TakeOrderedAndProject keeps k rows per
    partition and merges B×k at the driver — certifying the algebra
    certifies that partial limits lose nothing. The bucket level here
    stands in for partitions; 8×20 merge rows are constant-size
    regardless of input volume."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    # orderBy().limit() compiles to TakeOrderedAndProject (per-partition
    # partial limit + constant-size merge) — the global-window rewrite
    # would force a single-partition sort of the whole table instead.
    # The row_number AFTER the limit ranks only the 20 survivors.
    rank20 = F.row_number().over(Window.orderBy(*order_cols))
    direct = orders.orderBy(*order_cols).limit(20).withColumn("rnk", rank20)
    bucketed = (
        orders.withColumn("bucket", F.col("o_orderkey") % F.lit(8))
        .withColumn(
            "brnk",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy(*order_cols)
            ),
        )
        .filter(F.col("brnk") <= 20)
        .select("o_orderkey", "o_totalprice")
    )
    merged = bucketed.orderBy(*order_cols).limit(20).withColumn("rnk", rank20)
    m, d = merged.alias("m"), direct.alias("d")
    return (
        m.join(d, F.col("m.rnk") == F.col("d.rnk"))
        .select(
            F.col("m.rnk").alias("rank"),
            F.col("m.o_orderkey").alias("o_orderkey"),
            F.col("m.o_totalprice").alias("o_totalprice"),
            (F.col("m.o_orderkey") == F.col("d.o_orderkey")).alias("agree"),
        )
        .orderBy("rank")
    )


# =========================================================================
# w14: ntile deciles with both defining laws asserted
# =========================================================================

_W14_SQL = """
WITH tiled AS (
  SELECT c_mktsegment, c_acctbal,
         NTILE(10) OVER (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal, c_custkey) AS decile,
         CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS seg_n
  FROM customer
), agg AS (
  SELECT c_mktsegment, decile, seg_n,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         MIN(c_acctbal) AS min_bal,
         MAX(c_acctbal) AS max_bal
  FROM tiled GROUP BY c_mktsegment, decile, seg_n
)
SELECT c_mktsegment,
       CAST(decile AS BIGINT) AS decile,
       n_cust,
       min_bal,
       max_bal,
       (n_cust = seg_n // 10
          + CASE WHEN decile <= seg_n % 10 THEN 1 ELSE 0 END) AS size_ok,
       COALESCE(min_bal >= lag(max_bal) OVER (PARTITION BY c_mktsegment
                                              ORDER BY decile),
                TRUE) AS boundary_ok
FROM agg
ORDER BY c_mktsegment, decile
"""


@_register("w14_ntile_deciles", _W14_SQL)
def w14_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles per market segment via ntile(10) with a
    deterministic (c_acctbal, c_custkey) order, aggregated per tile and
    certified by BOTH ntile laws as emitted columns: size_ok — tile d
    holds ⌊n/10⌋ rows plus one iff d ≤ n mod 10 (bigger tiles first,
    the SQL-standard allocation) — and boundary_ok — under an ascending
    sort each tile's min_bal ≥ the previous tile's max_bal (ties may
    straddle, hence ≥). Together the two laws pin the exact tile
    assignment, so the hash certifies ntile semantics, not just the
    per-tile aggregates. c_acctbal doubles are compared and min/maxed
    only — both bit-exact. At scale this is one hash exchange on
    c_mktsegment; the sort inside each partition is the same sort the
    decile definition needs, and the per-segment COUNT rides the same
    window — no second shuffle."""
    tiled = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(10)
        .over(
            Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        )
        .alias("decile"),
        F.count(F.lit(1))
        .over(Window.partitionBy("c_mktsegment"))
        .alias("seg_n"),
    )
    agg = tiled.groupBy("c_mktsegment", "decile", "seg_n").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("decile")
    expected = F.expr("seg_n DIV 10") + F.when(
        F.col("decile") <= F.col("seg_n") % 10, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        agg.select(
            "c_mktsegment",
            F.col("decile").cast("long").alias("decile"),
            "n_cust",
            "min_bal",
            "max_bal",
            (F.col("n_cust") == expected).alias("size_ok"),
            F.coalesce(
                F.col("min_bal") >= F.lag("max_bal").over(w), F.lit(True)
            ).alias("boundary_ok"),
        )
        .orderBy("c_mktsegment", "decile")
    )
