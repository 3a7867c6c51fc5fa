r"""Round-5 wave 79: join-order cost comparison from exact statistics,
ORC round-trip fidelity.

- est2: est1 measured ONE join's size; est2 does what the optimizer
  does with such numbers — compares two orders of the filtered
  3-table star customer(BUILDING) ⋈ orders ⋈ lineitem by exact
  intermediate cardinalities (computed from per-key counts, never by
  running the quadratic joins), emits both plans' costs under the
  classic sum-of-intermediates model, certifies the JOIN-ASSOCIATIVITY
  law numerically (both orders must produce the same final
  cardinality), and marks the argmin plan. The filtered-first order
  wins because selection shrinks the intermediate — the
  pushdown-then-join intuition as a hash-checked number.
- src10: the storage-format matrix's missing native member — ORC.
  A deterministic lineitem slice round-trips Spark's ORC writer and
  reader (fixture built tmp-dir-then-rename, the src8 discipline) and
  is aggregate-compared by exact group sums; the oracle reads the
  ORIGINAL parquet, so the hash certifies the byte-semantic fidelity
  of the whole write-read cycle across formats.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no planner or columnar-format surface; these extend the statistics
family (est1, sk2) into plan choice, and the source/sink family
(S1-S9, src1-src9) with the second native columnar format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# est2: two join orders, exact intermediate cardinalities, argmin plan
# =========================================================================

_EST2_SQL = """
WITH cf AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), o AS (
  SELECT o_orderkey, o_custkey FROM orders
), lcnt AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cl
  FROM lineitem GROUP BY l_orderkey
), co AS (  -- |customer(BUILDING) JOIN orders| per order, plus its lineitem fanout
  SELECT o.o_orderkey, COALESCE(l.cl, 0) AS cl
  FROM o JOIN cf ON cf.c_custkey = o.o_custkey
  LEFT JOIN lcnt l ON l.l_orderkey = o.o_orderkey
), ol AS (  -- |orders JOIN lineitem| per order, plus the customer filter bit
  SELECT o.o_orderkey, COALESCE(l.cl, 0) AS cl,
         CASE WHEN cf.c_custkey IS NULL THEN 0 ELSE 1 END AS c_hit
  FROM o LEFT JOIN lcnt l ON l.l_orderkey = o.o_orderkey
  LEFT JOIN cf ON cf.c_custkey = o.o_custkey
), sizes AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM co) AS inter_co,
         (SELECT CAST(COALESCE(SUM(cl), 0) AS BIGINT) FROM ol) AS inter_ol,
         (SELECT CAST(COALESCE(SUM(cl), 0) AS BIGINT) FROM co) AS final_a,
         (SELECT CAST(COALESCE(SUM(cl * c_hit), 0) AS BIGINT) FROM ol)
           AS final_b
)
SELECT '(C*O)*L' AS plan,
       inter_co AS inter_rows, final_a AS final_rows,
       inter_co + final_a AS cost,
       (inter_co + final_a <= inter_ol + final_b) AS is_chosen,
       (final_a = final_b) AS assoc_ok
FROM sizes
UNION ALL
SELECT 'C*(O*L)' AS plan,
       inter_ol AS inter_rows, final_b AS final_rows,
       inter_ol + final_b AS cost,
       (inter_ol + final_b < inter_co + final_a) AS is_chosen,
       (final_a = final_b) AS assoc_ok
FROM sizes
"""


@_register("est2_join_order", _EST2_SQL)
def est2_join_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-order choice from exact statistics: for the filtered star
    customer(BUILDING) ⋈ orders ⋈ lineitem, both join orders'
    intermediate and final cardinalities are computed from per-key
    COUNTS (one aggregate per table — the quadratic joins are never
    executed), costed under the classic sum-of-intermediates model, and
    the cheaper plan is flagged. Two laws ride along: `assoc_ok` —
    both orders produce the SAME final cardinality (join associativity,
    checked numerically; a mismatch means a count pipeline is wrong) —
    and `is_chosen` marking exactly the argmin. The filtered-first
    order '(C*O)*L' wins because the BUILDING selection shrinks its
    intermediate below |orders ⋈ lineitem| — the predicate-pushdown
    dividend as a hash-certified number. Plan shape: three combinable
    aggregates + broadcast joins of key-count frames; at 100 TB this IS
    the statistics pass a CBO runs, as a Spark job."""
    cf = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lcnt = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey")
    ).agg(F.count(F.lit(1)).alias("cl"))
    co = (
        o.join(F.broadcast(cf), o["o_custkey"] == cf["c_custkey"])
        .join(lcnt, o["o_orderkey"] == lcnt["l_orderkey"], "left")
        .select(F.coalesce(F.col("cl"), F.lit(0)).alias("cl"))
    )
    ol = (
        o.join(lcnt, o["o_orderkey"] == lcnt["l_orderkey"], "left")
        .join(F.broadcast(cf), o["o_custkey"] == cf["c_custkey"], "left")
        .select(
            F.coalesce(F.col("cl"), F.lit(0)).alias("cl"),
            F.when(F.col("c_custkey").isNull(), 0).otherwise(1).alias("c_hit"),
        )
    )
    s_co = co.agg(
        F.count(F.lit(1)).cast("bigint").alias("inter_co"),
        F.coalesce(F.sum("cl"), F.lit(0)).cast("bigint").alias("final_a"),
    )
    s_ol = ol.agg(
        F.coalesce(F.sum("cl"), F.lit(0)).cast("bigint").alias("inter_ol"),
        F.coalesce(F.sum(F.col("cl") * F.col("c_hit")), F.lit(0))
        .cast("bigint")
        .alias("final_b"),
    )
    sizes = s_co.crossJoin(F.broadcast(s_ol))
    plan_a = sizes.select(
        F.lit("(C*O)*L").alias("plan"),
        F.col("inter_co").alias("inter_rows"),
        F.col("final_a").alias("final_rows"),
        (F.col("inter_co") + F.col("final_a")).alias("cost"),
        (
            F.col("inter_co") + F.col("final_a")
            <= F.col("inter_ol") + F.col("final_b")
        ).alias("is_chosen"),
        (F.col("final_a") == F.col("final_b")).alias("assoc_ok"),
    )
    plan_b = sizes.select(
        F.lit("C*(O*L)").alias("plan"),
        F.col("inter_ol").alias("inter_rows"),
        F.col("final_b").alias("final_rows"),
        (F.col("inter_ol") + F.col("final_b")).alias("cost"),
        (
            F.col("inter_ol") + F.col("final_b")
            < F.col("inter_co") + F.col("final_a")
        ).alias("is_chosen"),
        (F.col("final_a") == F.col("final_b")).alias("assoc_ok"),
    )
    return plan_a.unionAll(plan_b)


# =========================================================================
# src10: ORC round-trip with aggregate fidelity check
# =========================================================================

_SRC10_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_orderkey % 7 = 0
GROUP BY l_returnflag, l_linestatus
"""


@_register("src10_orc_roundtrip", _SRC10_SQL)
def src10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — Spark's second native columnar format beside
    parquet: a deterministic lineitem slice (orderkey % 7) is written
    with the ORC writer (zlib default; fixture materialized in a tmp
    dir then renamed, the src8 concurrency discipline) and read back,
    and exact per-group aggregates (BIGINT counts/quantity, DECIMAL
    money surfaced as double) are compared against the oracle reading
    the ORIGINAL parquet — the hash certifies that nothing was lost,
    duplicated, or re-typed across the format boundary. At 100 TB the
    same two lines are how a parquet lake backfills an ORC-consuming
    warehouse; ORC predicate pushdown and column pruning engage exactly
    like parquet's."""
    import shutil

    from .queries_scale import _SCRATCH

    sink = os.path.join(
        _SCRATCH, "src10_orc_" + os.path.basename(sf_dir.rstrip("/"))
    )
    marker = os.path.join(sink, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = f"{sink}.tmp.{os.getpid()}"
        (
            _t(spark, sf_dir, "lineitem")
            .where(F.col("l_orderkey") % 7 == 0)
            .write.mode("overwrite")
            .orc(tmp)
        )
        try:
            os.rename(tmp, sink)
        except OSError:
            if not os.path.exists(marker):
                shutil.rmtree(sink, ignore_errors=True)
                os.rename(tmp, sink)
            else:
                shutil.rmtree(tmp, ignore_errors=True)
    back = spark.read.orc(sink)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias(
            "sum_qty"
        ),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )
