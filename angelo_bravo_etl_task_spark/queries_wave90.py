r"""Round-5 wave 90: HDR-style log-bucketed latency histogram,
join-elimination law.

- hdr1: the latency histogram observability stacks ship (HdrHistogram
  / Prometheus-style exponential buckets) — order→ship latency in
  days bucketed by (power-of-two exponent, half-bucket mantissa bit),
  giving 2 buckets per octave with ≤50% relative bucket width, and the
  bucket-containment law certified per row: every bucket's recorded
  min and max actually lie inside its [lo, hi) range. The exponent
  comes from a CASE ladder over shifted thresholds — no log2, the
  libm-free discipline — and bucket edges are exact integers.
- jel1: the law behind the optimizer's join-elimination rewrite: an
  FK join to a dimension used only for filtering nothing may be
  DROPPED when every fact row matches. The query measures exactly
  that contract — fact count, joined count, orphan count — and
  certifies `eliminable_ok` (joined + orphans = fact) plus the
  referential verdict the rewrite needs (orphans = 0 here). The same
  counts power est2's cost model; this wave states the SEMANTIC
  precondition.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no observability surface; these extend the histogram family (hist1-3)
with the exponential-bucket variant every latency SLO uses, and the
planner-law family (est1/est2, dpp1) with the join-elimination
precondition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# hdr1: exponential (base-2, 2 sub-buckets) latency histogram
# =========================================================================

# exponent e = floor(log2(v)) for v >= 1, as a CASE ladder (v < 2^13 days
# is generous for order latency); sub-bucket = second-highest bit
_HDR_LADDER_SQL = """CASE
  WHEN v < 2 THEN 0 WHEN v < 4 THEN 1 WHEN v < 8 THEN 2
  WHEN v < 16 THEN 3 WHEN v < 32 THEN 4 WHEN v < 64 THEN 5
  WHEN v < 128 THEN 6 WHEN v < 256 THEN 7 WHEN v < 512 THEN 8
  WHEN v < 1024 THEN 9 WHEN v < 2048 THEN 10 WHEN v < 4096 THEN 11
  ELSE 12 END"""

_HDR1_SQL = f"""
WITH lat AS (
  SELECT CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
              AS BIGINT) + 1 AS v
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
), bucketed AS (
  SELECT v, {_HDR_LADDER_SQL} AS e,
         CASE WHEN {_HDR_LADDER_SQL} = 0 THEN 0
              WHEN v >= (CAST(1 AS BIGINT) << {_HDR_LADDER_SQL})
                   + (CAST(1 AS BIGINT) << {_HDR_LADDER_SQL}) // 2
              THEN 1 ELSE 0 END AS half
  FROM lat
), cells AS (
  SELECT CAST(e AS BIGINT) AS e, CAST(half AS BIGINT) AS half,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(v) AS BIGINT) AS min_v,
         CAST(MAX(v) AS BIGINT) AS max_v
  FROM bucketed GROUP BY e, half
)
SELECT e, half, n, min_v, max_v,
       CAST((CAST(1 AS BIGINT) << e)
            + half * GREATEST((CAST(1 AS BIGINT) << e) // 2, 1)
            AS BIGINT) AS lo,
       CAST((CAST(1 AS BIGINT) << e)
            + (half + 1) * GREATEST((CAST(1 AS BIGINT) << e) // 2, 1)
            AS BIGINT) AS hi,
       (min_v >= (CAST(1 AS BIGINT) << e)
                 + half * GREATEST((CAST(1 AS BIGINT) << e) // 2, 1)
        AND (e = 12 OR max_v < (CAST(1 AS BIGINT) << e)
                 + (half + 1) * GREATEST((CAST(1 AS BIGINT) << e) // 2, 1)))
         AS contained_ok
FROM cells
"""


@_register("hdr1_log_histogram", _HDR1_SQL)
def hdr1_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-style exponential latency histogram: order→ship latency
    (days + 1, so the domain starts at 1) lands in (exponent,
    half-bucket) cells — two sub-buckets per power of two, bounding
    relative bucket width at 50% of the lower edge — with the containment law certified
    per cell: the recorded min/max really lie inside the cell's exact
    integer [lo, hi) edges (lo = 2^e·(1 + half/2)). The exponent is a
    CASE ladder, never log2 (libm-free); the e=0 octave holds only
    v=1, where a half sub-bucket would be zero-width, so its half bit
    is pinned to 0 (one whole bucket [1, 2)). This is the histogram
    shape latency SLOs aggregate and merge (cells are combinable
    counts — the stats4 mergeability argument applies verbatim). One
    broadcast-joined scan, one ~26-cell aggregate."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    lat = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("sd") >= F.col("od"))
        .select((F.datediff("sd", "od") + 1).cast("bigint").alias("v"))
    )
    ladder = _HDR_LADDER_SQL.replace("\n", " ")
    bucketed = lat.select(
        "v",
        F.expr(f"CAST({ladder} AS BIGINT)").alias("e"),
    ).withColumn(
        "half",
        F.expr(
            "CAST(CASE WHEN e = 0 THEN 0"
            " WHEN v >= shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))"
            " + shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) DIV 2"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ),
    )
    cells = bucketed.groupBy("e", "half").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("min_v"),
        F.max("v").cast("bigint").alias("max_v"),
    )
    # sub-bucket width max(2^e/2, 1): the e=0 octave is one whole
    # bucket [1, 2) rather than two zero-width halves
    lo = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))"
        " + half * GREATEST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))"
        " DIV 2, CAST(1 AS BIGINT)) AS BIGINT)"
    )
    hi = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))"
        " + (half + 1) * GREATEST(shiftleft(CAST(1 AS BIGINT),"
        " CAST(e AS INT)) DIV 2, CAST(1 AS BIGINT)) AS BIGINT)"
    )
    return cells.select(
        "e",
        "half",
        "n",
        "min_v",
        "max_v",
        lo.alias("lo"),
        hi.alias("hi"),
        (
            (F.col("min_v") >= lo)
            & ((F.col("e") == 12) | (F.col("max_v") < hi))
        ).alias("contained_ok"),
    )


# =========================================================================
# jel1: the join-elimination precondition, measured and certified
# =========================================================================

_JEL1_SQL = """
WITH f AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS fact_rows FROM orders
), j AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS joined_rows
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphan_rows
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_custkey IS NULL
), dup AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS dup_keys FROM (
    SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1
  )
)
SELECT f.fact_rows, j.joined_rows, orphans.orphan_rows, dup.dup_keys,
       (j.joined_rows + orphans.orphan_rows = f.fact_rows
        AND dup.dup_keys = 0) AS partition_ok,
       (orphans.orphan_rows = 0 AND dup.dup_keys = 0) AS eliminable_ok
FROM f CROSS JOIN j CROSS JOIN orphans CROSS JOIN dup
"""


@_register("jel1_join_elimination", _JEL1_SQL)
def jel1_join_elimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic precondition of the optimizer's join-elimination
    rewrite, measured instead of assumed: an inner FK join to a
    dimension whose columns are unused may be dropped iff (a) the
    dimension key is UNIQUE (no fan-out) and (b) every fact row
    matches (no row loss). Both are counted — fact rows, joined rows,
    orphans via the null-extended anti pattern, duplicate dimension
    keys — and certified: `partition_ok` (joined + orphans = fact,
    which also proves the join didn't fan out) and `eliminable_ok`
    (orphans = 0 ∧ unique keys — the green light the rewrite needs).
    The same counts feed est2's cost model; this is the correctness
    side of that coin, and the pair is what a catalog records as a
    VALIDATED foreign-key constraint (RELY). Plan shape: one broadcast
    join + three combinable counts assembled from 1-row frames."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    f = o.agg(F.count(F.lit(1)).cast("bigint").alias("fact_rows"))
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("joined_rows"))
    )
    orphans = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_rows"))
    )
    dup = (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("dup_keys"))
    )
    return (
        f.crossJoin(F.broadcast(j))
        .crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(dup))
        .select(
            "fact_rows",
            "joined_rows",
            "orphan_rows",
            "dup_keys",
            (
                (F.col("joined_rows") + F.col("orphan_rows")
                 == F.col("fact_rows"))
                & (F.col("dup_keys") == 0)
            ).alias("partition_ok"),
            (
                (F.col("orphan_rows") == 0) & (F.col("dup_keys") == 0)
            ).alias("eliminable_ok"),
        )
    )
