r"""Round-5 wave 88: systematic weighted sampling, privacy cell
suppression.

- wt1: the WITH-multiplicity sampler data-mixing pipelines use beside
  rsv1's without-replacement draw — systematic (grid) sampling over
  the cumulative weight line: m = 20 probes at the odd multiples of
  W/2m pick whichever document's weight interval contains them. Fully
  deterministic, and the defining variance-free law is INTEGER-exact
  and certified per selected doc: a weight-w document is hit between
  (m·w) DIV W and (m·w) DIV W + 1 times — systematic sampling's ±1
  guarantee, the reason it beats independent draws for mixture
  fidelity.
- sup1: the census-style disclosure rule on an OLAP cube: counts over
  CUBE(segment, priority, year) publish only cells with at least
  k = max(5, total DIV 300) contributors (a data-derived threshold,
  the dp2 rule, so suppression and publication BOTH fire at every
  SF); suppressed cells emit NULL, and the publication law (every
  published count ≥ k) and honesty law (suppressed ⇔ count < k) ride
  as columns beside the grouping level.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no sampling or disclosure surface; these extend the sampling family
(rsv1, spl1, sm1/sm2) and the privacy family (an2 k-anonymity, an3,
an4, dp2/dp3) with the mixture sampler and the OLAP publication gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

_WT1_M = 20

# =========================================================================
# wt1: systematic sampling over the cumulative weight line
# =========================================================================

_WT1_SQL = f"""
WITH w AS (
  SELECT doc_id, lang,
         CAST(1 + LEAST(n_chars // 100, 7) AS BIGINT) AS weight
  FROM documents
), c AS (
  SELECT doc_id, lang, weight,
         CAST(SUM(weight) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS hi,
         CAST(COALESCE(SUM(weight) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS lo
  FROM w
), tot AS (
  SELECT CAST(SUM(weight) AS BIGINT) AS big_w FROM w
), probes AS (
  SELECT CAST(((2 * j + 1) * (SELECT big_w FROM tot)) // (2 * {_WT1_M})
              AS BIGINT) AS pos
  FROM (SELECT unnest(range(0, {_WT1_M})) AS j)
), hit AS (
  SELECT c.doc_id, c.lang, c.weight,
         CAST(COUNT(*) AS BIGINT) AS multiplicity
  FROM probes p JOIN c ON p.pos >= c.lo AND p.pos < c.hi
  GROUP BY c.doc_id, c.lang, c.weight
)
SELECT h.doc_id, h.lang, h.weight, h.multiplicity,
       ({_WT1_M} * h.weight) // t.big_w AS expected_lo,
       (h.multiplicity >= ({_WT1_M} * h.weight) // t.big_w
        AND h.multiplicity <= ({_WT1_M} * h.weight) // t.big_w + 1)
         AS within_one_ok
FROM hit h CROSS JOIN tot t
"""


@_register("wt1_systematic_sample", _WT1_SQL)
def wt1_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic weighted sampling WITH multiplicity: documents line up
    on the cumulative weight axis (prefix sums in doc_id order), and
    m = 20 probes at the odd multiples of W/2m — integer positions
    ((2j+1)·W) DIV 2m — each select the doc whose [lo, hi) interval
    contains them. The sampler's defining guarantee is certified per
    selected doc in pure integers: multiplicity ∈ {(m·w) DIV W,
    (m·w) DIV W + 1} — the ±1 law that makes systematic sampling
    variance-free for mixture fidelity (independent draws only get
    this in expectation). Conservation (Σ multiplicity = m) is checked
    in the property layer. The 20-row probe spine broadcasts onto the
    interval frame (bounded non-equi join — the xc1 spine shape); the
    prefix sum here is a single window over the corpus frame, and at
    100 TB it becomes ord1's two-level sharded prefix sum — the probe
    logic is unchanged. All arithmetic BIGINT."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "lang",
        (1 + F.least(F.floor(F.col("n_chars") / 100), F.lit(7)))
        .cast("bigint")
        .alias("weight"),
    )
    win = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    win_prev = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = w.select(
        "doc_id",
        "lang",
        "weight",
        F.sum("weight").over(win).cast("bigint").alias("hi"),
        F.coalesce(F.sum("weight").over(win_prev), F.lit(0))
        .cast("bigint")
        .alias("lo"),
    )
    tot = w.agg(F.sum("weight").cast("bigint").alias("big_w"))
    probes = (
        spark.range(0, _WT1_M)
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(f"CAST(((2 * id + 1) * big_w) DIV (2 * {_WT1_M}) AS BIGINT)")
            .alias("pos")
        )
    )
    hit = (
        F.broadcast(probes)
        .join(c, (F.col("pos") >= F.col("lo")) & (F.col("pos") < F.col("hi")))
        .groupBy("doc_id", "lang", "weight")
        .agg(F.count(F.lit(1)).cast("bigint").alias("multiplicity"))
    )
    exp_lo = F.expr(f"({_WT1_M} * weight) DIV big_w")
    return hit.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "lang",
        "weight",
        "multiplicity",
        exp_lo.alias("expected_lo"),
        (
            (F.col("multiplicity") >= exp_lo)
            & (F.col("multiplicity") <= exp_lo + 1)
        ).alias("within_one_ok"),
    )


# =========================================================================
# sup1: k-threshold cell suppression over a CUBE
# =========================================================================

_SUP1_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), tot AS (
  SELECT GREATEST(5, CAST(COUNT(*) AS BIGINT) // 300) AS k FROM base
), cells AS (
  SELECT COALESCE(segment, '(all)') AS segment,
         COALESCE(priority, '(all)') AS priority,
         COALESCE(CAST(yr AS VARCHAR), '(all)') AS yr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(GROUPING(segment) * 4 + GROUPING(priority) * 2
              + GROUPING(yr) AS BIGINT) AS level_
  FROM base GROUP BY CUBE(segment, priority, yr)
)
SELECT c.segment, c.priority, c.yr, c.level_, t.k,
       (c.n < t.k) AS suppressed,
       CASE WHEN c.n >= t.k THEN c.n END AS published_n,
       (CASE WHEN c.n >= t.k THEN c.n END IS NULL OR
        CASE WHEN c.n >= t.k THEN c.n END >= t.k) AS publication_ok,
       ((c.n < t.k) = (CASE WHEN c.n >= t.k THEN c.n END IS NULL))
         AS honesty_ok
FROM cells c CROSS JOIN tot t
"""


@_register("sup1_cell_suppression", _SUP1_SQL)
def sup1_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census-style primary cell suppression over an OLAP cube: counts
    by CUBE(segment, priority, order year) — every aggregation level
    tagged by its grouping id — publish only where the cell holds at
    least k = max(5, total DIV 300) contributors; smaller cells emit
    NULL. The threshold is data-derived (the dp2 relative rule), so
    suppressed AND published cells both exist at every SF, at the
    finest level and (for publication) at the margins. Two laws per
    row: `publication_ok` (whatever is published is ≥ k — the
    disclosure rule itself) and `honesty_ok` (suppression flag ⇔ NULL
    publication — no silent leak of a suppressed value). This is an2's
    k-anonymity gate lifted from one flat grouping to the full cube a
    statistical office actually releases. Plan shape: one broadcast
    join + one CUBE aggregate (2³ grouping sets in one shuffle); the
    1-row threshold broadcasts."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    )
    tot = base.agg(
        F.greatest(
            F.lit(5).cast("bigint"),
            F.expr("CAST(COUNT(*) AS BIGINT) DIV 300"),
        ).alias("k")
    )
    cells = base.cube("segment", "priority", "yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.grouping("segment") * 4
            + F.grouping("priority") * 2
            + F.grouping("yr")
        )
        .cast("bigint")
        .alias("level_"),
    ).select(
        F.coalesce(F.col("segment"), F.lit("(all)")).alias("segment"),
        F.coalesce(F.col("priority"), F.lit("(all)")).alias("priority"),
        F.coalesce(F.col("yr").cast("string"), F.lit("(all)")).alias("yr"),
        "n",
        "level_",
    )
    published = F.when(F.col("n") >= F.col("k"), F.col("n"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "segment",
        "priority",
        "yr",
        "level_",
        "k",
        (F.col("n") < F.col("k")).alias("suppressed"),
        published.alias("published_n"),
        (published.isNull() | (published >= F.col("k"))).alias(
            "publication_ok"
        ),
        ((F.col("n") < F.col("k")) == published.isNull()).alias("honesty_ok"),
    )
