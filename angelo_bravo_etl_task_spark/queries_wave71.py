"""Round-3 wave 71: Apriori support lattice, l-diversity audit.

- apri1: the anti-monotonicity law that makes frequent-itemset mining
  tractable at scale — support can only shrink as itemsets grow —
  certified on real basket data: top-30 part triples by support with
  the FULL support lattice attached (all three pair supports, all
  three item supports) and supp(abc) ≤ min(pair supps) ≤ min(item
  supps) asserted per row. Triple generation is per-basket
  combinations (lines-per-basket choose 3 — mb1's bound extended a
  level, never catalog³), and the certificate joins broadcast the
  30-row survivors against the support tables, not the reverse.
- an4: l-diversity — the audit k-anonymity (an2) misses. A group can
  be k-large yet reveal everyone's sensitive value if that value is
  constant within the group; here each (lang, source) cell counts
  DISTINCT sensitive bins (equi-width n_chars quartiles from one
  broadcast min/max — data-derived so both verdict branches fire at
  every SF, the dp2/bloom1 rule) and cells below l = 3 are flagged
  for generalization.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no mining or privacy surface; these extend the market-basket family
(mb1, mb2, cf1) and the privacy family (an1-an3, tx8, dp2, dp3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# apri1: support anti-monotonicity over the itemset lattice
# =========================================================================

_APRI1_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), item_supp AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp
  FROM items GROUP BY l_partkey
), pair_supp AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS supp
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
), triple_supp AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
         CAST(COUNT(*) AS BIGINT) AS supp
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN items c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY a.l_partkey, b.l_partkey, c.l_partkey
), top AS (
  SELECT pa, pb, pc, supp, rnk FROM (
    SELECT pa, pb, pc, supp,
           ROW_NUMBER() OVER (ORDER BY supp DESC, pa, pb, pc) AS rnk
    FROM triple_supp
  ) WHERE rnk <= 30
)
SELECT CAST(t.rnk AS BIGINT) AS rnk,
       t.pa AS part_a, t.pb AS part_b, t.pc AS part_c,
       t.supp AS supp_abc,
       ab.supp AS supp_ab, ac.supp AS supp_ac, bc.supp AS supp_bc,
       sa.supp AS supp_a, sb.supp AS supp_b, sc.supp AS supp_c,
       (t.supp <= LEAST(ab.supp, ac.supp, bc.supp)
        AND LEAST(ab.supp, ac.supp, bc.supp)
              <= LEAST(sa.supp, sb.supp, sc.supp)) AS lattice_ok
FROM top t
JOIN pair_supp ab ON ab.pa = t.pa AND ab.pb = t.pb
JOIN pair_supp ac ON ac.pa = t.pa AND ac.pb = t.pc
JOIN pair_supp bc ON bc.pa = t.pb AND bc.pb = t.pc
JOIN item_supp sa ON sa.l_partkey = t.pa
JOIN item_supp sb ON sb.l_partkey = t.pb
JOIN item_supp sc ON sc.l_partkey = t.pc
ORDER BY rnk
"""


@_register("apri1_support_lattice", _APRI1_SQL)
def apri1_support_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 part triples by basket support with the complete support
    lattice joined on and the Apriori anti-monotonicity law certified
    per row: supp(abc) ≤ min over its three pairs ≤ min over its three
    items. This inequality IS the pruning bound that lets level-wise
    mining discard candidates without counting them; emitting it as a
    column makes the oracle hash certify the law on real data. Triples
    come from the basket-keyed three-way self-join (per-basket
    combinations — the cost is Σ(basket choose 3), bounded by basket
    size, never catalog³), support counts are one combinable aggregate,
    and the certificate joins attach supports to the broadcast 30-row
    survivor frame. Top-30 instead of a fixed support threshold keeps
    the output non-empty at every SF (the dp2 relative-threshold rule);
    all supports are exact BIGINT."""
    from .operators.partitioning import spread

    # ONE shuffle builds sorted per-basket item arrays; pair and triple
    # combinations are then generated INSIDE each row by nested
    # higher-order functions (cost Σ(basket choose k), identical to the
    # self-join form but with zero extra shuffles and no re-scan), so
    # the three support tables share the same persisted basket frame.
    #
    # Materialization policy (r11 A/B, VERDICT r11 item 4): the LAZY
    # persist lets the three consumers' broadcast-build threads race and
    # duplicate the basket derivation (~16 s duplicate executor work) —
    # which is WALL-OPTIMAL on an idle local box where each stage is only
    # 8 tasks wide (eager checkpoint measured 1.8 s → 4.1 s). On a real
    # cluster that duplicate work costs real resources, so the eager
    # cluster shape ships behind the same env pattern as the heap/
    # partition knobs instead of only a comment.
    baskets = (
        spread(
            _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    if os.environ.get("SPARK_GRAFT_EAGER_SHARED_FRAMES", "") == "1":
        baskets = baskets.localCheckpoint(eager=True)  # cluster shape
    else:
        baskets = baskets.persist()  # local wall-clock optimum
    item_supp = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("supp"))
    )
    pair_combos = F.expr(
        """
        flatten(transform(ps, (a, i) ->
          transform(slice(ps, i + 2, size(ps) - i - 1), b ->
            struct(a AS pa, b AS pb))))
        """
    )
    pair_supp = (
        baskets.select(F.explode(pair_combos).alias("pr"))
        .groupBy(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("supp"))
        .persist()
    )
    triple_combos = F.expr(
        """
        flatten(flatten(transform(ps, (a, i) ->
          transform(slice(ps, i + 2, size(ps) - i - 1), (b, j) ->
            transform(slice(ps, i + j + 3, size(ps) - i - j - 2), c ->
              struct(a AS pa, b AS pb, c AS pc))))))
        """
    )
    triple_supp = (
        baskets.select(F.explode(triple_combos).alias("tr"))
        .groupBy(
            F.col("tr.pa").alias("pa"),
            F.col("tr.pb").alias("pb"),
            F.col("tr.pc").alias("pc"),
        )
        .agg(F.count(F.lit(1)).alias("supp"))
    )
    w = Window.orderBy(F.col("supp").desc(), "pa", "pb", "pc")
    top = (
        triple_supp.orderBy(F.col("supp").desc(), "pa", "pb", "pc")
        .limit(30)
        .withColumn("rnk", F.row_number().over(w))
    )
    t = F.broadcast(top).alias("t")
    ab = pair_supp.alias("ab")
    ac = pair_supp.alias("ac")
    bc = pair_supp.alias("bc")
    sa = item_supp.alias("sa")
    sb = item_supp.alias("sb")
    sc = item_supp.alias("sc")
    min_pair = F.least(F.col("ab.supp"), F.col("ac.supp"), F.col("bc.supp"))
    min_item = F.least(F.col("sa.supp"), F.col("sb.supp"), F.col("sc.supp"))
    return (
        t.join(
            ab,
            (F.col("ab.pa") == F.col("t.pa"))
            & (F.col("ab.pb") == F.col("t.pb")),
        )
        .join(
            ac,
            (F.col("ac.pa") == F.col("t.pa"))
            & (F.col("ac.pb") == F.col("t.pc")),
        )
        .join(
            bc,
            (F.col("bc.pa") == F.col("t.pb"))
            & (F.col("bc.pb") == F.col("t.pc")),
        )
        .join(sa, F.col("sa.l_partkey") == F.col("t.pa"))
        .join(sb, F.col("sb.l_partkey") == F.col("t.pb"))
        .join(sc, F.col("sc.l_partkey") == F.col("t.pc"))
        .select(
            F.col("t.rnk").cast("long").alias("rnk"),
            F.col("t.pa").alias("part_a"),
            F.col("t.pb").alias("part_b"),
            F.col("t.pc").alias("part_c"),
            F.col("t.supp").alias("supp_abc"),
            F.col("ab.supp").alias("supp_ab"),
            F.col("ac.supp").alias("supp_ac"),
            F.col("bc.supp").alias("supp_bc"),
            F.col("sa.supp").alias("supp_a"),
            F.col("sb.supp").alias("supp_b"),
            F.col("sc.supp").alias("supp_c"),
            (
                (F.col("t.supp") <= min_pair) & (min_pair <= min_item)
            ).alias("lattice_ok"),
        )
        .orderBy("rnk")
    )


# =========================================================================
# an4: l-diversity over (lang, source) cells
# =========================================================================

_AN4_SQL = """
WITH b AS (
  SELECT CAST(MIN(n_chars) AS BIGINT) AS mn,
         CAST(MAX(n_chars) AS BIGINT) AS mx
  FROM documents
), t AS (
  SELECT d.lang, d.source,
         LEAST(3, ((d.n_chars - b.mn) * 4) // (b.mx - b.mn + 1)) AS bin
  FROM documents d CROSS JOIN b
  UNION ALL
  SELECT 'zz' AS lang, 'planted_constant_bin' AS source,
         CAST(0 AS BIGINT) AS bin
  FROM documents WHERE doc_id % 7 = 0
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS grp_n,
       CAST(COUNT(DISTINCT bin) AS BIGINT) AS l_distinct,
       (COUNT(DISTINCT bin) >= 3) AS diverse_ok,
       CASE WHEN COUNT(DISTINCT bin) >= 3 THEN 'release'
            ELSE 'generalize' END AS action
FROM t GROUP BY lang, source
ORDER BY lang, source
"""


@_register("an4_l_diversity", _AN4_SQL)
def an4_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the quasi-identifier cell (lang, source):
    a cell that is k-anonymously large can still disclose its members'
    sensitive attribute if that attribute is near-constant inside it,
    so each cell counts DISTINCT sensitive bins and cells with fewer
    than l = 3 get a 'generalize' verdict. The sensitive attribute is
    the equi-width n_chars quartile from a single broadcast (min, max)
    — data-derived bounds (measured: 11 cells at l=1, 32 at l=2, 54 at
    l≥3 at sf0.01) where fixed bin edges would go vacuous under data
    regeneration. Large cells legitimately diversify as data grows (at
    sf0.1 every real cell spans ≥3 quartiles), so a planted synthetic
    cell with a constant bin keeps the 'generalize' branch firing at
    every SF — the tx8/src6 deterministic-planting rule.
    One 1-row broadcast + one hash aggregate on the QI key with a
    distinct-count — at 100 TB the aggregate is map-side combinable
    on (lang, source, bin) first, exactly how Spark plans
    COUNT(DISTINCT) via expand."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    d = docs.select("lang", "source", "n_chars")
    b = d.agg(
        F.min("n_chars").cast("long").alias("mn"),
        F.max("n_chars").cast("long").alias("mx"),
    )
    binned = d.crossJoin(F.broadcast(b)).select(
        "lang",
        "source",
        F.least(
            F.lit(3),
            F.expr("((n_chars - mn) * 4) DIV (mx - mn + 1)"),
        ).alias("bin"),
    )
    # Planted adversarial cell (the tx8/src6 planting rule): a synthetic
    # QI cell whose sensitive bin is constant BY CONSTRUCTION, so the
    # 'generalize' branch fires deterministically at EVERY SF — at sf0.1
    # every real (lang, source) cell is large enough to span >= 3
    # quartiles and the flag path would otherwise go vacuous (found by
    # the round-7 sf0.1 property sweep). Both engines state the plant
    # identically, so it is on the hash path like any other row.
    planted = docs.where(F.col("doc_id") % 7 == 0).select(
        F.lit("zz").alias("lang"),
        F.lit("planted_constant_bin").alias("source"),
        F.lit(0).cast("long").alias("bin"),
    )
    binned = binned.unionAll(planted)
    return (
        binned.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.countDistinct("bin").alias("l_distinct"),
            (F.countDistinct("bin") >= 3).alias("diverse_ok"),
            F.when(F.countDistinct("bin") >= 3, F.lit("release"))
            .otherwise(F.lit("generalize"))
            .alias("action"),
        )
        .orderBy("lang", "source")
    )
