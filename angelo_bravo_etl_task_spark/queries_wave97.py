r"""Round-7 wave 97: t-closeness and incremental join maintenance — the
missing rung of each of two existing certificate families.

- an5: the anonymization ladder ran k-anonymity (an2, cell size) and
  l-diversity (an4, distinct sensitive bins per cell); t-closeness is the
  stronger, standard third rung — a cell's sensitive-attribute
  DISTRIBUTION must sit within distance t of the corpus distribution, or
  an attacker who locates a victim's cell learns the attribute's skew
  even when l distinct values are present. Distance = Earth Mover's
  Distance over the ordered bins, kept as an EXACT integer fraction
  (numerator / denominator released separately — no floats anywhere).
- mv3: incremental view maintenance covered aggregation (mv1) and
  distinct (mv2); the missing algebra is the JOIN delta rule
  ``(A0+dA) JOIN (B0+dB) = A0 JOIN B0 + dA JOIN B0 + A0 JOIN dB + dA
  JOIN dB`` — the identity every streaming matview and CDC merge stands
  on. mv3 computes a revenue view both ways (full recompute vs the
  four-term incremental union) and certifies bit-equality per group in
  exact integer cents.

Both release bounded per-group frames with every branch/term provably
non-vacuous at every SF (planted mirror/violator cells for an5; modulus
delta slices sized so each of the four join terms is non-empty for mv3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# an5: t-closeness over (lang, source) cells — exact-integer EMD
# =========================================================================

_AN5_SQL = """
WITH b AS (
  SELECT CAST(MIN(n_chars) AS BIGINT) AS mn,
         CAST(MAX(n_chars) AS BIGINT) AS mx
  FROM documents
), binned AS (
  SELECT d.lang, d.source,
         LEAST(3, ((d.n_chars - b.mn) * 4) // (b.mx - b.mn + 1)) AS bin
  FROM documents d CROSS JOIN b
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(CASE WHEN bin <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
         CAST(SUM(CASE WHEN bin <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
         CAST(SUM(CASE WHEN bin <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2
  FROM binned
), cells AS (
  SELECT lang, source, bin FROM binned
  UNION ALL
  SELECT 'zz' AS lang, 'planted_constant_bin' AS source,
         CAST(0 AS BIGINT) AS bin
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 'zz' AS lang, 'planted_global_mirror' AS source, bin
  FROM binned
), per_cell AS (
  SELECT lang, source,
         CAST(COUNT(*) AS BIGINT) AS grp_n,
         CAST(SUM(CASE WHEN bin <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN bin <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN bin <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM cells GROUP BY lang, source
)
SELECT p.lang, p.source, p.grp_n,
       CAST(ABS(g.n_all * p.c0 - p.grp_n * g.g0)
          + ABS(g.n_all * p.c1 - p.grp_n * g.g1)
          + ABS(g.n_all * p.c2 - p.grp_n * g.g2) AS BIGINT) AS emd_num,
       CAST(3 * p.grp_n * g.n_all AS BIGINT) AS emd_den,
       ((ABS(g.n_all * p.c0 - p.grp_n * g.g0)
        + ABS(g.n_all * p.c1 - p.grp_n * g.g1)
        + ABS(g.n_all * p.c2 - p.grp_n * g.g2)) * 5
        <= 3 * p.grp_n * g.n_all) AS close_ok,
       CASE WHEN (ABS(g.n_all * p.c0 - p.grp_n * g.g0)
                 + ABS(g.n_all * p.c1 - p.grp_n * g.g1)
                 + ABS(g.n_all * p.c2 - p.grp_n * g.g2)) * 5
                 <= 3 * p.grp_n * g.n_all
            THEN 'release' ELSE 'suppress' END AS action
FROM per_cell p CROSS JOIN g
ORDER BY p.lang, p.source
"""


@_register("an5_t_closeness", _AN5_SQL)
def an5_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (t = 0.2) of the quasi-identifier cell
    (lang, source) over the same data-derived n_chars quartile bins as
    an4 — the third rung of the anonymization ladder after an2
    (k-anonymity) and an4 (l-diversity). Per cell the Earth Mover's
    Distance to the corpus distribution over the ORDERED bins is the
    mean absolute cumulative-share gap, kept as an exact integer
    fraction: emd_num = SUM_i |N*C_i - n*G_i| over the three interior
    prefixes, emd_den = 3*n*N (EMD = num/den, never materialized as a
    float); the verdict compares num*5 <= den, i.e. EMD <= 1/5, in pure
    integer arithmetic. Both branches are PLANTED so neither goes
    vacuous under any driver regeneration (the an4 sf0.1 lesson): a
    'planted_global_mirror' cell replays every real row's bin — its
    distribution IS the corpus distribution, EMD exactly 0, 'release'
    fires — and a 'planted_constant_bin' cell (the an4 plant) puts all
    mass on bin 0, forcing a large EMD and 'suppress'. 100 TB shape:
    one 1-row (min, max) broadcast, one map-side-combinable conditional-
    sum aggregate per cell, one 1-row corpus-distribution broadcast —
    the scored frame never shuffles against either scalar. N*C products
    stay under bigint through ~10^9 rows per side of the product;
    beyond that the prefix shares move to decimal128, same algebra."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    b = docs.agg(
        F.min("n_chars").cast("long").alias("mn"),
        F.max("n_chars").cast("long").alias("mx"),
    )
    binned = docs.crossJoin(F.broadcast(b)).select(
        "lang",
        "source",
        F.least(
            F.lit(3), F.expr("((n_chars - mn) * 4) DIV (mx - mn + 1)")
        ).alias("bin"),
    )
    g = F.broadcast(
        binned.agg(
            F.count(F.lit(1)).cast("long").alias("n_all"),
            F.sum((F.col("bin") <= 0).cast("long")).alias("g0"),
            F.sum((F.col("bin") <= 1).cast("long")).alias("g1"),
            F.sum((F.col("bin") <= 2).cast("long")).alias("g2"),
        )
    )
    cells = binned.unionAll(
        docs.where(F.col("doc_id") % 7 == 0).select(
            F.lit("zz").alias("lang"),
            F.lit("planted_constant_bin").alias("source"),
            F.lit(0).cast("long").alias("bin"),
        )
    ).unionAll(
        binned.select(
            F.lit("zz").alias("lang"),
            F.lit("planted_global_mirror").alias("source"),
            "bin",
        )
    )
    per_cell = cells.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("grp_n"),
        F.sum((F.col("bin") <= 0).cast("long")).alias("c0"),
        F.sum((F.col("bin") <= 1).cast("long")).alias("c1"),
        F.sum((F.col("bin") <= 2).cast("long")).alias("c2"),
    )
    emd_num = (
        F.abs(F.col("n_all") * F.col("c0") - F.col("grp_n") * F.col("g0"))
        + F.abs(F.col("n_all") * F.col("c1") - F.col("grp_n") * F.col("g1"))
        + F.abs(F.col("n_all") * F.col("c2") - F.col("grp_n") * F.col("g2"))
    )
    emd_den = 3 * F.col("grp_n") * F.col("n_all")
    return (
        per_cell.crossJoin(g)
        .select(
            "lang",
            "source",
            "grp_n",
            emd_num.cast("long").alias("emd_num"),
            emd_den.cast("long").alias("emd_den"),
            (emd_num * 5 <= emd_den).alias("close_ok"),
            F.when(emd_num * 5 <= emd_den, F.lit("release"))
            .otherwise(F.lit("suppress"))
            .alias("action"),
        )
        .orderBy("lang", "source")
    )


# =========================================================================
# mv3: incremental JOIN maintenance — the four-term delta identity
# =========================================================================

_MV3_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         (o_orderkey % 10 = 7) AS is_delta
  FROM orders
), l AS (
  SELECT l_orderkey,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         ((l_orderkey + l_linenumber) % 13 = 5) AS is_delta
  FROM lineitem
), full_v AS (
  SELECT o.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_full,
         CAST(SUM(l.cents) AS BIGINT) AS cents_full
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderpriority
), terms AS (
  SELECT o.o_orderpriority, l.cents, 'b' AS term
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey
  WHERE NOT o.is_delta AND NOT l.is_delta
  UNION ALL
  SELECT o.o_orderpriority, l.cents, 'da' AS term
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey
  WHERE o.is_delta AND NOT l.is_delta
  UNION ALL
  SELECT o.o_orderpriority, l.cents, 'db' AS term
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey
  WHERE NOT o.is_delta AND l.is_delta
  UNION ALL
  SELECT o.o_orderpriority, l.cents, 'dd' AS term
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey
  WHERE o.is_delta AND l.is_delta
), incr_v AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_incr,
         CAST(SUM(cents) AS BIGINT) AS cents_incr,
         CAST(SUM(CASE WHEN term = 'b'  THEN 1 ELSE 0 END) AS BIGINT)
           AS n_base,
         CAST(SUM(CASE WHEN term = 'da' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_da_b0,
         CAST(SUM(CASE WHEN term = 'db' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a0_db,
         CAST(SUM(CASE WHEN term = 'dd' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dadb
  FROM terms GROUP BY o_orderpriority
)
SELECT f.o_orderpriority, f.n_full, f.cents_full,
       i.n_incr, i.cents_incr,
       i.n_base, i.n_da_b0, i.n_a0_db, i.n_dadb,
       (f.n_full = i.n_incr AND f.cents_full = i.cents_incr)
         AS incremental_ok
FROM full_v f JOIN incr_v i ON f.o_orderpriority = i.o_orderpriority
ORDER BY f.o_orderpriority
"""


@_register("mv3_incremental_join", _MV3_SQL)
def mv3_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance certified against the full
    recompute — the delta rule streaming materialized views and CDC
    merges stand on: with A = A0 + dA and B = B0 + dB,
    ``A JOIN B = A0 JOIN B0  +  dA JOIN B0  +  A0 JOIN dB  +  dA JOIN
    dB``. The view is revenue (exact integer cents) per order priority
    over orders JOIN lineitem; delta slices are deterministic modulus
    cuts on DIFFERENT keys (orders: o_orderkey % 10 = 7; lineitem:
    (l_orderkey + l_linenumber) % 13 = 5) so all four terms — including
    the easy-to-forget dA JOIN dB cross term — are non-empty at every
    SF (~1/130 of lines land in the cross term; its omission is
    exactly the classic IVM bug this certificate falsifies). The
    released frame carries both routes' counts and cents plus per-term
    row counts, with ``incremental_ok`` asserting bit-equality. mv1
    (aggregation) and mv2 (distinct) covered the other two IVM
    algebras; mv3 completes the family. 100 TB shape: the four term
    joins are ONE equi-join each — the three delta terms have a
    delta-sized side (broadcastable in a real refresh; here Catalyst
    picks the strategy), partial aggregation is map-side combinable on
    the 5-value priority key, and the final two-route reconciliation
    join is dimension-sized."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderkey") % 10 == 7).alias("o_delta"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 13 == 5).alias(
            "l_delta"
        ),
    )
    full_v = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_full"),
            F.sum("cents").cast("long").alias("cents_full"),
        )
    )
    # The incremental route runs the four term joins for REAL — separate
    # joins over the pre-split frames, exactly what a refresh executes —
    # so incremental_ok certifies the rewrite, not a tautological
    # partition of one join.
    a0 = o.where(~F.col("o_delta"))
    da = o.where(F.col("o_delta"))
    b0 = li.where(~F.col("l_delta"))
    db = li.where(F.col("l_delta"))

    def _term(left: DataFrame, right: DataFrame, tag: str) -> DataFrame:
        return left.join(right, left.o_orderkey == right.l_orderkey).select(
            "o_orderpriority", "cents", F.lit(tag).alias("term")
        )

    terms = (
        _term(a0, b0, "b")
        .unionAll(_term(da, b0, "da"))
        .unionAll(_term(a0, db, "db"))
        .unionAll(_term(da, db, "dd"))
    )
    incr_v = (
        terms.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_incr"),
            F.sum("cents").cast("long").alias("cents_incr"),
            F.sum((F.col("term") == "b").cast("long")).alias("n_base"),
            F.sum((F.col("term") == "da").cast("long")).alias("n_da_b0"),
            F.sum((F.col("term") == "db").cast("long")).alias("n_a0_db"),
            F.sum((F.col("term") == "dd").cast("long")).alias("n_dadb"),
        )
    )
    return (
        full_v.join(incr_v, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_full",
            "cents_full",
            "n_incr",
            "cents_incr",
            "n_base",
            "n_da_b0",
            "n_a0_db",
            "n_dadb",
            (
                (F.col("n_full") == F.col("n_incr"))
                & (F.col("cents_full") == F.col("cents_incr"))
            ).alias("incremental_ok"),
        )
        .orderBy("o_orderpriority")
    )
