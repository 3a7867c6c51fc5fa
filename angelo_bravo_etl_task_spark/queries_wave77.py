r"""Round-5 wave 77: nucleus (top-p) vocabulary cutoff, stratified
deterministic split.

- topp1: the top-p selection rule (nucleus sampling's data-side twin)
  applied per language: the SMALLEST frequency-ranked prefix of terms
  whose mass reaches p = 0.9 of the stratum's tokens, with BOTH
  defining laws emitted as certified columns — sufficiency (the kept
  prefix reaches 0.9) and minimality (dropping its last term falls
  below 0.9). The threshold compare is the integer cross-product
  cum·10 ≥ 9·total, so no float ever decides membership.
- spl1: the split every training pipeline starts with —
  train/val/test by deterministic md5 bucket, stratified per
  language. Disjointness and exhaustiveness are structural (each doc
  hashes to exactly one bucket); the per-(stratum, split) counts and
  fractions are emitted for the driver hash, and the property layer
  bounds the realized fractions around 80/10/10 and certifies
  assignment stability (membership is a pure function of doc_id —
  re-running or re-sharding cannot move a document between splits).

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no sampling surface; these extend the LLM-pipeline family (vb1/vb2,
sh1, dm1, sm2, mix1) with the selection rule and the split governance
step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# topp1: smallest 0.9-mass frequency prefix per language, laws certified
# =========================================================================

_TOPP1_SQL = r"""
WITH toks AS (
  SELECT lang,
         unnest(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                            t -> LENGTH(t) > 0)) AS term
  FROM documents
), freq AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks GROUP BY lang, term
), ranked AS (
  SELECT lang, f,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY f DESC, term) AS BIGINT) AS rnk,
         CAST(SUM(f) OVER (PARTITION BY lang ORDER BY f DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM freq
), tot AS (
  SELECT lang, CAST(SUM(f) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM freq GROUP BY lang
), cut AS (
  SELECT r.lang, MIN(r.rnk) AS k
  FROM ranked r JOIN tot t ON t.lang = r.lang
  WHERE r.cum * 10 >= 9 * t.total
  GROUP BY r.lang
)
SELECT c.lang, c.k AS n_kept, t.n_terms,
       r.cum AS kept_mass, t.total AS total_mass,
       r.cum / t.total AS kept_frac,
       (r.cum * 10 >= 9 * t.total) AS sufficient_ok,
       (c.k = 1 OR (r.cum - r.f) * 10 < 9 * t.total) AS minimal_ok
FROM cut c
JOIN tot t ON t.lang = c.lang
JOIN ranked r ON r.lang = c.lang AND r.rnk = c.k
"""


@_register("topp1_nucleus_cutoff", _TOPP1_SQL)
def topp1_nucleus_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) cutoff per language stratum: the smallest
    frequency-ranked term prefix whose token mass reaches p = 0.9, with
    both defining laws hash-certified per row — `sufficient_ok` (the
    prefix reaches p) and `minimal_ok` (the prefix minus its last term
    does NOT), which together pin k exactly; membership is decided by
    the integer cross-product cum·10 ≥ 9·total, never a float. The
    aggregate-first discipline (vb1/vb2's rule): the corpus costs one
    explode + one combinable (lang, term) count; ranking, prefix sums,
    and the min-rank cut all run over the vocab-sized frequency frame
    partitioned BY LANG — no global window, every stratum ranks in
    parallel. kept_frac is one IEEE division of exact BIGINTs. At
    100 TB the frequency frame is the only shuffle that matters and it
    is key-partitioned; the cut join broadcasts the per-lang totals."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("term"),
    )
    freq = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("lang").orderBy(F.col("f").desc(), "term")
    ranked = freq.select(
        "lang",
        F.col("f").cast("bigint").alias("f"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("f")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    tot = freq.groupBy("lang").agg(
        F.sum("f").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    cut = (
        ranked.join(F.broadcast(tot), "lang")
        .where(F.col("cum") * 10 >= 9 * F.col("total"))
        .groupBy("lang")
        .agg(F.min("rnk").alias("k"))
    )
    return (
        F.broadcast(cut)
        .join(tot, "lang")
        .join(
            ranked,
            ["lang"],
        )
        .where(F.col("rnk") == F.col("k"))
        .select(
            "lang",
            F.col("k").alias("n_kept"),
            "n_terms",
            F.col("cum").alias("kept_mass"),
            F.col("total").alias("total_mass"),
            (F.col("cum") / F.col("total")).alias("kept_frac"),
            (F.col("cum") * 10 >= 9 * F.col("total")).alias("sufficient_ok"),
            (
                (F.col("k") == 1)
                | ((F.col("cum") - F.col("f")) * 10 < 9 * F.col("total"))
            ).alias("minimal_ok"),
        )
    )


# =========================================================================
# spl1: stratified deterministic train/val/test split
# =========================================================================

_SPL1_SQL = """
WITH b AS (
  SELECT lang,
         CAST('0x' || substr(md5('spl:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS bucket
  FROM documents
), tagged AS (
  SELECT lang,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM b
), per AS (
  SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n
  FROM tagged GROUP BY lang, split
), tot AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS stratum_total FROM per GROUP BY lang
)
SELECT p.lang, p.split, p.n, t.stratum_total,
       p.n / t.stratum_total AS frac
FROM per p JOIN tot t ON t.lang = p.lang
"""


@_register("spl1_stratified_split", _SPL1_SQL)
def spl1_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split — the governance
    step ahead of every training run: each doc's split is a pure
    function of its id (md5 bucket mod 100 → 80/10/10), so membership
    is stable under re-runs, re-sharding, and corpus growth (old docs
    never migrate), and disjoint-exhaustive by construction. Stratified
    reporting per language: counts, stratum totals, and the realized
    fraction (IEEE division of exact BIGINTs) — the table a data-ops
    review signs off on. The property layer bounds realized fractions
    around the 80/10/10 design and replays membership stability. Plan
    shape: one map-side hash + one combinable (lang, split) count; the
    stratum-total join is vocab-sized. At 100 TB the split column is
    computed at ingest for free and this audit is one aggregate."""
    d = _t(spark, sf_dir, "documents")
    h8 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("spl:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    tagged = d.select(
        "lang",
        F.when(h8 % 100 < 80, "train")
        .when(h8 % 100 < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    per = tagged.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = per.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("stratum_total")
    )
    return per.join(F.broadcast(tot), "lang").select(
        "lang",
        "split",
        "n",
        "stratum_total",
        (F.col("n") / F.col("stratum_total")).alias("frac"),
    )
