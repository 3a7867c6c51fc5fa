r"""Round-5 wave 75: vocabulary coverage curve, sequence-length bucket
padding audit.

- vb2: the curve that decides a tokenizer's vocab size — what fraction
  of the corpus token MASS the top-k terms cover, evaluated at
  power-of-two k. vb1 ships the vocab file; vb2 quantifies what any
  truncation of it costs (the OOV rate is 1 − coverage). The per-row
  certificate `avg_bound_ok` (freq_k · k ≤ covered_k — the k-th
  ranked frequency cannot exceed the top-k average) pins the ordering
  is truly by descending frequency; monotone coverage across rows is
  property-tested.
- pk2: the OTHER packing strategy next to pk1's concat-and-chunk —
  power-of-two length bucketing (pad each doc to its snug bucket,
  truncate at the 512 cap), the scheme batch-inference and
  padding-based trainers use. Per bucket: doc count, kept vs padded
  token totals, pad fraction, and the snugness law (every doc's
  length lands in (bucket/2, bucket] unless capped) — the invariant
  that makes bucketing better than pad-to-max, which the property
  layer quantifies against.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no tokenizer surface; these extend the LLM-pipeline family (vb1, pk1,
bud1, ck1, bpe1/bpe2, tx1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# vb2: token-mass coverage at power-of-two vocab sizes
# =========================================================================

_VB2_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                            t -> LENGTH(t) > 0)) AS term
  FROM documents
), freq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY term
), ranked AS (
  SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, term) AS BIGINT) AS rnk,
         CAST(SUM(f) OVER (ORDER BY f DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM freq
), tot AS (
  SELECT CAST(SUM(f) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM freq
), ks AS (
  SELECT CAST(POWER(2, e) AS BIGINT) AS k
  FROM (SELECT unnest(range(0, 11)) AS e)
  WHERE CAST(POWER(2, e) AS BIGINT) <= (SELECT n_terms FROM tot)
)
SELECT ks.k,
       r.f AS freq_k,
       r.cum AS covered_tokens,
       t.total_tokens,
       r.cum / t.total_tokens AS coverage,
       (r.f * ks.k <= r.cum) AS avg_bound_ok
FROM ks JOIN ranked r ON r.rnk = ks.k
CROSS JOIN tot t
"""


@_register("vb2_oov_coverage", _VB2_SQL)
def vb2_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for each power-of-two vocab size k (up
    to the distinct-term count), the token MASS covered by the top-k
    most frequent terms, its IEEE-division coverage ratio, the k-th
    ranked frequency, and the per-row average-bound certificate
    freq_k · k ≤ covered_k (the k-th frequency cannot exceed the top-k
    mean — false the moment the ranking isn't truly frequency-
    descending). 1 − coverage IS the OOV token rate a k-sized vocab
    pays; the curve is what fixes vocab-size budgets. Aggregate-first
    discipline throughout: the corpus costs one explode + one
    combinable count; ranking, prefix sums, and the ~11 k-probes all
    run over the vocab-sized frequency frame (the vb1/ord1 rule — the
    window never touches the corpus). At 100 TB the frequency table is
    millions of rows against trillions of tokens; everything after the
    first aggregate is cheap. Exact BIGINT counts; the only double is
    the final division."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), "term")
    ranked = freq.select(
        F.col("f").cast("bigint").alias("f"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("f")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    tot = freq.agg(
        F.sum("f").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    ks = (
        spark.range(0, 11)
        .select(F.pow(F.lit(2), F.col("id")).cast("bigint").alias("k"))
        .crossJoin(F.broadcast(tot.select("n_terms")))
        .where(F.col("k") <= F.col("n_terms"))
        .select("k")
    )
    return (
        F.broadcast(ks)
        .join(ranked, ks["k"] == ranked["rnk"])
        .crossJoin(F.broadcast(tot.select("total_tokens")))
        .select(
            "k",
            F.col("f").alias("freq_k"),
            F.col("cum").alias("covered_tokens"),
            "total_tokens",
            (F.col("cum") / F.col("total_tokens")).alias("coverage"),
            (F.col("f") * F.col("k") <= F.col("cum")).alias("avg_bound_ok"),
        )
    )


# =========================================================================
# pk2: power-of-two length buckets with the snugness law
# =========================================================================

_PK2_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(LENGTH(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                 t -> LENGTH(t) > 0)) AS BIGINT) AS n_tokens
  FROM documents
), bucketed AS (
  SELECT doc_id, n_tokens,
         LEAST(n_tokens, 512) AS kept,
         CASE WHEN n_tokens <= 8 THEN 8
              WHEN n_tokens <= 16 THEN 16
              WHEN n_tokens <= 32 THEN 32
              WHEN n_tokens <= 64 THEN 64
              WHEN n_tokens <= 128 THEN 128
              WHEN n_tokens <= 256 THEN 256
              ELSE 512 END AS bucket
  FROM toks WHERE n_tokens > 0
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_len,
       CAST(MAX(n_tokens) AS BIGINT) AS max_len,
       CAST(SUM(kept) AS BIGINT) AS kept_tokens,
       CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
       1.0 - CAST(SUM(kept) AS BIGINT) / CAST(COUNT(*) * bucket AS BIGINT)
         AS pad_frac,
       (MAX(LEAST(n_tokens, 512)) <= bucket
        AND (bucket = 8 OR MIN(n_tokens) * 2 > bucket
             OR bucket = 512)) AS snug_ok
FROM bucketed
GROUP BY bucket
"""


@_register("pk2_length_buckets", _PK2_SQL)
def pk2_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two sequence-length bucketing — the padding-based
    alternative to pk1's concat-and-chunk: each doc pads to the
    smallest bucket in {8,16,...,512} that holds it (truncating at the
    512 cap), so a batch mixes only same-bucket rows and the pad waste
    is bounded by half the bucket. Per bucket: doc count, length range,
    kept vs padded token totals, the pad fraction (one IEEE division
    of exact BIGINTs), and the snugness law — every doc's capped
    length fits the bucket AND (except the smallest and the capped
    bucket) exceeds half of it, the invariant that bounds pad_frac
    below 1/2 and makes bucketing beat pad-to-max (quantified in the
    property layer). The CASE ladder is branch-identical in both
    engines — no log2 (libm-free discipline). Plan shape: tokenize
    map-side, one combinable aggregate by bucket; at 100 TB this is a
    single shuffle of 7 groups' partials."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    ).cast("bigint")
    toks = d.select("doc_id", n_tokens.alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    bucket = (
        F.when(F.col("n_tokens") <= 8, 8)
        .when(F.col("n_tokens") <= 16, 16)
        .when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .when(F.col("n_tokens") <= 256, 256)
        .otherwise(512)
    )
    b = toks.select(
        "n_tokens",
        F.least(F.col("n_tokens"), F.lit(512)).alias("kept"),
        bucket.cast("bigint").alias("bucket"),
    )
    agg = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_len"),
        F.max("n_tokens").alias("max_len"),
        F.sum("kept").cast("bigint").alias("kept_tokens"),
        F.max("kept").alias("max_kept"),
    )
    padded = (F.col("n_docs") * F.col("bucket")).cast("bigint")
    return agg.select(
        "bucket",
        "n_docs",
        "min_len",
        "max_len",
        "kept_tokens",
        padded.alias("padded_tokens"),
        (F.lit(1.0) - F.col("kept_tokens") / padded).alias("pad_frac"),
        (
            (F.col("max_kept") <= F.col("bucket"))
            & (
                (F.col("bucket") == 8)
                | (F.col("min_len") * 2 > F.col("bucket"))
                | (F.col("bucket") == 512)
            )
        ).alias("snug_ok"),
    )
