r"""Round-7 wave 96: perplexity-band filtering — the one named LLM-curation
stage the registry did not yet carry.

Real pipelines (CCNet, Gopher/MassiveText, RefinedWeb) score every document
with a small n-gram language model (KenLM) and drop the tails: very LOW
perplexity is boilerplate/templated text, very HIGH perplexity is garbled or
non-linguistic content. The *model* here is a deterministic stub — per-bigram
surprisal derived from md5, the registry's standard portable coin (rng1
audits its uniformity) — because no LM weights exist in this container, but
everything the engine is responsible for is real and exactly the 100 TB
shape: tokenize → per-bigram score → per-document mean in EXACT integer
centinats → corpus-relative threshold → band labels. Swapping the stub for a
KenLM Pandas UDF changes one zip_with lambda, nothing else.

Design rules this wave inherits from hard-won registry discipline:

- Integer-exact end to end (no libm, no float accumulation): surprisal is
  ``1 + md5_24bit(prev, cur) % 8192`` centinats, means use truncating
  integer division (positive operands — the Spark ``DIV`` / DuckDB ``//``
  trap on negatives never arises).
- Data-derived threshold (the x3/dp2 planting rule): the predictable /
  surprising cut is the corpus mean, never an absolute constant that goes
  vacuous when the driver regenerates data; the 'short' branch is PLANTED
  by truncating every ``doc_id % 97 == 0`` document to one token,
  identically in both engines, so all three labels provably fire at every
  SF.
- Bounded release: a 3-row per-label aggregate (counts + exact integer sums
  + min/max + the threshold used), never the per-doc frame.

Reference parity note: the reference (Angelo_ETL_Task.py:245-258) filters
rows on NOT-NULL constraints only; content-quality filtering is part of the
extension surface BASELINE.json line 6 mandates (text analysis / curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.partitioning import spread
from .queries import _register, _t

# =========================================================================
# ppl1: perplexity-band filter over a deterministic bigram-surprisal LM
# =========================================================================

_PPL1_SQL = r"""
WITH raw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))),
                                           '\s+'),
                     t -> LENGTH(t) > 0) AS toks0
  FROM documents
), planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 THEN list_slice(toks0, 1, 1)
              ELSE toks0 END AS toks
  FROM raw
), scored AS (
  SELECT doc_id,
         CAST(GREATEST(LEN(toks) - 1, 0) AS BIGINT) AS n_bigrams,
         CASE WHEN LEN(toks) >= 2 THEN CAST(COALESCE(list_sum(
                list_transform(range(2, LEN(toks) + 1),
                  i -> 1 + CAST('0x' || substr(
                             md5(toks[i-1] || chr(1) || toks[i]), 1, 6)
                           AS BIGINT) % 8192)), 0) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS total_centinats
  FROM planted
), means AS (
  SELECT doc_id, n_bigrams,
         CASE WHEN n_bigrams >= 1
              THEN total_centinats // n_bigrams END AS mean_centinats
  FROM scored
), thr AS (
  SELECT CAST(CAST(SUM(mean_centinats) AS BIGINT) // COUNT(*) AS BIGINT) AS g
  FROM means WHERE n_bigrams >= 1
)
SELECT CASE WHEN n_bigrams = 0 THEN 'short'
            WHEN mean_centinats < (SELECT g FROM thr) THEN 'predictable'
            ELSE 'surprising' END AS label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(mean_centinats), 0) AS BIGINT)
         AS sum_mean_centinats,
       CAST(COALESCE(MIN(mean_centinats), -1) AS BIGINT)
         AS min_mean_centinats,
       CAST(COALESCE(MAX(mean_centinats), -1) AS BIGINT)
         AS max_mean_centinats,
       CAST((SELECT g FROM thr) AS BIGINT) AS threshold_centinats
FROM means
GROUP BY 1
"""


@_register("ppl1_perplexity_band_filter", _PPL1_SQL)
def ppl1_perplexity_band_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perplexity-band document filter with a deterministic bigram LM stub.

    Per token transition the 'model' charges ``1 + md5_24bit(prev·0x01·cur)
    % 8192`` centinats of surprisal (md5 = the registry's audited uniform
    coin, rng1); a document's score is the TRUNCATING-integer mean over its
    bigrams — exact, order-insensitive arithmetic both engines reproduce
    bit-for-bit, where a real pipeline would put KenLM log10-probs. Labels:
    'short' (no bigrams — planted by truncating ``doc_id % 97 == 0`` docs
    to one token so the branch fires at every SF), 'predictable' (below the
    corpus-mean threshold — boilerplate in a real feed), 'surprising' (the
    garbled tail). The threshold is data-derived (corpus mean via ``DIV``),
    so no driver regeneration can make the bands vacuous, and it travels as
    a broadcast 1-row frame — the corpus-scalar idiom every tx query uses.

    100 TB shape: tokenize + zip_with-score + aggregate-fold are pure
    Column expressions (whole-stage codegen, zero Python); the only wide
    operations are one 1-row threshold aggregate and one 3-row label
    aggregate — both map-side-combined. ``spread()`` first: the scoring is
    compute-heavy and the testdata files arrive as one scan partition. The
    per-bigram hash work is embarrassingly parallel and never shuffles.
    """
    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks0 = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda t: F.length(t) > 0,
    )
    toks = F.when(
        F.col("doc_id") % 97 == 0, F.slice(toks0, 1, 1)
    ).otherwise(toks0)
    scored = d.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.greatest(F.size("toks") - 1, F.lit(0))
        .cast("bigint")
        .alias("n_bigrams"),
        F.aggregate(
            F.zip_with(
                F.slice(
                    F.col("toks"), 1,
                    F.greatest(F.size("toks") - 1, F.lit(0)),
                ),
                F.slice(
                    F.col("toks"), 2,
                    F.greatest(F.size("toks") - 1, F.lit(0)),
                ),
                lambda p, c: F.lit(1).cast("bigint")
                + F.conv(
                    F.substring(
                        F.md5(F.concat(p, F.lit("\x01"), c)), 1, 6
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 8192,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_centinats"),
    )
    means = scored.select(
        "doc_id",
        "n_bigrams",
        F.when(
            F.col("n_bigrams") >= 1,
            F.expr("total_centinats DIV n_bigrams"),
        ).alias("mean_centinats"),
    )
    thr = (
        means.where(F.col("n_bigrams") >= 1)
        .agg(
            F.sum("mean_centinats").cast("bigint").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(F.expr("s DIV c").cast("bigint").alias("g"))
    )
    labeled = means.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("n_bigrams") == 0, F.lit("short"))
        .when(F.col("mean_centinats") < F.col("g"), F.lit("predictable"))
        .otherwise(F.lit("surprising"))
        .alias("label"),
        "mean_centinats",
        "g",
    )
    return labeled.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("mean_centinats"), F.lit(0))
        .cast("bigint")
        .alias("sum_mean_centinats"),
        F.coalesce(F.min("mean_centinats"), F.lit(-1))
        .cast("bigint")
        .alias("min_mean_centinats"),
        F.coalesce(F.max("mean_centinats"), F.lit(-1))
        .cast("bigint")
        .alias("max_mean_centinats"),
        F.min("g").cast("bigint").alias("threshold_centinats"),
    )
