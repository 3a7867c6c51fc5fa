r"""Round-8 wave 110: training-loader plumbing — deterministic epoch
shuffling (shuf1) and dataset canary watermarking (wmk1).

- shuf1: the physical side of mix2's epoch plan: every epoch needs a
  DIFFERENT, reproducible, globally-uniform permutation of the corpus
  into loader shards. `df.sample`/`rand()` orderings depend on partition
  layout; the portable construction is hash-ordering — position within
  shard = rank of md5('ep<epoch>:' || doc_id). Same recipe at 100 TB:
  the shuffle is one exchange on (epoch, shard), and any worker can
  recompute its shard's order without coordination.
- wmk1: canary injection + retrieval audit (the memorization/leak
  measurement primitive): deterministic canary documents are unioned
  into the corpus, the corpus is fingerprinted, and the audit must find
  EVERY canary by fingerprint with ZERO false positives on real
  documents — certified by the hash because both engines replay the
  same injection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_N_SHARDS = 8

_SHUF1_SQL = f"""
WITH e AS (
  SELECT epoch, doc_id,
         md5('ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
           AS h
  FROM documents CROSS JOIN (SELECT unnest(range(0, 2)) AS epoch)
)
SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % {_N_SHARDS} AS BIGINT)
         AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY epoch,
                      CAST('0x' || substr(h, 1, 8) AS BIGINT) % {_N_SHARDS}
         ORDER BY h, doc_id) AS BIGINT) AS position
FROM e
"""


@_register("shuf1_epoch_shuffle", _SHUF1_SQL)
def shuf1_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle into loader shards.

    For each epoch, every document gets an md5 draw keyed by
    ('ep<epoch>:' || doc_id); the top 32 hex bits mod N_SHARDS pick the
    shard, and the within-shard ORDER is the rank of the full hash
    (tie-break doc_id) — a fresh uniform permutation per epoch that any
    engine reproduces bit-for-bit, unlike rand()/df.sample whose streams
    depend on partition layout (the sm1 lesson, applied to ordering).

    100 TB shape: one exchange keyed (epoch, shard); the rank window
    sorts each shard independently (shards are the parallel unit by
    construction); changing the epoch literal reshuffles everything with
    zero data movement until the loader actually reads. Balance across
    shards is a hash-uniformity consequence — asserted as a relative
    bound in the unit test, and rng1 audits the md5 coin itself."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    e = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    shard = (
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint") % _N_SHARDS
    )
    from .operators.windows import with_row_number

    ranked = with_row_number(
        e.withColumn("shard", shard),
        ["epoch", "shard"],
        [F.col("h").asc(), F.col("doc_id").asc()],
        "position",
    )
    return ranked.select(
        F.col("epoch").cast("bigint").alias("epoch"),
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        F.col("position").cast("bigint").alias("position"),
    )


_N_CANARIES = 25

_WMK1_SQL = f"""
WITH canaries AS (
  SELECT unnest(range(0, {_N_CANARIES})) AS c
), corpus AS (
  SELECT doc_id, text, FALSE AS is_canary FROM documents
  UNION ALL
  SELECT 9000000 + c AS doc_id,
         'CANARY ' || md5('wmk1:' || CAST(c AS VARCHAR)) || ' SEQUENCE'
           AS text,
         TRUE AS is_canary
  FROM canaries
), fp AS (
  SELECT doc_id, is_canary, md5(text) AS fingerprint FROM corpus
), expected AS (
  SELECT md5('CANARY ' || md5('wmk1:' || CAST(c AS VARCHAR)) || ' SEQUENCE')
           AS fingerprint
  FROM canaries
)
SELECT f.doc_id, f.is_canary, f.fingerprint
FROM fp f JOIN expected x ON f.fingerprint = x.fingerprint
"""


@_register("wmk1_canary_audit", _WMK1_SQL)
def wmk1_canary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset canary watermarking + retrieval audit.

    Deterministic canary documents ('CANARY <md5(wmk1:i)> SEQUENCE') are
    unioned into the corpus, everything is content-fingerprinted, and
    the audit joins the fingerprint index against the EXPECTED canary
    fingerprints (recomputed independently — the auditor does not trust
    the injector). The result must contain exactly the N_CANARIES
    planted rows, all flagged is_canary — a real document colliding
    with a canary fingerprint (false positive) or a lost canary (false
    negative) changes the row set and reds the driver hash. This is the
    memorization/leak-measurement primitive: the same audit run against
    a MODEL's generations measures canary regurgitation.

    100 TB shape: injection is a union of a tiny literal frame;
    fingerprinting is the d1 map; the audit is an equi-join of the
    (small, broadcast) expected-fingerprint list against the corpus
    fingerprint index — never a text scan at audit time."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    canaries = spark.range(_N_CANARIES).select(
        (F.lit(9000000) + F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("CANARY "),
            F.md5(F.concat(F.lit("wmk1:"), F.col("id").cast("string"))),
            F.lit(" SEQUENCE"),
        ).alias("text"),
    )
    corpus = d.withColumn("is_canary", F.lit(False)).unionByName(
        canaries.withColumn("is_canary", F.lit(True))
    )
    fp = corpus.select(
        "doc_id", "is_canary", F.md5("text").alias("fingerprint")
    )
    expected = spark.range(_N_CANARIES).select(
        F.md5(
            F.concat(
                F.lit("CANARY "),
                F.md5(F.concat(F.lit("wmk1:"), F.col("id").cast("string"))),
                F.lit(" SEQUENCE"),
            )
        ).alias("fingerprint")
    )
    return fp.join(F.broadcast(expected), "fingerprint").select(
        "doc_id", "is_canary", "fingerprint"
    )
