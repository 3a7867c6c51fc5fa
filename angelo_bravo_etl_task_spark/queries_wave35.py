"""Round-3 wave 35: prefix-compression estimation, contrastive negative
sampling, local differential privacy, and the integer-math dialect pin.

- lcp1: front-coding savings — adjacent-in-sort-order longest common
  prefixes, the dictionary-compression estimate a storage layer makes;
  LCP as an in-cell monotone prefix-equality count, no char loops.
- neg1: deterministic negative sampling for contrastive training —
  md5-indexed draws with one salted retry when the draw collides with
  the anchor's own group; every triplet reproducible across engines.
- dp3: randomized response (LOCAL differential privacy — the respondent
  flips the bit, nobody holds the truth) with md5 coins and the exact
  rational debias (4*obs - n)/2 at p=1/4; dp2's central-noise sibling.
- f23: the portable integer-math surface pinned row by row: % sign
  semantics, positive mod, bit and/or/xor, shifts, greatest/least,
  sign/abs — the dialect contract every exact-arithmetic query in this
  registry stands on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# lcp1: front-coding (prefix compression) savings estimate
# =========================================================================

_LCP1_SQL = """
WITH ranked AS (
  SELECT p_brand, p_name,
         LAG(p_name) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey)
           AS prev_name
  FROM part
), lcps AS (
  SELECT p_brand,
         CAST(LENGTH(p_name) AS BIGINT) AS name_len,
         CAST(CASE WHEN prev_name IS NULL THEN 0 ELSE
           len(list_filter(generate_series(1,
                 least(LENGTH(p_name), LENGTH(prev_name))),
               i -> substr(p_name, 1, i) = substr(prev_name, 1, i)))
         END AS BIGINT) AS lcp
  FROM ranked
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_names,
       CAST(SUM(name_len) AS BIGINT) AS total_chars,
       CAST(SUM(lcp) AS BIGINT) AS saved_chars,
       CAST((10000 * SUM(lcp)) // SUM(name_len) AS BIGINT)
         AS savings_pct_x100
FROM lcps GROUP BY p_brand
"""


@_register("lcp1_prefix_compression", _LCP1_SQL)
def lcp1_prefix_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Front-coding savings estimate: sort each brand's part names, take
    the longest common prefix with the PREVIOUS name (one LAG window),
    and total the chars a delta/prefix encoding would elide — the
    decision input for dictionary vs front-coded string storage. The LCP
    itself is an in-cell count of prefix-equal positions (prefix
    equality is monotone in i, so counting equal prefixes IS the LCP —
    no loop, no UDF). Savings are exact integers with a basis-point
    ratio. One sort-window per brand over the name frame; at 100 TB
    this is the per-partition pass a table optimizer runs on sampled
    string columns."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_name", "p_partkey")
    ranked = p.select(
        "p_brand",
        "p_name",
        F.lag("p_name").over(w).alias("prev_name"),
    )
    lcp = F.when(F.col("prev_name").isNull(), 0).otherwise(
        F.expr(
            "size(filter(sequence(1, least(length(p_name),"
            " length(prev_name))),"
            " i -> substr(p_name, 1, CAST(i AS INT))"
            " = substr(prev_name, 1, CAST(i AS INT))))"
        )
    )
    lcps = ranked.select(
        "p_brand",
        F.length("p_name").cast("bigint").alias("name_len"),
        lcp.cast("bigint").alias("lcp"),
    )
    return lcps.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_names"),
        F.sum("name_len").alias("total_chars"),
        F.sum("lcp").alias("saved_chars"),
        F.expr(
            "CAST((10000 * sum(lcp)) div sum(name_len) AS BIGINT)"
        ).alias("savings_pct_x100"),
    )


# =========================================================================
# neg1: deterministic negative sampling for contrastive training
# =========================================================================

_NEG1_SQL = """
WITH docs AS (
  SELECT doc_id, source FROM documents
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM docs
), draws AS (
  SELECT d.doc_id, d.source, j.j,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '_'
                                 || CAST(j.j AS VARCHAR)), 1, 8)
              AS BIGINT) % m.m AS pick1,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '_'
                                 || CAST(j.j AS VARCHAR) || '_r'), 1, 8)
              AS BIGINT) % m.m AS pick2
  FROM docs d, (SELECT UNNEST([1, 2, 3]) AS j) j, m
), resolved AS (
  SELECT dr.doc_id, dr.source, dr.j,
         CASE WHEN n1.source <> dr.source THEN dr.pick1
              WHEN n2.source <> dr.source THEN dr.pick2
              ELSE NULL END AS neg_doc_id
  FROM draws dr
  JOIN docs n1 ON n1.doc_id = dr.pick1
  JOIN docs n2 ON n2.doc_id = dr.pick2
)
SELECT r.doc_id, r.j, r.neg_doc_id, nd.source AS neg_source,
       (r.neg_doc_id IS NOT NULL) AS valid
FROM resolved r
LEFT JOIN docs nd ON nd.doc_id = r.neg_doc_id
"""


@_register("neg1_negative_sampling", _NEG1_SQL)
def neg1_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for contrastive training: each anchor document
    draws 3 negatives by md5 index into the dense doc-id space, with ONE
    salted retry when the draw lands in the anchor's own source group
    (in-group 'negatives' poison contrastive losses) and an honest NULL
    when both draws collide — never a silent substitution. Fully
    deterministic (boot1's resampling rule applied to training-pair
    construction): the same corpus always yields the same triplets, on
    any engine, any cluster layout. Draw resolution is two equi-joins
    against the keyed corpus; the spine explode is in-cell. At 100 TB
    the doc-id space is dense per shard and the same shape runs
    per-shard."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    m = docs.agg(F.count(F.lit(1)).alias("m"))

    def pick(salt: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("_"),
                        F.col("j").cast("string"),
                        F.lit(salt),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint") % F.col("m")

    draws = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            "doc_id",
            "source",
            "j",
            pick("").alias("pick1"),
            pick("_r").alias("pick2"),
        )
    )
    n1 = docs.select(
        F.col("doc_id").alias("pick1"), F.col("source").alias("src1")
    )
    n2 = docs.select(
        F.col("doc_id").alias("pick2"), F.col("source").alias("src2")
    )
    resolved = (
        draws.join(n1, "pick1")
        .join(n2, "pick2")
        .select(
            "doc_id",
            "j",
            F.when(F.col("src1") != F.col("source"), F.col("pick1"))
            .when(F.col("src2") != F.col("source"), F.col("pick2"))
            .alias("neg_doc_id"),
        )
    )
    nd = docs.select(
        F.col("doc_id").alias("neg_doc_id"),
        F.col("source").alias("neg_source"),
    )
    return resolved.join(nd, "neg_doc_id", "left").select(
        "doc_id",
        "j",
        "neg_doc_id",
        "neg_source",
        F.col("neg_doc_id").isNotNull().alias("valid"),
    )


# =========================================================================
# dp3: randomized response (local differential privacy)
# =========================================================================

_DP3_SQL = """
WITH resp AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS truth,
         CASE WHEN CAST('0x' || substr(md5('coin'
                        || CAST(c_custkey AS VARCHAR)), 1, 8)
                   AS BIGINT) % 4 = 0
              THEN 1 - (CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)
              ELSE (CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)
         END AS reported
  FROM customer
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(truth) AS BIGINT) AS true_count,
       CAST(SUM(reported) AS BIGINT) AS observed,
       CAST(4 * SUM(reported) - COUNT(*) AS BIGINT) AS est_num,
       CAST(2 AS BIGINT) AS est_den,
       CAST(ABS((4 * SUM(reported) - COUNT(*)) - 2 * SUM(truth))
            AS BIGINT) AS abs_err_x2
FROM resp
"""


@_register("dp3_randomized_response", _DP3_SQL)
def dp3_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response — LOCAL differential privacy, dp2's sibling
    where the RESPONDENT flips the bit before anyone aggregates (no
    trusted curator ever holds the truth): each customer's bit flips
    with probability 1/4 on a deterministic md5 coin (retry-safe, the
    dp2 keyed-PRF rule), and the collector debiases with the exact
    rational estimate (obs - n/4)/(1/2) = (4*obs - n)/2. True count,
    observed count, estimate numerator/denominator, and the 2x-scaled
    absolute error are all exact integers — the estimator's bias is
    visibly zero in expectation and its realized error is auditable.
    One scan, one combinable aggregate."""
    c = _t(spark, sf_dir, "customer")
    truth = F.when(F.col("c_custkey") % 2 == 0, 1).otherwise(0)
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("coin"), F.col("c_custkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 4
        == 0
    )
    resp = c.select(
        truth.alias("truth"),
        F.when(coin, 1 - truth).otherwise(truth).alias("reported"),
    )
    return resp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("truth").alias("true_count"),
        F.sum("reported").alias("observed"),
        (4 * F.sum("reported") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("est_num"),
        F.lit(2).cast("bigint").alias("est_den"),
        F.abs(
            (4 * F.sum("reported") - F.count(F.lit(1)))
            - 2 * F.sum("truth")
        )
        .cast("bigint")
        .alias("abs_err_x2"),
    )


# =========================================================================
# f23: integer-math dialect surface pin
# =========================================================================

_F23_SQL = """
WITH vals AS (
  SELECT UNNEST(generate_series(-5, 5)) AS a
)
SELECT CAST(a AS BIGINT) AS a,
       CAST(a % 3 AS BIGINT) AS mod_sign,
       CAST(((a % 3) + 3) % 3 AS BIGINT) AS pmod3,
       CAST(a & 6 AS BIGINT) AS band6,
       CAST(a | 1 AS BIGINT) AS bor1,
       CAST(xor(a, 5) AS BIGINT) AS bxor5,
       CAST((a + 8) * 4 AS BIGINT) AS shl2_shifted,
       CAST((a + 8) // 2 AS BIGINT) AS shr1_shifted,
       CAST(GREATEST(a, 0) AS BIGINT) AS gz,
       CAST(LEAST(a, 0) AS BIGINT) AS lz,
       CAST(SIGN(a) AS BIGINT) AS sgn,
       CAST(ABS(a) AS BIGINT) AS absv,
       CAST(SIGN(a) * (ABS(a) // 2) AS BIGINT) AS trunc_div2
FROM vals
"""


@_register("f23_int_math_surface", _F23_SQL)
def f23_int_math_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The integer-math dialect contract pinned row by row over
    [-5, 5]: % sign follows the dividend on BOTH engines (so the
    positive-mod idiom ((a%b)+b)%b is required and verified); bitwise
    and/or/xor agree; shifts are pinned on non-negatives via *4 and
    floor-div-2 (shift semantics on negatives differ in type width, so
    exact-arithmetic queries shift only shifted-positive values); and
    the sign-split truncating division sign(a)*(|a| div 2) — the pca1
    negative-quotient rule (Spark DIV truncates toward zero, DuckDB //
    floors; the sign-split form makes them agree). Every exact-integer
    query in this registry leans on these identities; this row set is
    the executable spec."""
    spine = spark.range(-5, 6).select(F.col("id").cast("bigint").alias("a"))
    a = F.col("a")
    return spine.select(
        a.alias("a"),
        (a % 3).cast("bigint").alias("mod_sign"),
        (((a % 3) + 3) % 3).cast("bigint").alias("pmod3"),
        F.expr("a & 6").cast("bigint").alias("band6"),
        F.expr("a | 1").cast("bigint").alias("bor1"),
        F.expr("a ^ 5").cast("bigint").alias("bxor5"),
        ((a + 8) * 4).cast("bigint").alias("shl2_shifted"),
        F.expr("(a + 8) div 2").cast("bigint").alias("shr1_shifted"),
        F.greatest(a, F.lit(0)).cast("bigint").alias("gz"),
        F.least(a, F.lit(0)).cast("bigint").alias("lz"),
        F.signum(a).cast("bigint").alias("sgn"),
        F.abs(a).cast("bigint").alias("absv"),
        (F.signum(a).cast("bigint") * F.expr("abs(a) div 2"))
        .cast("bigint")
        .alias("trunc_div2"),
    )
