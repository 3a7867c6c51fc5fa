"""Round-3 wave 63: Viterbi decoding, KMP failure function.

- hmm1: Viterbi decoding of a 2-state HMM over each user's first 6
  observations — log-free: transition/emission weights are small
  integers and path scores are their exact BIGINT products, compared
  directly (the portable-arithmetic answer to 'Viterbi needs log
  space'); the property layer brute-forces ALL 2^6 state paths to
  certify the max.
- kmp1: the Knuth-Morris-Pratt failure function built as a fold, plus
  occurrence counting with it — cross-checked against the ENGINE's own
  substring counter ((len(text) - len(replace(text, pat, '')) /
  len(pat)) — the two-paradigm device applied to string matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# hmm1: Viterbi with exact integer products
# =========================================================================

_HMM1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id,
         CAST(CASE WHEN event_type IN ('click', 'purchase')
              THEN 1 ELSE 0 END AS BIGINT) AS ob,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 6
), packed AS (
  SELECT user_id, list(ob ORDER BY i) AS obs, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) = 6
), r AS (
  -- state 0 = 'browse' (emits 0 with weight 7, 1 with weight 3)
  -- state 1 = 'buy'    (emits 0 with weight 2, 1 with weight 8)
  -- transitions: 0->0:8 0->1:2 1->0:4 1->1:6 ; start: 5/5
  SELECT user_id, obs, n, CAST(1 AS BIGINT) AS i,
         CAST(5 * CASE WHEN obs[1] = 0 THEN 7 ELSE 3 END AS BIGINT) AS s0,
         CAST(5 * CASE WHEN obs[1] = 0 THEN 2 ELSE 8 END AS BIGINT) AS s1
  FROM packed
  UNION ALL
  SELECT user_id, obs, n, i + 1,
         greatest(s0 * 8, s1 * 4) * CASE WHEN obs[i + 1] = 0 THEN 7 ELSE 3 END,
         greatest(s0 * 2, s1 * 6) * CASE WHEN obs[i + 1] = 0 THEN 2 ELSE 8 END
  FROM r WHERE i < n
), final AS (
  SELECT user_id, obs, s0, s1,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id,
       array_to_string(list_transform(obs, o -> CAST(o AS VARCHAR)), '')
         AS observations,
       CAST(s0 AS BIGINT) AS best_end_browse,
       CAST(s1 AS BIGINT) AS best_end_buy,
       CAST(greatest(s0, s1) AS BIGINT) AS viterbi_score,
       s1 > s0 AS ends_in_buy
FROM final WHERE rn = 1
"""


@_register("hmm1_viterbi", _HMM1_SQL)
def hmm1_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of a 2-state browse/buy HMM over each user's
    first 6 binary observations (engagement events emit 1), LOG-FREE:
    all transition/emission weights are small integers and a path's
    score is their exact product — max 5*8^5*8^6 < 5e10, safely BIGINT
    — so the classic 'work in log space' dodge (and its non-portable
    libm calls) is unnecessary at bounded depth, and max-product
    Viterbi becomes a two-lane integer fold: lane k holds the best
    score of any path ending in state k. The property layer
    brute-forces ALL 64 state paths per user and certifies the max —
    the exhaustive certificate only a tiny state space affords, same
    spirit as jo1's all-parenthesizations check."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.when(F.col("event_type").isin("click", "purchase"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("ob"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 6)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "ob"))),
            lambda s: s["ob"],
        ).alias("obs"),
    ).where(F.col("n") == 6)

    def em0(ob):
        return F.when(ob == 0, F.lit(7)).otherwise(F.lit(3)).cast("bigint")

    def em1(ob):
        return F.when(ob == 0, F.lit(2)).otherwise(F.lit(8)).cast("bigint")

    acc0 = F.expr(
        "named_struct('s0', CAST(-1 AS BIGINT), 's1', CAST(-1 AS BIGINT))"
    )

    def step(acc, ob):
        first = acc["s0"] == -1
        s0 = F.when(first, 5 * em0(ob)).otherwise(
            F.greatest(acc["s0"] * 8, acc["s1"] * 4) * em0(ob)
        )
        s1 = F.when(first, 5 * em1(ob)).otherwise(
            F.greatest(acc["s0"] * 2, acc["s1"] * 6) * em1(ob)
        )
        return F.struct(s0.alias("s0"), s1.alias("s1"))

    folded = packed.select(
        "user_id",
        "obs",
        F.aggregate("obs", acc0, step).alias("v"),
    )
    return folded.select(
        "user_id",
        F.array_join(
            F.transform("obs", lambda o: o.cast("string")), ""
        ).alias("observations"),
        F.col("v.s0").alias("best_end_browse"),
        F.col("v.s1").alias("best_end_buy"),
        F.greatest(F.col("v.s0"), F.col("v.s1")).alias("viterbi_score"),
        (F.col("v.s1") > F.col("v.s0")).alias("ends_in_buy"),
    )


# =========================================================================
# kmp1: KMP failure function + occurrence counting
# =========================================================================

_KMP1_SQL = """
WITH RECURSIVE docs AS (
  SELECT doc_id, substr(text, 1, 60) AS s
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 15)
  WHERE LENGTH(substr(text, 1, 60)) >= 20
), pat AS (
  SELECT doc_id, s, substr(s, 4, 3) AS p FROM docs
), f AS (
  -- failure function of the 3-char pattern, built positionally
  SELECT doc_id, s, p,
         [CAST(0 AS BIGINT),
          CASE WHEN substr(p, 2, 1) = substr(p, 1, 1)
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END,
          CASE WHEN substr(p, 3, 1) = substr(p,
                 CASE WHEN substr(p, 2, 1) = substr(p, 1, 1) THEN 2 ELSE 1 END,
                 1)
               THEN CASE WHEN substr(p, 2, 1) = substr(p, 1, 1)
                         THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END
               WHEN substr(p, 3, 1) = substr(p, 1, 1) THEN CAST(1 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END] AS fail
  FROM pat
)
SELECT doc_id, p AS pattern,
       array_to_string(list_transform(fail, x -> CAST(x AS VARCHAR)), '/')
         AS failure_fn,
       CAST((LENGTH(s) - LENGTH(replace(s, p, ''))) // LENGTH(p) AS BIGINT)
         AS n_occurrences
FROM f
"""


@_register("kmp1_failure_function", _KMP1_SQL)
def kmp1_failure_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMP failure function (longest proper prefix that is also a
    suffix, per pattern position) built by the textbook fold for a
    3-char pattern drawn from each document (chars 4-6), emitted
    beside the document's occurrence count of that pattern — counted
    NOT by KMP but by the engines' own replace() arithmetic
    ((len - len(remove(pat)))/len(pat)), so the failure function's
    correctness and the match count come from independent machinery
    (the two-paradigm device on strings). The property layer runs the
    full KMP MATCHER in Python with this failure function and checks
    it finds exactly the same count as str.count-with-overlap
    adjusted to replace()'s non-overlapping semantics — plus the
    failure-function defining property prefix==suffix at every
    position. The Spark side builds fail[] with the same general fold
    that would extend to any pattern length."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(15)
    )
    docs = d.select(
        "doc_id", F.substring("text", 1, 60).alias("s")
    ).where(F.length("s") >= 20)
    pat = docs.withColumn("p", F.substring("s", 4, 3))

    # general KMP failure-function fold (works for any length)
    def failure(p):
        acc0 = F.expr(
            "named_struct('fail', array(CAST(0 AS BIGINT)),"
            " 'k', CAST(0 AS BIGINT))"
        )

        def step(acc, i):
            ch = p.substr(i.cast("int"), F.lit(1))
            # at most 2 fallback hops needed for a 3-char pattern; the
            # inner bounded loop generalizes (iso1's device)
            k = F.aggregate(
                F.sequence(F.lit(1), F.lit(3)),
                acc["k"],
                lambda kk, _j: F.when(
                    (kk > 0)
                    & (p.substr((kk + 1).cast("int"), F.lit(1)) != ch),
                    F.element_at(acc["fail"], kk.cast("int")),
                ).otherwise(kk),
            )
            k2 = F.when(
                p.substr((k + 1).cast("int"), F.lit(1)) == ch, k + 1
            ).otherwise(F.lit(0).cast("bigint"))
            return F.struct(
                F.concat(acc["fail"], F.array(k2)).alias("fail"),
                k2.alias("k"),
            )

        return F.aggregate(
            F.sequence(F.lit(2), F.length(p)), acc0, step
        )["fail"]

    occurrences = (
        (F.length("s") - F.length(F.replace(F.col("s"), F.col("p"))))
        / F.length("p")
    ).cast("bigint")
    return pat.select(
        "doc_id",
        F.col("p").alias("pattern"),
        F.array_join(
            F.transform(failure(F.col("p")), lambda x: x.cast("string")), "/"
        ).alias("failure_fn"),
        occurrences.alias("n_occurrences"),
    )
