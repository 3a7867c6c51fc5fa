"""Round-3 wave 52: Kadane max subarray, LZ78 dictionary build.

- kad1: maximum-subarray sum by Kadane's fold, oracle-checked against
  the PREFIX-SUM WINDOW form (best = max over j of P_j - min(P_i, i<j))
  — the mdq1 pattern again: one answer from an O(n) algorithmic fold
  and from pure declarative windows.
- lz1: LZ78 phrase-dictionary construction over document prefixes —
  the third tokenizer-lifecycle member (bpe2 learns merges, wp1
  applies a vocab, lz1 builds the classic adaptive dictionary), with
  the phrase count as the compressibility readout beside lcp1/huff1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# kad1: Kadane's maximum subarray (fold) vs prefix-min windows (oracle)
# =========================================================================

_KAD1_SQL = """
WITH seq AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5('kv' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 201 - 100 AS BIGINT) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), pre AS (
  SELECT user_id, i,
         SUM(v) OVER (PARTITION BY user_id ORDER BY i) AS p,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM seq
), best AS (
  SELECT user_id, n,
         p - LEAST(COALESCE(MIN(p) OVER (PARTITION BY user_id ORDER BY i
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0), 0) AS cand
  FROM pre
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(MAX(cand) AS BIGINT) AS max_subarray
FROM best
WHERE n >= 10
GROUP BY user_id, n
"""


@_register("kad1_max_subarray", _KAD1_SQL)
def kad1_max_subarray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-subarray sum (Kadane) over each user's signed md5 value
    trace (values in [-100, 100], first 30, the P&L / burst-detection
    primitive): Spark runs the O(n) FOLD — cur = max(v, cur+v), best =
    max(best, cur) — while the oracle computes the same answer from
    pure WINDOWS: best = max over j of (prefix_j - min(prefix_i, i<j,
    including the empty prefix 0)). Two paradigms, one answer — the
    mdq1 cross-check pattern — plus a brute-force O(n^2) sweep in the
    property layer as the third implementation. Subarrays must be
    non-empty (a user whose every value is negative reports the max
    single value)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kv"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 201
            - 100
        ).alias("v"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "v"))),
            lambda st: st["v"],
        ).alias("vals"),
    ).where(F.col("n") >= 10)
    acc0 = F.expr(
        "named_struct('best', CAST(-1000000000000 AS BIGINT),"
        " 'cur', CAST(-1000000000000 AS BIGINT))"
    )

    def step(acc, v):
        cur = F.greatest(v, acc["cur"] + v)
        return F.struct(
            F.greatest(acc["best"], cur).alias("best"), cur.alias("cur")
        )

    folded = packed.select(
        "user_id",
        "n",
        F.aggregate("vals", acc0, step)["best"].alias("max_subarray"),
    )
    return folded.select("user_id", F.col("n").cast("bigint").alias("n"), "max_subarray")


# =========================================================================
# lz1: LZ78 dictionary construction
# =========================================================================

_LZ1_SQL = """
WITH RECURSIVE docs AS (
  SELECT doc_id, substr(text, 1, 40) AS s, LENGTH(substr(text, 1, 40)) AS ln
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)
  WHERE LENGTH(substr(text, 1, 40)) >= 10
), r AS (
  SELECT doc_id, s, ln, CAST(0 AS BIGINT) AS i,
         CAST([] AS VARCHAR[]) AS dict, '' AS cur
  FROM docs
  UNION ALL
  SELECT doc_id, s, ln, i + 1,
         CASE WHEN list_contains(dict, cur || substr(s, CAST(i + 1 AS INTEGER), 1))
              THEN dict
              ELSE list_append(dict,
                     cur || substr(s, CAST(i + 1 AS INTEGER), 1)) END,
         CASE WHEN list_contains(dict, cur || substr(s, CAST(i + 1 AS INTEGER), 1))
              THEN cur || substr(s, CAST(i + 1 AS INTEGER), 1)
              ELSE '' END
  FROM r WHERE i < ln
), final AS (
  SELECT doc_id, ln, dict, cur,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT doc_id, CAST(ln AS BIGINT) AS n_chars,
       CAST(len(dict) AS BIGINT) AS n_phrases,
       cur AS tail_phrase,
       coalesce(array_to_string(dict, chr(31)), '') AS dictionary
FROM final WHERE rn = 1
"""


@_register("lz1_lz78_dictionary", _LZ1_SQL)
def lz1_lz78_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZ78 adaptive-dictionary construction over the first 40
    characters of 20 documents: extend the current phrase while it
    (plus the next char) is already in the dictionary, else emit it as
    a NEW dictionary phrase and restart — the classic parse whose
    phrase count is a compressibility measure (repetitive text packs
    into fewer, longer phrases), completing the tokenizer lifecycle
    beside bpe2 (learn merges) and wp1 (apply vocab). The fold state is
    (dict array, current phrase); the full dictionary is emitted joined
    on the unit-separator chr(31) (text can contain any printable
    delimiter). The property layer replays in Python and asserts the
    LZ78 invariants: phrases are unique, and every phrase's proper
    prefix chain is in the dictionary (each phrase = an earlier phrase
    + one char)."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(20)
    )
    docs = d.select(
        "doc_id", F.substring("text", 1, 40).alias("s")
    ).where(F.length("s") >= 10)
    chars = docs.select(
        "doc_id",
        "s",
        F.length("s").cast("bigint").alias("n_chars"),
        F.transform(
            F.sequence(F.lit(1), F.length("s")),
            lambda i: F.col("s").substr(i, F.lit(1)),
        ).alias("cs"),
    )
    acc0 = F.expr(
        "named_struct('dict', CAST(array() AS ARRAY<STRING>), 'cur', '')"
    )

    def step(acc, ch):
        ext = F.concat(acc["cur"], ch)
        known = F.array_contains(acc["dict"], ext)
        return F.struct(
            F.when(known, acc["dict"])
            .otherwise(F.concat(acc["dict"], F.array(ext)))
            .alias("dict"),
            F.when(known, ext).otherwise(F.lit("")).alias("cur"),
        )

    folded = chars.select(
        "doc_id",
        "n_chars",
        F.aggregate("cs", acc0, step).alias("m"),
    )
    return folded.select(
        "doc_id",
        "n_chars",
        F.size(F.col("m.dict")).cast("bigint").alias("n_phrases"),
        F.col("m.cur").alias("tail_phrase"),
        F.array_join(F.col("m.dict"), chr(31)).alias("dictionary"),
    )
