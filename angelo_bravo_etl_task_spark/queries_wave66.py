"""Round-3 wave 66: coin-change DP vs greedy, longest palindrome.

- coin1: minimum-coin change over the deliberately NON-canonical
  system {1, 3, 4} — the DP (array-state fold over amounts) beside
  the greedy largest-coin count, with the divergence flag: greedy is
  suboptimal exactly where the folk algorithm breaks (amount 6:
  greedy 4+1+1, optimal 3+3) — the denomination-design lesson made a
  checkable column.
- lps1: longest palindromic substring of document prefixes by center
  expansion — every center (char and gap) expands while the mirror
  holds, all in one nested in-cell fold; the palindrome-ness and
  maximality of the reported span are property-certified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# coin1: coin change — DP vs greedy on a non-canonical system
# =========================================================================

_COIN1_SQL = """
WITH RECURSIVE amounts AS (
  SELECT CAST(v AS BIGINT) AS amt
  FROM (SELECT unnest(range(1, 31)) AS v)
), dp AS (
  SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS best,
         [CAST(0 AS BIGINT)] AS tbl
  UNION ALL
  SELECT a + 1,
         least(
           CASE WHEN a + 1 >= 1 THEN tbl[CAST(a + 1 AS INTEGER) - 1 + 1] + 1
                ELSE 1000 END,
           CASE WHEN a + 1 >= 3 THEN tbl[CAST(a + 1 AS INTEGER) - 3 + 1] + 1
                ELSE 1000 END,
           CASE WHEN a + 1 >= 4 THEN tbl[CAST(a + 1 AS INTEGER) - 4 + 1] + 1
                ELSE 1000 END),
         list_append(tbl,
           least(
             CASE WHEN a + 1 >= 1 THEN tbl[CAST(a + 1 AS INTEGER) - 1 + 1] + 1
                  ELSE 1000 END,
             CASE WHEN a + 1 >= 3 THEN tbl[CAST(a + 1 AS INTEGER) - 3 + 1] + 1
                  ELSE 1000 END,
             CASE WHEN a + 1 >= 4 THEN tbl[CAST(a + 1 AS INTEGER) - 4 + 1] + 1
                  ELSE 1000 END))
  FROM dp WHERE a < 30
), dpt AS (
  SELECT tbl, ROW_NUMBER() OVER (ORDER BY a DESC) AS rn FROM dp
), greedy AS (
  SELECT amt,
         amt // 4
           + (amt % 4) // 3
           + ((amt % 4) % 3) AS g_coins
  FROM amounts
)
SELECT g.amt AS amount,
       CAST(t.tbl[CAST(g.amt AS INTEGER) + 1] AS BIGINT) AS dp_coins,
       CAST(g.g_coins AS BIGINT) AS greedy_coins,
       g.g_coins > t.tbl[CAST(g.amt AS INTEGER) + 1] AS greedy_suboptimal
FROM greedy g, dpt t
WHERE t.rn = 1
"""


@_register("coin1_change_dp_vs_greedy", _COIN1_SQL)
def coin1_change_dp_vs_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-coin change for amounts 1..30 over the deliberately
    NON-canonical denomination system {1, 3, 4}: the true optimum by
    the classic DP (dp[a] = 1 + min over coins of dp[a-c], the table
    riding an array-state fold), beside the folk GREEDY
    (largest-coin-first count, a closed form here), with the
    greedy_suboptimal flag per amount. On canonical systems (real
    currencies) the two always agree — {1,3,4} is the textbook
    counterexample (amount 6: greedy 4+1+1 = 3 coins, optimal
    3+3 = 2), and the property layer asserts the divergence set is
    exactly the amounts where a brute-force optimum beats greedy —
    the denomination-design audit as a query. `sf_dir` seeds
    determinism only."""
    _ = sf_dir
    acc0 = F.expr("array(CAST(0 AS BIGINT))")

    def step(tbl, a):
        def cand(c):
            return F.when(
                a >= c,
                F.element_at(tbl, (a - c + 1).cast("int")) + 1,
            ).otherwise(F.lit(1000).cast("bigint"))

        best = F.least(cand(F.lit(1)), cand(F.lit(3)), cand(F.lit(4)))
        return F.concat(tbl, F.array(best))

    dpt = spark.range(1).select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(30)).cast("array<bigint>"),
            acc0,
            step,
        ).alias("tbl")
    )
    amounts = spark.range(1, 31).select(F.col("id").cast("bigint").alias("amount"))
    g = amounts.withColumn(
        "greedy_coins",
        (
            F.expr("amount div 4")
            + F.expr("(amount % 4) div 3")
            + (F.col("amount") % 4) % 3
        ).cast("bigint"),
    )
    joined = g.crossJoin(F.broadcast(dpt))
    return joined.select(
        "amount",
        F.element_at("tbl", (F.col("amount") + 1).cast("int")).alias(
            "dp_coins"
        ),
        "greedy_coins",
        (
            F.col("greedy_coins")
            > F.element_at("tbl", (F.col("amount") + 1).cast("int"))
        ).alias("greedy_suboptimal"),
    )


# =========================================================================
# lps1: longest palindromic substring by center expansion
# =========================================================================

_LPS1_SQL = """
WITH docs AS (
  SELECT doc_id, lower(substr(text, 1, 40)) AS s
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 15)
  WHERE LENGTH(substr(text, 1, 40)) >= 10
), centers AS (
  -- center c over 2L-1 positions: odd centers at chars, even at gaps
  SELECT d.doc_id, d.s, c.c
  FROM docs d, (SELECT unnest(range(1, 80)) AS c) c
  WHERE c.c <= 2 * LENGTH(d.s) - 1
), spans AS (
  SELECT doc_id, s, c,
         -- max expansion r such that the window stays a mirror
         coalesce(list_max(list_filter(range(0, 21), r ->
           (c % 2 = 1 AND (c + 1) // 2 - r >= 1
            AND (c + 1) // 2 + r <= LENGTH(s)
            AND len(list_filter(range(0, CAST(r AS BIGINT) + 1), k ->
                  substr(s, CAST((c + 1) // 2 - k AS INTEGER), 1)
                  <> substr(s, CAST((c + 1) // 2 + k AS INTEGER), 1))) = 0)
           OR
           (c % 2 = 0 AND c // 2 - r + 1 >= 1
            AND c // 2 + r <= LENGTH(s) AND r >= 1
            AND len(list_filter(range(1, CAST(r AS BIGINT) + 1), k ->
                  substr(s, CAST(c // 2 - k + 1 AS INTEGER), 1)
                  <> substr(s, CAST(c // 2 + k AS INTEGER), 1))) = 0)
         )), CAST(-1 AS BIGINT)) AS rmax
  FROM centers
), lens AS (
  SELECT doc_id, s, c, rmax,
         CASE WHEN c % 2 = 1 THEN 2 * rmax + 1
              WHEN rmax >= 1 THEN 2 * rmax
              ELSE 1 END AS plen,
         CASE WHEN c % 2 = 1 THEN (c + 1) // 2 - rmax
              WHEN rmax >= 1 THEN c // 2 - rmax + 1
              ELSE (c + 1) // 2 END AS pstart
  FROM spans
), best AS (
  SELECT doc_id, s, plen, pstart,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY plen DESC, pstart, s) AS rn
  FROM lens
)
SELECT doc_id, CAST(plen AS BIGINT) AS pal_len,
       substr(s, CAST(pstart AS INTEGER), CAST(plen AS INTEGER)) AS palindrome
FROM best WHERE rn = 1
"""


@_register("lps1_longest_palindrome", _LPS1_SQL)
def lps1_longest_palindrome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest palindromic substring of 15 lowercased 40-char document
    prefixes by CENTER EXPANSION: all 2L-1 centers (characters and
    gaps) each expand while the mirror condition holds — here the
    max expansion radius is found declaratively (the largest r whose
    whole window mirrors, a filter over radii rather than a loop), and
    the global best takes the longest span with earliest-start
    tiebreak. The property layer verifies the reported string IS a
    palindrome of the reported length and that brute force over all
    substrings finds nothing longer — maximality, the claim that
    matters. Center expansion is O(L^2) bounded by the 40-char prefix;
    Manacher's O(L) exists for unbounded strings, noted not needed."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(15)
    )
    docs = d.select(
        "doc_id", F.lower(F.substring("text", 1, 40)).alias("s")
    ).where(F.length("s") >= 10)
    centers = docs.select(
        "doc_id",
        "s",
        F.explode(
            F.sequence(F.lit(1), 2 * F.length("s") - 1)
        ).alias("c"),
    )

    def mirrors_odd(s, mid, r):
        return ~F.exists(
            F.sequence(F.lit(0), r),
            lambda k: s.substr((mid - k).cast("int"), F.lit(1))
            != s.substr((mid + k).cast("int"), F.lit(1)),
        )

    def mirrors_even(s, left, r):
        return ~F.exists(
            F.sequence(F.lit(1), r),
            lambda k: s.substr((left - k + 1).cast("int"), F.lit(1))
            != s.substr((left + k).cast("int"), F.lit(1)),
        )

    s = F.col("s")
    c = F.col("c")
    odd = c % 2 == 1
    mid = ((c + 1) - (c + 1) % 2) / 2
    mid = mid.cast("bigint")
    left = F.expr("c div 2").cast("bigint")
    rmax = F.coalesce(
        F.array_max(
            F.filter(
                F.sequence(F.lit(0), F.lit(20)).cast("array<bigint>"),
                lambda r: F.when(
                    odd,
                    (mid - r >= 1)
                    & (mid + r <= F.length(s))
                    & mirrors_odd(s, mid, r),
                ).otherwise(
                    (r >= 1)
                    & (left - r + 1 >= 1)
                    & (left + r <= F.length(s))
                    & mirrors_even(s, left, r)
                ),
            )
        ),
        F.lit(-1).cast("bigint"),
    )
    spans = centers.select(
        "doc_id",
        "s",
        "c",
        rmax.alias("rmax"),
    )
    plen = (
        F.when(F.col("c") % 2 == 1, 2 * F.col("rmax") + 1)
        .otherwise(
            F.when(F.col("rmax") >= 1, 2 * F.col("rmax")).otherwise(1)
        )
        .cast("bigint")
    )
    pstart = (
        F.when(
            F.col("c") % 2 == 1,
            ((F.col("c") + 1) - (F.col("c") + 1) % 2) / 2 - F.col("rmax"),
        )
        .otherwise(
            F.when(
                F.col("rmax") >= 1,
                F.expr("c div 2") - F.col("rmax") + 1,
            ).otherwise(((F.col("c") + 1) - (F.col("c") + 1) % 2) / 2)
        )
        .cast("bigint")
    )
    lens = spans.select(
        "doc_id", "s", plen.alias("plen"), pstart.alias("pstart")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("plen").desc(), "pstart", "s"
    )
    best = lens.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return best.select(
        "doc_id",
        F.col("plen").alias("pal_len"),
        F.col("s")
        .substr(F.col("pstart").cast("int"), F.col("plen").cast("int"))
        .alias("palindrome"),
    )
