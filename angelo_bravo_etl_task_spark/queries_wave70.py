r"""Round-3 wave 70: exact-rational BM25, deterministic interleaving eval.

- bm25_1: the retrieval baseline every RAG pipeline starts from, with
  BOTH of BM25's defining behaviors — tf saturation (k1) and document-
  length normalization (b) — and ZERO floating point. The trick: with
  k1 = 1.2 and b = 0.75, the per-term score tf·(k1+1) / (tf + k1·(1−b
  + b·dl/avgdl)) multiplied out over avgdl = L/N becomes the exact
  integer rational 22·tf·L / (10·L·tf + 3·L + 9·N·dl), so one positive
  integer DIV per (doc, term) — truncation identical on both engines —
  replaces the libm-laden float form, and the per-doc score is an
  exact BIGINT sum (ir1's integer-idf discipline extended to the full
  BM25 numerator/denominator algebra).
- il1: slot-merge interleaving — the deterministic core of online
  ranker A/B evaluation. Two rankers over lineitem (revenue vs
  quantity) emit top-12 lists; ranker A's k-th item claims slot 2k−1,
  B's claims slot 2k, first-occurrence dedup keeps the minimum slot,
  and the within-source order-preservation law (the property team-
  draft interleaving must satisfy) is certified as a column via one
  lag window per source.

Reference parity note: the reference script (Angelo_ETL_Task.py) has no
retrieval surface; these extend the retrieval family (ir1, tx10, rrf1,
ndcg1, px5) with the scoring function production search actually uses
and the evaluation transform that compares two of them online.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# bm25_1: BM25 top-10 in exact integer arithmetic
# =========================================================================

_BM25_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                            t -> LENGTH(t) > 0)) AS term
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
), doclen AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS BIGINT) AS l FROM doclen
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term
), query AS (
  SELECT term, df FROM (
    SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rnk
    FROM df
  ) WHERE rnk BETWEEN 8 AND 13
), scored AS (
  SELECT p.doc_id,
         CAST(SUM((LEAST((s.n * 1000) // q.df, 100000)
                   * CAST(22 AS HUGEINT) * LEAST(p.tf, 100000) * s.l)
                  // (CAST(10 AS HUGEINT) * s.l * LEAST(p.tf, 100000)
                      + 3 * s.l + 9 * s.n * d.dl))
              AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         CAST(MAX(d.dl) AS BIGINT) AS dl
  FROM query q
  JOIN postings p ON p.term = q.term
  JOIN doclen d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, score, n_terms_hit, dl, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT doc_id, score, n_terms_hit, dl,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 10
"""


@_register("bm25_1_ranked_retrieval", _BM25_SQL)
def bm25_1_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-10 over the documents corpus with the
    entire score in exact BIGINT arithmetic. Per (doc, term):
    LEAST((N·1000) DIV df, 100000) · 22·tf·L DIV (10·L·tf + 3·L + 9·N·dl)
    — the closed-form of idf · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl)) after
    substituting avgdl = L/N and clearing denominators, so saturation
    AND length normalization survive intact while every operation is an
    exact integer (positive DIV truncates identically cross-engine).
    Overflow is bounded IN-CODE, not by assumption: the idf factor is
    capped at 1e5, tf is capped at 1e5 via LEAST in both engines (BM25's
    tf term saturates toward k1+1 anyway, so capping a pathological 1e5+
    term count changes nothing material), and the products run in
    128-bit integer arithmetic — Spark DECIMAL(38,0), DuckDB HUGEINT —
    because int64 is NOT enough at corpus scale: the capped numerator
    1e5·22·1e5·L passes 2^63 once L > 4.2e7 tokens. In decimal128 it
    holds to L ≈ 4.5e26 tokens; DIV on positive decimals truncates
    identically cross-engine and returns BIGINT (property-tested with
    adversarial tf up to 1e12 at a simulated 4e10-token corpus). The shape is
    the serving shape: a 6-term broadcast query hits the postings index
    by term equi-join, doc lengths join on doc_id, the 1-row corpus
    stats broadcast, scores are one map-side-combinable aggregate, and
    the top-k carries a total-order tiebreak. At 100 TB postings and
    doclen are both bucketed by their join keys and the query touches
    six term buckets."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    ).persist()
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    )
    df_ = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w_df = Window.orderBy(F.col("df").desc(), "term")
    query = (
        df_.withColumn("rnk", F.row_number().over(w_df))
        .where(F.col("rnk").between(8, 13))
        .select("term", "df")
    )
    term_score = F.expr(
        "(LEAST((n * 1000) DIV df, 100000)"
        " * CAST(22 AS DECIMAL(38,0)) * LEAST(tf, 100000) * l)"
        " DIV (CAST(10 AS DECIMAL(38,0)) * l * LEAST(tf, 100000)"
        " + 3 * l + 9 * n * dl)"
    )
    scored = (
        postings.join(F.broadcast(query), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(term_score).cast("bigint").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
            F.max("dl").cast("bigint").alias("dl"),
        )
    )
    w_rank = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= 10)
        .select(
            "doc_id",
            "score",
            "n_terms_hit",
            "dl",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


# =========================================================================
# il1: slot-merge interleaving of two rankers
# =========================================================================

_IL1_SQL = """
WITH agg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
), rank_a AS (
  SELECT l_partkey, rnk FROM (
    SELECT l_partkey,
           ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey) AS rnk
    FROM agg
  ) WHERE rnk <= 12
), rank_b AS (
  SELECT l_partkey, rnk FROM (
    SELECT l_partkey,
           ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey) AS rnk
    FROM agg
  ) WHERE rnk <= 12
), slots AS (
  SELECT l_partkey, 2 * rnk - 1 AS slot, 'A' AS src, rnk FROM rank_a
  UNION ALL
  SELECT l_partkey, 2 * rnk AS slot, 'B' AS src, rnk FROM rank_b
), merged AS (
  SELECT l_partkey,
         CAST(MIN(slot) AS BIGINT) AS slot,
         CASE WHEN MIN(slot) % 2 = 1 THEN 'A' ELSE 'B' END AS src,
         CAST(MAX(CASE WHEN src = 'A' THEN rnk END) AS BIGINT) AS rank_in_a,
         CAST(MAX(CASE WHEN src = 'B' THEN rnk END) AS BIGINT) AS rank_in_b
  FROM slots GROUP BY l_partkey
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY slot) AS BIGINT) AS position,
       l_partkey, src, slot, rank_in_a, rank_in_b,
       COALESCE(CASE WHEN src = 'A' THEN rank_in_a ELSE rank_in_b END
                  > lag(CASE WHEN src = 'A' THEN rank_in_a
                             ELSE rank_in_b END)
                    OVER (PARTITION BY src ORDER BY slot),
                TRUE) AS order_ok
FROM merged
ORDER BY position
"""


@_register("il1_slot_interleave", _IL1_SQL)
def il1_slot_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic slot-merge interleaving of two part rankers
    (revenue vs total quantity, each top-12 with a l_partkey tiebreak):
    ranker A's k-th result claims slot 2k−1, B's claims slot 2k, parts
    appearing in both lists keep their EARLIEST slot (first-occurrence
    dedup — A wins rank ties because 2k−1 < 2k), and final positions
    re-rank by surviving slot. order_ok certifies the law interleaving
    must satisfy for unbiased online comparison: restricted to either
    source, positions preserve that source's own ranking order (lag per
    src partition, vacuously true at each source's first row). Both
    ranker scores are exact (DECIMAL sum → terminal double; BIGINT
    quantity sum). Everything after the one groupBy on l_partkey is
    constant-size (≤ 24 rows), so the interleave itself costs nothing
    at any scale — the pattern online search evals run per query."""
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    w_a = Window.orderBy(F.col("revenue").desc(), "l_partkey")
    w_b = Window.orderBy(F.col("qty").desc(), "l_partkey")
    rank_a = (
        agg.withColumn("rnk", F.row_number().over(w_a))
        .where(F.col("rnk") <= 12)
        .select("l_partkey", "rnk")
    )
    rank_b = (
        agg.withColumn("rnk", F.row_number().over(w_b))
        .where(F.col("rnk") <= 12)
        .select("l_partkey", "rnk")
    )
    slots = rank_a.select(
        "l_partkey",
        (F.lit(2) * F.col("rnk") - 1).alias("slot"),
        F.lit("A").alias("src"),
        "rnk",
    ).unionAll(
        rank_b.select(
            "l_partkey",
            (F.lit(2) * F.col("rnk")).alias("slot"),
            F.lit("B").alias("src"),
            "rnk",
        )
    )
    merged = slots.groupBy("l_partkey").agg(
        F.min("slot").cast("long").alias("slot"),
        F.when(F.min("slot") % 2 == 1, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("src"),
        F.max(F.when(F.col("src") == "A", F.col("rnk")))
        .cast("long")
        .alias("rank_in_a"),
        F.max(F.when(F.col("src") == "B", F.col("rnk")))
        .cast("long")
        .alias("rank_in_b"),
    )
    own_rank = F.when(F.col("src") == "A", F.col("rank_in_a")).otherwise(
        F.col("rank_in_b")
    )
    w_src = Window.partitionBy("src").orderBy("slot")
    return (
        merged.select(
            F.row_number()
            .over(Window.orderBy("slot"))
            .cast("long")
            .alias("position"),
            "l_partkey",
            "src",
            "slot",
            "rank_in_a",
            "rank_in_b",
            F.coalesce(
                own_rank > F.lag(own_rank).over(w_src), F.lit(True)
            ).alias("order_ok"),
        )
        .orderBy("position")
    )
