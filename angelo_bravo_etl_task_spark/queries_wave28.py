"""Round-3 wave 28: PMI collocation mining, reciprocal-rank fusion for
hybrid retrieval, and classical seasonal decomposition — all exact.

- pmi1: pointwise mutual information WITHOUT log(): PMI ordering equals
  the ordering of n*c_xy/(c_x*c_y), so the score is the integer-scaled
  exact ratio — the log is monotone decoration the ranking never needed.
- rrf1: reciprocal rank fusion of two independent rankings with the
  1/(60+rank) terms as floor-scaled integers — the standard hybrid
  (lexical + prior) result merging, deterministic end to end.
- tm1: trend/seasonal/remainder decomposition where every division is
  deferred: 7x-scaled detrended values, per-weekday seasonal numerator/
  count pairs, remainder numerators over an explicit denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# pmi1: collocation mining by exact-ratio PMI
# =========================================================================

_PMI1_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), pos AS (
  SELECT doc_id, toks, UNNEST(generate_series(1, len(toks))) AS i FROM w
), uni AS (
  SELECT toks[i] AS word FROM pos
), bi AS (
  SELECT toks[i] AS x, toks[i + 1] AS y FROM pos WHERE i < len(toks)
), cx AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY word
), cxy AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c_xy FROM bi GROUP BY x, y
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM uni
)
, scored AS (
  SELECT x, y, c_xy, a.c AS c_x, b.c AS c_y,
         CAST((1000000 * n.n_tokens * c_xy) // (a.c * b.c) AS BIGINT)
           AS pmi_scaled
  FROM cxy JOIN cx a ON a.word = cxy.x JOIN cx b ON b.word = cxy.y
  CROSS JOIN n
  WHERE c_xy >= 5
)
SELECT x, y, c_xy, c_x, c_y, pmi_scaled,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi_scaled DESC, x, y) AS BIGINT)
         AS rank
FROM scored
QUALIFY rank <= 25
"""


@_register("pmi1_collocations", _PMI1_SQL)
def pmi1_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — WITHOUT the
    log: PMI = log(n*c_xy/(c_x*c_y)) is monotone in the ratio, so the
    ranking (which is all a collocation miner outputs) uses the exact
    integer-scaled ratio (1e6*n*c_xy) div (c_x*c_y) — no libm, no
    cross-engine drift; min-support c_xy >= 5 is the standard sparse-PMI
    guard. Shape: one token scan feeds unigram counts, bigram counts,
    and the 1-row corpus total; two broadcast joins attach the marginals
    to the bigram frame; top-25 with (score, x, y) tiebreak. Complements
    ng1 (continuation counts) and tx9 (novelty): PMI finds PHRASES, the
    units a tokenizer or stopword list should treat atomically. At
    100 TB the bigram count is the only high-cardinality aggregate and
    it is map-side-combinable."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    uni = toks.select(F.explode("toks").alias("word"))
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (t, i) -> struct(t AS x, element_at(toks, i + 2) AS y))"
            )
        ).alias("p")
    ).select("p.x", "p.y")
    cx = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    cxy = bi.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    # n_tokens = sum of the per-word counts: derived from cx instead of a
    # THIRD scan+split+explode of documents (optimization r11, guide
    # section 2.4 — the old uni.agg(count) re-read and re-tokenized the
    # whole corpus just to count tokens already counted in cx). Exact
    # equality: sum_word c(word) == count(tokens) by definition.
    n = cx.agg(F.sum("c").alias("n_tokens"))
    scored = (
        cxy.where(F.col("c_xy") >= 5)
        .join(F.broadcast(cx.select(F.col("word").alias("x"), F.col("c").alias("c_x"))), "x")
        .join(F.broadcast(cx.select(F.col("word").alias("y"), F.col("c").alias("c_y"))), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                "CAST((1000000 * n_tokens * c_xy) div (c_x * c_y) AS BIGINT)"
            ).alias("pmi_scaled"),
        )
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("pmi_scaled").desc(), "x", "y")
            ),
        )
        .where(F.col("rank") <= 25)
        .select("x", "y", "c_xy", "c_x", "c_y", "pmi_scaled", F.col("rank").cast("bigint").alias("rank"))
    )


# =========================================================================
# rrf1: reciprocal rank fusion of two rankings
# =========================================================================

_RRF1_SQL = """
WITH scored AS (
  SELECT doc_id,
         CAST(1000 * len(list_distinct(string_split(text, ' ')))
              // len(string_split(text, ' ')) AS BIGINT) AS lex,
         CAST(n_chars AS BIGINT) AS ln
  FROM documents
), ranked AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY lex DESC, doc_id) AS BIGINT)
           AS rank_a,
         CAST(ROW_NUMBER() OVER (ORDER BY ln DESC, doc_id) AS BIGINT)
           AS rank_b
  FROM scored
), fused AS (
  SELECT doc_id, rank_a, rank_b,
         CAST(1000000000 // (60 + rank_a)
              + 1000000000 // (60 + rank_b) AS BIGINT) AS rrf_scaled
  FROM ranked
)
SELECT doc_id, rank_a, rank_b, rrf_scaled,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_scaled DESC, doc_id)
            AS BIGINT) AS fused_rank
FROM fused
QUALIFY fused_rank <= 20
"""


@_register("rrf1_rank_fusion", _RRF1_SQL)
def rrf1_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion — the standard way hybrid search merges
    rankings from incomparable scorers (here: lexical diversity and a
    document-length prior; in production: BM25 and dense cosine). RRF's
    1/(k + rank) terms with k=60 become floor-scaled integers
    (1e9 div (60+rank)), making the fused ordering exact and
    cross-engine stable; every rank is a ROW_NUMBER with a pinned
    doc_id tiebreak, so no score normalization is ever needed — the
    whole point of RRF. Output: top-20 fused with both source ranks
    visible. At 100 TB each source ranking comes from its own top-k
    candidate pool (TakeOrderedAndProject, as t1 demonstrates), so the
    fusion frame is pool-sized, never corpus-sized."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.expr(
            "CAST(1000 * size(array_distinct(split(text, ' ')))"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("lex"),
        F.col("n_chars").cast("bigint").alias("ln"),
    )
    ranked = scored.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("lex").desc(), "doc_id"))
        .cast("bigint")
        .alias("rank_a"),
        F.row_number()
        .over(Window.orderBy(F.col("ln").desc(), "doc_id"))
        .cast("bigint")
        .alias("rank_b"),
    )
    fused = ranked.select(
        "doc_id",
        "rank_a",
        "rank_b",
        F.expr(
            "CAST(1000000000 div (60 + rank_a)"
            " + 1000000000 div (60 + rank_b) AS BIGINT)"
        ).alias("rrf_scaled"),
    )
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number()
            .over(Window.orderBy(F.col("rrf_scaled").desc(), "doc_id"))
            .cast("bigint"),
        )
        .where(F.col("fused_rank") <= 20)
    )


# =========================================================================
# tm1: seasonal decomposition with deferred division (all-integer)
# =========================================================================

_TM1_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, day, x,
         CAST(SUM(x) OVER w AS BIGINT) AS trend7_sum,
         CAST(COUNT(*) OVER w AS BIGINT) AS wn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), full_win AS (
  SELECT event_type, day, x, trend7_sum,
         CAST(7 * x - trend7_sum AS BIGINT) AS detrended_scaled,
         CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow
  FROM win WHERE wn = 7
), seasonal AS (
  SELECT event_type, dow,
         CAST(SUM(detrended_scaled) AS BIGINT) AS seasonal_num,
         CAST(COUNT(*) AS BIGINT) AS seasonal_cnt
  FROM full_win GROUP BY 1, 2
)
SELECT f.event_type, f.day, f.x, f.trend7_sum, f.detrended_scaled, f.dow,
       s.seasonal_num, s.seasonal_cnt,
       CAST(f.detrended_scaled * s.seasonal_cnt - s.seasonal_num AS BIGINT)
         AS remainder_num,
       CAST(7 * s.seasonal_cnt AS BIGINT) AS denom
FROM full_win f
JOIN seasonal s ON s.event_type = f.event_type AND s.dow = f.dow
"""


@_register("tm1_seasonal_decompose", _TM1_SQL)
def tm1_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical trend/seasonal/remainder decomposition with every
    division DEFERRED: the centered 7-day moving-average trend stays a
    window SUM (full windows only), detrended values carry the 7x scale
    (7x - trend_sum = 7*(x - trend)), the weekday seasonal component is
    a (numerator, count) pair, and the remainder is a numerator over the
    explicit 7*cnt denominator — every emitted column is an exact
    BIGINT; the single float division is the CONSUMER's choice.
    Weekday is epoch-day mod 7 (pure arithmetic — Spark's dayofweek and
    DuckDB's differ in origin, the arithmetic cannot). Complements fc1
    (seasonal-naive forecast) and hw1 (Holt): this is the diagnostic
    decomposition, those are forecasters. Shape: daily pre-aggregation,
    a 30-row-per-key window, a 7-row-per-key seasonal aggregate, one
    equi-join back."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    win = daily.select(
        "event_type",
        "day",
        "x",
        F.sum("x").over(w).alias("trend7_sum"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    full_win = win.where(F.col("wn") == 7).select(
        "event_type",
        "day",
        "x",
        "trend7_sum",
        (7 * F.col("x") - F.col("trend7_sum")).alias("detrended_scaled"),
        (F.datediff("day", F.lit("1970-01-01")) % 7)
        .cast("bigint")
        .alias("dow"),
    )
    seasonal = full_win.groupBy("event_type", "dow").agg(
        F.sum("detrended_scaled").alias("seasonal_num"),
        F.count(F.lit(1)).alias("seasonal_cnt"),
    )
    return full_win.join(seasonal, ["event_type", "dow"]).select(
        "event_type",
        "day",
        "x",
        "trend7_sum",
        "detrended_scaled",
        "dow",
        "seasonal_num",
        "seasonal_cnt",
        (
            F.col("detrended_scaled") * F.col("seasonal_cnt")
            - F.col("seasonal_num")
        ).alias("remainder_num"),
        (7 * F.col("seasonal_cnt")).alias("denom"),
    )
