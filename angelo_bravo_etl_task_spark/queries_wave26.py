"""Round-3 wave 26: diversified retrieval (MMR), ML evaluation as exact
rationals, and multi-window SLO burn-rate alerting.

- mmr1: greedy maximal-marginal-relevance re-ranking — the retrieval op
  between ANN search (x1/x2/x4) and the training-data mixers (mix1/dm1):
  pick results that are relevant AND mutually diverse. Cosines reuse the
  x1 fold (left-fold doubles, bit-identical cross-engine); the greedy
  argmax per round is a deterministic order-statistic.
- ev1: precision/recall/F1 per class as exact integer fractions — the
  evaluation report every model pipeline emits, with zero float drift
  (numerators and denominators, never the quotient).
- slo1: the two-resolution burn-rate alert (short window AND long window
  over threshold) in exact cross-multiplied integers, thresholded
  RELATIVE to the measured global rate so both alert branches fire at
  every SF (the dp2/bloom1 planting rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.similarity import dot, norm
from .queries import _register, _t

# =========================================================================
# mmr1: maximal marginal relevance diversified top-k
# =========================================================================

_MMR1_COS = (
    "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]),"
    " (acc, v) -> acc + v)"
    " / (sqrt(list_reduce(list_transform({a}, v -> v * v), (a, b) -> a + b))"
    " * sqrt(list_reduce(list_transform({b}, v -> v * v), (a, b) -> a + b)))"
)

_MMR1_SQL = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), cand AS (
  SELECT e.vec_id, {_MMR1_COS.format(a='q.qv', b='CAST(e.embedding AS DOUBLE[])')} AS rel,
         CAST(e.embedding AS DOUBLE[]) AS cv
  FROM embeddings e, q
  WHERE e.vec_id BETWEEN 1 AND 200
), cand8 AS (
  SELECT vec_id, rel, cv FROM (
    SELECT vec_id, rel, cv,
           ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn <= 8
), sims AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb,
         {_MMR1_COS.format(a='a.cv', b='b.cv')} AS sim
  FROM cand8 a, cand8 b WHERE a.vec_id <> b.vec_id
), sel1 AS (
  SELECT vec_id, rel FROM cand8 ORDER BY rel DESC, vec_id LIMIT 1
), r2 AS (
  SELECT c.vec_id, c.rel, MAX(s.sim) AS maxsim
  FROM cand8 c JOIN sims s ON s.ida = c.vec_id
  WHERE s.idb IN (SELECT vec_id FROM sel1)
    AND c.vec_id NOT IN (SELECT vec_id FROM sel1)
  GROUP BY c.vec_id, c.rel
), sel2 AS (
  SELECT vec_id, rel, maxsim FROM r2
  ORDER BY 0.5 * rel - 0.5 * maxsim DESC, vec_id LIMIT 1
), picked2 AS (
  SELECT vec_id FROM sel1 UNION ALL SELECT vec_id FROM sel2
), r3 AS (
  SELECT c.vec_id, c.rel, MAX(s.sim) AS maxsim
  FROM cand8 c JOIN sims s ON s.ida = c.vec_id
  WHERE s.idb IN (SELECT vec_id FROM picked2)
    AND c.vec_id NOT IN (SELECT vec_id FROM picked2)
  GROUP BY c.vec_id, c.rel
), sel3 AS (
  SELECT vec_id, rel, maxsim FROM r3
  ORDER BY 0.5 * rel - 0.5 * maxsim DESC, vec_id LIMIT 1
), picked3 AS (
  SELECT vec_id FROM picked2 UNION ALL SELECT vec_id FROM sel3
), r4 AS (
  SELECT c.vec_id, c.rel, MAX(s.sim) AS maxsim
  FROM cand8 c JOIN sims s ON s.ida = c.vec_id
  WHERE s.idb IN (SELECT vec_id FROM picked3)
    AND c.vec_id NOT IN (SELECT vec_id FROM picked3)
  GROUP BY c.vec_id, c.rel
), sel4 AS (
  SELECT vec_id, rel, maxsim FROM r4
  ORDER BY 0.5 * rel - 0.5 * maxsim DESC, vec_id LIMIT 1
)
SELECT CAST(1 AS BIGINT) AS round, vec_id, rel,
       CAST(NULL AS DOUBLE) AS maxsim, rel AS mmr FROM sel1
UNION ALL SELECT CAST(2 AS BIGINT), vec_id, rel, maxsim,
       0.5 * rel - 0.5 * maxsim FROM sel2
UNION ALL SELECT CAST(3 AS BIGINT), vec_id, rel, maxsim,
       0.5 * rel - 0.5 * maxsim FROM sel3
UNION ALL SELECT CAST(4 AS BIGINT), vec_id, rel, maxsim,
       0.5 * rel - 0.5 * maxsim FROM sel4
"""


@_register("mmr1_diversified_topk", _MMR1_SQL)
def mmr1_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: greedily select 4 of the
    top-8 cosine candidates for query vec_id=0, each round maximizing
    0.5*relevance - 0.5*max-similarity-to-already-selected — the standard
    diversification pass a retrieval pipeline runs AFTER ANN search
    (x1/x2/x4 produce the candidate pool; this dedupes it semantically).
    All cosines use the x1 left-fold (bit-identical doubles across
    engines); each greedy argmax is a deterministic order statistic with
    vec_id tiebreak, so the whole selection sequence is exact. The
    candidate pool (8) and round count (4) are constants: every frame
    after the ONE corpus-wide relevance scan is dimension-sized, which is
    precisely how MMR runs at 100 TB (re-rank the top-k, never the
    corpus). The oracle unrolls the identical four rounds as CTEs."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cand = (
        emb.where(F.col("vec_id").between(1, 200))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                dot(F.col("qv"), F.col("embedding"))
                / (norm(F.col("qv")) * norm(F.col("embedding")))
            ).alias("rel"),
            F.col("embedding").alias("cv"),
        )
    )
    cand8 = (
        cand.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("rel").desc(), "vec_id"))
        )
        .where(F.col("rn") <= 8)
        .select("vec_id", "rel", "cv")
        .persist()
    )
    a = cand8.select(F.col("vec_id").alias("ida"), F.col("cv").alias("cva"))
    b = cand8.select(F.col("vec_id").alias("idb"), F.col("cv").alias("cvb"))
    sims = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ida") != F.col("idb"))
        .select(
            "ida",
            "idb",
            (
                dot(F.col("cva"), F.col("cvb"))
                / (norm(F.col("cva")) * norm(F.col("cvb")))
            ).alias("sim"),
        )
        .persist()
    )

    sel = (
        cand8.withColumn(
            "rnd", F.row_number().over(Window.orderBy(F.col("rel").desc(), "vec_id"))
        )
        .where(F.col("rnd") == 1)
        .select(
            F.lit(1).cast("bigint").alias("round"),
            "vec_id",
            "rel",
            F.lit(None).cast("double").alias("maxsim"),
            F.col("rel").alias("mmr"),
        )
    )
    out = sel
    for r in range(2, 5):
        picked = out.select("vec_id")
        rem = cand8.join(picked, "vec_id", "left_anti")
        scored = (
            rem.join(sims, rem["vec_id"] == sims["ida"])
            .join(
                picked.select(F.col("vec_id").alias("idb")),
                "idb",
            )
            .groupBy(rem["vec_id"], "rel")
            .agg(F.max("sim").alias("maxsim"))
            .select(
                "vec_id",
                "rel",
                "maxsim",
                (0.5 * F.col("rel") - 0.5 * F.col("maxsim")).alias("mmr"),
            )
        )
        pick = (
            scored.withColumn(
                "rnd",
                F.row_number().over(Window.orderBy(F.col("mmr").desc(), "vec_id")),
            )
            .where(F.col("rnd") == 1)
            .select(
                F.lit(r).cast("bigint").alias("round"),
                "vec_id",
                "rel",
                "maxsim",
                "mmr",
            )
        )
        out = out.unionAll(pick)
    return out


# =========================================================================
# ev1: per-class classification report in exact integer fractions
# =========================================================================

_EV1_SQL = """
WITH scored AS (
  SELECT CAST(label AS BIGINT) AS y, CAST(vec_id % 10 AS BIGINT) AS p
  FROM embeddings
), classes AS (
  SELECT DISTINCT y AS c FROM scored
), stats AS (
  SELECT c,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM scored
          WHERE y = c AND p = c) AS tp,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM scored
          WHERE p = c AND y <> c) AS fp,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM scored
          WHERE y = c AND p <> c) AS fn
  FROM classes
)
SELECT c AS class, tp, fp, fn,
       CAST(tp + fn AS BIGINT) AS support,
       tp AS prec_num, CAST(tp + fp AS BIGINT) AS prec_den,
       tp AS rec_num, CAST(tp + fn AS BIGINT) AS rec_den,
       CAST(2 * tp AS BIGINT) AS f1_num,
       CAST(2 * tp + fp + fn AS BIGINT) AS f1_den
FROM stats
"""


@_register("ev1_classification_report", _EV1_SQL)
def ev1_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 as EXACT integer fractions — the
    evaluation table every model pipeline emits, with the quotient never
    taken (numerator/denominator columns instead), so there is no float
    to drift and downstream consumers can aggregate (micro/macro) without
    re-deriving counts. Predictions are the deterministic vec_id % 10
    rule against the stored labels (a fixed confusion structure at every
    SF — every cell of the report is non-trivially exercised). One
    map-side-combinable (y, p) group-count is the only full-data pass;
    the report assembles from that 100-cell frame."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("bigint").alias("y"),
        (F.col("vec_id") % 10).cast("bigint").alias("p"),
    )
    cells = emb.groupBy("y", "p").agg(F.count(F.lit(1)).alias("n")).persist()
    tp = cells.where(F.col("y") == F.col("p")).select(
        F.col("y").alias("class"), F.col("n").alias("tp")
    )
    fp = (
        cells.where(F.col("y") != F.col("p"))
        .groupBy(F.col("p").alias("class"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        cells.where(F.col("y") != F.col("p"))
        .groupBy(F.col("y").alias("class"))
        .agg(F.sum("n").alias("fn"))
    )
    rep = (
        tp.join(fp, "class", "full")
        .join(fn, "class", "full")
        .select(
            "class",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("bigint").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("bigint").alias("fn"),
        )
    )
    return rep.select(
        "class",
        "tp",
        "fp",
        "fn",
        (F.col("tp") + F.col("fn")).alias("support"),
        F.col("tp").alias("prec_num"),
        (F.col("tp") + F.col("fp")).alias("prec_den"),
        F.col("tp").alias("rec_num"),
        (F.col("tp") + F.col("fn")).alias("rec_den"),
        (2 * F.col("tp")).alias("f1_num"),
        (2 * F.col("tp") + F.col("fp") + F.col("fn")).alias("f1_den"),
    )


# =========================================================================
# slo1: two-resolution burn-rate alerting in exact integers
# =========================================================================

_SLO1_SQL = """
WITH hourly AS (
  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bh,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err_h,
         CAST(COUNT(*) AS BIGINT) AS tot_h
  FROM events GROUP BY 1
), six AS (
  SELECT CAST(bh // 6 AS BIGINT) AS b6,
         CAST(SUM(err_h) AS BIGINT) AS err_6,
         CAST(SUM(tot_h) AS BIGINT) AS tot_6
  FROM hourly GROUP BY 1
), g AS (
  SELECT CAST(SUM(err_h) AS BIGINT) AS g_err,
         CAST(SUM(tot_h) AS BIGINT) AS g_tot
  FROM hourly
)
SELECT h.bh, h.err_h, h.tot_h, s.b6, s.err_6, s.tot_6,
       (h.err_h * g.g_tot * 20 > h.tot_h * g.g_err * 21) AS alert_short,
       (s.err_6 * g.g_tot * 20 > s.tot_6 * g.g_err * 21) AS alert_long,
       ((h.err_h * g.g_tot * 20 > h.tot_h * g.g_err * 21)
        AND (s.err_6 * g.g_tot * 20 > s.tot_6 * g.g_err * 21)) AS page
FROM hourly h
JOIN six s ON s.b6 = h.bh // 6
CROSS JOIN g
"""


@_register("slo1_burn_rate", _SLO1_SQL)
def slo1_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting: page only when BOTH the
    1-hour and the containing 6-hour error rate exceed 1.05x the global
    rate — the standard two-resolution rule that suppresses blips (short
    spike, calm long window) and stale alerts (long elevated, short
    recovered). Every comparison is exact cross-multiplied integers
    (err * g_tot * 20 > tot * g_err * 21 encodes rate > 1.05 * global);
    the threshold is RELATIVE to the measured global rate, so hours land
    on both sides of it at every SF — no vacuously-true/false branch.
    Shape at 100 TB: one map-side-combinable hourly rollup, a 6-hour
    re-aggregation of the 720-row hourly frame, and a 1-row global
    scalar broadcast."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT)").alias("bh")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("err_h"),
        F.count(F.lit(1)).alias("tot_h"),
    ).persist()
    six = hourly.groupBy(F.expr("bh div 6").alias("b6")).agg(
        F.sum("err_h").alias("err_6"), F.sum("tot_h").alias("tot_6")
    )
    g = hourly.agg(
        F.sum("err_h").alias("g_err"), F.sum("tot_h").alias("g_tot")
    )
    joined = (
        hourly.join(six, F.expr("bh div 6") == six["b6"])
        .crossJoin(F.broadcast(g))
    )
    short = (
        F.col("err_h") * F.col("g_tot") * 20
        > F.col("tot_h") * F.col("g_err") * 21
    )
    lng = (
        F.col("err_6") * F.col("g_tot") * 20
        > F.col("tot_6") * F.col("g_err") * 21
    )
    return joined.select(
        "bh",
        "err_h",
        "tot_h",
        "b6",
        "err_6",
        "tot_6",
        short.alias("alert_short"),
        lng.alias("alert_long"),
        (short & lng).alias("page"),
    )
