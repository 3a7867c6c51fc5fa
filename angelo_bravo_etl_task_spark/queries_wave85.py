r"""Round-5 wave 85: language-ID evaluation loop, Krippendorff's alpha.

- ld1: closes the loop on tx3 — the stopword language-ID heuristic is
  EVALUATED against the corpus's true labels: full per-class confusion
  counts (tp/fp/fn), precision, recall, and F1 as single IEEE
  divisions of exact integers (F1 = 2tp/(2tp+fp+fn) — one division,
  no float composition), plus macro-F1 as a deterministic ordered
  fold. The heuristic's abstention (no stopword hit → NULL) is
  counted honestly as a miss.
- krip1: inter-annotator reliability the way measurement theory
  prescribes — Krippendorff's alpha (nominal, 2 coders) — in EXACT
  integer arithmetic: with coincidence agreements A and marginal
  pair-count B over N = 2n slots, alpha = (N(N−1) − B − (N−A)(N−1))
  / (N(N−1) − B), one terminal IEEE division. The second coder is a
  deterministic md5 10%-noise copy of the labels, so expected
  disagreement, observed disagreement, and alpha are all derivable by
  the oracle, and the chance-correction law alpha ≤ percent-agreement
  is certified alongside the [−1, 1] range law.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no evaluation surface; these extend the measurement family (kap1
Cohen's kappa, brier1, ndcg1, rk1, kt1) with the per-class diagnosis
and the chance-corrected reliability coefficient annotation pipelines
report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# ld1: tx3's heuristic vs true labels — per-class exact-rational metrics
# =========================================================================

_LD1_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang AS true_lang,
         list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), scored AS (
  SELECT doc_id, true_lang, list_aggregate([
    {'hits': LEN(list_filter(w, t -> t IN ('the','and','of','to','a','in','is','for','with','on'))), 'lang': 'en'},
    {'hits': LEN(list_filter(w, t -> t IN ('el','la','de','que','y','en','un','los','del','por'))), 'lang': 'es'},
    {'hits': LEN(list_filter(w, t -> t IN ('le','la','de','et','les','des','un','une','du','est'))), 'lang': 'fr'},
    {'hits': LEN(list_filter(w, t -> t IN ('der','die','und','das','von','den','ein','mit','ist','im'))), 'lang': 'de'},
    {'hits': LEN(list_filter(w, t -> t IN ('的','是','了','在','和','有','我','不','这','也'))), 'lang': 'zh'}
  ], 'max') AS best
  FROM toks
), pred AS (
  SELECT doc_id, true_lang,
         CASE WHEN best.hits > 0 THEN best.lang ELSE NULL END AS p
  FROM scored
), classes AS (
  SELECT DISTINCT true_lang AS c FROM pred
), m AS (
  SELECT cl.c,
         CAST((SELECT COUNT(*) FROM pred
               WHERE true_lang = cl.c AND p = cl.c) AS BIGINT) AS tp,
         CAST((SELECT COUNT(*) FROM pred
               WHERE true_lang <> cl.c AND p = cl.c) AS BIGINT) AS fp,
         CAST((SELECT COUNT(*) FROM pred
               WHERE true_lang = cl.c
                 AND (p IS NULL OR p <> cl.c)) AS BIGINT) AS fn
  FROM classes cl
)
SELECT c AS lang, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END AS precision_,
       CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END AS recall_,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN (2 * tp) / (2 * tp + fp + fn) END AS f1,
       CAST(SUM(CASE WHEN 2 * tp + fp + fn > 0
                THEN (2 * tp) / (2 * tp + fp + fn) ELSE 0 END)
            OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING) AS DOUBLE)
         / (SELECT COUNT(*) FROM classes) AS macro_f1
FROM m
"""


@_register("ld1_langid_confusion", _LD1_SQL)
def ld1_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation loop for tx3's stopword language-ID: per true class,
    confusion counts against the corpus's own labels (abstentions — no
    stopword hit — count as misses, never silently dropped), and the
    ranked-metric trio in exact-rational form: precision = tp/(tp+fp),
    recall = tp/(tp+fn), F1 = 2tp/(2tp+fp+fn) — each ONE IEEE division
    of exact BIGINTs (never a composition of rounded floats), NULL
    where undefined rather than a fake 0. macro_f1 folds the ≤5
    per-class F1s in lexicographic class order on both engines — a
    deterministic fixed-order float sum (the w12 lesson applied:
    defined fold order, tiny term count). Prediction reuses tx3's exact
    argmax expression, so this query certifies the EVALUATION of a
    query already certified itself. One corpus scan, one class-sized
    aggregate; at 100 TB the confusion matrix is a 5×5 reduction."""
    from .operators import text as TX

    d = _t(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("true_lang"),
        TX.detect_language(F.col("text")).alias("p"),
    )
    m = (
        pred.groupBy(F.col("true_lang").alias("lang"))
        .agg(
            F.sum(
                F.when(F.col("p") == F.col("true_lang"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("p").isNull() | (F.col("p") != F.col("true_lang")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    fp = (
        pred.where(F.col("p").isNotNull() & (F.col("p") != F.col("true_lang")))
        .groupBy(F.col("p").alias("lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("fp"))
    )
    j = m.join(fp, "lang", "left").select(
        "lang",
        "tp",
        F.coalesce(F.col("fp"), F.lit(0)).cast("bigint").alias("fp"),
        "fn",
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        (2 * F.col("tp")) / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    )
    w_all = Window.orderBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_classes = Window.partitionBy()
    return j.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp") / (F.col("tp") + F.col("fp")),
        ).alias("precision_"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp") / (F.col("tp") + F.col("fn")),
        ).alias("recall_"),
        f1.alias("f1"),
        (
            F.sum(F.coalesce(f1, F.lit(0.0))).over(w_all)
            / F.count(F.lit(1)).over(
                Window.partitionBy().orderBy("lang").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).cast("double").alias("macro_f1"),
    )


# =========================================================================
# krip1: Krippendorff's alpha (nominal, 2 coders) in exact integers
# =========================================================================

_KRIP1_SQL = """
WITH langs AS (
  SELECT ['de', 'en', 'es', 'fr', 'zh'] AS ls
), coded AS (
  SELECT d.doc_id, d.lang AS c1,
         CASE WHEN CAST('0x' || substr(md5('k:' || CAST(d.doc_id AS VARCHAR)),
                         1, 8) AS BIGINT) % 10 = 0
              THEN l.ls[(list_position(l.ls, d.lang) % 5) + 1]
              ELSE d.lang END AS c2
  FROM documents d CROSS JOIN langs l
), n_ AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(2 * COUNT(*) AS BIGINT) AS big_n,
         CAST(2 * SUM(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) AS BIGINT) AS a
  FROM coded
), marg AS (
  SELECT CAST(SUM(nc * (nc - 1)) AS BIGINT) AS b FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM (
      SELECT doc_id, c1 AS v FROM coded
      UNION ALL SELECT doc_id, c2 FROM coded
    ) GROUP BY v
  )
)
SELECT n_.n AS n_units, n_.big_n AS n_slots, n_.a AS agreements,
       marg.b AS marginal_pairs,
       (n_.big_n - n_.a) / n_.big_n AS d_observed,
       (n_.big_n * (n_.big_n - 1) - marg.b)
         / (n_.big_n * (n_.big_n - 1)) AS d_expected,
       ((n_.big_n * (n_.big_n - 1) - marg.b)
        - (n_.big_n - n_.a) * (n_.big_n - 1))
         / (n_.big_n * (n_.big_n - 1) - marg.b) AS alpha,
       (((n_.big_n * (n_.big_n - 1) - marg.b)
         - (n_.big_n - n_.a) * (n_.big_n - 1))
          <= (n_.big_n * (n_.big_n - 1) - marg.b)) AS alpha_le_one_ok,
       ((n_.big_n - n_.a) * (n_.big_n - 1)
          <= 2 * (n_.big_n * (n_.big_n - 1) - marg.b)) AS alpha_ge_neg1_ok
FROM n_ CROSS JOIN marg
"""


@_register("krip1_krippendorff_alpha", _KRIP1_SQL)
def krip1_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal data, 2 coders) in exact integer
    arithmetic: coder 1 is the corpus label, coder 2 a deterministic
    md5 10%-noise copy (flipped cyclically to the next language), so
    every quantity is derivable: with N = 2n coincidence slots, A =
    agreement slots, B = Σ_c n_c(n_c−1) marginal pairs, the textbook
    D_o = (N−A)/N and D_e = (N(N−1)−B)/(N(N−1)) reduce to
    alpha = (N(N−1) − B − (N−A)(N−1)) / (N(N−1) − B) — exact BIGINTs
    with ONE terminal IEEE division (kap1's discipline extended from
    kappa's simpler chance model to alpha's coincidence model). The
    range laws ride as integer-comparison columns (alpha ≤ 1 always;
    ≥ −1 for this design). Plan shape: one pass for agreements, one
    label-marginal aggregate over the unioned codings; at 100 TB both
    are combinable counts."""
    langs = ["de", "en", "es", "fr", "zh"]
    d = _t(spark, sf_dir, "documents")
    h8 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("k:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    ls = F.array(*[F.lit(x) for x in langs])
    flipped = F.element_at(
        ls, (F.array_position(ls, F.col("lang")) % 5 + 1).cast("int")
    )
    coded = d.select(
        "doc_id",
        F.col("lang").alias("c1"),
        F.when(h8 % 10 == 0, flipped).otherwise(F.col("lang")).alias("c2"),
    )
    n_ = coded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (2 * F.count(F.lit(1))).cast("bigint").alias("big_n"),
        (2 * F.sum(F.when(F.col("c1") == F.col("c2"), 1).otherwise(0)))
        .cast("bigint")
        .alias("a"),
    )
    marg = (
        coded.select(F.col("c1").alias("v"))
        .unionAll(coded.select(F.col("c2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nc"))
        .agg(
            F.sum(F.col("nc") * (F.col("nc") - 1))
            .cast("bigint")
            .alias("b")
        )
    )
    j = n_.crossJoin(F.broadcast(marg))
    de_num = F.col("big_n") * (F.col("big_n") - 1) - F.col("b")
    do_num = (F.col("big_n") - F.col("a")) * (F.col("big_n") - 1)
    return j.select(
        F.col("n").alias("n_units"),
        F.col("big_n").alias("n_slots"),
        F.col("a").alias("agreements"),
        F.col("b").alias("marginal_pairs"),
        ((F.col("big_n") - F.col("a")) / F.col("big_n")).alias("d_observed"),
        (de_num / (F.col("big_n") * (F.col("big_n") - 1))).alias(
            "d_expected"
        ),
        ((de_num - do_num) / de_num).alias("alpha"),
        ((de_num - do_num) <= de_num).alias("alpha_le_one_ok"),
        (do_num <= 2 * de_num).alias("alpha_ge_neg1_ok"),
    )
