r"""Round-9 wave 119: incremental delta-vs-corpus dedup (d13), Kneser-Ney
smoothed bigram LM counts (kn1), inter-annotator agreement (kappa1), and
the UNPIVOT/melt relational verb (unpivot1).

d13 is the shape every PRODUCTION dedup actually runs: the corpus is
already deduped and indexed; what arrives daily is a small delta, and
the question is "which new docs are novel?" — answered WITHOUT the
corpus ever self-joining. kn1/kappa1 extend the text-curation family
with the standard LM-smoothing and label-quality primitives; unpivot1
closes a relational verb (wide→long) the registry had only in the
pivot (long→wide) direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _NORM_SQL, _grams_select, _register, _t

# ==========================================================================
# d13: incremental dedup — delta probed against an indexed corpus
# ==========================================================================

# The oracle computes the exact cross-split ground truth with the shared
# inverted-gram-index construction (never all-pairs): corpus = doc_id %
# 10 != 0; delta = the %10 slice PLUS planted clones of every 37th corpus
# doc at id+1_000_000 (identical text -> jaccard 1.0, so the match branch
# fires at every SF; clone ids are off both id spaces). A delta doc is
# novel iff NO corpus doc reaches word-3-gram jaccard >= 0.6.
#
# EMPIRICAL-FLOOR NOTE (the d3 argument, same caveat): the engine's LSH
# candidates must cover every true cross-split pair. Planted clones are
# caught with certainty (identical signatures); the natural pairs' Jaccards
# measured on the current generated data are >= 0.75 with nothing in
# (0.35, 0.75), where 64x16-band recall is ~1 — re-measure after any data
# regeneration before trusting a red sweep as an engine bug.
_D13_SQL = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
    ), delta AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
      WHERE doc_id % 10 <> 0 AND doc_id % 37 = 0
    ), shc AS (
      {_grams_select("corpus")}
    ), shd AS (
      {_grams_select("delta")}
    ), exc AS (
      SELECT doc_id, unnest(grams) AS g FROM shc
    ), exd AS (
      SELECT doc_id, unnest(grams) AS g FROM shd
    ), shared AS (
      SELECT d.doc_id AS did, c.doc_id AS cid, COUNT(*) AS c
      FROM exd d JOIN exc c ON d.g = c.g
      GROUP BY 1, 2
    ), confirmed AS (
      SELECT s.did, MIN(s.cid) AS match_id
      FROM shared s
      JOIN (SELECT doc_id, len(grams) AS n FROM shd) nd ON s.did = nd.doc_id
      JOIN (SELECT doc_id, len(grams) AS n FROM shc) nc ON s.cid = nc.doc_id
      WHERE CAST(s.c AS DOUBLE) / (nd.n + nc.n - s.c) >= 0.6
      GROUP BY s.did
    )
    SELECT d.doc_id,
           CAST(CASE WHEN m.match_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_novel,
           CAST(COALESCE(m.match_id, -1) AS BIGINT) AS match_id
    FROM delta d LEFT JOIN confirmed m ON d.doc_id = m.did
    """


@_register("d13_incremental_dedup", _D13_SQL)
def d13_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: probe a NEW-document delta against an existing
    corpus with asymmetric banded-LSH, exact-confirm the candidates, and
    emit the admit/reject decision per delta doc (is_novel + the min-id
    corpus match). The corpus NEVER self-joins — d3/d7 answer "dedup this
    corpus once"; d13 answers the question every production pipeline asks
    daily: "which of today's arrivals are already in the 100 TB history?"

    Construction: corpus = doc_id % 10 != 0; delta = the %10 slice plus
    planted clones of every 37th corpus doc at id+1_000_000 (identical
    text, so the duplicate branch fires deterministically at every SF —
    the dp2 planting rule; clone ids collide with neither id space).

    100 TB shape: the banded-signature frame of the corpus is the
    INDEX — in production it is precomputed once, persisted bucketed by
    (band, band_hash), and only the delta's ~bands rows/doc shuffle; the
    probe equi-join touches only the buckets the delta actually hits, so
    cost is O(|delta| x bands x bucket-hit size), independent of corpus
    cardinality. The exact-confirm joins shingle arrays onto the (small)
    candidate list, and the final decision is a per-delta-doc aggregate.
    Reference parity: the reference truncates + reloads its whole table
    per run (Angelo_ETL_Task.py:276-374); this is the operation that
    replaces that pattern at any real scale."""
    from .operators.dedup import (
        gram_hashes_frame,
        jaccard_pairs_from_hashes,
        lsh_probe_candidates_from_hashes,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # bounded 1-row agg: guard the clone-offset invariant before planting
    # (the sdd1 pattern, ADVICE r9) — a real-id collision would be
    # replayed identically by the oracle and certify garbage
    _max_id = d.agg(F.max("doc_id")).first()[0]
    if _max_id is None or _max_id >= 1_000_000:
        raise RuntimeError(
            f"d13 clone offset 1_000_000 collides with real doc_id space "
            f"(max={_max_id}); raise the offset on BOTH engine and oracle"
        )
    corpus = d.where(F.col("doc_id") % 10 != 0)
    clones = corpus.where(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"
    )
    delta = d.where(F.col("doc_id") % 10 == 0).unionByName(clones)
    # Optimization r11 (guide §2.3/§2.4): ONE normalize+tokenize+hash pass
    # per side shared by the banded signatures and the exact confirm —
    # before, the probe re-shingled both sides and the confirm re-shingled
    # delta∪corpus from raw text (3 full text passes → 2 checkpointed
    # hash passes; confirm joins 8-byte gram hashes, not n-gram strings).
    dh = gram_hashes_frame(delta)
    ch = gram_hashes_frame(corpus)
    cand = lsh_probe_candidates_from_hashes(dh, ch).select(
        F.col("probe_id").alias("id_a"), F.col("index_id").alias("id_b")
    )
    confirmed = (
        jaccard_pairs_from_hashes(dh, ch, cand, threshold=0.6)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("match_id"))
    )
    return delta.join(
        confirmed, delta["doc_id"] == confirmed["id_a"], "left"
    ).select(
        "doc_id",
        F.when(F.col("match_id").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_novel"),
        F.coalesce(F.col("match_id"), F.lit(-1))
        .cast("bigint")
        .alias("match_id"),
    )


# ==========================================================================
# kn1: Kneser-Ney smoothed bigram LM counts — exact integer release
# ==========================================================================

# P_KN(w2|w1) = max(c12 - 0.75, 0)/c1 + 0.75*(N1+(w1,.)/c1)*(N1+(.,w2)/D)
# with D = total distinct bigram types. Multiplying through by 4*c1*D
# clears every denominator: num = max(4*c12 - 3, 0)*D + 3*N1+(w1,.)*N1+(.,w2),
# den = 4*c1*D — EXACT BIGINTs, plus the pmi1-style integer-scaled
# probability (1e6*num) // den. Zero floats anywhere.
_KN1_SQL = """
WITH w AS (
  SELECT string_split(text, ' ') AS toks FROM documents
), pos AS (
  SELECT toks, UNNEST(generate_series(1, len(toks))) AS i FROM w
), bi AS (
  SELECT toks[i] AS x, toks[i + 1] AS y FROM pos WHERE i < len(toks)
), cxy AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c_xy FROM bi GROUP BY x, y
), cx AS (
  SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x,
         CAST(COUNT(*) AS BIGINT) AS n1p_fwd
  FROM cxy GROUP BY x
), cy AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM cxy GROUP BY y
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM cxy
), scored AS (
  SELECT cxy.x, cxy.y, cxy.c_xy, cx.c_x, cx.n1p_fwd, cy.n1p_bwd,
         GREATEST(4 * cxy.c_xy - 3, 0) * t.n_types
           + 3 * cx.n1p_fwd * cy.n1p_bwd AS p_num,
         4 * cx.c_x * t.n_types AS p_den
  FROM cxy JOIN cx ON cxy.x = cx.x JOIN cy ON cxy.y = cy.y
  CROSS JOIN tot t
  WHERE cxy.c_xy >= 5
)
SELECT x, y, c_xy, c_x, n1p_fwd, n1p_bwd,
       CAST(p_num AS BIGINT) AS p_num,
       CAST(p_den AS BIGINT) AS p_den,
       CAST((1000000 * p_num) // p_den AS BIGINT) AS p_kn_x1e6,
       CAST(ROW_NUMBER() OVER (ORDER BY (1000000 * p_num) // p_den DESC,
                               x, y) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 50
"""


@_register("kn1_kneser_ney", _KN1_SQL)
def kn1_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram probabilities — the standard n-gram LM
    smoothing (absolute discount d=0.75 + continuation probability),
    released as EXACT integers: multiplying P_KN through by 4*c(w1)*D
    (D = distinct bigram types) clears the dyadic discount and every
    denominator, so num/den are exact BIGINTs and the released
    p_kn_x1e6 is an integer floor-division both engines compute
    identically — the pmi1 no-libm rule applied to a full smoothing
    formula. Top-50 bigrams with min-support c_xy >= 5, (score, x, y)
    tiebreak.

    Continuation counts are what distinguish KN from naive discounting:
    N1+(.,w2) counts the DISTINCT left-contexts of w2, so "francisco"
    (frequent but only after "san") gets a LOW continuation probability.
    ng1's raw continuation counts feed in here; kn1 is the full formula.

    100 TB shape: one bigram-count aggregate (map-side combinable; the
    only high-cardinality shuffle), two tiny marginal frames broadcast
    back, one 1-row type-count scalar, top-k at the end. pmi1 finds
    phrases; kn1 produces the LM scores a perplexity filter (ppl1) would
    consume in a real curation stack."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("toks"))
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (t, i) -> struct(t AS x, element_at(toks, i + 2) AS y))"
            )
        ).alias("p")
    ).select("p.x", "p.y")
    cxy = bi.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    cxy = cxy.localCheckpoint(eager=True)  # feeds three aggregates below
    cx = cxy.groupBy("x").agg(
        F.sum("c_xy").alias("c_x"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cy = cxy.groupBy("y").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    tot = cxy.agg(F.count(F.lit(1)).alias("n_types"))
    scored = (
        cxy.where(F.col("c_xy") >= 5)
        .join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            "c_xy",
            "c_x",
            "n1p_fwd",
            "n1p_bwd",
            (
                F.greatest(4 * F.col("c_xy") - 3, F.lit(0))
                * F.col("n_types")
                + 3 * F.col("n1p_fwd") * F.col("n1p_bwd")
            ).cast("bigint").alias("p_num"),
            (4 * F.col("c_x") * F.col("n_types"))
            .cast("bigint")
            .alias("p_den"),
        )
    )
    return (
        scored.select(
            "*",
            F.expr("CAST((1000000 * p_num) div p_den AS BIGINT)").alias(
                "p_kn_x1e6"
            ),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("p_kn_x1e6").desc(), "x", "y"))
            .cast("bigint"),
        )
        .where(F.col("rank") <= 50)
    )


# ==========================================================================
# kappa1: Cohen's kappa inter-annotator agreement — exact integer release
# ==========================================================================

# Two deterministic 'annotators' label docs long/short: A by characters
# vs the corpus mean (cross-multiplied — no division), B by token count
# vs ITS corpus mean, with planted label noise (B flipped on doc_id %
# 41 == 0) so the disagreement cells are non-empty at every SF. kappa =
# (po - pe)/(1 - pe) cleared to integers: num = n*(n11+n00) - (a1*b1 +
# a0*b0), den = n*n - (a1*b1 + a0*b0).
_KAPPA1_SQL = r"""
WITH feat AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              t -> LENGTH(t) > 0)) AS BIGINT) AS n_toks
  FROM documents
), means AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(SUM(n_toks) AS BIGINT) AS sum_toks
  FROM feat
), lab AS (
  SELECT f.doc_id,
         CASE WHEN f.n_chars * m.n > m.sum_chars THEN 1 ELSE 0 END AS a,
         CASE WHEN f.doc_id % 41 = 0
              THEN 1 - (CASE WHEN f.n_toks * m.n > m.sum_toks
                             THEN 1 ELSE 0 END)
              ELSE (CASE WHEN f.n_toks * m.n > m.sum_toks
                         THEN 1 ELSE 0 END) END AS b
  FROM feat f CROSS JOIN means m
), cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 END), 0)
              AS BIGINT) AS n11,
         CAST(COALESCE(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 END), 0)
              AS BIGINT) AS n00,
         CAST(COALESCE(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 END), 0)
              AS BIGINT) AS n10,
         CAST(COALESCE(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 END), 0)
              AS BIGINT) AS n01,
         CAST(COALESCE(SUM(a), 0) AS BIGINT) AS a1,
         CAST(COALESCE(SUM(b), 0) AS BIGINT) AS b1
  FROM lab
)
SELECT n, n11, n00, n10, n01,
       CAST(n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1)) AS BIGINT)
         AS kappa_num,
       CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS BIGINT)
         AS kappa_den,
       CAST((1000000 * (n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1))))
            // (n * n - (a1 * b1 + (n - a1) * (n - b1))) AS BIGINT)
         AS kappa_x1e6
FROM cells
"""


@_register("kappa1_agreement", _KAPPA1_SQL)
def kappa1_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-annotator agreement, exactly — the label-quality
    primitive every human-annotation pipeline computes before trusting a
    training set. Two deterministic 'annotators' (doc length in chars vs
    the corpus mean; token count vs its mean — cross-multiplied integer
    comparisons, no division) label every document; annotator B carries
    planted label noise (flipped on doc_id % 41 == 0, the dp2 relative
    rule) so all four confusion cells are non-empty at every SF and
    kappa sits strictly inside (0, 1). kappa = (po-pe)/(1-pe) cleared of
    divisions: num = n*(n11+n00) - (a1*b1 + a0*b0), den = n^2 - (...) —
    exact BIGINTs plus the floor-scaled kappa_x1e6. Negative-quotient
    DIV never arises (num >= ... can be negative in adversarial data,
    but ABS is not needed: both engines truncate INTEGER // toward zero
    identically per the pid1 measurement).

    100 TB shape: ONE pass over the corpus for features, one 1-row
    means frame broadcast back, one 1-row confusion aggregate — the
    whole statistic is two map-side-combinable scans."""
    d = _t(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(
            F.filter(
                F.split("text", r"\s+"), lambda t: F.length(t) > 0
            )
        ).cast("bigint").alias("n_toks"),
    )
    means = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_toks").alias("sum_toks"),
    )
    b_raw = F.when(
        F.col("n_toks") * F.col("n") > F.col("sum_toks"), F.lit(1)
    ).otherwise(F.lit(0))
    lab = feat.crossJoin(F.broadcast(means)).select(
        "doc_id",
        F.when(F.col("n_chars") * F.col("n") > F.col("sum_chars"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("a"),
        F.when(F.col("doc_id") % 41 == 0, 1 - b_raw)
        .otherwise(b_raw)
        .alias("b"),
    )
    cells = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1)),
            F.lit(0),
        ).alias("n11"),
        F.coalesce(
            F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1)),
            F.lit(0),
        ).alias("n00"),
        F.coalesce(
            F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1)),
            F.lit(0),
        ).alias("n10"),
        F.coalesce(
            F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1)),
            F.lit(0),
        ).alias("n01"),
        F.coalesce(F.sum("a"), F.lit(0)).alias("a1"),
        F.coalesce(F.sum("b"), F.lit(0)).alias("b1"),
    )
    pe_mass = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    num = F.col("n") * (F.col("n11") + F.col("n00")) - pe_mass
    den = F.col("n") * F.col("n") - pe_mass
    return cells.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n00").cast("bigint").alias("n00"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        num.cast("bigint").alias("kappa_num"),
        den.cast("bigint").alias("kappa_den"),
        F.expr(
            "CAST((1000000 * (n * (n11 + n00)"
            " - (a1 * b1 + (n - a1) * (n - b1))))"
            " div (n * n - (a1 * b1 + (n - a1) * (n - b1))) AS BIGINT)"
        ).alias("kappa_x1e6"),
    )


# ==========================================================================
# unpivot1: the wide->long relational verb (df.unpivot / UNPIVOT)
# ==========================================================================

# Oracle as explicit UNION ALL — exact by construction and independent of
# DuckDB's UNPIVOT dialect; the Spark side uses the native unpivot verb.
_UNPIVOT1_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS qty_c,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS price_c,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty_c' AS metric, qty_c AS value FROM wide
UNION ALL
SELECT l_returnflag, 'price_c', price_c FROM wide
UNION ALL
SELECT l_returnflag, 'n_rows', n_rows FROM wide
"""


@_register("unpivot1_wide_to_long", _UNPIVOT1_SQL)
def unpivot1_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the wide->long inverse of p1's pivot, via Spark's
    native ``DataFrame.unpivot`` (SQL UNPIVOT): a per-flag aggregate with
    three BIGINT measure columns melts into (flag, metric, value) rows.
    Same-type measures only — unpivot requires a common value type, so
    the money columns are integer cents like everywhere else. The oracle
    is the explicit UNION ALL the verb is sugar for.

    100 TB shape: unpivot is a flatMap — each input row emits
    |measures| output rows, no shuffle, no sort; the only exchange here
    is the upstream aggregate's. The wide->long direction is what feeds
    metric stores and per-metric windowing without one-job-per-column."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    price_c = (
        F.col("l_extendedprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(qty_c).cast("bigint").alias("qty_c"),
        F.sum(price_c).cast("bigint").alias("price_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["qty_c", "price_c", "n_rows"],
        "metric",
        "value",
    )
