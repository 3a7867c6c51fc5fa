r"""Round-10 wave 124: the ExactSubstr REMOVAL transform (sd2) and the
composed nightly incremental-corpus loop (px7).

sd2 completes wave 123's sd1: where sd1 *accounts* repeated-span
coverage, sd2 performs Lee et al. 2021's actual output operation — emit
the CLEANED text with every repeated span dropped except one canonical
occurrence corpus-wide.

px7 closes VERDICT r9 item 6: d13 (delta-vs-corpus candidate probe) and
merge1 (MERGE INTO) existed separately; px7 registers the composed loop
a production training-data pipeline runs nightly — delta → LSH probe →
exact confirm → MERGE into the standing corpus state (matched corpus
docs absorb their duplicates, novel deltas insert) — with an exact
state-replay oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _grams_select, _register, _t

_W = 10  # window width in tokens (matches sd1; Lee et al. use 50 BPE)

# ==========================================================================
# sd2: exact-substring removal rewrite — emit the cleaned text
# ==========================================================================

# Same planted construction as sd1 (every 61st doc REPLACED by a shared
# 12-token boilerplate run, every 13th PREFIXED with it), same 10-token
# window hashing, same >=2-distinct-docs repeat rule. New here: the
# canonical occurrence per repeated window hash — (MIN doc_id, then MIN
# position within that doc) — SURVIVES; every other occurrence is
# removal-marked, and the query emits each document's cleaned token
# stream (positions not covered by any marked window). doc 0 is the
# %61 all-boilerplate doc, so it is the canonical keeper and survives
# intact; every other %61 doc rewrites to EMPTY; %13 docs lose exactly
# their 12-token prefix. The oracle replays the identical span
# arithmetic at token-position level.
_SD2_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))),
                                           '\s+'),
                     t -> LENGTH(t) > 0) AS toks0
  FROM documents
), planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 61 = 0
              THEN list_transform(range(1, 13),
                                  i -> 'boiler' || CAST(i AS VARCHAR))
              WHEN doc_id % 13 = 0
              THEN list_concat(list_transform(range(1, 13),
                                              i -> 'boiler' || CAST(i AS VARCHAR)),
                               toks0)
              ELSE toks0 END AS toks
  FROM base
), win AS (
  SELECT doc_id, i,
         md5(array_to_string(list_slice(toks, i, i + {_W} - 1), ' ')) AS wh
  FROM planted, UNNEST(range(1, len(toks) - {_W} + 2)) AS t(i)
  WHERE len(toks) >= {_W}
), rep AS (
  SELECT wh, MIN(doc_id) AS cdoc
  FROM win GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
), canon AS (
  SELECT w.wh, r.cdoc, MIN(w.i) AS ci
  FROM win w JOIN rep r ON w.wh = r.wh AND w.doc_id = r.cdoc
  GROUP BY w.wh, r.cdoc
), marked AS (
  SELECT w.doc_id, w.i
  FROM win w JOIN canon c ON w.wh = c.wh
  WHERE NOT (w.doc_id = c.cdoc AND w.i = c.ci)
), cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, UNNEST(range(i, i + {_W})) AS pos FROM marked
  )
), toksrc AS (
  SELECT doc_id, i, toks[i] AS tok
  FROM planted, UNNEST(range(1, len(toks) + 1)) AS t(i)
), kept AS (
  SELECT t.doc_id, t.i, t.tok
  FROM toksrc t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.pos
  WHERE c.pos IS NULL
), cleaned AS (
  SELECT doc_id, COUNT(*) AS kept_tokens,
         md5(array_to_string(list(tok ORDER BY i), ' ')) AS clean_md5
  FROM kept GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(len(p.toks) AS BIGINT) AS n_toks,
       CAST(COALESCE(c.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(p.toks) - COALESCE(c.kept_tokens, 0) AS BIGINT)
         AS removed_tokens,
       COALESCE(c.clean_md5, md5('')) AS clean_md5
FROM planted p LEFT JOIN cleaned c ON p.doc_id = c.doc_id
"""


@_register("sd2_substring_rewrite", _SD2_SQL)
def sd2_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal rewrite (Lee et al. 2021, the production verb
    sd1's accounting precedes): for every 10-token window repeated across
    >= 2 distinct documents, ONE canonical occurrence survives corpus-wide
    — (min doc_id, min position) — and every other occurrence's span is
    dropped from its document; the query emits the cleaned token stream
    (released as md5 + kept/removed counts so the hash certifies the
    exact rewritten text). Planting (sd1's): every 61st doc IS the shared
    12-token boilerplate (doc 0 becomes the canonical keeper; the rest
    rewrite to empty — md5('') rides the hash), every 13th is prefixed
    with it (loses exactly the prefix); natural text passes through
    untouched unless genuinely repeated.

    100 TB shape: the repeat detection is sd1's ONE combinable aggregate
    on the window hash (the only high-cardinality shuffle); the canonical
    choice adds one aggregate over the (already reduced) repeated-hash
    frame; and the REWRITE is per-document array surgery — covered
    positions are collected per doc (bounded by doc length) and the
    cleaned text is a single higher-order `filter` over the token array,
    so the engine never explodes the corpus to token-position rows (the
    oracle does, for clarity, at oracle scale). One doc_id-keyed join
    carries the bounded cover sets back; no global sort, no suffix
    array — the same maximality-for-fixed-width tradeoff sd1 documents.
    Reference parity: extends sd1 (queries_wave123.py); reference has no
    sub-document operation (Angelo_ETL_Task.py is whole-row ETL)."""
    from .operators.partitioning import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks0 = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda t: F.length(t) > 0,
    )
    boiler = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda i: F.concat(F.lit("boiler"), i.cast("string")),
    )
    planted = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 61 == 0, boiler)
        .when(F.col("doc_id") % 13 == 0, F.concat(boiler, toks0))
        .otherwise(toks0)
        .alias("toks"),
    ).localCheckpoint(eager=True)  # feeds win + the final rewrite join
    win = planted.where(F.size("toks") >= _W).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (_W - 1)),
                lambda i: F.struct(
                    i.alias("i"),
                    F.md5(
                        F.concat_ws(
                            " ", F.slice("toks", i, F.lit(_W))
                        ).cast("binary")
                    ).alias("wh"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", "w.i", "w.wh").localCheckpoint(eager=True)
    # win feeds rep, canon AND marked — materialize once (the
    # signature-frame lesson from the verify gotchas)
    rep = (
        win.groupBy("wh")
        .agg(
            F.count_distinct("doc_id").alias("_nd"),
            F.min("doc_id").alias("cdoc"),
        )
        .where(F.col("_nd") >= 2)
        .select("wh", "cdoc")
    )
    canon = (
        win.join(rep, ["wh"])
        .where(F.col("doc_id") == F.col("cdoc"))
        .groupBy("wh", "cdoc")
        .agg(F.min("i").alias("ci"))
    )
    marked = (
        win.join(canon, ["wh"])
        .where(~((F.col("doc_id") == F.col("cdoc")) & (F.col("i") == F.col("ci"))))
        .select("doc_id", "i")
    )
    cov = (
        marked.select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + (_W - 1))).alias(
                "pos"
            ),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("_cov"))
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, idx: ~F.array_contains(
            F.coalesce(F.col("_cov"), F.array().cast("array<int>")),
            idx + 1,
        ),
    )
    return planted.join(cov, "doc_id", "left").select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.size(kept).cast("bigint").alias("kept_tokens"),
        (F.size("toks") - F.size(kept)).cast("bigint").alias("removed_tokens"),
        F.md5(F.concat_ws(" ", kept).cast("binary")).alias("clean_md5"),
    )


# ==========================================================================
# px7: the composed nightly incremental-corpus loop — probe → confirm →
# MERGE into the standing corpus state
# ==========================================================================

# d13's exact ground-truth decision (inverted-gram-index word-3-gram
# jaccard >= 0.6, min-id match) extended by the MERGE replay: matched
# corpus docs absorb their duplicate arrivals (WHEN MATCHED → counter
# update), unmatched deltas insert (WHEN NOT MATCHED → insert). Same
# construction and the same empirical-floor caveat as d13: planted
# clones are caught with certainty (identical signatures); natural
# cross-split pairs measured >= 0.75 with nothing in (0.35, 0.75).
_PX7_SQL = f"""
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
    ), absorbed AS (
      SELECT match_id, CAST(COUNT(*) AS BIGINT) AS n_absorbed
      FROM confirmed GROUP BY match_id
    )
    SELECT c.doc_id, CAST(0 AS BIGINT) AS is_new,
           CAST(COALESCE(a.n_absorbed, 0) AS BIGINT) AS absorbed,
           CAST(LENGTH(COALESCE(c.text, '')) AS BIGINT) AS len_chars
    FROM corpus c LEFT JOIN absorbed a ON c.doc_id = a.match_id
    UNION ALL
    SELECT d.doc_id, CAST(1 AS BIGINT) AS is_new,
           CAST(0 AS BIGINT) AS absorbed,
           CAST(LENGTH(COALESCE(d.text, '')) AS BIGINT) AS len_chars
    FROM delta d LEFT JOIN confirmed m ON d.doc_id = m.did
    WHERE m.did IS NULL
    """


@_register("px7_incremental_corpus", _PX7_SQL)
def px7_incremental_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly incremental-corpus loop, composed end-to-end: today's
    delta (the %10 slice plus planted clones of every 37th corpus doc at
    id+1_000_000) is LSH-probed against the standing corpus (d13's
    asymmetric probe — the corpus never self-joins), candidates are
    exact-confirmed at word-3-gram jaccard >= 0.6, and the decision
    MERGEs into the corpus state: WHEN MATCHED the surviving corpus doc
    absorbs the duplicate arrival (absorbed counter += matches, min-id
    survivor rule), WHEN NOT MATCHED the novel delta doc inserts. The
    released frame IS the post-merge corpus state — one row per final
    doc with (is_new, absorbed, len_chars) — so the driver hash
    certifies the exact state a production pipeline would persist, not
    just the per-delta decision (that is d13's row).

    100 TB shape: the probe equi-join on (band, band_hash) touches only
    the buckets the delta hits — cost ∝ |delta|, independent of corpus
    size (operators/dedup.py:408); the exact confirm joins shingle
    arrays onto the (small) candidate list; the MERGE is ONE broadcast
    left join of the absorbed-counts frame (bounded by |delta|) onto the
    corpus plus a broadcast anti-join for novelty and a union — the
    corpus is scanned once and never shuffled on a key. Plan-audited: no
    BNLJ/cartesian, no corpus self-join. Reference parity: this replaces
    the reference's truncate-and-reload-the-whole-table pattern
    (Angelo_ETL_Task.py:276-374) with the loop that works at any scale;
    composes d13 (queries_wave119.py) with merge1's MERGE semantics
    (queries_wave118.py)."""
    from .operators.dedup import jaccard_pairs, lsh_probe_candidates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # bounded 1-row agg: clone-offset guard (the sdd1 pattern)
    _max_id = d.agg(F.max("doc_id")).first()[0]
    if _max_id is None or _max_id >= 1_000_000:
        raise RuntimeError(
            f"px7 clone offset 1_000_000 collides with real doc_id space "
            f"(max={_max_id}); raise the offset on BOTH engine and oracle"
        )
    corpus = d.where(F.col("doc_id") % 10 != 0)
    clones = corpus.where(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"
    )
    delta = d.where(F.col("doc_id") % 10 == 0).unionByName(clones)
    cand = lsh_probe_candidates(delta, corpus).select(
        F.col("probe_id").alias("id_a"), F.col("index_id").alias("id_b")
    )
    confirmed = (
        jaccard_pairs(delta.unionByName(corpus), cand, threshold=0.6)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("match_id"))
        .localCheckpoint(eager=True)  # feeds the absorb agg AND the anti-join
    )
    absorbed = confirmed.groupBy("match_id").agg(
        F.count(F.lit(1)).alias("n_absorbed")
    )
    survivors = corpus.join(
        F.broadcast(absorbed),
        corpus["doc_id"] == absorbed["match_id"],
        "left",
    ).select(
        "doc_id",
        F.lit(0).cast("bigint").alias("is_new"),
        F.coalesce(F.col("n_absorbed"), F.lit(0))
        .cast("bigint")
        .alias("absorbed"),
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("bigint")
        .alias("len_chars"),
    )
    inserts = delta.join(
        F.broadcast(confirmed),
        delta["doc_id"] == confirmed["id_a"],
        "left_anti",
    ).select(
        "doc_id",
        F.lit(1).cast("bigint").alias("is_new"),
        F.lit(0).cast("bigint").alias("absorbed"),
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("bigint")
        .alias("len_chars"),
    )
    return survivors.unionByName(inserts)
