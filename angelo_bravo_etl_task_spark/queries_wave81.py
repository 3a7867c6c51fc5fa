r"""Round-5 wave 81: boundary-respecting greedy packing, mixture epoch
planning.

- pk3: the packing variant SFT loaders actually use — documents NEVER
  straddle a sequence boundary: greedy first-fit in doc order per
  source shard, truncating only documents longer than the 256-token
  budget. Genuinely sequential (whether a doc opens a new sequence
  depends on the fill level left by every previous doc), so no window
  frame expresses it — the ewma1/seq2 decomposition applies: per-shard
  doc lists are bounded, ONE deterministic sorted fold per shard
  assigns (seq, offset), the recursive-CTE oracle replays the same
  recurrence, and the no-straddle law is certified per row.
- mix2: the data-scheduling arithmetic behind mixture training: given
  per-source token masses and DIVERSITY-derived mixture weights
  (each source's distinct-term count — data-derived so the plan moves
  with the corpus), compute each source's token target for a
  2×-corpus budget and the integer epoch count (repetition factor)
  that meets it, with the two ceiling laws certified per row:
  planned ≥ target, and planned − target < one epoch (tightness).

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no training-pipeline surface; these extend the packing family (pk1,
pk2) with the boundary-respecting variant and the mixture family
(mix1, sm2, dm1) with the epoch-plan arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_PK3_BUDGET = 256

# =========================================================================
# pk3: greedy first-fit packing, documents never straddle
# =========================================================================

_PK3_SQL = rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source,
         CAST(LENGTH(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                 t -> LENGTH(t) > 0)) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS i
  FROM documents
), k AS (
  SELECT doc_id, source, n_tokens, i,
         LEAST(n_tokens, {_PK3_BUDGET}) AS kept
  FROM toks
), r AS (
  SELECT doc_id, source, n_tokens, kept, i,
         CAST(1 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS offset_,
         kept AS fill
  FROM k WHERE i = 1
  UNION ALL
  SELECT k.doc_id, k.source, k.n_tokens, k.kept, k.i,
         CASE WHEN r.fill + k.kept > {_PK3_BUDGET}
              THEN r.seq_id + 1 ELSE r.seq_id END,
         CASE WHEN r.fill + k.kept > {_PK3_BUDGET}
              THEN 0 ELSE r.fill END,
         CASE WHEN r.fill + k.kept > {_PK3_BUDGET}
              THEN k.kept ELSE r.fill + k.kept END
  FROM r JOIN k ON k.source = r.source AND k.i = r.i + 1
)
SELECT source, doc_id, n_tokens, kept, seq_id,
       offset_ AS seq_offset,
       (offset_ + kept <= {_PK3_BUDGET}) AS no_straddle_ok
FROM r
"""


@_register("pk3_no_straddle_packing", _PK3_SQL)
def pk3_no_straddle_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit sequence packing where documents NEVER straddle
    a boundary — the SFT/instruction-tuning loader's contract (pk1's
    concat-and-chunk splits docs; pk2 pads per doc; pk3 packs whole
    docs until the next would overflow, then opens a new sequence,
    truncating only docs longer than the whole 256-token budget). The
    fill-level dependence makes it sequential — no window frame or
    gaps-and-islands trick expresses "depends on the offset the
    previous doc received" — so it runs as the ewma1/seq2 shape: one
    sorted F.aggregate fold per source shard over the bounded per-shard
    doc list, exploded back to rows; the oracle replays the identical
    recurrence as a recursive CTE. `no_straddle_ok` (offset + kept ≤
    budget) is the contract, certified per row. At 100 TB shards are
    the parallel unit (pk1's rule) and each fold is one task; exact
    BIGINT token arithmetic throughout."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    ).cast("bigint")
    series = (
        d.select(
            "source",
            "doc_id",
            n_tokens.alias("n_tokens"),
        )
        .withColumn(
            "kept", F.least(F.col("n_tokens"), F.lit(_PK3_BUDGET))
        )
        .groupBy("source")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "n_tokens", "kept"))
            ).alias("s")
        )
    )

    def merge(acc, v):
        wrap = (acc["fill"] + v["kept"]) > _PK3_BUDGET
        seq = acc["seq"] + F.when(wrap, 1).otherwise(0)
        off = F.when(wrap, F.lit(0).cast("bigint")).otherwise(acc["fill"])
        fill = F.when(wrap, v["kept"]).otherwise(acc["fill"] + v["kept"])
        return F.struct(
            seq.alias("seq"),
            fill.alias("fill"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        v["doc_id"].alias("doc_id"),
                        v["n_tokens"].alias("n_tokens"),
                        v["kept"].alias("kept"),
                        seq.alias("seq_id"),
                        off.alias("seq_offset"),
                    )
                ),
            ).alias("out"),
        )

    init = F.expr(
        "named_struct('seq', CAST(1 AS BIGINT), 'fill', CAST(0 AS BIGINT),"
        " 'out', CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT,"
        " n_tokens: BIGINT, kept: BIGINT, seq_id: BIGINT,"
        " seq_offset: BIGINT>>))"
    )
    folded = series.select(
        "source",
        F.aggregate("s", init, merge, lambda acc: acc["out"]).alias("out"),
    )
    ex = folded.select("source", F.explode("out").alias("p"))
    return ex.select(
        "source",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.n_tokens").alias("n_tokens"),
        F.col("p.kept").alias("kept"),
        F.col("p.seq_id").alias("seq_id"),
        F.col("p.seq_offset").alias("seq_offset"),
        ((F.col("p.seq_offset") + F.col("p.kept")) <= _PK3_BUDGET).alias(
            "no_straddle_ok"
        ),
    )


# =========================================================================
# mix2: diversity-weighted mixture epoch plan with ceiling laws
# =========================================================================

_MIX2_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                            t -> LENGTH(t) > 0)) AS term
  FROM documents
), per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS tokens,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS w
  FROM toks GROUP BY source
), tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS corpus_tokens,
         CAST(SUM(w) AS BIGINT) AS sum_w
  FROM per
)
SELECT p.source, p.tokens, p.w,
       (2 * t.corpus_tokens * p.w) // t.sum_w AS target_tokens,
       ((2 * t.corpus_tokens * p.w) // t.sum_w + p.tokens - 1) // p.tokens
         AS epochs,
       (((2 * t.corpus_tokens * p.w) // t.sum_w + p.tokens - 1) // p.tokens)
         * p.tokens AS planned_tokens,
       ((((2 * t.corpus_tokens * p.w) // t.sum_w + p.tokens - 1) // p.tokens)
         * p.tokens >= (2 * t.corpus_tokens * p.w) // t.sum_w) AS ceil_ok,
       ((((2 * t.corpus_tokens * p.w) // t.sum_w + p.tokens - 1) // p.tokens)
         * p.tokens - (2 * t.corpus_tokens * p.w) // t.sum_w < p.tokens)
         AS tight_ok
FROM per p CROSS JOIN tot t
"""


@_register("mix2_epoch_plan", _MIX2_SQL)
def mix2_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture epoch planning — the integer arithmetic that turns
    mixture weights into a repetition schedule: each source's weight is
    its DISTINCT-TERM count (diversity-derived, so the plan moves with
    the corpus — the dp2 relative rule), its token target is the
    2×-corpus budget apportioned by weight (target = 2·corpus·w DIV
    Σw), and its epoch count is the ceiling of target over its own
    token mass via the pure-integer identity ceil(a/b) = (a+b−1) DIV b.
    Both ceiling laws are certified per row: `ceil_ok` (planned ≥
    target — the schedule never undershoots) and `tight_ok` (planned −
    target < one pass of the source — never a full wasted epoch). This
    is mix1's temperature-weighting sibling on the schedule side: what
    a data loader multiplies each shard list by. One explode + one
    combinable aggregate per source; the totals broadcast; everything
    exact BIGINT."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("term"),
    )
    per = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("tokens"),
        F.countDistinct("term").cast("bigint").alias("w"),
    )
    tot = per.agg(
        F.sum("tokens").cast("bigint").alias("corpus_tokens"),
        F.sum("w").cast("bigint").alias("sum_w"),
    )
    j = per.crossJoin(F.broadcast(tot))
    target = F.expr("(2 * corpus_tokens * w) DIV sum_w")
    epochs = F.expr(
        "((2 * corpus_tokens * w) DIV sum_w + tokens - 1) DIV tokens"
    )
    return j.select(
        "source",
        "tokens",
        "w",
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        (epochs * F.col("tokens")).alias("planned_tokens"),
        (epochs * F.col("tokens") >= target).alias("ceil_ok"),
        (epochs * F.col("tokens") - target < F.col("tokens")).alias(
            "tight_ok"
        ),
    )
