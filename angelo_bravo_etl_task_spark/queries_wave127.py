r"""Round-10 wave 127: the composed clean -> pack pipeline (px8) — sd2's
ExactSubstr rewrite feeding fixed-budget sequence packing, the two-step
every pretraining data pipeline runs between raw text and the trainer.

Shares sd2's CTE chain (`_SD2_CTES`) and engine helper
(`sd2_cleaned_frame`) so the rewrite semantics cannot drift between the
accounting query and this composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t
from .sd2_shared import _SD2_CTES, sd2_cleaned_frame

_PX8_BUDGET = 256  # tokens per packed training sequence

# Packing replay: per source, CLEANED docs (empty rewrites dropped) in
# doc_id order; a doc starts at the running total of all earlier cleaned
# docs in its source — seq_id = S div B, seq_offset = S % B (pk1's
# boundary-spanning rule). The cleaned token counts come from the SAME
# CTE chain sd2 releases, so a rewrite bug reds both queries identically.
_PX8_SQL = f"""
WITH {_SD2_CTES}, nclean AS (
  SELECT p.doc_id, CAST(COALESCE(c.kept_tokens, 0) AS BIGINT) AS n_clean
  FROM planted p LEFT JOIN cleaned c ON p.doc_id = c.doc_id
), src AS (
  SELECT doc_id, source FROM documents
), packed AS (
  SELECT n.doc_id, s.source, n.n_clean,
         CAST(COALESCE(SUM(n.n_clean) OVER (
           PARTITION BY s.source ORDER BY n.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM nclean n JOIN src s ON n.doc_id = s.doc_id
  WHERE n.n_clean > 0
)
SELECT doc_id, source, n_clean,
       CAST(start_tok // {_PX8_BUDGET} AS BIGINT) AS seq_id,
       CAST(start_tok % {_PX8_BUDGET} AS BIGINT) AS seq_offset
FROM packed
"""


@_register("px8_clean_pack_pipeline", _PX8_SQL)
def px8_clean_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed clean -> pack pipeline: sd2's exact-substring REWRITE
    (repeated spans removed, one canonical occurrence corpus-wide)
    feeds fixed-budget sequence packing (pk1's greedy running-sum rule,
    256 tokens per sequence, per-source shards, boundary-spanning docs)
    — the exact two-step a pretraining pipeline runs between raw text
    and the trainer, composed in ONE lazy plan. Documents whose rewrite
    is empty (the non-canonical all-boilerplate %61 docs) drop out
    before packing, exactly as production discards fully-deduped texts.
    Released per kept doc: cleaned token count and its (seq_id,
    seq_offset) position. Both stages share single definitions with
    their standalone queries (`_SD2_CTES`/`sd2_cleaned_frame`; pk1's
    packing arithmetic), so a rewrite or packing bug reds this AND the
    standalone rows identically — drift-proof by construction.

    100 TB shape: sd2's contract (ONE window-hash shuffle + per-doc
    array surgery) plus ONE running-sum window PARTITIONED by source
    (uniform shards here; with few huge sources the per-source prefix
    sum decomposes exactly like ord1's two-level bucket row numbering —
    bucket within source, stitch boundary sums — the same note bud1/wt1
    carry for their global prefixes) and one doc_id-keyed join for the
    source column. Reference parity: the
    composed replacement for the reference's transform()+load() staging
    (Angelo_ETL_Task.py:150-374) in the training-data domain."""
    cleaned = sd2_cleaned_frame(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    nclean = (
        cleaned.select(
            "doc_id", F.size("kept_toks").cast("bigint").alias("n_clean")
        )
        .join(src, "doc_id")
        .where(F.col("n_clean") > 0)
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = nclean.select(
        "doc_id",
        "source",
        "n_clean",
        F.coalesce(F.sum("n_clean").over(w), F.lit(0))
        .cast("bigint")
        .alias("start_tok"),
    )
    return packed.select(
        "doc_id",
        "source",
        "n_clean",
        F.expr(f"CAST(start_tok DIV {_PX8_BUDGET} AS BIGINT)").alias(
            "seq_id"
        ),
        (F.col("start_tok") % _PX8_BUDGET).cast("bigint").alias(
            "seq_offset"
        ),
    )
