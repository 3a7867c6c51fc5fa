r"""Round-9 wave 121: chat-template linting (chat1) and context-budget
truncation accounting (trunc1) — the two checks an SFT data pipeline
runs between formatting and tokenization.

chat1 lints synthesized conversations against the template contract
(roles alternate, conversation ends with assistant, no empty turns)
with all three violation classes PLANTED so every branch fires at
every SF. trunc1 measures what each candidate context budget costs in
lost tokens, with budgets derived from the corpus median length so the
truncated/untouched branches both fire under any data generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# ==========================================================================
# chat1: chat-template linting
# ==========================================================================

# Conversations synthesized deterministically from documents: conv_id =
# doc_id // 3, turn = doc_id % 3, base roles (system, user, assistant) —
# a VALID 3-turn template. Planted violations (mutually exclusive conv
# slices): %23 -> turn 2's role corrupted to 'user' (breaks alternation
# AND the assistant ending); %29 (non-%23) -> turn 1's text emptied.
_CHAT1_SQL = """
WITH turns AS (
  SELECT doc_id // 3 AS conv_id,
         doc_id % 3 AS turn,
         CASE
           WHEN (doc_id // 3) % 23 = 0 AND doc_id % 3 = 2 THEN 'user'
           WHEN doc_id % 3 = 0 THEN 'system'
           WHEN doc_id % 3 = 1 THEN 'user'
           ELSE 'assistant' END AS role,
         CASE WHEN (doc_id // 3) % 29 = 0 AND (doc_id // 3) % 23 <> 0
                   AND doc_id % 3 = 1 THEN ''
              ELSE text END AS content
  FROM documents
), complete AS (
  SELECT conv_id FROM turns GROUP BY conv_id HAVING COUNT(*) = 3
), flagged AS (
  SELECT t.conv_id,
         MAX(CASE WHEN t.turn >= 1 AND t.role = prev_role
                  THEN 1 ELSE 0 END) AS repeat_role,
         MAX(CASE WHEN t.turn = 2 AND t.role <> 'assistant'
                  THEN 1 ELSE 0 END) AS bad_ending,
         MAX(CASE WHEN LENGTH(TRIM(t.content)) = 0
                  THEN 1 ELSE 0 END) AS empty_turn
  FROM (
    SELECT conv_id, turn, role, content,
           LAG(role) OVER (PARTITION BY conv_id ORDER BY turn) AS prev_role
    FROM turns
  ) t
  JOIN complete c ON t.conv_id = c.conv_id
  GROUP BY t.conv_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(COALESCE(SUM(CASE WHEN repeat_role = 0 AND bad_ending = 0
                              AND empty_turn = 0 THEN 1 END), 0)
            AS BIGINT) AS n_valid,
       CAST(COALESCE(SUM(repeat_role), 0) AS BIGINT) AS n_repeat_role,
       CAST(COALESCE(SUM(bad_ending), 0) AS BIGINT) AS n_bad_ending,
       CAST(COALESCE(SUM(empty_turn), 0) AS BIGINT) AS n_empty_turn,
       CAST(COALESCE(MIN(CASE WHEN repeat_role = 1 THEN conv_id END), -1)
            AS BIGINT) AS first_repeat_conv,
       CAST(COALESCE(MIN(CASE WHEN empty_turn = 1 THEN conv_id END), -1)
            AS BIGINT) AS first_empty_conv
FROM flagged
"""


@_register("chat1_template_lint", _CHAT1_SQL)
def chat1_template_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template linting — the validation an SFT pipeline runs before
    a single conversation reaches the tokenizer: roles must alternate
    (no adjacent repeats via LAG over turn order), the conversation must
    end with the assistant, and no turn may be empty. Conversations are
    synthesized deterministically from documents (conv = doc_id // 3,
    turns = system/user/assistant) with all violation classes PLANTED in
    disjoint conv slices (%23 corrupts the closing role — firing BOTH
    the alternation and ending rules, as real template bugs do; %29
    empties a turn), so every counter is non-zero at every SF and the
    valid majority passes. Incomplete trailing conversations are
    excluded by the completeness gate, exactly as a real batcher drops
    partial groups. Released: per-class violation counts + first
    offending conv ids (the triage columns an operator actually reads).

    100 TB shape: one window (LAG within conv — conversations are short
    and numerous, so partitions are uniform), one per-conv aggregate,
    one 1-row rollup; all map-side combinable. The lint never
    materializes the concatenated template string — it checks structure
    before paying formatting cost."""
    d = _t(spark, sf_dir, "documents")
    conv = F.expr("doc_id div 3")  # = DuckDB // on non-negatives
    turn = F.col("doc_id") % 3
    turns = d.select(
        conv.alias("conv_id"),
        turn.alias("turn"),
        F.when((conv % 23 == 0) & (turn == 2), F.lit("user"))
        .when(turn == 0, F.lit("system"))
        .when(turn == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(
            (conv % 29 == 0) & (conv % 23 != 0) & (turn == 1), F.lit("")
        )
        .otherwise(F.col("text"))
        .alias("content"),
    )
    complete = (
        turns.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == 3)
        .select("conv_id")
    )
    w = Window.partitionBy("conv_id").orderBy("turn")
    lagged = turns.join(complete, "conv_id").select(
        "conv_id",
        "turn",
        "role",
        "content",
        F.lag("role").over(w).alias("prev_role"),
    )
    flagged = lagged.groupBy("conv_id").agg(
        F.max(
            F.when(
                (F.col("turn") >= 1)
                & (F.col("role") == F.col("prev_role")),
                1,
            ).otherwise(0)
        ).alias("repeat_role"),
        F.max(
            F.when(
                (F.col("turn") == 2) & (F.col("role") != "assistant"), 1
            ).otherwise(0)
        ).alias("bad_ending"),
        F.max(
            F.when(F.length(F.trim("content")) == 0, 1).otherwise(0)
        ).alias("empty_turn"),
    )
    valid = (
        (F.col("repeat_role") == 0)
        & (F.col("bad_ending") == 0)
        & (F.col("empty_turn") == 0)
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.coalesce(F.sum(F.when(valid, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_valid"),
        F.coalesce(F.sum("repeat_role"), F.lit(0))
        .cast("bigint")
        .alias("n_repeat_role"),
        F.coalesce(F.sum("bad_ending"), F.lit(0))
        .cast("bigint")
        .alias("n_bad_ending"),
        F.coalesce(F.sum("empty_turn"), F.lit(0))
        .cast("bigint")
        .alias("n_empty_turn"),
        F.coalesce(
            F.min(F.when(F.col("repeat_role") == 1, F.col("conv_id"))),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("first_repeat_conv"),
        F.coalesce(
            F.min(F.when(F.col("empty_turn") == 1, F.col("conv_id"))),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("first_empty_conv"),
    )


# ==========================================================================
# trunc1: context-budget truncation accounting
# ==========================================================================

# Budgets derived from the corpus MEDIAN token count (floored — the fe8
# lesson), so both the truncated and untouched branches fire under ANY
# data generation: half the corpus exceeds the median budget by
# definition; the 2x-median budget leaves a long tail untouched.
_TRUNC1_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              t -> LENGTH(t) > 0)) AS BIGINT) AS n_toks
  FROM documents
), med AS (
  SELECT CAST(FLOOR(median(n_toks)) AS BIGINT) AS m FROM toks
), budgets AS (
  SELECT UNNEST([GREATEST(m // 2, 1), GREATEST(m, 1), GREATEST(2 * m, 1)])
           AS budget
  FROM med
)
SELECT b.budget,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN t.n_toks > b.budget THEN 1 END), 0)
            AS BIGINT) AS n_truncated,
       CAST(SUM(LEAST(t.n_toks, b.budget)) AS BIGINT) AS tokens_kept,
       CAST(COALESCE(SUM(CASE WHEN t.n_toks > b.budget
                              THEN t.n_toks - b.budget END), 0)
            AS BIGINT) AS tokens_lost
FROM toks t CROSS JOIN budgets b
GROUP BY b.budget
"""


@_register("trunc1_context_budget", _TRUNC1_SQL)
def trunc1_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-budget truncation accounting: for each candidate context
    length (median//2, median, 2*median tokens — data-derived so neither
    branch can go vacuous under regeneration), how many documents get
    truncated and how many tokens the cut costs. This is the table a
    team looks at before fixing max_seq_len: tokens_lost at each budget
    IS the training-data price of the shorter context. LEAST/GREATEST
    stay on BIGINTs throughout (no decimal promotion — the fe6 gotcha
    doesn't apply to integer types).

    100 TB shape: one token-count scan (pure Column), a 1-row median
    aggregate, a 3-row budget frame broadcast via crossJoin, and a 3-row
    rollup — the per-doc×budget intermediate never shuffles; only the
    3-group aggregate does, map-side combined."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split("text", r"\s+"), lambda t: F.length(t) > 0
            )
        ).cast("bigint").alias("n_toks"),
    )
    med = toks.agg(
        F.floor(F.median("n_toks")).cast("bigint").alias("m")
    )
    budgets = med.select(
        F.explode(
            F.array(
                F.greatest(F.expr("m div 2"), F.lit(1)),
                F.greatest(F.col("m"), F.lit(1)),
                F.greatest(2 * F.col("m"), F.lit(1)),
            )
        ).alias("budget")
    )
    return (
        toks.crossJoin(F.broadcast(budgets))
        .groupBy("budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("n_toks") > F.col("budget"), 1)),
                F.lit(0),
            ).cast("bigint").alias("n_truncated"),
            F.sum(F.least(F.col("n_toks"), F.col("budget")))
            .cast("bigint")
            .alias("tokens_kept"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("n_toks") > F.col("budget"),
                        F.col("n_toks") - F.col("budget"),
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("tokens_lost"),
        )
    )
