"""Round-3 wave 37: off-policy evaluation, vocabulary growth, and
interval concurrency.

- ops1: inverse-propensity-score policy value estimation — the
  counterfactual "what would the click-only policy have earned" readout
  from logged uniform-ish data, IPS and SNIPS both as exact rational
  (numerator, denominator) pairs.
- heaps1: Heaps'-law vocabulary growth — distinct vocabulary at five
  nested corpus prefixes, the curve that sizes tokenizer vocabularies
  and predicts OOV rates as the corpus scales.
- conc1: maximum concurrency by the +1/-1 delta sweep — the classic
  interval algorithm (meeting rooms / connection pools / peak load):
  running sum over sorted boundary events, max per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# ops1: IPS / SNIPS off-policy value estimation
# =========================================================================

_OPS1_SQL = """
WITH logs AS (
  SELECT event_type AS action,
         CAST(CAST(value AS DECIMAL(18,6)) * 100 AS DECIMAL(38,6))
           AS reward_cents
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN action = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(CAST(5 * SUM(CASE WHEN action = 'click'
                              THEN reward_cents ELSE 0 END)
                 AS DECIMAL(38,6)) AS VARCHAR) AS ips_num,
       CAST(COUNT(*) AS BIGINT) AS ips_den,
       CAST(CAST(SUM(CASE WHEN action = 'click'
                          THEN reward_cents ELSE 0 END)
                 AS DECIMAL(38,6)) AS VARCHAR) AS snips_num,
       CAST(SUM(CASE WHEN action = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS snips_den
FROM logs
"""


@_register("ops1_ips_offpolicy", _OPS1_SQL)
def ops1_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation: estimate the value of the deterministic
    target policy 'always click' from logged data where the behavior
    policy chose among 5 actions (propensity 1/5, so the importance
    weight on matching rows is 5). IPS = 5 * sum(matching rewards) / n
    and the self-normalized SNIPS = sum(matching rewards) / n_match are
    both emitted as exact (numerator, denominator) pairs in decimal
    cents — the counterfactual readout a recommendation/ads team runs
    before an A/B test, with zero float drift (the division is the
    consumer's). One combinable aggregate over the log scan."""
    ev = _t(spark, sf_dir, "events")
    logs = ev.select(
        F.col("event_type").alias("action"),
        (F.col("value").cast("decimal(18,6)") * 100)
        .cast("decimal(38,6)")
        .alias("reward_cents"),
    )
    match = F.col("action") == "click"
    return logs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(match, 1).otherwise(0)).cast("bigint").alias("n_match"),
        # exact DECIMAL(38,6) released as its fixed-6-decimal string on
        # BOTH engines: DuckDB's pandas path degrades >18-digit decimals
        # to float64 ('50975500.0' vs Spark's '50975500.000000') — the
        # round-7 full-replica divergence class (same fix as dt1).
        (5 * F.sum(F.when(match, F.col("reward_cents")).otherwise(0)))
        .cast("decimal(38,6)")
        .cast("string")
        .alias("ips_num"),
        F.count(F.lit(1)).alias("ips_den"),
        F.sum(F.when(match, F.col("reward_cents")).otherwise(0))
        .cast("decimal(38,6)")
        .cast("string")
        .alias("snips_num"),
        F.sum(F.when(match, 1).otherwise(0)).cast("bigint").alias(
            "snips_den"
        ),
    )


# =========================================================================
# heaps1: vocabulary growth at nested corpus prefixes
# =========================================================================

_HEAPS1_SQL = """
WITH m AS (
  SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS m FROM documents
), cuts AS (
  SELECT k, (m.m * k) // 5 AS cutoff
  FROM (SELECT UNNEST([1, 2, 3, 4, 5]) AS k), m
), words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
)
SELECT CAST(c.k AS BIGINT) AS prefix_fifth,
       CAST(c.cutoff AS BIGINT) AS n_docs_cutoff,
       CAST(COUNT(DISTINCT CASE WHEN wo.doc_id < c.cutoff
                                THEN wo.w END) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN wo.doc_id < c.cutoff THEN 1 ELSE 0 END)
            AS BIGINT) AS tokens
FROM words wo CROSS JOIN cuts c
GROUP BY c.k, c.cutoff
"""


@_register("heaps1_vocab_growth", _HEAPS1_SQL)
def heaps1_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct vocabulary and token count
    at five nested corpus prefixes (docs below k/5 of the id space) —
    the curve that sizes tokenizer vocabularies, predicts OOV rates as
    a corpus scales, and (with zipf1's spectrum) characterizes whether
    more data still buys new words. The five prefixes are computed in
    ONE pass over the exploded token frame (conditional distinct per
    cutoff — the cube-by-cutoff shape), not five scans. At 100 TB the
    cutoffs become ingestion-time snapshots and each row of this output
    is one snapshot's vocab metric, mergeable by max."""
    d = _t(spark, sf_dir, "documents")
    m = d.agg((F.max("doc_id") + 1).cast("bigint").alias("m"))
    cuts = (
        spark.range(1, 6)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(m))
        .select("k", F.expr("(m * k) div 5").alias("cutoff"))
    )
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        words.crossJoin(F.broadcast(cuts))
        .groupBy(
            F.col("k").cast("bigint").alias("prefix_fifth"),
            F.col("cutoff").cast("bigint").alias("n_docs_cutoff"),
        )
        .agg(
            F.countDistinct(
                F.when(F.col("doc_id") < F.col("cutoff"), F.col("w"))
            )
            .cast("bigint")
            .alias("vocab"),
            F.sum(
                F.when(F.col("doc_id") < F.col("cutoff"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("tokens"),
        )
    )


# =========================================================================
# conc1: max concurrency via the +1/-1 delta sweep
# =========================================================================

_CONC1_SQL = """
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(MIN(epoch_us(ts)) AS BIGINT) AS s,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS e
  FROM events GROUP BY 1, 2
), deltas AS (
  SELECT day, s AS t, CAST(1 AS BIGINT) AS d, user_id FROM spans
  UNION ALL
  SELECT day, e + 1 AS t, CAST(-1 AS BIGINT) AS d, user_id FROM spans
), running AS (
  SELECT day, t, d,
         CAST(SUM(d) OVER (PARTITION BY day ORDER BY t, d, user_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS live
  FROM deltas
)
SELECT day,
       CAST(MAX(live) AS BIGINT) AS peak_concurrency,
       CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
FROM running GROUP BY day
"""


@_register("conc1_max_concurrency", _CONC1_SQL)
def conc1_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day by the classic +1/-1 delta sweep: each
    user's daily activity span emits a +1 at its start and a -1 just
    after its end; the running sum over time-sorted deltas IS the live
    concurrency, and its max is the day's peak — the meeting-rooms /
    connection-pool / peak-load algorithm, O(n log n) against the
    O(n*buckets) spine-join a naive formulation writes. The sweep
    ordering is pinned by (t, d, user_id): at an exact boundary tie the
    +1 sorts before the -1 (d ascending puts -1 first... the -1 is at
    e+1, so true ties only occur between different users, where order
    cannot change the max). Exact integer microseconds; one window per
    day partition over the 2x-spans delta frame."""
    ev = _t(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min(F.unix_micros("ts")).alias("s"),
        F.max(F.unix_micros("ts")).alias("e"),
    )
    starts = spans.select(
        "day", F.col("s").alias("t"), F.lit(1).cast("bigint").alias("d"),
        "user_id",
    )
    ends = spans.select(
        "day",
        (F.col("e") + 1).alias("t"),
        F.lit(-1).cast("bigint").alias("d"),
        "user_id",
    )
    deltas = starts.unionAll(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("t", "d", "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.select(
        "day", "d", F.sum("d").over(w).alias("live")
    )
    return running.groupBy("day").agg(
        F.max("live").cast("bigint").alias("peak_concurrency"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_spans"),
    )
