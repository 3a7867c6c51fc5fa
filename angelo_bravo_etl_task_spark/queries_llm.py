"""LLM training-data pipeline queries, wave 2: repetition filtering,
PII redaction, benchmark-contamination detection, rollup cascading, and
streaming exact dedup.

These extend the training-data surface (dedup d1-d6, similarity x1-x4,
text tx1-tx6, multimodal mm1-mm3, prep pipeline px2) with the remaining
operations a 100 TB pre-training corpus pass needs:

- tx7: Gopher-style repetition signals (duplicate n-gram fractions) — the
  quality gate that catches boilerplate/looping text.
- tx8: PII scrubbing — regex redaction with exact match accounting. The
  synthetic corpus has no PII, so both engines append a deterministic
  PII-shaped suffix first; the check then covers the redaction itself.
- ct1: train/test contamination — flag corpus documents sharing word
  n-grams with a held-out benchmark set (the decontamination join every
  serious pre-training run performs).
- ts2: hierarchical rollup — daily aggregates computed FROM hourly
  aggregates (the continuous-aggregate/hypertable-rollup pattern: at
  100 TB you re-aggregate the small rollup, never re-scan the raw facts).
- e6: streaming exact dedup via dropDuplicatesWithinWatermark — the
  stateful streaming operator the batch dedup family (d1/d2) maps to in a
  Structured Streaming ingest path; state for a key is freed once the
  watermark passes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import text as TX
from .queries import _register, _t
from .operators.localframe import local_rows_df

# ---------------------------------------------------------------------------
# tx7: repetition signals
# ---------------------------------------------------------------------------

@_register(
    "tx7_repetition",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                         t -> LENGTH(t) > 0) AS w
      FROM documents
    ), grams AS (
      SELECT doc_id, w,
             list_transform(generate_series(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i + 1]) AS bi,
             list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS tri
      FROM toks
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS rep_words,
           CASE WHEN len(bi) > 0
                THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
                ELSE 0.0 END AS rep_dup_bigram_frac,
           CASE WHEN len(tri) > 0
                THEN 1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri)
                ELSE 0.0 END AS rep_dup_trigram_frac,
           CASE WHEN len(w) > 0
                THEN CAST(list_max(list_transform(list_distinct(w),
                          u -> len(list_filter(w, x -> x = u)))) AS DOUBLE) / len(w)
                ELSE 0.0 END AS rep_top_word_frac
    FROM grams
    """,
)
def tx7_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (operators/text.py::
    repetition_features): duplicate-bigram/trigram fractions and the
    most-frequent-word share, all exact-integer-count IEEE divisions.
    Scales as a pure narrow projection — no shuffle, no Python."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.repetition_features(d).select(
        "doc_id",
        "rep_words",
        "rep_dup_bigram_frac",
        "rep_dup_trigram_frac",
        "rep_top_word_frac",
    )


# ---------------------------------------------------------------------------
# tx8: PII redaction
# ---------------------------------------------------------------------------

# The same juiced-up text expression in both engines: the corpus has no PII,
# so a deterministic PII-shaped suffix (email + E.164-ish phone derived from
# doc_id) is appended before scrubbing.
_TX8_SQL = r"""
WITH juiced AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text,
            '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
FROM juiced
"""


@_register("tx8_pii_redaction", _TX8_SQL)
def tx8_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/text.py::redact/match_count): count then
    redact emails and phone numbers with patterns from the Java-regex/RE2
    shared syntax subset, hash the scrubbed text for value comparison.
    Narrow, codegen-resident — the 100 TB shape is scan → regexp_replace →
    write, zero exchanges."""
    d = _t(spark, sf_dir, "documents")
    juiced = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = TX.redact(
        TX.redact(juiced, TX.EMAIL_RE, "<EMAIL>"), TX.PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        TX.match_count(juiced, TX.EMAIL_RE).alias("n_emails"),
        TX.match_count(juiced, TX.PHONE_RE).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# ct1: benchmark contamination
# ---------------------------------------------------------------------------

_CT1_N = 3  # n-gram order; 3 gives collision density on the synthetic vocab
            # (production decontamination uses 8-13-grams — same plumbing)

_CT1_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 2),
                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
    FROM toks WHERE len(w) >= 3
  )
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
)
SELECT d.doc_id, COUNT(*) AS n_shared_grams
FROM grams d JOIN bench b USING (g)
WHERE d.doc_id % 50 <> 0
GROUP BY d.doc_id
"""


@_register("ct1_contamination", _CT1_SQL)
def ct1_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: every corpus document sharing at
    least one word n-gram with the held-out benchmark slice (doc_id % 50
    = 0 stands in for the eval set), with the shared-gram count. Corpus
    grams are deduped per document BEFORE the join (array_distinct inside
    codegen), the benchmark gram set broadcasts (eval suites are tiny
    relative to a corpus), so cost is one broadcast hash join over the
    exploded grams — no shuffle of the corpus. At 100 TB, join on
    xxhash64(gram) instead of the string to shrink exchange width; kept as
    the raw string here so the DuckDB oracle is hash-exact."""
    from .operators.partitioning import spread

    # spread: the source is ONE parquet split, and the n-gram expression is
    # the dominant cost — without repartitioning it runs on a single core.
    # localCheckpoint: the bench branch and the corpus branch both consume
    # `grams`; materializing once halves the n-gram work (6.6 s -> ~1.5 s
    # at sf0.1).
    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_ngrams(F.col("text"), _CT1_N))).alias(
            "g"
        ),
    ).localCheckpoint(eager=True)
    bench = (
        grams.where(F.col("doc_id") % 50 == 0).select("g").distinct()
    )
    return (
        grams.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# ---------------------------------------------------------------------------
# ts2: hierarchical rollup (continuous-aggregate cascade)
# ---------------------------------------------------------------------------

@_register(
    "ts2_rollup_cascade",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def ts2_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: hourly aggregates first, then the
    daily level re-aggregated FROM the hourly rollup (sum-of-sums,
    sum-of-counts) — never from the raw facts. The oracle aggregates raw
    events directly; equality holds because the partial sums are exact
    DECIMAL (a double-typed cascade would NOT reassociate exactly). This
    is the continuous-aggregate pattern: at 100 TB the hourly table is
    ~10⁴× smaller than the events it summarizes, so every coarser
    resolution (day/week/month) is a cheap re-aggregation of the rollup."""
    from .operators.agg import dec

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value", 18, 6)).alias("sv"),
    )
    return hourly.groupBy(F.to_date("hour").alias("day")).agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("sv").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# e6: streaming exact dedup (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

_E6_RUN_SEQ = [0]


@_register(
    "e6_stream_dedup",
    """
    SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute
    FROM events
    """,
)
def e6_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup as a REAL streaming run (streaming/windows.py
    ::streaming_dedup): dropDuplicatesWithinWatermark on (event_type,
    minute-bucket) emits the first arrival per key and frees a key's state
    once the watermark passes it — the ingest-side twin of batch d1. Only
    the key columns are projected out, so the surviving-row
    nondeterminism of first-arrival dedup cannot leak into the result:
    the emitted set IS the distinct key set, which the oracle mirrors."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
        streaming_dedup,
    )

    _E6_RUN_SEQ[0] += 1
    sink = f"e6_dedup_sink_{_E6_RUN_SEQ[0]}"
    with stream_partitions(spark):
        stream = stream_events_raw(spark, sf_dir, watermark="30 minutes")
        keyed = stream.select(
            "event_type",
            F.date_trunc("minute", "ts").alias("minute"),
            "ts",
        )
        deduped = streaming_dedup(keyed, keys=("event_type", "minute")).select(
            "event_type", "minute"
        )
        return run_available_now(deduped, sink, timeout=120)


_E7_RUN_SEQ = [0]


@_register(
    "e7_stream_filter_dedup",
    """
    SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute
    FROM events
    WHERE value >= 50.0 AND event_type <> 'error'
    """,
)
def e7_stream_filter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest COMPOSITION — the minimal continuous LLM-data
    intake: a quality gate (predicate filter, evaluated before any state
    is created, so rejected events never touch the dedup store) feeding
    stateful exact dedup (dropDuplicatesWithinWatermark), one streaming
    pass. e6 proves the dedup operator alone; this proves operators
    COMPOSE in a single streaming query with state still bounded by the
    watermark. Oracle: the equivalent batch filter + DISTINCT (single-
    batch invariant per stream_events_raw)."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
        streaming_dedup,
    )

    _E7_RUN_SEQ[0] += 1
    sink = f"e7_fd_sink_{_E7_RUN_SEQ[0]}"
    with stream_partitions(spark):
        stream = stream_events_raw(spark, sf_dir, watermark="30 minutes")
        gated = stream.where(
            (F.col("value") >= 50.0) & (F.col("event_type") != "error")
        ).select(
            "event_type", F.date_trunc("minute", "ts").alias("minute"), "ts"
        )
        deduped = streaming_dedup(gated, keys=("event_type", "minute")).select(
            "event_type", "minute"
        )
        return run_available_now(deduped, sink, timeout=120)


# =========================================================================
# pk1: sequence packing — documents into fixed-token-budget training rows
# =========================================================================

_PK1_BUDGET = 256

_PK1_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source,
         LENGTH(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                            t -> LENGTH(t) > 0)) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM toks
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       start_tok // {_PK1_BUDGET} AS seq_id,
       start_tok % {_PK1_BUDGET} AS seq_offset
FROM packed
"""


@_register("pk1_sequence_packing", _PK1_SQL)
def pk1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the training-data step that concatenates documents
    into fixed-token-budget rows (_PK1_BUDGET = 256 tokens): each doc gets
    the (sequence id, offset) where its tokens start in the packed stream,
    exactly the concat-then-chunk packing LLM loaders use (docs may straddle
    a boundary; the loader splits them). The assignment is a pure prefix-sum:
    ONE window (cumulative tokens over doc_id order per source shard) and
    two integer ops — no greedy bin-packing loop, no driver state. At 100 TB
    the partition key is the shard (source); each shard's prefix sum is an
    independent sort, and the global op is one shuffle. Deterministic by
    construction (doc_id is a total order within shard), so the SQL mirror
    is exact."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    prev = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(prev), F.lit(0).cast("long"))
    return toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / F.lit(_PK1_BUDGET)).alias("seq_id"),
        (start % F.lit(_PK1_BUDGET)).alias("seq_offset"),
    )


# =========================================================================
# sm2: data-mixture resampling — per-language hash sampling to target
# weights
# =========================================================================

# (lang, hex-threshold of the first 4 md5 nibbles): en kept at 14/16,
# de 8/16, fr 4/16, everything else 2/16 — the "upsample head language,
# downsample tail" mixture every pretraining corpus spec encodes.
_SM2_THRESHOLDS = [("en", "e000"), ("de", "8000"), ("fr", "4000")]
_SM2_DEFAULT = "2000"

_SM2_SQL = f"""
WITH keyed AS (
  SELECT lang, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 4) AS bucket
  FROM documents
)
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM keyed
WHERE {" OR ".join(f"(lang = '{lang}' AND bucket < '{thr}')" for lang, thr in _SM2_THRESHOLDS)}
   OR (lang NOT IN ({", ".join(f"'{lang}'" for lang, _ in _SM2_THRESHOLDS)})
       AND bucket < '{_SM2_DEFAULT}')
GROUP BY lang
"""


@_register("sm2_mixture_resample", _SM2_SQL)
def sm2_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture resampling: sample each language stratum at its target
    weight with a DETERMINISTIC hash predicate — md5(doc_id || ':mix')
    prefix compared against a per-stratum hex threshold (en 87.5%, de 50%,
    fr 25%, tail langs 12.5%). Same engine-portable idiom as sm1: the
    decision is a pure function of the row key, so reruns, retries, and
    other engines (the oracle) select the IDENTICAL row set — no RNG state,
    no sampling seed to ship. At 100 TB this is a narrow filter fused into
    the scan (no shuffle before the per-lang rollup), and changing the
    mixture is a threshold-table edit, not a re-shard. The ':mix' salt
    decorrelates this sample from any other hash-sample of the same keys
    (sm1, px2's split)."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 4
    )
    keep = F.lit(False)
    seen = []
    for lang, thr in _SM2_THRESHOLDS:
        keep = keep | ((F.col("lang") == lang) & (bucket < thr))
        seen.append(lang)
    keep = keep | (~F.col("lang").isin(seen) & (bucket < _SM2_DEFAULT))
    return (
        d.where(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# =========================================================================
# tx9: bigram novelty — corpus-frequency profile of each document
# =========================================================================

_TX9_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i + 1])) AS g
    FROM toks WHERE len(w) >= 2
  )
), df AS (
  SELECT g, COUNT(*) AS doc_freq FROM grams GROUP BY g
)
SELECT grams.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CASE WHEN df.doc_freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique
FROM grams JOIN df USING (g)
GROUP BY grams.doc_id
"""


@_register("tx9_bigram_novelty", _TX9_SQL)
def tx9_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty profile: per document, the count of distinct word
    bigrams and how many of them appear NOWHERE else in the corpus
    (document frequency 1). High-novelty documents carry information no
    other document has; near-zero novelty marks templated/boilerplate text
    — a cheap, exact memorization/diversity signal for corpus curation,
    complementing tx7's within-document repetition. Integer outputs keep
    the oracle exact.

    Shape — exploits that a df=1 bigram belongs to exactly ONE document:
    the exploded (doc_id, gram) frame is computed ONCE — spread() first
    (the source is a single parquet split, so the n-gram expression would
    otherwise run on one core) and eagerly localCheckpoint'ed so the two
    consuming aggregates don't re-derive it. n_bigrams is a per-doc count;
    n_unique is one HASH aggregate — groupBy(gram) keeping count + the
    owning min(doc_id), filter count=1, re-count per doc. The tx5-style
    count() window here would SORT the (mostly-unique) bigram universe —
    measured 6.6 s vs 4.2 s at sf0.1 (the residual is the n-gram
    expression itself, shared by ct1). At 100 TB, swap the checkpoint for
    persist(DISK) and hash the bigram to shrink exchange width."""
    from .operators.partitioning import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_ngrams(F.col("text"), 2))).alias(
            "g"
        ),
    ).localCheckpoint(eager=True)
    n_bigrams = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams")
    )
    uniq_per_doc = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("owner"))
        .where(F.col("c") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return n_bigrams.join(uniq_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_bigrams",
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
    )


# =========================================================================
# dp1: incremental ingest dedup — new batch vs standing corpus fingerprints
# =========================================================================

_DP1_SQL = """
WITH corpus AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
), batch AS (
  SELECT doc_id, md5(text) AS h, n_chars FROM documents WHERE doc_id % 7 = 0
)
SELECT b.doc_id, b.n_chars
FROM batch b LEFT JOIN corpus c ON b.h = c.h
WHERE c.h IS NULL
"""


@_register("dp1_incremental_dedup", _DP1_SQL)
def dp1_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the ingest-time variant of d1: an arriving
    batch (doc_id % 7 = 0 stands in for today's crawl) is admitted only
    where its content hash is absent from the standing corpus fingerprint
    set, via a LEFT ANTI join on md5. At 100 TB the fingerprint table is
    the persistent artifact (16 bytes/doc, bucketed by hash prefix) so
    each daily batch joins against fingerprints, never against corpus
    text — the batch side shuffles |batch|, the corpus side is a one-time
    layout. d1 dedups a corpus against itself; this is the steady-state
    pipeline that keeps it deduped."""
    d = _t(spark, sf_dir, "documents")
    corpus = (
        d.where(F.col("doc_id") % 7 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    batch = d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.md5("text").alias("h"), "n_chars"
    )
    return batch.join(corpus, "h", "left_anti").select("doc_id", "n_chars")


# =========================================================================
# sh1: curriculum sharding — ordered, size-capped training shards
# =========================================================================


@_register(
    "sh1_curriculum_shards",
    """
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    """,
)
def sh1_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum sharding — the EXPORT step of a training-data pipeline:
    documents are range-partitioned by a quality/difficulty score
    (n_chars here) so shard k holds one contiguous score band (a training
    loop reading shards in order gets curriculum ordering for free), and
    ``maxRecordsPerFile`` caps every shard file (dataloaders want
    uniform-sized shards, not one fat partition). The oracle checks
    content preservation through the rewrite; the curriculum property
    itself — pairwise-disjoint per-file score ranges and the record cap —
    is asserted in tests/test_operators.py (range split points come from
    sampling, so they are layout, not semantics)."""
    import os

    from .queries_scale import _SCRATCH

    sink = os.path.join(
        _SCRATCH, "sh1_shards_" + os.path.basename(sf_dir.rstrip("/"))
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    (
        d.repartitionByRange(4, "n_chars", "doc_id")
        .sortWithinPartitions("n_chars", "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", "100")
        .parquet(sink)
    )
    back = spark.read.parquet(sink)
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# =========================================================================
# px3: the continuous-ingest flagship — gate -> dedup -> enrich -> window
# in ONE streaming query
# =========================================================================

_PX3_RUN_SEQ = [0]


@_register(
    "px3_streaming_ingest_pipeline",
    """
    WITH dim(event_type, weight) AS (
      VALUES ('click', 1), ('view', 2), ('purchase', 5), ('signup', 3)
    ), gated AS (
      SELECT DISTINCT ON (event_id) event_id, ts, event_type, value
      FROM events
      WHERE value >= 1.0 AND event_type <> 'error'
    ), agg AS (
      SELECT d.weight,
             g.event_type,
             time_bucket(INTERVAL '10 minutes', g.ts) AS window_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(g.value AS DECIMAL(18,2)) * d.weight) AS DOUBLE)
               AS weighted_value
      FROM gated g JOIN dim d ON g.event_type = d.event_type
      GROUP BY 1, 2, 3
    ), wm AS (
      SELECT MAX(ts) - INTERVAL '30 minutes' AS horizon FROM events
    )
    SELECT event_type, window_start, n_events, weighted_value
    FROM agg, wm
    WHERE agg.window_start + INTERVAL '10 minutes' <= wm.horizon
    """,
)
def px3_streaming_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONTINUOUS-INGEST flagship: every streaming stage this engine
    provides, composed into ONE streaming query — (1) stateless quality
    gate (evaluated before any state exists, so rejects never cost state),
    (2) stateful exact dedup on event_id (dropDuplicatesWithinWatermark,
    state freed past the watermark), (3) stream-static broadcast
    enrichment (no join state), (4) watermarked tumbling weighted
    aggregate in append mode. This is e7 + e8 fused — the point is that
    the stages COMPOSE under one watermark with bounded state, which is
    the production property; each stage alone is already oracle-checked.
    The oracle mirrors gate -> DISTINCT ON(event_id) -> join -> window
    with the append-mode finality cutoff. event_id is unique in the
    source, so dedup's survivor choice cannot affect values."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
        streaming_dedup,
    )

    _PX3_RUN_SEQ[0] += 1
    sink = f"px3_ingest_sink_{_PX3_RUN_SEQ[0]}"
    dim = local_rows_df(spark, 
        [("click", 1), ("view", 2), ("purchase", 5), ("signup", 3)],
        "event_type string, weight int",
    )
    with stream_partitions(spark):
        stream = stream_events_raw(spark, sf_dir, watermark="30 minutes")
        gated = stream.where(
            (F.col("value") >= 1.0) & (F.col("event_type") != "error")
        ).select("event_id", "ts", "event_type", "value")
        deduped = streaming_dedup(gated, keys=("event_id",))
        enriched = deduped.join(F.broadcast(dim), "event_type").select(
            "event_type",
            "ts",
            (F.col("value").cast("decimal(18,2)") * F.col("weight")).alias(
                "wv"
            ),
        )
        agg = (
            enriched.groupBy(
                "event_type", F.window("ts", "10 minutes").alias("w")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("wv").cast("double").alias("weighted_value"),
            )
            .select(
                "event_type",
                F.col("w.start").alias("window_start"),
                "n_events",
                "weighted_value",
            )
        )
        return run_available_now(agg, sink, timeout=180)


# =========================================================================
# ck1: document chunking with overlap — the pretraining/RAG splitter
# =========================================================================

_CK1_C = 64  # chunk size (tokens)
_CK1_S = 48  # stride (=> 16-token overlap)

_CK1_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), chunks AS (
  SELECT doc_id,
         (s - 1) // {_CK1_S} AS chunk_idx,
         list_slice(w, s, LEAST(len(w), s + {_CK1_C} - 1)) AS chunk
  FROM toks, UNNEST(generate_series(1, len(w), {_CK1_S})) AS t(s)
  WHERE len(w) > 0
)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM chunks
"""


@_register("ck1_doc_chunking", _CK1_SQL)
def ck1_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking with overlap — the splitter every pretraining /
    RAG pipeline runs before anything else: fixed 64-token windows at
    stride 48 (16-token overlap so no boundary context is lost), emitted
    as (doc_id, chunk_idx, token count, content hash). One sequence() +
    posexplode + slice, all inside codegen — 1 -> N fan-out with zero
    Python and zero shuffles; at 100 TB this runs at scan speed and the
    only cost is output volume (~n/stride x chunk rows). The oracle
    rebuilds identical chunks with list_slice over the same stride grid,
    so window boundaries, the short tail chunks, and content all
    hash-match."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", TX.tokens(F.col("text")).alias("w")).where(
        F.size("w") > 0
    )
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(1), F.size("w"), F.lit(_CK1_S))
        ).alias("chunk_idx", "s"),
        F.col("w"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.slice(F.col("w"), F.col("s"), F.lit(_CK1_C)).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


# =========================================================================
# vb1: vocabulary build — ranked terms with dense ids
# =========================================================================

_VB1_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, unnest(w) AS term FROM toks
), df AS (
  SELECT term, COUNT(*) AS doc_freq FROM grams GROUP BY term
)
SELECT term, doc_freq,
       ROW_NUMBER() OVER (ORDER BY doc_freq DESC, term) AS token_id
FROM df
QUALIFY token_id <= 1000
"""


@_register("vb1_vocab_build", _VB1_SQL)
def vb1_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction — the tokenizer-artifact query: per-term
    document frequency, top 1000 terms, each assigned a DENSE token id by
    rank (deterministic tiebreak on the term). The global ROW_NUMBER runs
    over the AGGREGATED term frame (vocab-sized, thousands of rows), never
    the corpus — the same aggregate-first discipline as ord1/qt1; corpus
    cost is one explode + one hash aggregate. This is hh1's count feeding
    ord1's enumeration: the output table IS the vocab file a tokenizer
    ships."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    grams = d.select(
        "doc_id", F.explode(F.array_distinct(TX.tokens(F.col("text")))).alias("term")
    )
    df_counts = grams.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("term"))
    return (
        df_counts.withColumn("token_id", F.row_number().over(w))
        .where(F.col("token_id") <= 1000)
    )


# =========================================================================
# dm1: per-source document caps — crawl-curation quota
# =========================================================================

_DM1_SQL = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents
)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS kept_chars
FROM ranked WHERE rnk <= 40
GROUP BY source
"""


@_register("dm1_per_source_caps", _DM1_SQL)
def dm1_per_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps — the crawl-curation quota that stops one
    domain from dominating a corpus: keep at most 40 documents per source,
    best-first by a quality proxy (length, deterministic id tiebreak), and
    account what survived. One window partitioned by source (cardinality =
    number of domains — large in a real crawl, so the partitioning
    distributes) + one aggregate. The per-domain cap composes with dp1's
    fingerprint dedup and sm2's mixture weights as the standard curation
    stack."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 40)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("n_chars").cast("bigint")).alias("kept_chars"),
        )
    )


# =========================================================================
# an2: k-anonymity suppression over quasi-identifiers
# =========================================================================

_AN2_SQL = """
WITH g AS (
  SELECT lang, source,
         COUNT(*) OVER (PARTITION BY lang, source) AS grp_n
  FROM documents
), m AS (
  SELECT lang,
         CASE WHEN grp_n < 8 THEN '*' ELSE source END AS source_masked
  FROM g
)
SELECT lang, source_masked, COUNT(*) AS n_docs
FROM m GROUP BY lang, source_masked
"""


@_register("an2_k_anonymity", _AN2_SQL)
def an2_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression over the quasi-identifier pair (lang,
    source): any combination shared by fewer than k=8 documents is
    re-identifying, so its source is generalized to '*' before release —
    the privacy gate that pairs with tx8's direct-identifier redaction
    when corpora leave the trust boundary. Two hash aggregates on the
    same key (group sizes, then the post-mask recount) — the window in
    the oracle is expressed as a groupBy + broadcast-back join in Spark
    so the quasi-identifier cardinality, not the row count, bounds the
    small side. At 100 TB the QI-combination frame is still tiny
    (|langs| x |sources|), so the mask join stays a broadcast."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    sizes = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("grp_n"))
    masked = d.join(F.broadcast(sizes), ["lang", "source"]).select(
        "lang",
        F.when(F.col("grp_n") < 8, F.lit("*"))
        .otherwise(F.col("source"))
        .alias("source_masked"),
    )
    return masked.groupBy("lang", "source_masked").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# =========================================================================
# tx10: TF-IDF keyword extraction (rational idf — no libm in the oracle)
# =========================================================================

_TX10_SQL = r"""
WITH exploded AS (
  SELECT doc_id, UNNEST(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                    t -> LENGTH(t) > 0)) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM exploded GROUP BY doc_id, term
), withdf AS (
  SELECT doc_id, term, tf,
         COUNT(*) OVER (PARTITION BY term) AS doc_freq
  FROM tf
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term,
         CAST(tf * n_docs AS DOUBLE) / doc_freq AS score
  FROM withdf, n
)
SELECT doc_id, term, score, rnk FROM (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


@_register("tx10_tfidf_keywords", _TX10_SQL)
def tx10_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction by TF-IDF ranking — tx5 ranks by
    raw TF; this weights rarity in, which is what surfaces
    document-DISTINCTIVE terms for tagging, retrieval boosts, and topic
    drift monitors. The idf is kept RATIONAL (tf * N / df — one exact
    integer product, one raw IEEE division) instead of the textbook
    log(N/df): the ranking is identical (log is monotone) and the oracle
    match stays bit-exact, where libm's log would differ in the last ulp
    between engines. Same three high-cardinality shuffles as tx5 (the DF
    window reads the single tf subtree once — no double-evaluated join
    back); the corpus size N is a 1-row cross join, broadcast for free."""
    from .operators.text import tokens
    from .operators.windows import top_k_per_group

    d = _t(spark, sf_dir, "documents")
    exploded = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = exploded.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    with_df = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = with_df.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        (
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("doc_freq")
        ).alias("score"),
    )
    return top_k_per_group(
        scored,
        ["doc_id"],
        [F.col("score").desc(), F.col("term")],
        k=3,
        alias="rnk",
    )


# =========================================================================
# bpe1: BPE merge-candidate statistics (the tokenizer-training inner scan)
# =========================================================================

_BPE1_SQL = r"""
WITH words AS (
  SELECT LOWER(UNNEST(list_filter(
           regexp_split_to_array(TRIM(text), '\s+'), t -> LENGTH(t) > 0)))
         AS w
  FROM documents
), wf AS (
  SELECT w, COUNT(*) AS freq FROM words WHERE LENGTH(w) >= 2 GROUP BY w
), pairs AS (
  SELECT substr(wf.w, i, 2) AS pair, wf.freq
  FROM wf, UNNEST(generate_series(1, LENGTH(wf.w) - 1)) AS t(i)
), agg AS (
  SELECT pair, SUM(freq) AS n FROM pairs GROUP BY pair
)
SELECT pair, n, rnk FROM (
  SELECT pair, CAST(n AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
  FROM agg
) WHERE rnk <= 20
"""


@_register("bpe1_merge_candidates", _BPE1_SQL)
def bpe1_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer-training inner loop's scan step: corpus-weighted
    adjacent-symbol-pair frequencies (here at the character stage — the
    first merge iteration), top-20 merge candidates. The scale shape is
    the point: pair generation runs over the WORD-FREQUENCY table, not
    the corpus (the classic BPE optimization — each distinct word
    contributes its pairs once, weighted by freq), so the explode factor
    is bounded by vocabulary size x word length, and the heavy corpus
    pass is one hash aggregate. Iterating merges re-runs this scan on a
    re-segmented vocab — a driver loop over a frame of |vocab| rows, not
    over 100 TB of text. Adjacent pairs via substr over a posexploded
    index sequence — pure codegen, no Python."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("w")
    ).where(F.length("w") >= 2)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        "freq",
        F.posexplode(F.sequence(F.lit(1), F.length("w") - 1)).alias(
            "pos", "i"
        ),
        F.col("w"),
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "freq")
    agg = pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
    w_rank = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        agg.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= 20)
        .select("pair", F.col("n").cast("bigint").alias("n"), "rnk")
    )


# =========================================================================
# fh1/fh2: feature hashing (the hashing trick) + inverted-index sparse
# cosine — the no-model embedding path for corpus-scale similarity
# =========================================================================

_FH1_SQL = r"""
WITH terms AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                            t -> LENGTH(t) > 0)) AS term
  FROM documents
), hashed AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(term), 1, 4) AS BIGINT) % 64 AS dim,
         CASE WHEN CAST('0x' || substr(md5(term), 5, 1) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM terms
)
SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS weight
FROM hashed GROUP BY doc_id, dim HAVING SUM(s) <> 0
"""


@_register("fh1_feature_hashing", _FH1_SQL)
def fh1_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009): each
    token is hashed straight to one of 64 dimensions with a hash-derived
    ±1 sign, giving every document a fixed-width sparse vector with NO
    vocabulary table, no fit step, and no driver state — the embedding
    path that works on the first pass over 100 TB because it is
    embarrassingly parallel and the dimensionality is a constant, not a
    function of the corpus. Signed sums make collisions cancel in
    expectation (the property that preserves inner products). md5-derived
    dim and sign are engine-portable; weights are exact integer sums.
    Zero-weight cells are dropped — the vector is stored sparse,
    (doc_id, dim, weight)."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    h = F.md5(F.col("term"))
    dim = F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 64
    sign = F.when(
        F.conv(F.substring(h, 5, 1), 16, 10).cast("bigint") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        terms.select("doc_id", dim.alias("dim"), sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("bigint").alias("weight"))
        .where(F.col("weight") != 0)
    )


_FH2_SQL = r"""
WITH terms AS (
  SELECT doc_id,
         UNNEST(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                            t -> LENGTH(t) > 0)) AS term
  FROM documents
), hashed AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(term), 1, 4) AS BIGINT) % 64 AS dim,
         CASE WHEN CAST('0x' || substr(md5(term), 5, 1) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM terms
), vec AS (
  SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS weight
  FROM hashed GROUP BY doc_id, dim HAVING SUM(s) <> 0
), norm2 AS (
  SELECT doc_id, SUM(weight * weight) AS n2 FROM vec GROUP BY doc_id
), dots AS (
  SELECT p.doc_id AS query_id, c.doc_id AS neighbor_id,
         SUM(p.weight * c.weight) AS dot
  FROM vec p JOIN vec c ON p.dim = c.dim
  WHERE p.doc_id < 20 AND p.doc_id <> c.doc_id
  GROUP BY p.doc_id, c.doc_id
), scored AS (
  SELECT d.query_id, d.neighbor_id,
         CAST(d.dot AS DOUBLE)
         / (sqrt(CAST(np.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
           AS cos_sim
  FROM dots d
  JOIN norm2 np ON np.doc_id = d.query_id
  JOIN norm2 nc ON nc.doc_id = d.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@_register("fh2_sparse_cosine_topk", _FH2_SQL)
def fh2_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-5 over fh1's sparse hashed vectors via an
    INVERTED-INDEX join — the sparse-similarity shape that scales where
    dense all-pairs cannot: vectors join on the DIMENSION id, so only
    coordinate overlaps generate work (for high-dimensional sparse data
    the dim join prunes most pairs; pairs sharing no dimension never
    materialize, which is also why they can't reach the top-k — their
    dot is 0). Dots are exact integer sums; only the two sqrt norms and
    the final division touch doubles, in identical order on both
    engines. The probe filter (doc_id < 20) pushes into the index scan;
    at 100 TB the same plan runs probe-batch x inverted-index with the
    dim-join shuffle partitioned by dimension id."""
    # vec feeds THREE subtrees (probes, candidates, norms); checkpoint so
    # the tokenize+hash explode runs once, not per join side (same
    # double-compute hazard as the LSH signature self-joins in d3/d7)
    vec = fh1_feature_hashing(spark, sf_dir).localCheckpoint(eager=True)
    norm2 = vec.groupBy("doc_id").agg(
        F.sum(F.col("weight") * F.col("weight")).alias("n2")
    )
    p = (
        vec.where(F.col("doc_id") < 20)
        .select(
            F.col("doc_id").alias("query_id"),
            "dim",
            F.col("weight").alias("pw"),
        )
    )
    dots = (
        p.join(vec.withColumnRenamed("doc_id", "neighbor_id"), "dim")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("pw") * F.col("weight")).alias("dot"))
    )
    np_ = norm2.select(F.col("doc_id").alias("query_id"), F.col("n2").alias("pn2"))
    nc = norm2.select(
        F.col("doc_id").alias("neighbor_id"), F.col("n2").alias("cn2")
    )
    scored = (
        dots.join(F.broadcast(np_), "query_id")
        .join(nc, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("pn2").cast("double"))
                    * F.sqrt(F.col("cn2").cast("double"))
                )
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# =========================================================================
# e9: COMPLETE output mode — the third streaming output mode
# =========================================================================

_E9_RUN_SEQ = [0]

_E9_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


@_register("e9_complete_mode", _E9_SQL)
def e9_complete_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third streaming output mode, COMPLETE: the sink holds the full
    recomputed aggregate after every micro-batch — no watermark, no
    append-finalization cutoff, state = one row per group forever. That
    state contract is exactly why complete mode is ONLY viable for
    low-cardinality aggregates (a live per-type dashboard: 5 groups), and
    why every high-cardinality query in this repo runs append mode with
    a watermark instead; the mode choice IS the scale decision. After the
    availableNow drain the sink equals the batch aggregate, which the
    oracle computes directly — same exact-decimal sum discipline as e1."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
    )

    _E9_RUN_SEQ[0] += 1
    sink = f"e9_complete_sink_{_E9_RUN_SEQ[0]}"
    with stream_partitions(spark):
        stream = stream_events_raw(spark, sf_dir, watermark="10 minutes")
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        return run_available_now(agg, sink, timeout=120, output_mode="complete")


# =========================================================================
# e10: union of streams — two sources merged under one watermark
# =========================================================================

_E10_RUN_SEQ = [0]

_E10_SQL = """
WITH unioned AS (
  SELECT 'web' AS channel, ts, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'txn' AS channel, ts, value FROM events WHERE event_type = 'purchase'
), agg AS (
  SELECT channel,
         time_bucket(INTERVAL '15 minutes', ts) AS window_start,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM unioned GROUP BY 1, 2
)
SELECT channel, window_start, n, sum_value FROM agg
WHERE window_start + INTERVAL '15 minutes'
      <= (SELECT MAX(ts) FROM events
          WHERE event_type IN ('click', 'purchase')) - INTERVAL '10 minutes'
"""


@_register("e10_stream_union", _E10_SQL)
def e10_stream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION of two streams — the multi-source ingest shape (web events +
    transaction feed merging into one sessionless rollup): two readStream
    branches tagged with their channel, unionByName'd, then ONE windowed
    aggregate under ONE watermark. Structured Streaming tracks the
    watermark across all inputs of the single post-union watermark node,
    so one lagging channel correctly holds back finalization — semantics
    a hand-rolled dual-job merge gets wrong. Both branches here read the same single file
    (hermetic harness; production = two Kafka topics), one micro-batch.
    Append-mode oracle needs the usual watermark-finalization cutoff."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
    )

    _E10_RUN_SEQ[0] += 1
    sink = f"e10_union_sink_{_E10_RUN_SEQ[0]}"
    with stream_partitions(spark):
        stream = stream_events_raw(spark, sf_dir, watermark=None)
        web = stream.where(F.col("event_type") == "click").select(
            F.lit("web").alias("channel"), "ts", "value"
        )
        txn = stream.where(F.col("event_type") == "purchase").select(
            F.lit("txn").alias("channel"), "ts", "value"
        )
        # ONE watermark node ABOVE the union: the effective watermark is
        # max(ts over both channels) - delay, which the oracle's cutoff can
        # state exactly (per-branch watermark nodes would make it depend on
        # filter pushdown; see stream_events_raw)
        unioned = web.unionByName(txn).withWatermark("ts", "10 minutes")
        agg = (
            unioned.groupBy(
                "channel", F.window("ts", "15 minutes").alias("w")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                "channel",
                F.col("w.start").alias("window_start"),
                "n",
                "sum_value",
            )
        )
        return run_available_now(agg, sink, timeout=120)


# =========================================================================
# cur1: corpus datasheet — the dataset-card statistics block
# =========================================================================

_CUR1_SQL = r"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
         LEN(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                         t -> LENGTH(t) > 0)) AS n_words
  FROM documents
), q AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM base
)
SELECT
  (SELECT COUNT(*) FROM base) AS n_docs,
  (SELECT COUNT(DISTINCT lang) FROM base) AS n_langs,
  (SELECT COUNT(DISTINCT source) FROM base) AS n_sources,
  (SELECT CAST(SUM(n_chars) AS BIGINT) FROM base) AS total_chars,
  (SELECT CAST(SUM(n_words) AS BIGINT) FROM base) AS total_words,
  (SELECT CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) FROM base)
    AS mean_chars,
  (SELECT COUNT(*) FROM base WHERE n_chars < 200) AS n_short,
  (SELECT MIN(n_chars) FROM q WHERE 2 * rn >= n) AS median_chars
"""


@_register("cur1_corpus_datasheet", _CUR1_SQL)
def cur1_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card statistics block (datasheets for datasets): corpus
    size, language/source diversity, exact char/word totals, mean and
    exact median length, and the short-document count — the numbers every
    corpus release publishes and every curation iteration re-checks. One
    scan computes the row-level stats; the median reuses m1's aggregated
    two-pass shape; distinct counts are partial-aggregated. The oracle
    spells the same block as scalar subqueries. At 100 TB this is one
    job, not a notebook of eight — the point of making the datasheet a
    single registered query."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_words"),
    )
    # median over the AGGREGATED length frame (distinct lengths, not rows)
    # — the qt3 shape; the only unpartitioned window runs over |distinct
    # lengths| rows
    by_len = base.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    cum = by_len.select(
        "n_chars",
        F.sum("cnt")
        .over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cw"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    median = (
        cum.where(2 * F.col("cw") >= F.col("n"))
        .agg(F.min("n_chars").alias("median_chars"))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_words").alias("total_words"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "mean_chars"
        ),
        F.count(F.when(F.col("n_chars") < 200, F.lit(1))).alias("n_short"),
    )
    return stats.crossJoin(F.broadcast(median)).select(
        "n_docs", "n_langs", "n_sources", "total_chars", "total_words",
        "mean_chars", "n_short", "median_chars",
    )


# =========================================================================
# px4: the nightly incremental corpus refresh — dedup, gate, cap, account
# =========================================================================

_PX4_SQL = r"""
WITH corpus AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
), batch AS (
  SELECT doc_id, source, lang, n_chars, md5(text) AS h,
         LEN(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                         t -> LENGTH(t) > 0)) AS n_words
  FROM documents WHERE doc_id % 10 = 0
), batch_deduped AS (
  SELECT * FROM (
    SELECT b.*, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
    FROM batch b
  ) WHERE rn = 1
), novel AS (
  SELECT b.* FROM batch_deduped b
  LEFT JOIN corpus c ON b.h = c.h WHERE c.h IS NULL
), gated AS (
  SELECT * FROM novel WHERE n_chars >= 200 AND n_words >= 30
), capped AS (
  SELECT doc_id, source, lang, n_chars FROM (
    SELECT g.*, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id) AS cap_rn
    FROM gated g
  ) WHERE cap_rn <= 10
)
SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars FROM capped
"""


@_register("px4_incremental_refresh", _PX4_SQL)
def px4_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship #4 — the NIGHTLY corpus refresh, i.e. the pipeline the
    one-shot px2 becomes once a corpus exists: an arriving batch
    (doc_id % 10 = 0) is (1) deduped within itself (first-wins per
    content hash — a crawl re-fetches pages), (2) anti-joined against the
    standing corpus fingerprint set (dp1's shape: the persistent 16-byte
    /doc artifact, never corpus text), (3) quality-gated on length and
    word count, (4) capped per source (dm1's crawl quota, best-first).
    One lazy plan: the batch flows through a hash-partition window, an
    anti-join against the bucketed fingerprint layout, a codegen filter,
    and one more window — every stage keyed on hash/source, nothing
    corpus-sized shuffles. The oracle mirrors all four stages as CTEs, so
    the driver hash-compare certifies the COMPOSITION, not just the
    pieces."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    corpus = (
        d.where(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    batch = d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(tokens(F.col("text"))).alias("n_words"),
    )
    wh = Window.partitionBy("h").orderBy("doc_id")
    batch_deduped = (
        batch.withColumn("rn", F.row_number().over(wh))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    novel = batch_deduped.join(corpus, "h", "left_anti")
    gated = novel.where((F.col("n_chars") >= 200) & (F.col("n_words") >= 30))
    wcap = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        gated.withColumn("cap_rn", F.row_number().over(wcap))
        .where(F.col("cap_rn") <= 10)
        .select(
            "doc_id", "source", "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


# =========================================================================
# aud1: filter audit — every rejected document carries its WHY
# =========================================================================

_AUD1_SQL = r"""
WITH corpus AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
), arrivals AS (
  SELECT doc_id, source, n_chars, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 1000000, source, n_chars, text
  FROM documents WHERE doc_id % 100 = 1
  UNION ALL
  SELECT doc_id + 2000000, source, n_chars, text
  FROM documents WHERE doc_id % 200 = 0
), batch AS (
  SELECT doc_id, source, n_chars, md5(text) AS h,
         LEN(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                         t -> LENGTH(t) > 0)) AS n_words
  FROM arrivals
), staged AS (
  SELECT b.doc_id, b.source, b.n_chars, b.n_words,
         ROW_NUMBER() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn,
         CASE WHEN c.h IS NULL THEN 0 ELSE 1 END AS in_corpus
  FROM batch b LEFT JOIN corpus c ON b.h = c.h
), capped AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS cap_rn
  FROM staged
  WHERE rn = 1 AND in_corpus = 0 AND n_chars >= 200 AND n_words >= 30
)
SELECT s.doc_id,
       CASE WHEN s.rn > 1 THEN 'dup_in_batch'
            WHEN s.in_corpus = 1 THEN 'dup_vs_corpus'
            WHEN s.n_chars < 200 OR s.n_words < 30 THEN 'low_quality'
            WHEN cp.cap_rn > 10 THEN 'over_source_cap'
            ELSE 'accepted' END AS fate
FROM staged s LEFT JOIN capped cp ON cp.doc_id = s.doc_id
"""


@_register("aud1_filter_audit", _AUD1_SQL)
def aud1_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explainable filtering: px4's refresh re-run in AUDIT mode — every
    batch document appears exactly once with its fate ('accepted' or the
    FIRST pipeline stage that rejected it: in-batch duplicate, corpus
    duplicate, quality gate, source cap). Survivor pipelines discard the
    why; the audit is what debugging a corpus composition, reporting to
    data providers, and tuning gates actually needs — and it costs the
    same plan shape (the stages become flags instead of filters, the cap
    window runs over the gate's survivors only, one CASE applies the
    precedence). The oracle mirrors flags and precedence; total row
    count = arrival count by construction, so nothing is silently
    dropped. The clean synthetic corpus has no duplicate texts, so
    arrivals include planted re-fetches of corpus docs and second copies
    of batch docs (dq2's planted-violation discipline) — every fate
    fires."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    corpus = (
        d.where(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("h"), F.lit(1).alias("in_corpus"))
        .distinct()
    )
    # planted arrivals keep every fate non-vacuous: re-fetches of corpus
    # docs (doc_id%100=1, +1e6 ids) trigger dup_vs_corpus, second copies
    # of batch docs (doc_id%200=0, +2e6 ids) trigger dup_in_batch
    base = d.select("doc_id", "source", "n_chars", "text")
    arrivals = (
        base.where(F.col("doc_id") % 10 == 0)
        .unionByName(
            base.where(F.col("doc_id") % 100 == 1).withColumn(
                "doc_id", F.col("doc_id") + 1_000_000
            )
        )
        .unionByName(
            base.where(F.col("doc_id") % 200 == 0).withColumn(
                "doc_id", F.col("doc_id") + 2_000_000
            )
        )
    )
    batch = arrivals.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(tokens(F.col("text"))).alias("n_words"),
    )
    staged = (
        batch.withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        )
        .join(corpus, "h", "left")
        .withColumn("in_corpus", F.coalesce("in_corpus", F.lit(0)))
    )
    gate = (F.col("n_chars") >= 200) & (F.col("n_words") >= 30)
    capped = (
        staged.where((F.col("rn") == 1) & (F.col("in_corpus") == 0) & gate)
        .withColumn(
            "cap_rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id")
                )
            ),
        )
        .select("doc_id", "cap_rn")
    )
    return staged.join(capped, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("rn") > 1, "dup_in_batch")
        .when(F.col("in_corpus") == 1, "dup_vs_corpus")
        .when(~gate, "low_quality")
        .when(F.col("cap_rn") > 10, "over_source_cap")
        .otherwise("accepted")
        .alias("fate"),
    )


# =========================================================================
# url1: URL parsing — the crawl pipeline's per-domain accounting key
# =========================================================================

_URL1_SQL = r"""
WITH urls AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/'
           || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
  FROM documents
), parsed AS (
  SELECT doc_id,
         regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
         regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
  FROM urls
)
SELECT host, lang_param, COUNT(*) AS n_docs,
       MIN(doc_id) AS first_doc
FROM parsed GROUP BY host, lang_param
"""


@_register("url1_parse", _URL1_SQL)
def url1_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing with the built-in parse_url (HOST/QUERY-param
    extraction) — the first operation every crawl pipeline applies,
    because the HOST is the curation key (dm1's per-source caps, robots
    policies, domain blocklists all key on it) and query params carry
    labels. URLs are synthesized deterministically from the catalog
    columns (the corpus carries no raw URLs); the oracle parses the
    same strings with explicit regexes, pinning parse_url's component
    semantics. Codegen projection + one aggregate — scan-speed."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    parsed = d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
    return parsed.groupBy("host", "lang_param").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


# =========================================================================
# luhn1: checksum validation — cutting PII-detector false positives
# =========================================================================

_LUHN1_SQL = r"""
WITH cand AS (
  SELECT doc_id,
         lpad(CAST(doc_id * 9973 % 10000000000 AS VARCHAR), 10, '0')
           AS number
  FROM documents WHERE doc_id % 10 = 0
), digits AS (
  SELECT doc_id, number,
         list_reverse(list_transform(
           regexp_extract_all(number, '[0-9]'), d -> CAST(d AS BIGINT)))
           AS ds
  FROM cand
), checked AS (
  SELECT doc_id, number,
         list_reduce(
           list_transform(
             generate_series(1, len(ds)),
             i -> CASE WHEN i % 2 = 0
                       THEN CASE WHEN ds[i] * 2 > 9 THEN ds[i] * 2 - 9
                                 ELSE ds[i] * 2 END
                       ELSE ds[i] END),
           (a, b) -> a + b) % 10 = 0 AS luhn_ok
  FROM digits
)
SELECT doc_id, number, luhn_ok FROM checked
"""


@_register("luhn1_checksum", _LUHN1_SQL)
def luhn1_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation (built-in luhn_check) over deterministic
    10-digit candidate numbers — the post-filter that keeps a PII
    detector honest: tx8's regexes FIND card-shaped digit runs, the
    checksum separates real card numbers from order ids and timestamps
    (most random digit runs fail Luhn, so this cuts false-positive
    redactions ~10x). The oracle implements the algorithm itself
    (reverse digits, double every second, subtract 9 over 9, sum mod
    10) — exact integer math, so the built-in's semantics are pinned,
    not assumed."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    number = F.lpad(
        ((F.col("doc_id") * 9973) % 10_000_000_000).cast("string"), 10, "0"
    )
    return d.select(
        "doc_id",
        number.alias("number"),
        F.expr(
            "luhn_check(lpad(CAST(doc_id * 9973 % 10000000000 AS STRING),"
            " 10, '0'))"
        ).alias("luhn_ok"),
    )


# =========================================================================
# div1: source-diversity index — the curation KPI, in rational arithmetic
# =========================================================================

_DIV1_SQL = """
WITH counts AS (
  SELECT lang, source, COUNT(*) AS n
  FROM documents GROUP BY lang, source
), per_lang AS (
  SELECT lang,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(n * n) AS BIGINT) AS sum_sq,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM counts GROUP BY lang
)
SELECT lang, n_docs, n_sources,
       1.0 - CAST(sum_sq AS DOUBLE) / (CAST(n_docs AS DOUBLE) * n_docs)
         AS simpson_diversity
FROM per_lang
"""


@_register("div1_simpson_diversity", _DIV1_SQL)
def div1_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson diversity of sources within each language — the
    corpus-composition KPI behind 'is this slice dominated by one
    domain?' (dm1 caps enforce the policy; this measures it). Chosen
    over Shannon entropy DELIBERATELY: 1 - Σ(n_i/N)² needs only integer
    sums and one division-and-subtract in doubles — bit-exact
    cross-engine — where entropy's log() is libm territory the oracle
    discipline excludes; the two rank distributions near-identically.
    Two hash aggregates over the tiny (lang, source) frame."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    per_lang = counts.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    return per_lang.select(
        "lang",
        "n_docs",
        "n_sources",
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n_docs").cast("double") * F.col("n_docs"))
        ).alias("simpson_diversity"),
    )
