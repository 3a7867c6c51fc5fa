r"""Round-5 wave 83: dead-letter-queue ingest with repair, and its
streaming twin.

- dlq1: the three-way ingest routing every production feed needs —
  parse, repair, or quarantine: a JSONL fixture planted with
  deterministic corruption (every 23rd doc's line truncated =
  unparseable DEAD; every 29th doc's integer prefixed with a legacy
  sigil = parseable-but-mistyped REPAIRABLE) is read PERMISSIVE
  with a corrupt-record column, repaired by a declarative transform
  (strip separators, cast), and accounted: conservation (good +
  repaired + dead = lines) is a certified column, and the recovered
  integer total is hash-compared against the oracle computing the
  TRUTH from the source table — the repair provably restored the
  original values, not plausible ones.
- e14: the same fixture as a STREAM (readStream.text, one file per
  micro-batch), routed in foreachBatch into additive counters — a
  commutative-monoid state, so the final accounting is independent of
  how the stream was chunked, checked against the same batch oracle.
  dlq1 is the backfill path, e14 the live path; a feed needs both to
  agree, and the shared oracle certifies exactly that.

Reference parity note: the reference script (Angelo_ETL_Task.py) reads
clean CSVs only; these extend the dirty-ingest family (src6 PERMISSIVE
CSV, vr1 VARIANT) with the quarantine-and-repair loop and its
streaming twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .queries import _register, _t
from .operators.localframe import local_rows_df

# Expected accounting, computed from the SOURCE table with the same
# modular corruption rules — the oracle never reads the fixture, it
# derives what a correct ingest+repair MUST recover (src6's discipline).
_DLQ1_SQL = """
WITH t AS (
  SELECT doc_id, lang, n_chars,
         (doc_id % 23 = 0) AS dead,
         (doc_id % 23 <> 0 AND doc_id % 29 = 0) AS repairable
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN NOT dead AND NOT repairable THEN 1 ELSE 0 END)
            AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN repairable THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repaired,
       CAST(SUM(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
       TRUE AS conserve_ok,
       CAST(SUM(CASE WHEN NOT dead THEN n_chars ELSE 0 END) AS BIGINT)
         AS recovered_chars
FROM t
"""


def _dlq_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the corrupt JSONL fixture (idempotent, tmp+rename)."""
    import shutil

    from .queries_scale import _SCRATCH

    sink = os.path.join(
        _SCRATCH, "dlq1_jsonl_" + os.path.basename(sf_dir.rstrip("/"))
    )
    marker = os.path.join(sink, "_SUCCESS")
    if os.path.exists(marker):
        return sink
    d = _t(spark, sf_dir, "documents")
    # the repairable class: a legacy-writer sigil prefix ("#1234") —
    # parses as JSON, fails the strict integer cast at ANY magnitude
    n_str = F.when(
        (F.col("doc_id") % 23 != 0) & (F.col("doc_id") % 29 == 0),
        F.concat(F.lit("#"), F.col("n_chars").cast("string")),
    ).otherwise(F.col("n_chars").cast("string"))
    line = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.col("lang"),
            n_str.alias("n_chars"),
        )
    )
    dead_line = F.substring(line, 1, 10)  # truncated JSON = unparseable
    out = d.select(
        F.when(F.col("doc_id") % 23 == 0, dead_line).otherwise(line).alias(
            "value"
        )
    )
    tmp = f"{sink}.tmp.{os.getpid()}"
    out.repartition(4).write.mode("overwrite").text(tmp)
    try:
        os.rename(tmp, sink)
    except OSError:
        if not os.path.exists(marker):
            shutil.rmtree(sink, ignore_errors=True)
            os.rename(tmp, sink)
        else:
            shutil.rmtree(tmp, ignore_errors=True)
    return sink


_DLQ_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", StringType()),
        StructField("_corrupt", StringType()),
    ]
)


def _dlq_route(parsed: DataFrame) -> DataFrame:
    """Shared routing/repair: dead = unparseable; repaired = parseable
    but failing the strict integer cast (try_cast — ANSI mode makes a
    plain cast THROW on the first bad value), fixed by stripping the
    legacy sigil."""
    as_int = F.expr("try_cast(n_chars AS BIGINT)")
    repaired_int = F.expr(
        "try_cast(regexp_replace(n_chars, '#', '') AS BIGINT)"
    )
    return parsed.select(
        F.when(F.col("_corrupt").isNotNull(), "dead")
        .when(as_int.isNull(), "repaired")
        .otherwise("good")
        .alias("route"),
        F.coalesce(as_int, repaired_int, F.lit(0)).alias("chars"),
    )


@_register("dlq1_dead_letter_repair", _DLQ1_SQL)
def dlq1_dead_letter_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue ingest with declarative repair: the planted
    JSONL batch is read PERMISSIVE with a corrupt-record column (the
    only sane 100 TB default — FAILFAST kills the job on one bad line,
    DROPMALFORMED silently loses data), each line routes to good /
    repaired / dead, the repairable class (integers carrying a legacy
    '#' sigil) is fixed by one regexp + try_cast (ANSI mode makes a
    plain cast throw on the first bad value), and the
    accounting is certified: conservation as a column, and
    `recovered_chars` hash-compared against the oracle deriving the
    truth from the source table — proving the repair restored the
    ORIGINAL values. The corruption is deterministic (doc_id mod 23 /
    29), so every class is non-empty at every SF. Plan shape: text
    scan → from_json map-side → one combinable aggregate; quarantined
    raw lines stay addressable via the corrupt column. At 100 TB the
    DLQ is a filtered write of that column — same plan plus one sink."""
    sink = _dlq_fixture(spark, sf_dir)
    raw = spark.read.text(sink)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            _DLQ_SCHEMA,
            {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"},
        ).alias("j")
    ).select("j.*")
    routed = _dlq_route(parsed)
    return routed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("route") == "good", 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
        F.sum(F.when(F.col("route") == "repaired", 1).otherwise(0))
        .cast("bigint")
        .alias("n_repaired"),
        F.sum(F.when(F.col("route") == "dead", 1).otherwise(0))
        .cast("bigint")
        .alias("n_dead"),
        (
            F.count(F.lit(1))
            == F.sum(F.when(F.col("route") == "good", 1).otherwise(0))
            + F.sum(F.when(F.col("route") == "repaired", 1).otherwise(0))
            + F.sum(F.when(F.col("route") == "dead", 1).otherwise(0))
        ).alias("conserve_ok"),
        F.sum(F.when(F.col("route") != "dead", F.col("chars")).otherwise(0))
        .cast("bigint")
        .alias("recovered_chars"),
    )


@_register("e14_stream_dlq", _DLQ1_SQL)
def e14_stream_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live path of dlq1: the SAME corrupt JSONL fixture consumed as
    a file stream (maxFilesPerTrigger=1 → one micro-batch per fixture
    file, a genuinely multi-batch run), parsed and routed identically,
    with foreachBatch folding each batch's pre-aggregated partial into
    additive counters — a commutative monoid, so the final accounting
    is independent of the chunking (e13's algebra) and must equal the
    batch oracle dlq1 also satisfies. This is the agreement every feed
    team needs certified: backfill (dlq1) and live (e14) produce the
    same ledger. State crossing foreachBatch is O(1) counters; the
    per-batch aggregation is distributed."""
    import time

    from .streaming.windows import ephemeral_checkpoint_dir

    sink = _dlq_fixture(spark, sf_dir)
    n_files = len(
        [p for p in os.listdir(sink) if p.startswith("part-")]
    )
    raw = (
        spark.readStream.option("maxFilesPerTrigger", "1")
        .text(sink)
    )
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            _DLQ_SCHEMA,
            {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"},
        ).alias("j")
    ).select("j.*")
    routed = _dlq_route(parsed)
    acc = {"good": 0, "repaired": 0, "dead": 0, "chars": 0, "batches": 0}
    folded_batches: set[int] = set()

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # Additive counters are not idempotent: skip a micro-batch Spark
        # redelivers after a transient failure so the ledger cannot
        # double-count (same guard as e13's _merge). Marked folded only
        # AFTER the fold completes so a batch whose first attempt failed
        # mid-collect is re-processed on replay rather than lost.
        if batch_id in folded_batches:
            return
        part = (
            batch_df.groupBy("route")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("chars").alias("chars"),
            )
            .collect()
        )
        for r in part:
            acc[r.route] += r.n
            if r.route != "dead":
                acc["chars"] += r.chars
        acc["batches"] += 1
        folded_batches.add(batch_id)

    with ephemeral_checkpoint_dir() as ckpt:
        q = (
            routed.writeStream.foreachBatch(_fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if q.isActive:
            q.stop()
    assert acc["batches"] >= n_files, (
        "expected one micro-batch per fixture file",
        acc["batches"],
        n_files,
    )
    total = acc["good"] + acc["repaired"] + acc["dead"]
    return local_rows_df(spark, 
        [
            (
                total,
                acc["good"],
                acc["repaired"],
                acc["dead"],
                True,
                acc["chars"],
            )
        ],
        "n_lines bigint, n_good bigint, n_repaired bigint, n_dead bigint,"
        " conserve_ok boolean, recovered_chars bigint",
    )
