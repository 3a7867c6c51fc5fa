r"""Round-8 wave 101: the two remaining streaming operational rungs —
dedup STATE across a restart (e16) and rate-limited backfill (e17).

e15 proved aggregation state survives a checkpoint restart; e16 proves
the OTHER stateful operator class does too: ``dropDuplicates`` keeps a
seen-keys store, and a restarted stream must keep suppressing keys it
saw before the restart — the exactly-once ingest guarantee CDC and
event pipelines stand on. e17 proves the backfill pattern: a large
backlog processed under ``maxFilesPerTrigger`` lands in BOUNDED
micro-batches (trigger=availableNow drains the backlog across as many
batches as the cap dictates), so a year of history replays without a
single giant batch OOMing the state store.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries import _register, _t
from .operators.localframe import local_rows_df

_SEQ = [0]  # memory-sink names are session-global; make each run unique

_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select("event_id", "event_type")


# Duplicates are planted on BOTH sides of the restart, so the oracle —
# one row per distinct event_id — only matches if the seen-keys state
# survived the checkpoint round-trip.
_E16_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_first_seen
FROM events
GROUP BY event_type
"""


@_register("e16_dedup_state_restart", _E16_SQL)
def e16_dedup_state_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates state across a kill-and-resume (completes e15's
    restart proof for the second stateful operator class).

    Tranche A = even event_ids plus duplicate copies of the id%10==0
    rows (in-tranche dups). After the stop, tranche B = odd event_ids
    plus MORE copies of the id%10==0 rows — keys the pre-restart run
    already emitted. The restarted query must suppress them from the
    RESTORED seen-keys store; emitting them again (state lost) inflates
    n_first_seen above the oracle's one-row-per-distinct-id answer and
    reds the hash. In-query asserts additionally pin the mechanism: the
    second run emits exactly the odd-id count (cross-restart dups
    suppressed), the first exactly the even-id count.

    Unwatermarked dropDuplicates state grows with the key universe —
    correct here (bounded demo), documented as the contrast to e6's
    watermarked dedup, which is the 100 TB shape when keys expire.
    """
    ev = _events(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_e16_")
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")

    # The append-mode memory sink cannot RECOVER from a checkpoint (only
    # complete mode can reconstruct its table) — foreachBatch is the
    # restart-capable sink for append-shaped output (e13's pattern). The
    # per-type tallies of first-seen emissions fold locally per batch;
    # tallied-batch dedup keeps a hypothetical batch replay idempotent.
    emitted: list[dict[str, int]] = []

    def _run() -> int:
        tally: dict[str, int] = {}
        done_batches: set[int] = set()

        def _fold(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id in done_batches:
                return
            rows = (
                batch_df.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            for r in rows:
                tally[r["event_type"]] = (
                    tally.get(r["event_type"], 0) + r["n"]
                )
            done_batches.add(batch_id)

        q = (
            spark.readStream.schema(_EV_SCHEMA)
            .parquet(indir)
            .dropDuplicates(["event_id"])
            .writeStream.foreachBatch(_fold)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        emitted.append(tally)
        return sum(tally.values())

    try:
        even = ev.where(F.col("event_id") % 2 == 0)
        odd = ev.where(F.col("event_id") % 2 == 1)
        dup_keys = ev.where(F.col("event_id") % 10 == 0)  # even ids
        assert dup_keys.limit(1).count() == 1, "plant requires dup rows"
        even.unionAll(dup_keys).write.mode("append").parquet(indir)
        n_first = _run()
        # stream is DOWN; tranche B lands with REPLAYS of tranche-A keys
        odd.unionAll(dup_keys).write.mode("append").parquet(indir)
        n_second = _run()
        assert n_first == even.count(), (n_first, even.count())
        assert n_second == odd.count(), (
            "restart re-emitted keys seen before the stop "
            "(dedup state lost)",
            n_second,
            odd.count(),
        )
        combined: dict[str, int] = {}
        for tally in emitted:
            for k, v in tally.items():
                combined[k] = combined.get(k, 0) + v
        return local_rows_df(spark, 
            [(k, v) for k, v in combined.items()],
            "event_type string, n_first_seen bigint",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


_E17_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
FROM events
GROUP BY event_type
"""


@_register("e17_bounded_backfill", _E17_SQL)
def e17_bounded_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limited backfill: drain a multi-file backlog under
    ``maxFilesPerTrigger`` with trigger=availableNow.

    The backlog is written as 6 parquet files; maxFilesPerTrigger=2
    forces the availableNow drain into >= 3 micro-batches (asserted via
    recentProgress) instead of one giant batch — the knob that lets a
    year of history replay through the SAME bounded-memory pipeline that
    serves live traffic. The aggregate's final complete-mode emission
    must equal the batch answer: a dropped or double-read file in any
    intermediate batch survives into the final state and reds the hash.

    100 TB shape: per-batch input is capped by files x file-size, so
    state-store snapshots, shuffle sizes, and executor memory are sized
    once for the cap and hold for both backfill and steady state.
    """
    ev = _events(spark, sf_dir)
    _SEQ[0] += 1
    sink = f"e17_{os.getpid()}_{_SEQ[0]}"
    base = tempfile.mkdtemp(prefix="sg_e17_")
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    try:
        ev.repartition(6).write.parquet(indir)
        n_files = len(
            [f for f in os.listdir(indir) if f.endswith(".parquet")]
        )
        assert n_files >= 3, f"backlog must span files, got {n_files}"
        q = (
            spark.readStream.schema(_EV_SCHEMA)
            .option("maxFilesPerTrigger", "2")
            .parquet(indir)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("event_id").alias("sum_event_ids"),
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        data_batches = sum(
            1
            for p in (q.recentProgress or [])
            if p and int(p["numInputRows"]) > 0
        )
        q.stop()
        assert data_batches >= (n_files + 1) // 2, (
            "maxFilesPerTrigger ignored — backlog drained in too few "
            "batches",
            data_batches,
            n_files,
        )
        out = spark.table(sink)
        return local_rows_df(spark, out.collect(), out.schema).select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_event_ids").cast("long").alias("sum_event_ids"),
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
