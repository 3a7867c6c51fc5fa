"""Structured Streaming operators over the events stream (SURVEY.md §2.4).

The reference is batch-only; the driver's ``events`` table is stream-shaped
(event_id, ts, user_id, event_type, value, props), so the engine exposes the
standard streaming surface: tumbling/sliding/session windows with
watermarks, late-data drop, and stateful dedup.

Each aggregation helper works on BOTH static and streaming DataFrames
(``F.window``/``session_window`` are batch-compatible) — the batch path is
what the DuckDB oracle checks; the streaming path is exercised in tests with
``availableNow`` triggers over the same parquet.

Scale notes: watermark bounds state size (no watermark = unbounded state =
OOM at 100 TB/day); window aggs shuffle on (window, keys) like any groupBy;
``dropDuplicatesWithinWatermark`` keeps only in-watermark keys in state.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_SCHEMAS


# State-store partitions for the one-shot streaming queries: streaming
# snapshots/commits one state store PER shuffle partition PER micro-batch,
# a fixed overhead that dwarfs the data at harness volume (measured in
# queries_px.e3: 8.9 s @ 32 partitions vs 1.6 s @ 8; r12 floor probe:
# stream-stream joins carry 4 store instances per partition, and 4
# partitions beat 8 on every probed query but one — e5 4.0→3.4 s,
# e12 4.6→3.6, e11 4.4→3.8, px3 3.9→3.2, e16 3.5→3.1, e6/e9/e15/e17/e3
# −0.1..−0.3, e10 neutral, obs2 one +0.5 sample re-adjudicated neutral
# by interleaved A/B). Size state partitions to state volume, not core
# count; env-overridable for cluster runs.
STREAM_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_STREAM_PARTS", "4")


@contextlib.contextmanager
def stream_partitions(
    spark: SparkSession, n: int | None = None
) -> Iterator[None]:
    """Scope ``spark.sql.shuffle.partitions`` to ``n`` (default
    STREAM_SHUFFLE_PARTITIONS) for a one-shot streaming run, restoring it
    after. Pure-JVM stateful ops want FEW partitions (state-store commit
    overhead dominates); Python-state ops (applyInPandasWithState) are
    worker-compute-bound and want more (measured st1: 6.0 s @ 4, 4.1 s @ 8,
    3.2 s @ 16, 4.0 s @ 32 at sf0.1)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(n) if n is not None else STREAM_SHUFFLE_PARTITIONS,
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@contextlib.contextmanager
def ephemeral_checkpoint_dir(prefix: str = "sg_ckpt_") -> Iterator[str]:
    """Throwaway checkpoint location for one-shot ``availableNow`` runs.

    Spark's default temp checkpoint lands on local disk; every micro-batch
    snapshots/commits one state store PER shuffle partition, so checkpoint
    I/O latency is a fixed per-batch cost. Placing it on tmpfs (/dev/shm)
    measured ~20% off st1's wall-clock locally. ONLY valid for ephemeral
    runs whose result is fully consumed before the dir is deleted — a
    production streaming job needs its checkpoint on durable shared storage
    (HDFS/S3) to survive driver restarts, which is why this is an explicit
    opt-in helper, not a session default.
    """
    base = "/dev/shm"
    if not (os.path.isdir(base) and os.access(base, os.W_OK)):
        base = None  # tempfile falls back to the platform default
    path = tempfile.mkdtemp(prefix=prefix, dir=base)
    try:
        yield path
    finally:
        shutil.rmtree(path, ignore_errors=True)


def run_available_now(
    df: DataFrame, sink: str, timeout: float = 300.0, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion into a named memory sink.

    One ``availableNow`` pass (append mode by default; st2's
    transformWithState emits in update mode) with an ephemeral tmpfs
    checkpoint; blocks until the trigger drains, then returns the sink
    table. Shared by every batch-harness streaming query (e3, e5, st1)."""
    spark = df.sparkSession
    with ephemeral_checkpoint_dir() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout)
        if q.isActive:
            q.stop()
    return spark.table(sink)


def stream_events(
    spark: SparkSession,
    parquet_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """readStream over a parquet directory of events, watermarked on ts.

    In production this is Kafka/Kinesis + the same downstream plan; parquet
    directory streaming keeps the harness hermetic.
    ``max_files_per_trigger=None`` lets one micro-batch take every available
    file (parallel scan) — watermark-final results are identical, since the
    watermark still advances to max(event time) - delay after the batch.
    """
    reader = spark.readStream.schema(TESTDATA_SCHEMAS["events"])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(parquet_dir).withWatermark("ts", watermark)


def stream_events_raw(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """readStream directly over the driver's original ``events.parquet`` —
    no staging rewrite. ``ts`` is read per the file's physical unit
    (footer-inspected, as in ``sources/readers.load_table``): a
    TIMESTAMP(NANOS) file — which Spark's reader won't map to
    TimestampType — streams as raw nanos (long) truncated to microseconds
    in-stream; micro/millisecond files stream under the declared
    TimestampType schema directly.

    SINGLE-BATCH INVARIANT for batch-oracle parity: the source is one
    parquet file and no ``maxFilesPerTrigger`` is set, so an availableNow
    run processes everything in ONE micro-batch. Queries whose oracle is a
    batch query over the same data (e6's DISTINCT, notably) rely on this:
    with multiple batches, rows arriving in a later batch below the
    then-current watermark would be dropped (by design — that is watermark
    semantics), and whole keys could go missing vs the oracle. Swapping in
    a partitioned events directory or adding a file-per-trigger limit
    breaks that equivalence; this function asserts the single-file layout
    rather than letting the invariant rot silently."""
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from ..sources.readers import parquet_ts_unit

    # the file-stream source requires a DIRECTORY base path — point at the
    # sf dir and glob-filter to the events file
    matches = [
        p
        for p in os.listdir(sf_dir)
        if p == "events.parquet" and os.path.isfile(os.path.join(sf_dir, p))
    ]
    if len(matches) != 1:
        raise ValueError(
            f"stream_events_raw requires exactly one events.parquet FILE in "
            f"{sf_dir} (single-batch invariant for batch-oracle parity); "
            f"found {matches or 'none'}"
        )
    nanos = (
        parquet_ts_unit(os.path.join(sf_dir, "events.parquet")) == "ns"
    )
    schema = (
        StructType(
            [
                StructField(
                    f.name, LongType() if f.name == "ts" else f.dataType
                )
                for f in TESTDATA_SCHEMAS["events"].fields
            ]
        )
        if nanos
        else TESTDATA_SCHEMAS["events"]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select(*[f.name for f in TESTDATA_SCHEMAS["events"].fields])
    # watermark=None returns the bare stream so callers can place their own
    # watermark node deliberately (e10 watermarks ABOVE a union of filtered
    # branches: with per-branch watermark nodes the effective watermark is
    # min-policy over per-branch maxima, which depends on whether the
    # optimizer pushed each filter below its watermark node — an
    # un-modelable cutoff for a batch oracle)
    if watermark is None:
        return raw
    return raw.withWatermark("ts", watermark)


def tumbling_window_agg(
    events: DataFrame,
    duration: str = "10 minutes",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Non-overlapping fixed windows: count + exact decimal sum of value."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Overlapping windows — each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "5 minutes",
    keys: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge; a quiet
    period of ``gap`` closes the session. State per open session only."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            *keys,
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, keys: Sequence[str] = ("event_id",)) -> DataFrame:
    """Stateful exact dedup bounded by the watermark — duplicate events
    arriving within the watermark horizon are dropped; state for a key is
    freed once the watermark passes it."""
    return events.dropDuplicatesWithinWatermark(list(keys))
