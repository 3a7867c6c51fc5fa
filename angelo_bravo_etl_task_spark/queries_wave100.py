r"""Round-8 wave 100: streaming checkpoint/restore and nested schema
evolution — the two operational rungs every production deployment hits
(verdict r7 item 5).

e15: every real stream RESTARTS — deploys, crashes, rescales. The
exactly-once story of Structured Streaming is the checkpoint: the file
source's offset log remembers which input files each micro-batch
consumed, and the state store snapshots the aggregation state per batch.
This query runs a stream, STOPS it, lands more input, and restarts a
brand-new query object on the same checkpointLocation — the final
complete-mode output must equal the batch answer over ALL input. A lost
state store under-counts (restart-from-scratch), a lost offset log
double-counts (re-read of tranche A) — either reds the hash against the
batch oracle.

src11: src3 proved FLAT schema evolution (a new top-level column);
long-lived nested datasets evolve INSIDE struct columns — a new field in
`meta`, a new field in `meta.inner`. Parquet mergeSchema reconciles
recursively; the oracle reproduces the union-by-name NULL-extension
semantics from the original rows at both nesting depths.
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

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)

_E15_SEQ = [0]  # memory-sink names are session-global; make each run unique

# Oracle = the plain batch aggregate over ALL events: the streaming run
# only matches if tranche A's state survived the restart AND tranche A's
# files were not re-read after it.
_E15_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
FROM events
GROUP BY event_type
"""


@_register("e15_checkpoint_restore", _E15_SQL)
def e15_checkpoint_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kill-and-resume exactly-once proof (verdict r7 item 5a).

    Tranche A (even event_ids) lands as parquet files; a file-source
    stream aggregates per-type counts into a complete-mode memory sink
    with trigger=availableNow and STOPS. Tranche B (odd event_ids) lands;
    a NEW query object restarts on the SAME checkpointLocation into a
    FRESH memory sink. Complete mode re-emits the full state table, so
    the second sink's content certifies both restart guarantees at once:

    - state restore: tranche A's counts appear although the restarted
      query only read tranche B's files (asserted via recentProgress);
    - no re-read: tranche A counted once, or the sums double.

    Integer-only measures (count + sum of event_id) keep the comparison
    exact; the double `value` column never enters the aggregate.

    100 TB shape: this IS the scale story for streaming — checkpoint on
    durable shared storage is what lets a 1000-executor stream restart
    without reprocessing a petabyte of history. State is per-group
    (bounded key count), the offset log grows with file count not bytes,
    and complete mode is only viable because the result table is tiny
    (per-type aggregates); high-cardinality results would use update
    mode + an idempotent sink (e13's pattern).
    """
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    _E15_SEQ[0] += 1
    sink = f"e15_restore_{os.getpid()}_{_E15_SEQ[0]}"
    base = tempfile.mkdtemp(prefix="sg_e15_")
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")

    def _run_available(sink_name: str) -> int:
        q = (
            spark.readStream.schema(schema)
            .parquet(indir)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("event_id").alias("sum_event_ids"),
            )
            .writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows_in = sum(
            int(p["numInputRows"]) for p in (q.recentProgress or []) if p
        )
        q.stop()
        return rows_in

    try:
        # tranche A: even event_ids
        ev.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(
            indir
        )
        n_a = _run_available(sink + "_a")
        # stream is DOWN; tranche B lands while nobody is watching
        ev.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(
            indir
        )
        n_b = _run_available(sink)
        total = ev.count()
        # the restarted query must have read ONLY tranche B's files —
        # re-reading A would show up here even before the hash reds
        assert n_a + n_b == total, (n_a, n_b, total)
        assert n_b < total, "restart re-read tranche A (offset log lost)"
        out = spark.table(sink)
        return local_rows_df(spark, out.collect(), out.schema).select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_event_ids").cast("long").alias("sum_event_ids"),
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Oracle: union-by-name NULL-extension at both nesting depths, rebuilt
# from the original orders rows. Batch is the partition-dir column.
_SRC11_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(1 AS INT) AS batch,
       CAST(o_custkey AS BIGINT) AS custkey,
       CAST(NULL AS VARCHAR) AS status,
       CAST(o_orderkey % 7 AS BIGINT) AS inner_x,
       CAST(NULL AS BIGINT) AS inner_y
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT CAST(o_orderkey AS BIGINT),
       CAST(2 AS INT),
       CAST(o_custkey AS BIGINT),
       o_orderstatus,
       CAST(o_orderkey % 7 AS BIGINT),
       CAST(o_orderkey % 11 AS BIGINT)
FROM orders WHERE o_orderkey % 3 = 1
"""


@_register("src11_nested_schema_evolution", _SRC11_SQL)
def src11_nested_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nested schema evolution under mergeSchema (verdict r7 item 5b;
    src3 covered the flat case).

    Batch 1 writes ``meta: struct<custkey, inner: struct<x>>``; batch 2
    adds a field at EACH depth: ``meta.status`` and ``meta.inner.y``. A
    mergeSchema read must reconcile the struct types recursively —
    union-by-name with NULL-extension per depth — and keep partition
    discovery (the batch dir) working over the evolved files. Any field
    misalignment, silent drop, or depth-limited merge breaks the hash
    against the oracle's reconstruction from the original rows.

    100 TB shape: mergeSchema samples footers (cheap relative to data);
    the modeled discipline is ADDITIVE-only evolution — adds at any
    nesting depth are reconcilable, type changes are not. Flattening at
    the end is projection-only; nothing shuffles.
    """
    base = os.path.join(
        _SCRATCH, "src11_" + os.path.basename(sf_dir.rstrip("/"))
    )
    o = _t(spark, sf_dir, "orders")
    (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_custkey").alias("custkey"),
                F.struct(
                    (F.col("o_orderkey") % 7).alias("x")
                ).alias("inner"),
            ).alias("meta"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(base, "batch=1"))
    )
    (
        o.where(F.col("o_orderkey") % 3 == 1)
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_custkey").alias("custkey"),
                F.col("o_orderstatus").alias("status"),
                F.struct(
                    (F.col("o_orderkey") % 7).alias("x"),
                    (F.col("o_orderkey") % 11).alias("y"),
                ).alias("inner"),
            ).alias("meta"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(base, "batch=2"))
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return merged.select(
        "o_orderkey",
        F.col("batch").cast("int").alias("batch"),
        F.col("meta.custkey").alias("custkey"),
        F.col("meta.status").alias("status"),
        F.col("meta.inner.x").alias("inner_x"),
        F.col("meta.inner.y").alias("inner_y"),
    )
