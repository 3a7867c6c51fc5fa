r"""Round-8 wave 109: the state data source reader (src15) — Spark 4's
ops/debugging surface for streaming state (`spark.read.format(
"statestore")`), certified by putting the STATE STORE CONTENTS themselves
on the driver's hash path.

Every production streaming incident eventually needs "what is actually IN
the state store right now?" — the state reader answers it as a batch
DataFrame over a checkpoint, no stream restart required. Here a real
streaming aggregation runs to completion, then the checkpoint is read
back through the state source and RELEASED AS THE QUERY RESULT: the
driver hashes Spark's internal state bytes (decoded) against the DuckDB
batch ground truth — state corruption, partial commits, or decode drift
all red the hash.
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

_SRC15_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
FROM events WHERE event_id % 5 <> 0
GROUP BY event_type
"""


@_register("src15_state_datasource", _SRC15_SQL)
def src15_state_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a keyed streaming aggregation (complete mode, availableNow),
    then read its CHECKPOINT STATE back through the ``statestore`` batch
    source and release the decoded state as the result — the driver hash
    certifies the state reader end to end against the batch oracle.

    In-query asserts pin the rest of the surface: the ``state-metadata``
    source reports the stateStoreSave operator with the session's
    partition count, and the state contents equal the memory sink's
    complete-mode output row for row (the two views of the same store).

    100 TB shape: the state source reads store files directly — one task
    per state partition, no stream restart, no reprocessing of the input
    — which is why it is THE tool for state-size audits, skew analysis
    (rows per partition_id ship with every row), and offline state
    surgery validation. The aggregation itself is the standard
    partial/final two-phase shape; state size is O(distinct keys)."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") % 5 != 0)
        .select("event_id", "event_type")
    )
    base = tempfile.mkdtemp(prefix="sg_src15_")
    indir, ckpt = os.path.join(base, "in"), os.path.join(base, "ckpt")
    sink = f"src15_sink_{os.getpid()}_{abs(hash(base)) % 10_000}"
    try:
        ev.write.parquet(indir)
        q = (
            spark.readStream.schema(schema)
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
        q.stop()

        md = spark.read.format("state-metadata").load(ckpt).collect()
        assert len(md) == 1 and md[0].operatorName == "stateStoreSave", md
        n_ptn = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        assert md[0].numPartitions == n_ptn, (md[0].numPartitions, n_ptn)

        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").cast("long").alias("n_events"),
                F.col("value.sum").cast("long").alias("sum_event_ids"),
            )
        )
        out = state.collect()
        sink_rows = {
            r.event_type: (r.n_events, r.sum_event_ids)
            for r in spark.table(sink).collect()
        }
        from_state = {
            r.event_type: (r.n_events, r.sum_event_ids) for r in out
        }
        # the two views of the same store must agree exactly
        assert from_state == sink_rows, (from_state, sink_rows)
        return local_rows_df(spark, 
            [(r.event_type, r.n_events, r.sum_event_ids) for r in out],
            "event_type string, n_events bigint, sum_event_ids bigint",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
