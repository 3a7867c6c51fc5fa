r"""Round-8 wave 104: streaming ``observe()`` metrics (obs2) — the
monitoring tap every production stream carries.

obs1 proved batch ``observe()``; streams are where it earns its keep:
per-micro-batch row counts and checksums surface in each
StreamingQueryProgress WITHOUT a second aggregation pass over the data,
which is how a 100 TB pipeline watches itself (input-vs-sink
reconciliation, freshness alarms) at zero extra scan cost. The observed
metrics are ADDITIVE (count, sum), so their fold across micro-batches
must equal the batch truth — put on the hash path here.
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

_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

_OBS2_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS observed_rows,
       CAST(SUM(event_id) AS BIGINT) AS observed_sum_ids,
       CAST(COUNT(*) AS BIGINT) AS sink_rows,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS sink_types
FROM events
"""


@_register("obs2_stream_observe", _OBS2_SQL)
def obs2_stream_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``observe()`` on a streaming DataFrame, folded across a FORCED
    multi-batch run (maxFilesPerTrigger=2 over 6 files) and certified
    against both the sink and the batch oracle.

    The observe node taps rows as they flow into the stateful aggregate
    — no extra scan, no second job. Each micro-batch's observed (count,
    sum) lands in its StreamingQueryProgress; because both metrics are
    additive, their fold over all batches must equal the batch answer,
    and the sink's own totals must agree — input/sink reconciliation,
    the first dashboard any production stream gets.

    100 TB shape: observed metrics are computed inside the existing
    exchange (combiner-style partials), cost O(1) memory per metric per
    task; the alternative — a second aggregation job over the source —
    doubles the scan. In-query asserts force >= 3 batches so the fold
    is genuinely exercised across progress events.
    """
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="sg_obs2_")
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    sink = f"obs2_{os.getpid()}_{abs(hash(base)) % 10**6}"
    try:
        ev.repartition(6).write.parquet(indir)
        q = (
            spark.readStream.schema(_EV_SCHEMA)
            .option("maxFilesPerTrigger", "2")
            .parquet(indir)
            .observe(
                "tap",
                F.count(F.lit(1)).alias("n"),
                F.sum("event_id").alias("s"),
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = [p for p in (q.recentProgress or []) if p]
        q.stop()
        taps = [
            p["observedMetrics"]["tap"]
            for p in progress
            if "tap" in (p.get("observedMetrics") or {})
            and int(p["numInputRows"]) > 0
        ]
        assert len(taps) >= 3, (
            "observe fold needs a multi-batch run",
            len(taps),
        )
        observed_rows = sum(int(t["n"]) for t in taps)
        observed_sum = sum(int(t["s"]) for t in taps)
        sink_rows = 0
        sink_types = 0
        for r in spark.table(sink).collect():
            sink_rows += r["n_events"]
            sink_types += 1
        return local_rows_df(spark, 
            [(observed_rows, observed_sum, sink_rows, sink_types)],
            "observed_rows bigint, observed_sum_ids bigint, "
            "sink_rows bigint, sink_types bigint",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
