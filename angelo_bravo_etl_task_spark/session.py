"""SparkSession factory.

The reference (Angelo_ETL_Task.py:377-390) runs one Python thread in one
process. Here the equivalent "runtime" is a SparkSession configured for the
scale target: AQE on (runtime re-planning, skew-join splitting, shuffle
coalescing), Arrow on (any Pandas-UDF boundary is vectorized), and a shuffle
partition count sized for the local harness but overridable for a cluster.

At 100 TB the same code runs unchanged; only ``master`` and the conf numbers
change (shuffle partitions ~ 2-3x total cores, maxPartitionBytes 128-256 MB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that encode the scale design, not just local-test convenience.
_ENGINE_CONFS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, convert sort-merge joins to broadcast when the built side turns
    # out small. Essential at 100 TB. NOT free locally: each query stage is
    # an exchange materialization barrier plus a re-planning round, a fixed
    # latency that dominates sub-second queries (measured at sf0.1: +70%
    # wall-clock on a tiny-query sample, zero plan improvement at MB scale).
    # Callers benchmarking small data can disable via get_spark(adaptive=
    # False); the default encodes the cluster target.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / applyInPandas / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables (region/nation/supplier/... and the LOINC hierarchy)
    # are broadcast; 64 MB covers every dim table at any SF we target while
    # fact-fact joins still shuffle.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Readers: don't glob tiny files into thousands of tasks locally, but do
    # split large files; 128 MB is the cluster default and correct at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Timestamps without timezone semantics end-to-end (the testdata parquet
    # uses TIMESTAMP_NTZ-like local timestamps; DuckDB compares naively).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # TIMESTAMP(NANOS) parquet columns (the events table, some driver data
    # generations) surface as raw nanosecond longs; readers convert to
    # microsecond timestamps explicitly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive (isAdjustedToUTC=false) parquet timestamps — the current driver
    # data generation — read as TIMESTAMP, not TIMESTAMP_NTZ, so the whole
    # function surface (unix_micros, window, watermarks) applies uniformly;
    # with the UTC session zone the instants equal DuckDB's naive values.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_spark(
    app_name: str = "angelo-bravo-etl-task-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
    adaptive: bool | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for the test/bench harness; on a real cluster pass ``None`` and submit
    with ``spark-submit --master ...`` (existing session wins).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)

    # Driver heap (optimization r11, guide section 5): PySpark's default is
    # -Xmx1g, and in local[N] the "driver" JVM hosts every executor thread —
    # N concurrent tasks were sharing ~0.36 GB of execution memory, so
    # sorts/joins/aggregates spilled and GC dominated the long-suite tail
    # (the round-8/9/10 "in-suite spike" class). 8g is sized to the harness
    # (128 GiB box, a handful of concurrent sessions under pytest-shards);
    # on a real cluster the submitter sets --driver-memory/--executor-memory
    # and this env override keeps the knob parameterised, not hard-coded.
    # Only effective at JVM launch: getOrCreate() reusing a live session
    # keeps that session's heap (same rule as every other launch-time conf).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = builder.config("spark.driver.memory", driver_mem)

    if shuffle_partitions is None:
        # local[N]: N cores → N shuffle partitions avoids tiny-task overhead;
        # on a cluster AQE coalescing makes the exact number less critical.
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    confs = dict(_ENGINE_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if adaptive is not None:
        confs["spark.sql.adaptive.enabled"] = str(adaptive).lower()
    if extra_confs:
        confs.update(extra_confs)

    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
