r"""Round-8 wave 102: read-path fault tolerance — corrupt files (src12)
and files that vanish mid-job (src13).

At 100 TB these are WHEN, not IF: a failed writer leaves a truncated
parquet file; a retention job deletes files between a reader's planning
and its execution. Spark's contract is explicit opt-in degradation —
``ignoreCorruptFiles`` / ``ignoreMissingFiles`` — and the default is
fail-fast. Both queries certify BOTH sides: the lenient read returns
exactly the surviving rows (hash vs oracle), and the strict default
genuinely throws (asserted in-query, so the lenient path is proven
load-bearing, not vacuously equal to a clean read).
"""

from __future__ import annotations

import glob
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


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select("event_id", "event_type")


_SRC12_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows_readable,
       CAST(SUM(event_id) AS BIGINT) AS sum_readable_ids
FROM events
GROUP BY event_type
"""


@_register("src12_corrupt_parquet", _SRC12_SQL)
def src12_corrupt_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ignoreCorruptFiles`` over a directory holding a truncated
    parquet file (the classic failed-writer artifact).

    All events land in 3 good files; a 4th file carries the parquet
    magic but no valid footer — exactly what a writer killed mid-flush
    leaves behind. The lenient read must return precisely the good
    files' rows (the oracle's answer over all events); the strict
    default must throw (asserted), proving the flag — not luck — is
    what makes the read succeed.

    100 TB shape: the skip decision is per-file at footer-read time, so
    cost is O(corrupt files), and the lenient read degrades coverage
    silently — which is why production pairs it with a row-count
    reconciliation (rc1's pattern) instead of trusting it blindly.
    """
    ev = _events(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_src12_")
    try:
        ev.repartition(3).write.mode("overwrite").parquet(base)
        # parquet magic, deterministic junk body, NO footer/magic tail
        with open(
            os.path.join(base, "part-99999-corrupt.snappy.parquet"), "wb"
        ) as fh:
            fh.write(b"PAR1" + b"\x13" * 2048)
        strict_failed = False
        try:
            spark.read.schema(_EV_SCHEMA).option(
                "ignoreCorruptFiles", "false"
            ).parquet(base).count()
        except Exception:
            strict_failed = True
        assert strict_failed, (
            "planted corrupt file was readable — the lenient path below "
            "would certify nothing"
        )
        lenient = (
            spark.read.schema(_EV_SCHEMA)
            .option("ignoreCorruptFiles", "true")
            .parquet(base)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows_readable"),
                F.sum("event_id").alias("sum_readable_ids"),
            )
        )
        res = lenient.collect()
        return local_rows_df(spark, res, lenient.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Partition dirs make the deleted slice DETERMINISTIC: everything under
# ptn=3 vanishes, so the surviving rows are exactly event_id % 4 != 3.
_SRC13_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_surviving,
       CAST(SUM(event_id) AS BIGINT) AS sum_surviving_ids
FROM events
WHERE event_id % 4 <> 3
GROUP BY event_type
"""


@_register("src13_ignore_missing_files", _SRC13_SQL)
def src13_ignore_missing_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``ignoreMissingFiles`` when data is deleted between a reader's
    file-listing and its execution (retention/GC racing a long scan).

    Events are written partitioned by ptn = event_id % 4; a DataFrame is
    planned (file index snapshotted), then every data file under ptn=3
    is deleted from under it. Executing the planned scan with
    ignoreMissingFiles=true must return exactly the ptn != 3 rows; the
    same stale plan with the strict default must throw (asserted).

    100 TB shape: listing a petabyte table takes minutes — there is
    ALWAYS a window between listing and the last task. Retention jobs
    that delete whole partitions make the lost slice partition-aligned,
    which is what keeps the degraded result EXPLAINABLE (a missing day,
    not random rows) — modeled here by the % 4 partitioning.
    """
    ev = _events(spark, sf_dir).withColumn(
        "ptn", (F.col("event_id") % 4).cast("int")
    )
    base = tempfile.mkdtemp(prefix="sg_src13_")
    try:
        ev.write.mode("overwrite").partitionBy("ptn").parquet(base)

        def _stale_scan(ignore_missing: str) -> DataFrame:
            return (
                spark.read.schema(_EV_SCHEMA)
                .option("ignoreMissingFiles", ignore_missing)
                .option("basePath", base)
                .parquet(base)
            )

        strict = _stale_scan("false")
        lenient = _stale_scan("true")
        # both file indexes are snapshotted NOW; delete underneath them
        removed = 0
        for f in glob.glob(os.path.join(base, "ptn=3", "*.parquet")):
            os.remove(f)
            removed += 1
        assert removed > 0, "nothing deleted — the race is not modeled"
        strict_failed = False
        try:
            strict.count()
        except Exception:
            strict_failed = True
        assert strict_failed, (
            "stale strict scan survived deleted files — listing was not "
            "snapshotted; the lenient path below would certify nothing"
        )
        out = lenient.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_surviving"),
            F.sum("event_id").alias("sum_surviving_ids"),
        )
        res = out.collect()
        return local_rows_df(spark, res, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
