"""Partitioning helpers — explicit parallelism control for compute-bound
stages.

Spark sizes scan partitions by file splits (``maxPartitionBytes``), which is
right for IO-bound work but wrong for small-on-disk / heavy-to-process data:
a 13 MB documents file is one split, so a shingle+hash stage over it runs on
ONE core. ``spread`` restores compute parallelism with a single narrow
shuffle. At 100 TB the inputs arrive pre-split and ``spread`` becomes a
no-op cost-wise (it still guards against skewed splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition to ``partitions`` (default: the session's default
    parallelism) ahead of an expensive map stage."""
    sc = df.sparkSession.sparkContext
    return df.repartition(partitions or sc.defaultParallelism)
