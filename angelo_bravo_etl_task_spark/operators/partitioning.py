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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the heavy (fact) side, replicate the dim.

    A shuffle join on a skewed key sends every row of the hot key to ONE
    reducer; at 100 TB that task runs for hours while the rest idle. Salting
    splits each hot key into ``n_salts`` sub-keys: the fact side gets a
    uniform ``_salt`` derived by hashing ``salt_from`` (a high-cardinality
    fact column — NOT the join key, which is constant within the hot group),
    the dim side is replicated once per salt (a broadcast cross join against
    ``n_salts`` rows — dim grows n_salts-fold, which is the technique's
    cost), and the join key becomes ``(on, _salt)`` — the hot key's rows now
    spread over ``n_salts`` reducers.

    Result is provably identical to the unsalted join: every fact row meets
    exactly the one dim replica carrying its salt (oracle query sk1 checks
    value equality against the plain SQL join).

    Use when the dim is too big to broadcast AND the fact key is skewed;
    when the dim fits in memory, ``F.broadcast`` beats salting (no shuffle
    at all), and AQE's skew-join handles sort-merge cases post-hoc — this
    operator is for the hash-join path AQE can't split (e.g. aggregation
    buffers keyed by the join output, or pre-AQE co-partitioning needs).
    """
    from pyspark.sql import functions as F

    spark = fact.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(salt_from or on)), F.lit(n_salts)).cast("int"),
    )
    dim_s = dim.crossJoin(F.broadcast(salts))
    # shuffle_hash hint: the point is the shuffled path (broadcast would
    # bypass the skew problem entirely and the demo with it)
    return fact_s.join(dim_s.hint("shuffle_hash"), [on, "_salt"], how).drop("_salt")
