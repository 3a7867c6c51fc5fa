"""Single-pass column profiling — the data-quality/expectations primitive.

``profile_columns`` computes null count, exact distinct count, and min/max
per column in ONE aggregation over ONE scan (deequ-style). At 100 TB this
is the only acceptable shape: every per-column statistic rides the same
partial-aggregate pass; profiling N columns costs one job, not N.

The multi-COUNT(DISTINCT) plan uses Spark's Expand operator (one shuffle,
rows replicated per distinct-aggregate) — exact and single-pass. For wide
tables at extreme scale swap exact distinct for approx_count_distinct and
the Expand collapses into plain partial aggs.

min/max are computed on the NATIVE type (so numeric/date ordering is
correct) and cast to string only for the uniform output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: (col_name, n_nulls, n_distinct, min_str, max_str).

    Exact counts; min/max native-typed then stringified. Single agg job.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.when(col.isNull(), F.lit(1))).alias(f"_{c}_nulls"),
            F.count_distinct(col).alias(f"_{c}_distinct"),
            F.min(col).cast("string").alias(f"_{c}_min"),
            F.max(col).cast("string").alias(f"_{c}_max"),
        ]
    summary = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _{c}_nulls, _{c}_distinct, _{c}_min, _{c}_max" for c in cols
    )
    return summary.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_str, max_str)"
        )
    )
