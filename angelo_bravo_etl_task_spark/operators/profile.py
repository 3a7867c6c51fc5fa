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

    Built entirely from Column expressions — per-column stat STRUCTs in one
    agg, then ``inline`` to rows. No SQL-string interpolation, so column
    names containing spaces, dots, quotes, or hyphens profile fine
    (references are backtick-quoted, with embedded backticks doubled);
    unknown names fail fast here rather than as a downstream parse error.
    """
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs = []
    for i, c in enumerate(cols):
        col = df["`" + c.replace("`", "``") + "`"]
        aggs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.count(F.when(col.isNull(), F.lit(1))).alias("n_nulls"),
                F.count_distinct(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_str"),
                F.max(col).cast("string").alias("max_str"),
            ).alias(f"_s{i}")
        )
    summary = df.agg(*aggs)
    return summary.select(
        F.inline(F.array(*[summary[f"_s{i}"] for i in range(len(cols))]))
    )
