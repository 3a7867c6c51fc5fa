"""Aggregation operators (SURVEY.md §2.2 R3, §2.4 extension aggs).

Reference surface: one group-count (``value_counts``, Angelo_ETL_Task.py:173)
and one read-back MIN (Angelo_ETL_Task.py:331). Extensions: the full agg set,
rollup/cube/grouping sets, approx distinct.

Scale notes: every ``groupBy().agg()`` is a partial (map-side) aggregate
followed by one shuffle on the grouping key — Spark does the combine
automatically. Exact money arithmetic uses DECIMAL so results are
deterministic across engines and partition orders (double summation is
order-dependent; decimal is exact).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .localframe import local_rows_df


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Cast to exact decimal before summing — order-independent, engine-
    independent results (double sums differ in last ULPs per partition
    order)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal SUM, surfaced as double (deterministic: the decimal
    result is exact, and decimal→double conversion is correctly rounded)."""
    return F.sum(dec(col, 18, scale)).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum ÷ count in IEEE double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 18, scale)).cast("double") / F.count(c)


def group_count(df: DataFrame, keys: Sequence[str], alias: str = "cnt") -> DataFrame:
    """Frequency per key — the reference's ``value_counts`` (:173)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def grouped_agg(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """groupBy().agg() with named output columns."""
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """ROLLUP(keys): hierarchical subtotals + grand total."""
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """CUBE(keys): all subtotal combinations."""
    return df.cube(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    agg_sql: dict[str, str],
) -> DataFrame:
    """GROUPING SETS via the SQL path (Catalyst expands to one Expand node —
    a single pass over the input, not one scan per set).

    ``agg_sql`` maps output name → SQL aggregate expression string.
    """
    keys = sorted({k for s in sets for k in s})
    df.createOrReplaceTempView("_gs_input")
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    aggs_sql = ", ".join(f"{expr} AS {name}" for name, expr in agg_sql.items())
    return df.sparkSession.sql(
        f"SELECT {', '.join(keys)}, {aggs_sql} FROM _gs_input "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def approx_distinct(
    df: DataFrame, col: str, rsd: float = 0.05, alias: str = "approx_distinct"
) -> DataFrame:
    """HyperLogLog++ distinct estimate — one pass, tiny sketch per partition,
    merge on the driver; the scale answer when exact COUNT(DISTINCT) would
    shuffle every key."""
    return df.agg(F.approx_count_distinct(col, rsd).alias(alias))


def exact_distinct_count(df: DataFrame, cols: Sequence[str], alias: str = "cnt") -> DataFrame:
    """Exact COUNT(DISTINCT cols...): expands to a two-stage aggregate."""
    return df.agg(F.count_distinct(*[F.col(c) for c in cols]).alias(alias))


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Sequence[float],
) -> DataFrame:
    """Exact discrete multi-quantile per group, TWO-PASS: group-count to a
    small (group, value, count) frame, cumulative window over THAT, then
    the smallest value whose cumulative rank reaches ceil(q*n). The
    windows only ever see the aggregated frame — never a low-cardinality
    window over the raw table (SCALE.md finding 5). Output columns:
    group_cols + (q, quantile_value). The definition (min v with
    rank >= ceil(q*n)) is engine-neutral — no builtin interpolation
    flavor to match."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    gc = df.groupBy(*group_cols, F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = gc.select(
        *group_cols,
        "_v",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    q_frame = local_rows_df(spark, [(float(q),) for q in qs], "q double")
    return (
        cum.crossJoin(F.broadcast(q_frame))
        .where(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy(*group_cols, "q")
        .agg(F.min("_v").alias("quantile_value"))
    )
