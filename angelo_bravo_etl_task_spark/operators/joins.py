"""Join operators (SURVEY.md §2.2 R1 + §2.4 extension joins).

The reference has exactly one join — a pandas left merge
(Angelo_ETL_Task.py:158). Here the full join surface is exposed
declaratively; Catalyst picks broadcast-hash vs shuffled-hash vs sort-merge,
and AQE re-picks at runtime. The only scale decisions we make by hand:

- ``broadcast=True`` for dimension tables (kills the shuffle entirely);
- range/as-of joins avoid the naive cross product by bucketing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
}


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join; ``broadcast_right`` hints a broadcast-hash join (no shuffle).

    Replaces reference ``loinc_df.merge(hierarchy_df, 'left', ...)``
    (Angelo_ETL_Task.py:158). On a cluster, broadcast the dimension side of
    every star-schema join — a 100 TB fact table then never shuffles for it.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int | None = None,
    extra_on: Column | None = None,
) -> DataFrame:
    """Join rows where ``left.left_point`` falls in ``[right_lo, right_hi)``.

    Naively this is a broadcast-nested-loop join (O(n*m)). With
    ``bucket_width`` both sides get equi-joinable bucket keys: the right side
    explodes each interval into the buckets it spans, then an equi-join on
    the bucket prunes candidates before the exact range predicate. That turns
    BNLJ into a shuffled hash join — the difference between hours and minutes
    at scale. Pick ``bucket_width`` ~ the typical interval length.
    """
    cond = (F.col(left_point) >= F.col(right_lo)) & (
        F.col(left_point) < F.col(right_hi)
    )
    if extra_on is not None:
        cond = cond & extra_on
    if bucket_width is None:
        return left.join(right, on=cond, how="inner")

    lb = left.withColumn(
        "_bucket", (F.col(left_point) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(right_lo) / F.lit(bucket_width)).cast("long"),
                (F.col(right_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return lb.join(rb, on=["_bucket"], how="inner").where(cond).drop("_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_time_as: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the greatest
    ``right_time <= left_time`` (direction='backward'), the smallest
    ``right_time >= left_time`` ('forward'), or the closest in absolute
    distance with exact ties going backward ('nearest' — pandas
    merge_asof's tie rule), per key.

    ``tolerance_seconds`` bounds the match the way pandas ``merge_asof``'s
    tolerance does: a candidate further than the bound (in seconds for
    timestamp axes — the gap is computed on ``cast('double')``, i.e. epoch
    seconds; in native units for numeric axes) leaves the right-side
    columns NULL instead. ``right_time_as`` additionally emits the matched
    right row's time under that name (NULL where no match) — callers need
    it to see WHICH observation matched, and the tolerance check uses it
    internally anyway.

    Implemented as union + window (no cross product): tag both sides, union
    on the key+time axis, carry right-side values with ``last(ignorenulls)``
    over an ordered window, then keep left rows. One shuffle on the key —
    same cost as a sort-merge join, robust to skewed time ranges.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys and c != left_time]
    rcols = [c for c in right.columns if c not in keys and c != right_time]

    lt = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    rt = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    lt = lt.withColumn("_src_t", F.lit(None).cast(right.schema[right_time].dataType))
    rt = rt.withColumn("_src_t", F.col("_t"))
    unioned = lt.unionByName(rt)
    rcols = rcols + ["__matched_t"]
    unioned = unioned.withColumn("_r___matched_t", F.col("_src_t")).drop("_src_t")

    if direction == "backward":
        # right rows sort before left rows at equal time → a match at t==t counts
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            *keys,
            "_t",
            "_is_left",
            *lcols,
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_r_{c}")
                for c in rcols
            ],
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            *keys,
            "_t",
            "_is_left",
            *lcols,
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_r_{c}")
                for c in rcols
            ],
        )
    elif direction == "nearest":
        # Both directional fills over the SAME union — two window sorts,
        # one shuffle — then a per-row choice: the candidate with the
        # smaller absolute gap wins; an exact tie goes to the backward
        # match (pandas merge_asof semantics).
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        two = unioned.select(
            *keys,
            "_t",
            "_is_left",
            *lcols,
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(wb).alias(f"_rb_{c}")
                for c in rcols
            ],
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(wf).alias(f"_rf_{c}")
                for c in rcols
            ],
        )
        gap_b = F.col("_t").cast("double") - F.col("_rb___matched_t").cast("double")
        gap_f = F.col("_rf___matched_t").cast("double") - F.col("_t").cast("double")
        ok_b = F.col("_rb___matched_t").isNotNull()
        ok_f = F.col("_rf___matched_t").isNotNull()
        if tolerance_seconds is not None:
            tol = F.lit(float(tolerance_seconds))
            ok_b = ok_b & (gap_b <= tol)
            ok_f = ok_f & (gap_f <= tol)
        use_b = ok_b & (~ok_f | (gap_b <= gap_f))
        filled = two.select(
            *keys,
            "_t",
            "_is_left",
            *lcols,
            *[
                F.when(use_b, F.col(f"_rb_{c}"))
                .when(ok_f, F.col(f"_rf_{c}"))
                .alias(f"_r_{c}")
                for c in rcols
            ],
        )
    else:
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )

    out = filled.where(F.col("_is_left") == 1).drop("_is_left")
    value_rcols = [c for c in rcols if c != "__matched_t"]
    if tolerance_seconds is not None and direction != "nearest":
        gap = F.col("_t").cast("double") - F.col("_r___matched_t").cast("double")
        if direction == "forward":
            gap = -gap
        ok = F.col("_r___matched_t").isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        out = out.select(
            *keys,
            "_t",
            *lcols,
            *[F.when(ok, F.col(f"_r_{c}")).alias(f"_r_{c}") for c in value_rcols],
            F.when(ok, F.col("_r___matched_t")).alias("_r___matched_t"),
        )
    if right_time_as is not None:
        out = out.withColumnRenamed("_r___matched_t", right_time_as)
    else:
        out = out.drop("_r___matched_t")
    for c in value_rcols:
        out = out.withColumnRenamed(f"_r_{c}", c)
    return out.withColumnRenamed("_t", left_time)
