"""Physical-plan auditing — the 100 TB design checks, machine-checkable.

"Would this plan survive a 100× scale-up?" is a property of the PHYSICAL
plan, not the query text: filters must reach the parquet scan
(PushedFilters), dimension joins must broadcast (BroadcastHashJoin, no
SortMergeJoin on a star query), scalar work must stay in whole-stage
codegen. These helpers turn those rules into assertions that tests run on
every registered query, so a regression in plan shape fails CI instead of
surfacing as a 100×-slower cluster job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_plan(
    df: DataFrame,
    contains: list[str] | None = None,
    not_contains: list[str] | None = None,
) -> str:
    """Assert substrings (non-)presence in the physical plan; returns the
    plan text for further inspection."""
    plan = physical_plan(df)
    for s in contains or []:
        assert s in plan, f"expected {s!r} in plan:\n{plan}"
    for s in not_contains or []:
        assert s not in plan, f"did not expect {s!r} in plan:\n{plan}"
    return plan
