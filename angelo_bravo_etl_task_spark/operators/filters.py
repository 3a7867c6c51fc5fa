"""Filter operators (SURVEY.md §2.2 R6).

The reference's constraint filter (Angelo_ETL_Task.py:245-258) conjoins
``notnull() & != ''`` over the 13 NOT NULL columns. Declared as one Column
expression so Catalyst can push the input-column parts below joins and into
the parquet scan (check ``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

from functools import reduce
from operator import and_
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def not_null_not_empty(df: DataFrame, cols: Sequence[str]) -> Column:
    """Conjunction of IS NOT NULL (and != '' for string columns)."""
    preds: list[Column] = []
    for c in cols:
        p = F.col(c).isNotNull()
        if isinstance(df.schema[c].dataType, StringType):
            p = p & (F.col(c) != "")
        preds.append(p)
    return reduce(and_, preds)


def constraint_filter(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop rows violating NOT-NULL/non-empty constraints (reference
    :245-258 drops them silently before the DB would reject them)."""
    return df.where(not_null_not_empty(df, cols))
