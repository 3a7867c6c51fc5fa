"""Datetime helpers (SURVEY.md §2.3 F9, §7.4 item 3).

The reference snapshots ``datetime.now()`` ONCE per run and writes it as a
``dd-MM-yyyy HH:mm:ss`` string into timestamp columns (Angelo_ETL_Task.py:
182-183, 225-229). The engine keeps real TimestampType end-to-end and
formats only at compat boundaries (CSV export).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's format string '%d-%m-%Y %H:%M:%S' in Spark pattern syntax.
REFERENCE_DT_PATTERN = "dd-MM-yyyy HH:mm:ss"


def run_timestamp(now: _dt.datetime | None = None) -> _dt.datetime:
    """One snapshot per run, taken on the driver (like the reference's single
    ``now()`` :182) and injected as a literal — never per-row
    current_timestamp(), which would differ between tasks/retries."""
    ts = now or _dt.datetime.now()
    return ts.replace(microsecond=0)


def run_timestamp_lit(now: _dt.datetime | None = None) -> Column:
    return F.lit(run_timestamp(now)).cast("timestamp")


def format_run_timestamp(ts: Column) -> Column:
    """Reference-compatible string form (compat/export boundary only)."""
    return F.date_format(ts, REFERENCE_DT_PATTERN)
