"""String/path operators (SURVEY.md §2.2 R12-R14, §2.3 F1-F7).

These cover the reference's hierarchy-path machinery — materialized-path
strings like ``\\i2b2\\Laboratory\\(LP...) name\\(4548-4) name`` — and varchar
truncation. All pure Column expressions (whole-stage codegen), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_varchar(col: Column | str, n: int) -> Column:
    """Enforce a varchar(n) limit by prefix truncation (reference
    ``varchar_len``, Angelo_ETL_Task.py:123-127, applied :261-272)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def dot_path_depth(path: Column | str, base: int = 3) -> Column:
    """Hierarchy depth from a dot-separated ancestor path (reference
    C_HLEVEL = dot_count + 3, Angelo_ETL_Task.py:192). split('.') on a
    non-empty path has dot_count+1 elements, so depth = size + base - 1."""
    c = F.col(path) if isinstance(path, str) else path
    return (F.size(F.split(c, r"\.")) + F.lit(base - 1)).cast("int")


def strip_after_last(col: Column | str, delimiter: str = "\\") -> Column:
    """Everything before the last ``delimiter`` (reference C_PATH,
    Angelo_ETL_Task.py:239: ``path[:path.rfind('\\')]``)."""
    c = F.col(col) if isinstance(col, str) else col
    d = "\\\\" if delimiter == "\\" else delimiter
    return F.regexp_replace(c, f"{d}[^{d}]*$", "")


def last_segment(col: Column | str, delimiter: str = "\\") -> Column:
    """The text after the last ``delimiter``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, delimiter, -1)


def path_codes(path_to_root: Column, leaf_code: Column) -> Column:
    """Ancestor codes root-first plus the leaf: split PATH_TO_ROOT on '.'
    and append the row's own code (reference get_c_full_name :32-34)."""
    return F.concat(F.split(path_to_root, r"\."), F.array(leaf_code))


def materialized_path(
    codes: Column, names: Column, root: str = "\\i2b2\\Laboratory"
) -> Column:
    """Concatenate ``\\(code) name`` segments onto ``root`` (reference
    get_c_full_name :43-47). ``codes`` and ``names`` are equal-length
    arrays (zip_with keeps it all in one JVM expression)."""
    segs = F.zip_with(
        codes,
        names,
        lambda c, n: F.concat(F.lit("\\("), c, F.lit(") "), n),
    )
    return F.concat(F.lit(root), F.concat_ws("", segs))
