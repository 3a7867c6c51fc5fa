"""Property-based tests (SURVEY.md §5) for the string/path operators:
truncation, path parsing, depth — hypothesis generates the adversarial
cases (unicode, delimiters inside segments, boundary lengths)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.operators.strings import (
    dot_path_depth,
    last_segment,
    materialized_path,
    path_codes,
    strip_after_last,
    truncate_varchar,
)

# one shared slow-resource (SparkSession) → bound example counts
PROP_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

code = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Nd")), min_size=1, max_size=8
)


def _one_row(spark, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} STRING" for k in cols)
    )
    return df


@given(value=st.text(min_size=0, max_size=120), n=st.integers(1, 60))
@settings(**PROP_SETTINGS)
def test_truncation_is_bounded_prefix(spark, value, n):
    df = _one_row(spark, v=value).select(truncate_varchar("v", n).alias("t"))
    out = df.collect()[0]["t"]
    assert len(out) <= n
    assert value.startswith(out)
    if len(value) <= n:
        assert out == value


@given(codes=st.lists(code, min_size=1, max_size=8))
@settings(**PROP_SETTINGS)
def test_depth_equals_segment_count(spark, codes):
    path = ".".join(codes)
    df = _one_row(spark, p=path).select(dot_path_depth("p", base=3).alias("d"))
    assert df.collect()[0]["d"] == len(codes) + 2


@given(codes=st.lists(code, min_size=1, max_size=6), leaf=code)
@settings(**PROP_SETTINGS)
def test_path_reassembly(spark, codes, leaf):
    """C_PATH + '\\' + last_segment reassembles C_FULLNAME (reference
    C_PATH :239 semantics)."""
    path_to_root = ".".join(codes)
    df = _one_row(spark, p=path_to_root, leaf=leaf).select(
        materialized_path(
            path_codes(F.col("p"), F.col("leaf")),
            F.transform(
                path_codes(F.col("p"), F.col("leaf")), lambda c: F.lit("nm")
            ),
        ).alias("full")
    )
    full = df.collect()[0]["full"]
    df2 = _one_row(spark, f=full).select(
        strip_after_last("f", "\\").alias("parent"),
        last_segment("f", "\\").alias("leaf_seg"),
    )
    r = df2.collect()[0]
    assert r["parent"] + "\\" + r["leaf_seg"] == full
    # depth of materialized path = segments + 2 root segments
    assert full.count("\\") == (len(codes) + 1) + 2
