"""Golden-row pipeline test: the docx worked example for LOINC 4548-4
(FIXTURES.md §2) through the full LOINC→i2b2 transform, plus the §7.4 edge
cases (last-wins duplicates, folder flags, truncation)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.pipelines.loinc_i2b2 import transform_loinc_to_i2b2
from angelo_bravo_etl_task_spark.schemas import (
    HIERARCHY_SCHEMA,
    I2B2_SCHEMA,
    LOINC_SCHEMA,
)

CHAIN = "LP31756-7.LP30786-5.LP31617-1.LP14554-7.LP16412-6.LP16413-4.LP100945-7"
ANCESTOR_NAMES = {
    "LP31756-7": "Hematology",
    "LP30786-5": "Blood bank",
    "LP31617-1": "Chemistry challenge",
    "LP14554-7": "Hemoglobin",
    "LP16412-6": "Glycated hemoglobin",
    "LP16413-4": "Hemoglobin A1c",
    "LP100945-7": "HbA1c measurement",
}


def _fixtures(spark):
    loinc_rows = [
        (
            "4548-4",
            "Hemoglobin A1c/Hemoglobin.total",
            "MFr",
            "Pt",
            "Bld",
            "Qn",
            None,
            "ACTIVE",
        ),
        # an LP code present in loinc → exercises the LP branches of C_NAME
        # and C_METADATAXML; parent of exactly one row + non-ACTIVE → 'FIE'
        ("LP100945-7", None, None, None, None, "Ord", None, "DEPRECATED"),
        # parent of two rows → 'M' flag
        ("LP16413-4", None, None, None, None, "Ord", None, "ACTIVE"),
    ]
    chain_codes = CHAIN.split(".")
    hier_rows = []
    for i, code in enumerate(chain_codes):
        hier_rows.append(
            (
                ".".join(chain_codes[:i]) if i else "",
                1,
                chain_codes[i - 1] if i else None,
                code,
                ANCESTOR_NAMES[code],
            )
        )
    hier_rows.append((CHAIN, 1, "LP100945-7", "4548-4", "Hgb A1c MFr Bld"))
    # second child of LP16413-4 → makes it a multi-folder ('M')
    hier_rows.append(
        (
            ".".join(chain_codes[:6]),
            2,
            "LP16413-4",
            "LP999999-9",
            "Other HbA1c thing",
        )
    )
    loinc = spark.createDataFrame(loinc_rows, LOINC_SCHEMA)
    hierarchy = spark.createDataFrame(hier_rows, HIERARCHY_SCHEMA).withColumn(
        "_line_no", F.monotonically_increasing_id()
    )
    return loinc, hierarchy


@pytest.fixture(scope="module")
def result(spark):
    loinc, hierarchy = _fixtures(spark)
    now = datetime.datetime(2026, 8, 13, 12, 0, 0)
    df = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="spec", now=now, hierarchy_order_col="_line_no"
    )
    return {r["C_BASECODE"]: r for r in df.collect()}, df


def test_golden_row_4548_4(result):
    rows, df = result
    r = rows["LOINC:4548-4"]
    assert r["C_HLEVEL"] == 9
    assert r["C_NAME"] == "Hemoglobin A1c/Hemoglobin.total:MFr:Pt:Bld:Qn:"
    assert r["C_VISUALATTRIBUTES"] == "LA"
    assert r["C_SYMBOL"] == "Hgb A1c MFr Bld"
    assert r["C_COLUMNDATATYPE"] == "N"
    # per-segment names (spec mode, docx semantics — NOT the reference's
    # leaf-name-repetition bug at Angelo_ETL_Task.py:40)
    expected_fullname = "\\i2b2\\Laboratory" + "".join(
        f"\\({code}) {ANCESTOR_NAMES[code]}" for code in CHAIN.split(".")
    ) + "\\(4548-4) Hgb A1c MFr Bld"
    assert r["C_FULLNAME"] == expected_fullname
    assert r["C_DIMCODE"] == r["C_FULLNAME"]
    assert r["C_TOOLTIP"] == r["C_FULLNAME"]
    assert r["C_PATH"] == expected_fullname.rsplit("\\", 1)[0]
    assert r["C_SYNONYM_CD"] == "N"
    assert r["C_OPERATOR"] == "LIKE"
    assert r["M_APPLIED_PATH"] == "@"
    assert r["SOURCESYSTEM_CD"] == "LOINC"
    assert r["VALUETYPE_CD"] == "LAB"
    assert r["C_METADATAXML"] == (
        "<Loinc><LOINC_NUM>4548-4</LOINC_NUM>"
        "<COMPONENT>Hemoglobin A1c/Hemoglobin.total</COMPONENT>"
        "<SYSTEM>Bld</SYSTEM><METHOD_TYP /></Loinc>"
    )


def test_folder_flags(result):
    rows, _ = result
    # LP100945-7 parents exactly one row, DEPRECATED → F + I + E
    assert rows["LOINC:LP100945-7"]["C_VISUALATTRIBUTES"] == "FIE"
    # LP16413-4 parents two rows, ACTIVE → M + A + E
    assert rows["LOINC:LP16413-4"]["C_VISUALATTRIBUTES"] == "MAE"


def test_lp_name_and_xml(result):
    rows, _ = result
    r = rows["LOINC:LP16413-4"]
    assert r["C_NAME"] == "Hemoglobin A1c"  # CODE_TEXT, not the concat
    assert r["C_METADATAXML"] == (
        "<MultiAxialHierarchy><LOINC_NUM>LP16413-4</LOINC_NUM>"
        "<CODE_TEXT>Hemoglobin A1c</CODE_TEXT></MultiAxialHierarchy>"
    )


def test_output_schema(result):
    _, df = result
    assert [f.name for f in df.schema.fields] == [f.name for f in I2B2_SCHEMA.fields]
    assert [f.dataType for f in df.schema.fields] == [
        f.dataType for f in I2B2_SCHEMA.fields
    ]


def test_compat_mode_leaf_name_repetition(spark):
    """Reference bug (Angelo_ETL_Task.py:40): every path segment carries the
    LEAF's name. compat mode must reproduce it."""
    loinc, hierarchy = _fixtures(spark)
    df = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="compat", hierarchy_order_col="_line_no"
    )
    r = {x["C_BASECODE"]: x for x in df.collect()}["LOINC:4548-4"]
    expected = "\\i2b2\\Laboratory" + "".join(
        f"\\({code}) Hgb A1c MFr Bld" for code in CHAIN.split(".") + ["4548-4"]
    )
    assert r["C_FULLNAME"] == expected


def test_compat_mode_nan_in_concat(spark):
    """Reference quirk (Angelo_ETL_Task.py:169-170): pandas astype(str)
    turns NaN concat members into the literal 'nan'. compat mode reproduces
    it; spec mode uses empty string."""
    loinc = spark.createDataFrame(
        [("333-3", None, "P", None, "S", "Qn", None, "ACTIVE")], LOINC_SCHEMA
    )
    hierarchy = spark.createDataFrame(
        [("", 1, None, "LPD-1", "D"), ("LPD-1", 1, "LPD-1", "333-3", "Name")],
        HIERARCHY_SCHEMA,
    ).withColumn("_line_no", F.monotonically_increasing_id())
    compat = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="compat", hierarchy_order_col="_line_no"
    ).collect()[0]
    spec = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="spec", hierarchy_order_col="_line_no"
    ).collect()[0]
    assert compat["C_NAME"] == "nan:P:nan:S:Qn:nan"
    assert spec["C_NAME"] == ":P::S:Qn:"


def test_last_wins_duplicate_hierarchy(spark):
    """A code placed twice in the hierarchy: the LAST file row's path must
    drive the output (pd.Series.to_dict semantics, Angelo_ETL_Task.py:163)."""
    loinc = spark.createDataFrame(
        [("111-1", "Comp", "P", "T", "S", "Qn", None, "ACTIVE")], LOINC_SCHEMA
    )
    hierarchy = spark.createDataFrame(
        [
            ("", 1, None, "LPA-1", "A name"),
            ("", 1, None, "LPB-1", "B name"),
            ("LPA-1", 1, "LPA-1", "111-1", "first placement"),
            ("LPB-1", 2, "LPB-1", "111-1", "second placement"),
        ],
        HIERARCHY_SCHEMA,
    ).withColumn("_line_no", F.monotonically_increasing_id())
    df = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="spec", hierarchy_order_col="_line_no"
    )
    rows = df.collect()
    assert len(rows) == 1  # one surviving row per code, not a fan-out
    r = rows[0]
    assert r["C_HLEVEL"] == 3
    assert r["C_FULLNAME"].startswith("\\i2b2\\Laboratory\\(LPB-1) B name")
    assert r["C_SYMBOL"] == "second placement"


def test_truncation_limits(spark):
    """varchar limits enforced by prefix truncation (reference :261-272)."""
    long_name = "X" * 1000
    loinc = spark.createDataFrame(
        [("222-2", long_name, "P", "T", "S", "Nom", "M", "ACTIVE")], LOINC_SCHEMA
    )
    hierarchy = spark.createDataFrame(
        [
            ("", 1, None, "LPC-1", long_name),
            ("LPC-1", 1, "LPC-1", "222-2", long_name),
        ],
        HIERARCHY_SCHEMA,
    ).withColumn("_line_no", F.monotonically_increasing_id())
    df = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="spec", hierarchy_order_col="_line_no"
    )
    r = df.collect()[0]
    assert len(r["C_FULLNAME"]) == 700
    assert len(r["C_SYMBOL"]) == 50
    assert len(r["C_TOOLTIP"]) == 900
    assert r["C_COLUMNDATATYPE"] == "T"  # non-Qn scale


def test_compat_mode_nan_in_xml(spark):
    """Reference quirk (Angelo_ETL_Task.py:111-115): str(NaN) puts the
    LITERAL bytes 'nan' inside C_METADATAXML elements. compat mode must
    reproduce them; spec mode keeps the empty-element form."""
    loinc, hierarchy = _fixtures(spark)
    compat = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="compat", hierarchy_order_col="_line_no"
    ).where(F.col("C_BASECODE") == "LOINC:4548-4").collect()[0]
    # METHOD_TYP is NULL for 4548-4 → literal 'nan' element body
    assert "<METHOD_TYP>nan</METHOD_TYP>" in compat["C_METADATAXML"]
    spec = transform_loinc_to_i2b2(
        loinc, hierarchy, mode="spec", hierarchy_order_col="_line_no"
    ).where(F.col("C_BASECODE") == "LOINC:4548-4").collect()[0]
    assert "<METHOD_TYP />" in spec["C_METADATAXML"]
    assert "nan" not in spec["C_METADATAXML"]


def test_order_fallback_refused_on_multipartition_input(spark):
    """_with_order's monotonically_increasing_id fallback is not file order
    across partitions — the pipeline must refuse it rather than silently
    produce run-dependent survivors."""
    loinc, hierarchy = _fixtures(spark)
    multi = hierarchy.drop("_line_no").repartition(4)
    with pytest.raises(ValueError, match="hierarchy_order_col is required"):
        transform_loinc_to_i2b2(loinc, multi, mode="spec")
    # single-partition input still allows the fallback
    single = hierarchy.drop("_line_no").coalesce(1)
    assert transform_loinc_to_i2b2(loinc, single, mode="spec").count() > 0
