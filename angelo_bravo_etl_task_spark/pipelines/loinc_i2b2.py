"""The flagship pipeline: LOINC + MultiAxialHierarchy → 25-column i2b2 table.

Spark-first recomposition of the reference ``transform()``
(Angelo_ETL_Task.py:150-274). Where the reference builds five Python dicts
and runs per-row lambdas, this declares ONE lazy logical plan:

- the lookup dicts become joins (the hierarchy is dimension-sized →
  broadcast; nothing collects to the driver);
- last-wins duplicate-key semantics (pd.Series.to_dict) become a
  row_number window over an explicit order column (SURVEY.md §7.4);
- every computed column is a native Column expression (codegen), including
  the XML documents and materialized paths;
- the NOT-NULL filter and varchar truncation are driven from the schema
  tables in ``schemas.py``.

Two modes (SURVEY.md §7.4): ``spec`` (docx-correct, default) and ``compat``
(reproduces the reference's verified quirks: leaf-name repetition in
C_FULLNAME segments (:40) and 'nan' literals in C_NAME (:169-170)).

At 100 TB-shape inputs: the only shuffles are (a) the last-wins window on
CODE, (b) the path-segment regroup for spec-mode names; hierarchy-side
joins broadcast. Both shuffles key on high-cardinality codes — no skew.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F

from ..functions.datetime_utils import run_timestamp_lit
from ..functions.xmlgen import loinc_metadata_xml
from ..operators.dedup import last_wins
from ..operators.filters import constraint_filter
from ..operators.project import visual_attributes
from ..operators.strings import (
    dot_path_depth,
    materialized_path,
    path_codes,
    strip_after_last,
    truncate_varchar,
)
from ..schemas import I2B2_COLUMNS, I2B2_NOT_NULL_COLUMNS, I2B2_VARCHAR_LIMITS

PATH_ROOT = "\\i2b2\\Laboratory"


def _with_order(df: DataFrame, order_col: str | None) -> tuple[DataFrame, str]:
    """Ensure an explicit order column for last-wins semantics.

    Without one, the only available stand-in is ``monotonically_increasing_id``
    — which encodes (partition, offset), NOT file order, so on multi-partition
    input the surviving duplicate would silently change run to run. That
    nondeterminism is refused: the fallback is allowed ONLY for
    single-partition input (where partition offset IS read order); everything
    else must supply a real line-number column."""
    if order_col is not None:
        return df, order_col
    if df.rdd.getNumPartitions() > 1:
        raise ValueError(
            "hierarchy_order_col is required for multi-partition input: "
            "monotonically_increasing_id() is not file order across "
            "partitions, so last-wins survivors would be nondeterministic. "
            "Supply an explicit line-number/order column."
        )
    return df.withColumn("_ord", F.monotonically_increasing_id()), "_ord"


def _c_name_concat(compat: bool) -> F.Column:
    """':'-joined 6-column concat (reference :169-170). pandas astype(str)
    turns NaN into 'nan' (compat); spec uses empty string — separators stay
    either way (concat_ws would silently drop them)."""
    cols = ["COMPONENT", "PROPERTY", "TIME_ASPCT", "SYSTEM", "SCALE_TYP", "METHOD_TYP"]
    filler = "nan" if compat else ""
    parts: list[F.Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(":"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(filler)))
    return F.concat(*parts)


def transform_loinc_to_i2b2(
    loinc: DataFrame,
    hierarchy: DataFrame,
    mode: str = "spec",
    now: _dt.datetime | None = None,
    hierarchy_order_col: str | None = None,
    import_date: _dt.datetime | None = None,
) -> DataFrame:
    """LOINC tables → i2b2 ontology rows (reference transform(), :150-274).

    ``hierarchy_order_col``: column that defines file order for last-wins
    duplicate resolution. ``import_date``: earliest existing import date from
    the sink, if any (reference load() read-back, :330-335).
    """
    if mode not in ("spec", "compat"):
        raise ValueError(f"mode must be spec|compat, got {mode}")
    compat = mode == "compat"

    hierarchy, ord_col = _with_order(hierarchy, hierarchy_order_col)

    # One surviving hierarchy row per CODE, last file row wins — replaces
    # loinc_path_dict / loinc_codetext_dict (reference :163,:166). The
    # reference keys the path dict by merged LOINC_NUM, which equals CODE on
    # the join matches, so a single dedup serves both.
    # hier_last feeds up to three places (the base join, and in spec mode
    # the per-segment name map); Catalyst's tree-shaped plan re-derives
    # the window subtree per use. That re-derivation is two extra
    # dimension-sized window shuffles — measurably cheaper than an eager
    # localCheckpoint here (A/B at sf0.1: materialization costs ~1 s cold
    # and breaks the transform's one-lazy-plan property; the recompute is
    # noise next to the fact side at any scale, since the hierarchy is a
    # dimension by definition).
    hier_last = last_wins(
        hierarchy.select("CODE", "CODE_TEXT", "PATH_TO_ROOT", ord_col),
        ["CODE"],
        ord_col,
    ).drop(ord_col)

    # parent_count_dict (:173): children per IMMEDIATE_PARENT.
    parent_counts = hierarchy.groupBy("IMMEDIATE_PARENT").agg(
        F.count(F.lit(1)).alias("_parent_count")
    )

    # The reference's merged_df + unique() reduces to: one row per LOINC_NUM
    # with its surviving hierarchy row. Missing-hierarchy codes crash the
    # reference (:192 on NaN); both modes drop them (documented deviation —
    # an engine can't "crash per row"), i.e. inner-join semantics.
    base = (
        loinc.join(
            F.broadcast(hier_last),
            loinc["LOINC_NUM"] == hier_last["CODE"],
            "inner",
        )
        .join(
            F.broadcast(parent_counts),
            loinc["LOINC_NUM"] == parent_counts["IMMEDIATE_PARENT"],
            "left",
        )
        .drop("IMMEDIATE_PARENT")
    )

    # --- C_FULLNAME ------------------------------------------------------
    codes_arr = path_codes(F.col("PATH_TO_ROOT"), F.col("LOINC_NUM"))
    if compat:
        # reference bug (:40): every segment carries the LEAF's name
        names_arr = F.transform(codes_arr, lambda _: F.col("CODE_TEXT"))
        base = base.withColumn(
            "C_FULLNAME", materialized_path(codes_arr, names_arr, PATH_ROOT)
        )
    else:
        # spec mode: per-segment names — explode the path, join the (broadcast)
        # code→name map, regroup ordered by position. One shuffle on LOINC_NUM.
        names = hier_last.select(
            F.col("CODE").alias("_seg_code"), F.col("CODE_TEXT").alias("_seg_name")
        )
        segs = (
            base.select("LOINC_NUM", F.posexplode(codes_arr).alias("_pos", "_seg_code"))
            .join(F.broadcast(names), "_seg_code", "left")
            .groupBy("LOINC_NUM")
            .agg(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("_pos"),
                                    F.concat(
                                        F.lit("\\("),
                                        F.col("_seg_code"),
                                        F.lit(") "),
                                        # ancestors missing from the hierarchy
                                        # would KeyError in the reference; spec
                                        # falls back to the code itself
                                        F.coalesce(F.col("_seg_name"), F.col("_seg_code")),
                                    ).alias("_seg"),
                                )
                            )
                        ),
                        lambda s: s["_seg"],
                    ),
                ).alias("_segments")
            )
            .select(
                F.col("LOINC_NUM").alias("_fn_code"),
                F.concat(F.lit(PATH_ROOT), F.col("_segments")).alias("C_FULLNAME"),
            )
        )
        base = base.join(segs, base["LOINC_NUM"] == segs["_fn_code"], "inner").drop(
            "_fn_code"
        )

    # --- remaining columns (reference :189-241), all native expressions --
    now_lit = run_timestamp_lit(now)
    import_lit = (
        F.lit(import_date).cast("timestamp") if import_date is not None else now_lit
    )
    is_lp = F.col("LOINC_NUM").startswith("LP")

    out = base.withColumns(
        {
            "C_HLEVEL": dot_path_depth(F.col("PATH_TO_ROOT"), base=3),
            "C_NAME": F.when(is_lp, F.col("CODE_TEXT")).otherwise(
                _c_name_concat(compat)
            ),
            "C_SYNONYM_CD": F.lit("N"),
            "C_VISUALATTRIBUTES": visual_attributes(
                F.col("_parent_count"), F.col("STATUS")
            ),
            "C_TOTALNUM": F.lit(None).cast("int"),
            "C_BASECODE": F.concat(F.lit("LOINC:"), F.col("LOINC_NUM")),
            "C_METADATAXML": loinc_metadata_xml(
                F.col("LOINC_NUM"),
                F.col("CODE_TEXT"),
                F.col("COMPONENT"),
                F.col("SYSTEM"),
                F.col("METHOD_TYP"),
                compat=compat,
            ),
            "C_FACTTABLECOLUMN": F.lit("CONCEPT_CD"),
            "C_TABLENAME": F.lit("CONCEPT_DIMENSION"),
            "C_COLUMNNAME": F.lit("CONCEPT_PATH"),
            "C_COLUMNDATATYPE": F.when(
                F.col("SCALE_TYP") == "Qn", F.lit("N")
            ).otherwise(F.lit("T")),
            "C_OPERATOR": F.lit("LIKE"),
            "C_DIMCODE": F.col("C_FULLNAME"),
            "C_COMMENT": F.lit(None).cast("string"),
            "C_TOOLTIP": F.col("C_FULLNAME"),
            "M_APPLIED_PATH": F.lit("@"),
            "UPDATE_DATE": now_lit,
            "DOWNLOAD_DATE": now_lit,
            "IMPORT_DATE": import_lit,
            "SOURCESYSTEM_CD": F.lit("LOINC"),
            "VALUETYPE_CD": F.lit("LAB"),
            "M_EXCLUSION_CD": F.lit(None).cast("string"),
            "C_PATH": strip_after_last(F.col("C_FULLNAME"), "\\"),
            "C_SYMBOL": F.col("CODE_TEXT"),
        }
    )

    # constraint filter (:245-258) then varchar truncation (:261-272),
    # in the reference's order (filter sees untruncated values)
    out = constraint_filter(out, I2B2_NOT_NULL_COLUMNS)
    out = out.withColumns(
        {
            name: truncate_varchar(F.col(name), limit)
            for name, limit in I2B2_VARCHAR_LIMITS.items()
        }
    )
    return out.select(
        *[
            F.col(name).cast(dtype).alias(name)
            for name, dtype, _, _ in I2B2_COLUMNS
        ]
    )
