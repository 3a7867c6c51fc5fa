"""XML generation as Column expressions (SURVEY.md §2.3 F8).

The reference builds one small XML document per row with ElementTree in a
Python loop (Angelo_ETL_Task.py:89-120) — the slowest possible path. Here
the same documents are deterministic concat expressions with explicit
escaping, byte-compatible with ``ET.tostring(..., encoding='unicode')``
for the tag shapes involved, and fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xml_escape_text(col: Column) -> Column:
    """Escape text content the way ElementTree does: & < > (not quotes)."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    return c


def xml_element(tag: str, *children: Column) -> Column:
    """``<tag>…children…</tag>`` (children already serialized)."""
    return F.concat(F.lit(f"<{tag}>"), *children, F.lit(f"</{tag}>"))


def xml_leaf(tag: str, value: Column, null_text: str | None = None) -> Column:
    """``<tag>escaped-value</tag>``; NULL value → ``<tag />`` like
    ElementTree's ``text=None`` — unless ``null_text`` is given, in which
    case NULL renders as that literal text (the reference passes
    ``str(value)`` so pandas NaN becomes the LITERAL ``'nan'`` inside the
    element, Angelo_ETL_Task.py:111-115; compat mode threads that through)."""
    if null_text is not None:
        null_doc = F.lit(f"<{tag}>{null_text}</{tag}>")
    else:
        null_doc = F.lit(f"<{tag} />")
    return F.when(value.isNull(), null_doc).otherwise(
        F.concat(F.lit(f"<{tag}>"), xml_escape_text(value), F.lit(f"</{tag}>"))
    )


def loinc_metadata_xml(
    loinc_num: Column,
    code_text: Column,
    component: Column,
    system: Column,
    method_typ: Column,
    compat: bool = False,
) -> Column:
    """The reference's two per-row document shapes (Angelo_ETL_Task.py:95-117):

    LP* codes →  <MultiAxialHierarchy><LOINC_NUM>…</LOINC_NUM>
                 <CODE_TEXT>…</CODE_TEXT></MultiAxialHierarchy>
    otherwise →  <Loinc><LOINC_NUM>…</LOINC_NUM><COMPONENT>…</COMPONENT>
                 <SYSTEM>…</SYSTEM><METHOD_TYP>…</METHOD_TYP></Loinc>

    The reference passes ``str(value)`` so NaN becomes the literal 'nan'
    (§7.4 quirk, Angelo_ETL_Task.py:111-115); ``compat=True`` reproduces
    that; spec mode keeps NULLs as empty ``<tag />`` elements instead.
    """
    null_text = "nan" if compat else None
    lp_doc = xml_element(
        "MultiAxialHierarchy",
        xml_leaf("LOINC_NUM", loinc_num, null_text),
        xml_leaf("CODE_TEXT", code_text, null_text),
    )
    std_doc = xml_element(
        "Loinc",
        xml_leaf("LOINC_NUM", loinc_num, null_text),
        xml_leaf("COMPONENT", component, null_text),
        xml_leaf("SYSTEM", system, null_text),
        xml_leaf("METHOD_TYP", method_typ, null_text),
    )
    return F.when(loinc_num.startswith("LP"), lp_doc).otherwise(std_doc)
