"""Round-3 wave 58: binary-encoding surface, version ordering.

- f24: base64 / hex encode-decode round trips pinned across engines —
  the binary-transport surface (payload columns shipped through JSON
  or text protocols), with the encodings themselves compared
  cross-engine, not just the round trips.
- vs1: semantic-version ordering — parse 'v<major>.<minor>.<patch>'
  strings and rank numerically, emitting the LEXICOGRAPHIC rank
  beside it; the two orders must disagree (v10 < v9 as strings) or
  the test data is too tame, property-asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# f24: base64 / hex round trips
# =========================================================================

_F24_SQL = """
SELECT doc_id,
       to_base64(CAST(substr(text, 1, 24) AS BLOB)) AS b64,
       CAST(from_base64(to_base64(CAST(substr(text, 1, 24) AS BLOB)))
            AS VARCHAR) AS b64_roundtrip,
       lower(hex(CAST(substr(text, 1, 12) AS BLOB))) AS hx,
       CAST(unhex(lower(hex(CAST(substr(text, 1, 12) AS BLOB))))
            AS VARCHAR) AS hex_roundtrip,
       substr(text, 1, 24) = CAST(from_base64(to_base64(
         CAST(substr(text, 1, 24) AS BLOB))) AS VARCHAR) AS b64_ok,
       substr(text, 1, 12) = CAST(unhex(lower(hex(
         CAST(substr(text, 1, 12) AS BLOB)))) AS VARCHAR) AS hex_ok
FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 25)
"""


@_register("f24_binary_encodings", _F24_SQL)
def f24_binary_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 and hex encode/decode round trips over document prefixes
    — the binary-transport surface every pipeline crosses when payload
    bytes ride JSON/text protocols. Both the ENCODINGS (same base64
    alphabet and padding, same lowercased hex) and the round-trip
    identity flags are compared cross-engine, pinning that Spark's
    base64/unbase64/hex/unhex and DuckDB's to_base64/from_base64/hex/
    unhex agree byte for byte on UTF-8 text (Spark uppercases hex,
    DuckDB's is uppercase too — both lowercased for the pin). Pure
    codegen projections."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(25)
    )
    p24 = F.substring("text", 1, 24)
    p12 = F.substring("text", 1, 12)
    b64 = F.base64(p24.cast("binary"))
    hx = F.lower(F.hex(p12.cast("binary")))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.unbase64(b64).cast("string").alias("b64_roundtrip"),
        hx.alias("hx"),
        F.unhex(hx).cast("string").alias("hex_roundtrip"),
        (p24 == F.unbase64(b64).cast("string")).alias("b64_ok"),
        (p12 == F.unhex(hx).cast("string")).alias("hex_ok"),
    )


# =========================================================================
# vs1: semantic-version ordering vs lexicographic
# =========================================================================

_VS1_SQL = """
WITH v AS (
  SELECT p_partkey AS key,
         'v' || CAST(CAST('0x' || substr(md5('ma' || CAST(p_partkey AS VARCHAR)),
                1, 8) AS BIGINT) % 12 AS VARCHAR)
         || '.' || CAST(CAST('0x' || substr(md5('mi' || CAST(p_partkey AS VARCHAR)),
                1, 8) AS BIGINT) % 25 AS VARCHAR)
         || '.' || CAST(CAST('0x' || substr(md5('pa' || CAST(p_partkey AS VARCHAR)),
                1, 8) AS BIGINT) % 10 AS VARCHAR) AS version
  FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 30)
), parsed AS (
  SELECT key, version,
         CAST(regexp_extract(version, 'v(\\d+)\\.(\\d+)\\.(\\d+)', 1)
              AS BIGINT) AS major,
         CAST(regexp_extract(version, 'v(\\d+)\\.(\\d+)\\.(\\d+)', 2)
              AS BIGINT) AS minor,
         CAST(regexp_extract(version, 'v(\\d+)\\.(\\d+)\\.(\\d+)', 3)
              AS BIGINT) AS patch
  FROM v
)
SELECT key, version, major, minor, patch,
       CAST(ROW_NUMBER() OVER (ORDER BY major, minor, patch, key)
            AS BIGINT) AS semver_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY version, key) AS BIGINT) AS lex_rank
FROM parsed
"""


@_register("vs1_version_ordering", _VS1_SQL)
def vs1_version_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version ordering for 30 md5-derived 'vM.m.p' strings:
    parse the three numeric components by regex and rank (major, minor,
    patch), emitting the LEXICOGRAPHIC rank beside it — the artifact-
    registry trap this query exists to pin ('v10.0.0' sorts before
    'v9.0.0' as a string). Majors span 0..11 and minors 0..24, so the
    two orders provably disagree at every SF (property: ranks differ
    for some row, and the semver rank matches Python tuple sort). The
    fix every registry needs — sort by parsed tuples, never strings —
    demonstrated as two window ranks over one parse."""
    p = (
        _t(spark, sf_dir, "part")
        .select("p_partkey")
        .orderBy("p_partkey")
        .limit(30)
    )

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("p_partkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    v = p.select(
        F.col("p_partkey").alias("key"),
        F.concat(
            F.lit("v"),
            (_h8("ma") % 12).cast("string"),
            F.lit("."),
            (_h8("mi") % 25).cast("string"),
            F.lit("."),
            (_h8("pa") % 10).cast("string"),
        ).alias("version"),
    )
    rx = r"v(\d+)\.(\d+)\.(\d+)"
    parsed = v.select(
        "key",
        "version",
        F.regexp_extract("version", rx, 1).cast("bigint").alias("major"),
        F.regexp_extract("version", rx, 2).cast("bigint").alias("minor"),
        F.regexp_extract("version", rx, 3).cast("bigint").alias("patch"),
    )
    return parsed.select(
        "key",
        "version",
        "major",
        "minor",
        "patch",
        F.row_number()
        .over(Window.orderBy("major", "minor", "patch", "key"))
        .cast("bigint")
        .alias("semver_rank"),
        F.row_number()
        .over(Window.orderBy("version", "key"))
        .cast("bigint")
        .alias("lex_rank"),
    )
