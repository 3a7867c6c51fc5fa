r"""Round-8 wave 111: the VARIANT type (var2) — Spark 4's open-format
semi-structured column, the engine surface behind schemaless event
ingestion (the modern JSON-lake pattern: land heterogeneous payloads AS
VARIANT, shred typed columns lazily at query time instead of forcing a
global schema at write time).

Heterogeneous JSON payloads (three deterministic shapes, fields present
or absent by key) are parsed with ``parse_json``, path-extracted with
``variant_get``/``try_variant_get``, and the shredded typed columns ride
the driver's hash against DuckDB's JSON operators over the identical
payload strings. All leaf values are integers/strings/booleans — no
floats inside JSON, so serialization formatting can't diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_VAR2_SQL = """
WITH payload AS (
  SELECT o_orderkey,
         CASE CAST(o_orderkey % 3 AS INTEGER)
           WHEN 0 THEN '{"k": ' || CAST(o_orderkey AS VARCHAR)
                || ', "cust": {"id": ' || CAST(o_custkey AS VARCHAR)
                || ', "tier": "gold"}, "amounts": ['
                || CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
                || ', 5]}'
           WHEN 1 THEN '{"k": ' || CAST(o_orderkey AS VARCHAR)
                || ', "cust": {"id": ' || CAST(o_custkey AS VARCHAR)
                || '}, "note": "x"}'
           ELSE '{"k": ' || CAST(o_orderkey AS VARCHAR) || ', "flag": true}'
         END AS j
  FROM orders
)
SELECT o_orderkey,
       CAST(j ->> '$.cust.id' AS BIGINT) AS cust_id,
       j ->> '$.cust.tier' AS tier,
       CAST(CAST(j ->> '$.flag' AS BOOLEAN) AS BIGINT) AS flag_i,
       CAST(j ->> '$.amounts[0]' AS BIGINT) AS amount0_cents
FROM payload
"""


@_register("var2_variant_shredding", _VAR2_SQL)
def var2_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless ingestion via VARIANT: heterogeneous JSON payloads
    (three shapes — nested customer object with/without tier, bare flag
    record; fields genuinely absent, not null) are parsed ONCE into a
    VARIANT column, then shredded into typed columns by path:
    ``variant_get`` for fields the shape guarantees,
    ``try_variant_get`` for optional paths (returns NULL instead of
    throwing on absent fields — both branches exercised by
    construction). The oracle runs DuckDB's JSON operators over the
    byte-identical payload strings, so the hash certifies parse +
    path-extraction + type coercion end to end. Leaf values are
    integers/strings only on the hash path — the extracted boolean is
    released as nullable BIGINT (a nullable BOOLEAN pandas-materializes
    as Spark None vs DuckDB NaN, found live in pre-verification), and
    floats never enter the JSON, so there is no serialization
    formatting to diverge.

    100 TB shape: VARIANT is the open-format answer to 'land first,
    schema later' — payloads stay one binary column through the scan
    (no schema inference pass over petabytes), shredding happens in the
    projection with per-path columnar pruning, and hot paths can be
    materialized later without rewriting history. The parse is a pure
    map; nothing here shuffles."""
    o = _t(spark, sf_dir, "orders")
    price_c = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    j = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(
                F.lit('{"k": '),
                F.col("o_orderkey").cast("string"),
                F.lit(', "cust": {"id": '),
                F.col("o_custkey").cast("string"),
                F.lit(', "tier": "gold"}, "amounts": ['),
                price_c.cast("string"),
                F.lit(", 5]}"),
            ),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(
                F.lit('{"k": '),
                F.col("o_orderkey").cast("string"),
                F.lit(', "cust": {"id": '),
                F.col("o_custkey").cast("string"),
                F.lit('}, "note": "x"}'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"k": '),
                F.col("o_orderkey").cast("string"),
                F.lit(', "flag": true}'),
            )
        )
    )
    v = o.select("o_orderkey", F.parse_json(j).alias("v"))
    return v.selectExpr(
        "o_orderkey",
        "try_variant_get(v, '$.cust.id', 'bigint') AS cust_id",
        "try_variant_get(v, '$.cust.tier', 'string') AS tier",
        "CAST(try_variant_get(v, '$.flag', 'boolean') AS BIGINT) AS flag_i",
        "try_variant_get(v, '$.amounts[0]', 'bigint') AS amount0_cents",
    )
