r"""Round-7 wave 95: native XML file source/sink (Spark 4).

- src10: the XML FILE source — ``format("xml")`` with rowTag — which is
  new, built-in surface in Spark 4 (the old spark-xml package folded into
  core). The registry already certifies the XML *column* functions
  (f8 generation, xml2 from_xml parse-back); this closes the remaining
  gap: XML as an interchange FORMAT on disk, the shape B2B/healthcare
  feeds (the reference's own LOINC domain) actually arrive in.

Reference parity note: the reference script (Angelo_ETL_Task.py:160-176)
builds C_METADATAXML strings by hand; src10 is the engine-level
counterpart — schema'd XML ingestion that parallelizes per file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .queries_scale import _SCRATCH

# =========================================================================
# src10: XML source/sink round-trip with escaping actually exercised
# =========================================================================

_SRC10_SQL = """
WITH slice AS (
  SELECT o_orderkey,
         o_orderpriority || ' <&"''> ' || CAST(o_custkey AS VARCHAR)
           AS tricky,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 20 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
       CAST(SUM(LENGTH(tricky)) AS BIGINT) AS sum_tricky_chars,
       md5(string_agg(tricky, '|' ORDER BY o_orderkey)) AS tricky_md5,
       CAST(SUM(CAST(CAST(price AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_price_cents
FROM slice
"""


@_register("src10_xml_source", _SRC10_SQL)
def src10_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML file source (Spark 4 ``format("xml")``): a bounded
    orders slice is written as XML documents (rowTag=order) and read
    back with an EXPLICIT schema — never inference, which on a 100 TB
    feed would parse everything twice. The payload is built to make the
    round-trip non-vacuous: the ``tricky`` column embeds every XML
    metacharacter (``< & " '`` and ``>``), so writer escaping and
    reader unescaping are both on the hash path (the oracle computes
    the same ordered md5 from the ORIGINAL rows — any mangling in
    either direction breaks ``tricky_md5``). Doubles cross as text via
    Java shortest-repr (exact both ways, src1's JSON argument), then
    are fixed to integer cents for the released sum so the aggregate
    itself is order-insensitive. At 100 TB XML scans parallelize per
    file like JSON-lines; the write stays a bounded fixture
    materialization (it builds the SOURCE under test), and the
    read-back aggregate is the distributed path being certified."""
    sink = os.path.join(
        _SCRATCH, "src10_xml_" + os.path.basename(sf_dir.rstrip("/"))
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    slice_df = o.select(
        "o_orderkey",
        F.concat(
            F.col("o_orderpriority"),
            F.lit(" <&\"'> "),
            F.col("o_custkey").cast("string"),
        ).alias("tricky"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    (
        slice_df.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(sink)
    )
    back = (
        spark.read.format("xml")
        .schema("o_orderkey bigint, tricky string, price double")
        .option("rowTag", "order")
        .load(sink)
    )
    # ordered md5 over a bounded slice: sort_array(collect_list(struct))
    # keeps the concat order identical to the oracle's ORDER BY key
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("sum_keys"),
        F.sum(F.length("tricky")).alias("sum_tricky_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("o_orderkey", "tricky"))
                    ),
                    lambda s: s["tricky"],
                ),
                "|",
            )
        ).alias("tricky_md5"),
        F.sum(
            (F.col("price").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("sum_price_cents"),
    )
