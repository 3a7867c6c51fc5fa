r"""Round-7 wave 95: native XML file source/sink, EXECUTE IMMEDIATE.

- src10: the XML FILE source — ``format("xml")`` with rowTag — which is
  new, built-in surface in Spark 4 (the old spark-xml package folded into
  core). The registry already certifies the XML *column* functions
  (f8 generation, xml2 from_xml parse-back); this closes the remaining
  gap: XML as an interchange FORMAT on disk, the shape B2B/healthcare
  feeds (the reference's own LOINC domain) actually arrive in.
- sql7: EXECUTE IMMEDIATE — Spark 4's dynamic-SQL statement — in its
  full shape: a scalar probe captured INTO a session variable, then a
  parameterized aggregate bound via named USING. Completes the SQL
  frontend family (sql1 static text, sql3 parameterized spark.sql,
  var1 session variables, scr1 scripting) with the one statement-level
  surface that was missing.

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


# =========================================================================
# sql7: EXECUTE IMMEDIATE — dynamic SQL with INTO capture + USING binding
# =========================================================================

_SQL7_SQL = """
WITH cut AS (
  SELECT CAST(MAX(o_orderkey) // 2 AS BIGINT) AS cut FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents,
       (SELECT cut FROM cut) AS cutoff_used
FROM orders WHERE o_orderkey <= (SELECT cut FROM cut)
GROUP BY o_orderpriority
"""


@_register("sql7_execute_immediate", _SQL7_SQL)
def sql7_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL via EXECUTE IMMEDIATE (Spark 4), both halves of the
    statement's contract in one flow: (1) a scalar probe whose result
    is captured INTO a session variable (``MAX(o_orderkey) DIV 2`` — a
    data-derived cutoff, never a constant that goes vacuous when the
    driver regenerates data), and (2) the released aggregate as a
    dynamically-supplied SQL STRING with a named parameter bound via
    ``USING var AS cut`` — the template-driven ETL shape (rule engines,
    per-tenant queries) where the text of the statement is data, not
    code. Parameter binding is the injection-safe path: the cutoff
    travels as a typed value, never string-spliced into the template.
    The oracle states the identical cutoff + aggregate statically.
    Money is released as exact integer cents. Dynamic or not, the plan
    Catalyst compiles is the same pushdown-filtered scan + hash
    aggregate the static sql1 gets — EXECUTE IMMEDIATE is frontend
    surface, not an execution mode."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sql7_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sql7_cut BIGINT")
    spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT MAX(o_orderkey) DIV 2 FROM sql7_orders' INTO sql7_cut"
    )
    template = (
        "SELECT o_orderpriority, "
        "COUNT(*) AS n_orders, "
        "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "AS sum_cents, "
        ":cut AS cutoff_used "
        "FROM sql7_orders WHERE o_orderkey <= :cut "
        "GROUP BY o_orderpriority"
    )
    return spark.sql(
        f"EXECUTE IMMEDIATE '{template}' USING sql7_cut AS cut"
    )


# =========================================================================
# ps1: pandas API on Spark — the third frontend, same engine
# =========================================================================

_PS1_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders GROUP BY o_orderpriority
"""


@_register("ps1_pandas_api", _PS1_SQL)
def ps1_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``) — PySpark's third
    frontend after DataFrame and SQL — driving the SAME engine: a
    pandas-shaped ``read_parquet → column arithmetic → groupby().agg()``
    that compiles to the identical pushdown-scan + hash-aggregate plan
    the DataFrame API gets (pandas-on-Spark is lazy Column algebra, not
    a driver-side pandas), released back through ``to_spark()``. This
    is the migration path for pandas codebases: same groupby semantics,
    distributed execution, no collect. Cents via ROUND of the double
    product: the true price has <= 2 decimals, so the product sits an
    epsilon from an integer and half-up vs half-even can never differ
    (no exact .5 remainders exist to disagree on); both engines multiply
    the identical IEEE doubles. The per-row index warning pandas-on-
    Spark emits for default indexes is irrelevant here — the groupby
    never touches the index. At 100 TB this runs exactly as q1 does;
    the frontend choice changes ergonomics, not the plan."""
    import pyspark.pandas as pps

    path = os.path.join(sf_dir, "orders.parquet")
    psdf = pps.read_parquet(path)[
        ["o_orderpriority", "o_orderkey", "o_totalprice"]
    ]
    psdf["cents"] = (psdf["o_totalprice"] * 100).round(0).astype("int64")
    g = psdf.groupby("o_orderpriority").agg(
        n=("o_orderkey", "count"),
        sum_keys=("o_orderkey", "sum"),
        sum_cents=("cents", "sum"),
    )
    return g.reset_index().to_spark().select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_keys").cast("bigint").alias("sum_keys"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    )
