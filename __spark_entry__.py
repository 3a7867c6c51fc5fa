"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``angelo_bravo_etl_task_spark`` — this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference transform()'s
    core relational shape (left join → group count → CASE → constraint
    filter, SURVEY.md §7.2) on the testdata star schema."""
    from angelo_bravo_etl_task_spark.operators.filters import constraint_filter
    from angelo_bravo_etl_task_spark.operators.joins import equi_join
    from angelo_bravo_etl_task_spark.operators.project import case_when
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    sf_dir = "/root/testdata/sf0.001"
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
            "total_qty"
        ),
    )
    joined = equi_join(
        orders,
        per_order,
        on=orders["o_orderkey"] == per_order["l_orderkey"],
        how="left",
    )
    shaped = joined.select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("total_qty"), F.lit(0.0)).alias("total_qty"),
        case_when(
            [
                (F.col("n_lines") > 4, F.lit("M")),
                (F.col("n_lines") >= 1, F.lit("F")),
            ],
            default=F.lit("L"),
        ).alias("order_class"),
    )
    return constraint_filter(shaped, ["o_orderkey", "o_orderstatus", "order_class"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    angelo_bravo_etl_task_spark/queries.py for the registry)."""
    from angelo_bravo_etl_task_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI oracle SQL per query. Omitted only for d4_simhash,
    whose flagged-pair set is hash-function-internal with imperfect
    recall at any exact-Jaccard threshold (measured tri-SF), so no law
    can make it SQL-predictable — it gets the weaker rows-only check,
    unit tests on planted fixtures, and a hash-green precision
    certificate (d11_simhash_precision). Every other formerly rows-only
    query (a2, qt2, d3, x2, x4, hh2, a4) now emits a law-certified
    output with a real oracle (verdict r7 item 6, waves 100/105)."""
    from angelo_bravo_etl_task_spark.queries import all_oracles

    return all_oracles()
