"""Round-2 TPC-H shape widening (SURVEY.md §2.4 extension surface).

The remaining canonical TPC-H query SHAPES the registry did not yet cover,
adapted to the driver's reduced schemas (no partsupp / no phone / no
receipt-commit dates — substitutions noted per query): conditional-share
aggregation (q8), multi-dim profit rollup (q9), scalar-subquery HAVING
(q11), outer-join distribution (q13), CTE + scalar-max selection (q15),
NOT-IN subquery + multi-column distinct count (q16), correlated scalar
subquery per group (q17), disjunctive multi-predicate pushdown (q19), and
anti-join + scalar-avg subquery (q22).

Float parity discipline (see queries.py header): exact decimal sums cast
to double, raw IEEE division of those doubles, never round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.agg import dec, dsum
from .queries import _register, _t

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


@_register(
    "q8_market_share",
    f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n.n_name = 'NATION_3' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional revenue share per year — one nation's
    fraction of a region's revenue. One pass over the fact table: both the
    conditional and total sums come out of the SAME aggregation (no second
    scan, no self-join); all dims broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nation_rev = F.when(F.col("n_name") == "NATION_3", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(o), l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .where(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("mkt_share")
        )
    )


@_register(
    "q9_product_profit",
    f"""
    SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           CAST(SUM({_REV_SQL}
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus retail cost of goods — the
    testdata has no partsupp, so p_retailprice*quantity stands in for
    supplycost*quantity) per nation per year, for parts matching a name
    pattern. The part filter is applied BEFORE the join (broadcast the
    filtered dim, prune the fact early)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = _rev() - dec("p_retailprice") * dec("l_quantity")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(o), l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@_register(
    "q11_important_parts",
    f"""
    SELECT l_partkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS part_value
    FROM lineitem l
    GROUP BY l_partkey
    HAVING CAST(SUM({_REV_SQL}) AS DOUBLE)
           > 0.0007 * (SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) FROM lineitem l)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a fraction of the
    GLOBAL aggregate (scalar subquery in HAVING; partsupp value replaced by
    lineitem revenue). The global total is a one-row aggregate broadcast
    into the filter — a cross join with a 1-row side, never a shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(_rev()).cast("double").alias("part_value")
    )
    total = l.agg((F.sum(_rev()).cast("double") * F.lit(0.0007)).alias("_thr"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("_thr"))
        .select("l_partkey", "part_value")
    )


@_register(
    "q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                         AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution via LEFT OUTER
    join with a join-side filter (customers with no qualifying orders count
    as 0), then a second aggregation over the first."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@_register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_SQL}) AS DOUBLE)
               AS total_revenue
      FROM lineitem l
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE reused twice — once for the per-supplier
    aggregate, once for its scalar MAX — joined back to the dimension. The
    aggregate is computed once per branch off the pruned scan (3-month
    shipdate filter pushed to parquet); the scalar max broadcasts."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(_t(spark, sf_dir, "supplier")), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_register(
    "q16_supplier_count",
    """
    SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 14, 23, 45)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (suppliers \"with complaints\" —
    negative balance stands in for the comment pattern) excluded via
    broadcast ANTI join, then multi-column distinct count. partsupp is
    replaced by observed (l_partkey, l_suppkey) pairs."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size").isin(1, 14, 23, 45))
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "q17_small_quantity",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + self-join — the form Catalyst
    itself rewrites to. The per-part averages are a small frame (one row per
    part) and broadcast; the brand filter prunes the probe side first."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    avg_qty = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(avg_qty), l["l_partkey"] == F.col("_pk"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@_register(
    "q19_disjunctive",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd predicate groups spanning both join
    sides. The single-side conjuncts Catalyst can factor out (p_size >= 1,
    quantity bounds) push into the scans; the cross-side residue evaluates
    post-join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@_register(
    "q22_idle_customers",
    """
    SELECT c_custkey % 7 AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT orders —
    scalar average subquery + anti join + group (custkey mod stands in for
    the phone country code). The average is a broadcast 1-row frame; the
    anti join broadcasts nothing useful at scale, so it shuffles on custkey
    — exactly what a 100 TB orders table needs."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "_avg"
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@_register(
    "q20_excess_suppliers",
    """
    SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%red%')
          AND l_shipdate >= TIMESTAMP '1995-06-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 800
      )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape — nested IN-subquery chain (part filter feeding a
    grouped-HAVING supplier filter feeding the outer select). No partsupp
    table in the reduced schema, so "availqty" becomes shipped quantity of
    matching parts since a cutoff. Plan shape: the part filter broadcasts
    into a semi-join, the HAVING aggregates pre-shuffle, the supplier
    filter is a second semi-join — no subquery is ever materialized
    driver-side."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    red_parts = p.where(F.col("p_name").like("%red%")).select("p_partkey")
    heavy_supps = (
        li.where(F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        .join(F.broadcast(red_parts), li["l_partkey"] == red_parts["p_partkey"], "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .where(F.col("_qty") > 800)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.where(F.col("n_name") == "NATION_3")),
               s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .join(F.broadcast(heavy_supps), s["s_suppkey"] == heavy_supps["l_suppkey"], "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


@_register(
    "q21_waiting_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> s.s_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> s.s_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape — EXISTS + NOT-EXISTS correlated self-joins on the
    fact table ("the only supplier whose line was late on a multi-supplier
    order"). Lateness is l_shipdate > o_orderdate + 90 days (no
    receipt/commit dates in the reduced schema). Spark plan: the EXISTS is
    a left-semi and the NOT EXISTS a left-anti against a shared late-lines
    frame — the fact table shuffles once per side on l_orderkey, and both
    probe sides reuse the same orders join."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = (
        li.join(o.where(F.col("o_orderstatus") == "F"),
                li["l_orderkey"] == o["o_orderkey"])
        .where(late)
        .select("l_orderkey", "l_suppkey")
    )
    base = (
        l1.join(F.broadcast(s), l1["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n.where(F.col("n_name") == "NATION_1")),
              s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    other = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    with_other = base.join(
        other,
        (base["l_orderkey"] == other["_ok"]) & (base["l_suppkey"] != other["_sk"]),
        "left_semi",
    )
    other_late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(late)
        .select(F.col("l_orderkey").alias("_lok"), F.col("l_suppkey").alias("_lsk"))
    )
    solo_late = with_other.join(
        other_late,
        (with_other["l_orderkey"] == other_late["_lok"])
        & (with_other["l_suppkey"] != other_late["_lsk"]),
        "left_anti",
    )
    return solo_late.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
