"""Query registry: every implemented operator as a (Spark query, oracle SQL)
pair over the driver testdata tables (TESTDATA.md).

The driver runs each Spark callable at sf=0.01 and hash-compares against the
DuckDB oracle (row-count + schema + order-insensitive value hash), so both
sides must produce IDENTICAL values, not just equivalent semantics:

- money/value aggregates go through exact DECIMAL (order-independent,
  engine-independent), surfaced as double (decimal→double is correctly
  rounded in both engines);
- averages are exact-decimal-sum ÷ count in IEEE double (deterministic);
- every LIMIT/top-k orders by a unique tiebreaker so membership is
  deterministic;
- dot products/norms are left folds in double with identical fold order on
  both sides (Spark ``aggregate`` ≡ DuckDB ``list_reduce``);
- ratios are raw IEEE divisions of exact integers — bit-identical — with NO
  rounding (round() implementations differ between engines; raw doubles
  don't).

Registry shape: ``QUERIES[name] = (fn(spark, sf_dir) -> DataFrame,
oracle_sql | None)``. None = non-SQL-expressible (driver records the weaker
rows-only check).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import joins as J
from .operators.localframe import local_rows_df
from .operators import similarity as SIM
from .operators import text as TX
from .operators.agg import davg, dec, dsum
from .operators.filters import constraint_filter
from .operators.project import case_when, visual_attributes
from .operators.strings import dot_path_depth, strip_after_last
from .operators.windows import top_k_per_group, with_lag_lead, with_row_number
from .sources.readers import load_table
from .streaming.windows import session_window_agg, tumbling_window_agg

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {}


def _register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        # a duplicate name would SILENTLY shadow the earlier query (and
        # its oracle) — the wave-72/wave-25 ssj1 collision class
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# Reference surface (SURVEY.md §2.2) on the TPC-H-ish tables
# =========================================================================


@_register(
    "r1_left_join",
    """
    SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber, l.l_quantity
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def r1_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: the reference's only join (Angelo_ETL_Task.py:158) — left outer
    equi-join with fan-out on duplicate keys and NULL-fill on misses."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    return J.equi_join(
        orders,
        lineitem,
        on=orders["o_orderkey"] == lineitem["l_orderkey"],
        how="left",
    ).select("o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity")


@_register(
    "r2_last_wins_dedup",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber DESC, l_partkey DESC,
                                         l_quantity DESC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def r2_last_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: last-wins duplicate-key resolution (pd.Series.to_dict semantics,
    Angelo_ETL_Task.py:163-176). The testdata has duplicate (l_orderkey,
    l_linenumber) pairs, so the order extends to (l_partkey, l_quantity) —
    a composite that IS unique here — to pin the survivor deterministically
    on both engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    return D.last_wins(li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_quantity"])


@_register(
    "r3_group_count",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def r3_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: group-by frequency count (value_counts, Angelo_ETL_Task.py:173)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@_register(
    "r4_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def r4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: distinct (Angelo_ETL_Task.py:179 unique())."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@_register(
    "r5_project_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'BIG' ELSE 'SMALL' END AS size_class,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           'ORD:' || CAST(o_orderkey AS VARCHAR) AS tagged,
           'LOINC' AS source_system
    FROM orders
    """,
)
def r5_project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5/R7/R9/R14/F3-F5: projection with CASE, literal, truncation,
    concat (reference column builds :189-241)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        case_when(
            [(F.col("o_totalprice") > 200000, F.lit("BIG"))], default=F.lit("SMALL")
        ).alias("size_class"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat(F.lit("ORD:"), F.col("o_orderkey").cast("string")).alias("tagged"),
        F.lit("LOINC").alias("source_system"),
    )


@_register(
    "r6_filter_notnull",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_returnflag IS NOT NULL AND l_returnflag <> ''
      AND l_linestatus IS NOT NULL AND l_linestatus <> ''
    """,
)
def r6_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: the NOT NULL / non-empty constraint filter (reference :245-258)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    return constraint_filter(li, ["l_returnflag", "l_linestatus"])


@_register(
    "r10_visual_attributes",
    """
    SELECT c.c_custkey,
           (CASE WHEN COALESCE(oc.cnt, 0) > 1 THEN 'M'
                 WHEN COALESCE(oc.cnt, 0) = 1 THEN 'F'
                 ELSE 'L' END)
           || (CASE WHEN c.c_mktsegment = 'BUILDING' THEN 'A' ELSE 'I' END)
           || (CASE WHEN COALESCE(oc.cnt, 0) >= 1 THEN 'E' ELSE '' END)
           AS c_visualattributes
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
      ON c.c_custkey = oc.o_custkey
    """,
)
def r10_visual_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10: the 3-char visual-attributes code (Angelo_ETL_Task.py:60-87)
    exercised on TPC-H shapes: order count plays parent_count, BUILDING
    segment plays ACTIVE."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        c.join(F.broadcast(counts), c["c_custkey"] == counts["o_custkey"], "left")
        .select(
            "c_custkey",
            visual_attributes(
                F.col("cnt"), F.col("c_mktsegment"), active_value="BUILDING"
            ).alias("c_visualattributes"),
        )
    )


@_register(
    "r12_path_ops",
    """
    SELECT doc_id,
           source || '.' || lang AS dot_path,
           LENGTH(source || '.' || lang)
             - LENGTH(REPLACE(source || '.' || lang, '.', '')) + 3 AS c_hlevel,
           REGEXP_REPLACE('\\lab\\' || source || '\\' || lang,
                          '\\\\[^\\\\]*$', '') AS parent_path
    FROM documents
    """,
)
def r12_path_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12/R13/F6: hierarchy-path string ops (depth = dots+3 :192; C_PATH
    strip-after-last-backslash :239) on synthesized source/lang paths."""
    d = _t(spark, sf_dir, "documents")
    dot_path = F.concat_ws(".", F.col("source"), F.col("lang"))
    backslash_path = F.concat(
        F.lit("\\lab\\"), F.col("source"), F.lit("\\"), F.col("lang")
    )
    return d.select(
        "doc_id",
        dot_path.alias("dot_path"),
        dot_path_depth(dot_path, base=3).alias("c_hlevel"),
        strip_after_last(backslash_path, "\\").alias("parent_path"),
    )


# =========================================================================
# Relational extension surface (SURVEY.md §2.4)
# =========================================================================


@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with exact decimal arithmetic.
    Partial aggregation map-side; one shuffle on the 4-group key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            ).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → joins → agg → top-k. The
    customer side is broadcast (dimension), lineitem never shuffles for the
    join at scale; unique tiebreaker (l_orderkey) makes LIMIT deterministic."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(F.broadcast(o), l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "q5_local_supplier",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star-schema multi-join. All dimension sides broadcast
    — the fact table (lineitem) flows through without a single join shuffle;
    the only shuffle is the final small aggregation."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(o), l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@_register(
    "j1_semi_anti",
    """
    SELECT 'with_orders' AS side, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS side, c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j1_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins, tagged and unioned."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = J.equi_join(
        c, o, on=c["c_custkey"] == o["o_custkey"], how="left_semi"
    ).select(F.lit("with_orders").alias("side"), "c_custkey")
    anti = J.equi_join(
        c, o, on=c["c_custkey"] == o["o_custkey"], how="left_anti"
    ).select(F.lit("without_orders").alias("side"), "c_custkey")
    return semi.unionByName(anti)


@_register(
    "j2_range_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, b.band_lo, b.band_name
    FROM lineitem l
    JOIN (VALUES (0, 10, 'xs'), (10, 20, 's'), (20, 30, 'm'),
                 (30, 40, 'l'), (40, 51, 'xl')) AS b(band_lo, band_hi, band_name)
      ON l.l_quantity >= b.band_lo AND l.l_quantity < b.band_hi
    """,
)
def j2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join with bucketed candidate pruning —
    equi-join on the bucket key instead of a nested-loop cross product."""
    li = _t(spark, sf_dir, "lineitem")
    bands = local_rows_df(spark, 
        [(0, 10, "xs"), (10, 20, "s"), (20, 30, "m"), (30, 40, "l"), (40, 51, "xl")],
        "band_lo INT, band_hi INT, band_name STRING",
    )
    joined = J.range_join(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        bands,
        left_point="l_quantity",
        right_lo="band_lo",
        right_hi="band_hi",
        bucket_width=10,
    )
    return joined.select("l_orderkey", "l_linenumber", "band_lo", "band_name")


@_register(
    "j3_asof_join",
    """
    SELECT e.event_id,
           (SELECT MAX(p.ts) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts) AS last_purchase_ts
    FROM events e
    """,
)
def j3_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (most-recent-prior) join: each event paired with the user's
    latest purchase at-or-before it. Union+window implementation — one
    shuffle on user_id, no per-row subquery."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    p = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = J.asof_join(
        e, p, on="user_id", left_time="ts", right_time="p_ts", direction="backward"
    )
    return joined.select("event_id", F.col("purchase_ts").alias("last_purchase_ts"))


@_register(
    "w1_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (unique tiebreaker o_orderkey)."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return top_k_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        alias="rank",
    )


@_register(
    "w2_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregate window (exact decimal, unique ordering)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@_register(
    "w3_lag_lead",
    """
    SELECT event_id, user_id,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT)
             - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id))) AS BIGINT)
             AS gap_seconds
    FROM events
    """,
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead window over the event stream."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_seconds"),
    )


@_register(
    "g1_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one Expand pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )


@_register(
    "g2_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all subtotal combinations in one Expand pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice").alias("sum_price"), F.count(F.lit(1)).alias("cnt")
    )


@_register(
    "g3_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def g3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL frontend."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@_register(
    "a1_count_distinct",
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def a1_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi count-distinct (expands to two-stage aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "s1_setops",
    """
    SELECT 'active_big' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'no_orders' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
)
def s1_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL composition (Catalyst rewrites the
    set ops to semi/anti joins)."""
    from .operators.setops import except_, intersect, union_all

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    active_big = intersect(rich, o).select(
        F.lit("active_big").alias("tag"), "c_custkey"
    )
    no_orders = except_(c.select("c_custkey"), o).select(
        F.lit("no_orders").alias("tag"), "c_custkey"
    )
    return union_all(active_big, no_orders)


@_register(
    "t1_topk_global",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def t1_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark's TakeOrderedAndProject — per-partition heaps,
    no global sort."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(20)
    )


@_register(
    "f1_scalar_strings",
    """
    SELECT doc_id,
           UPPER(SUBSTRING(source, 1, 3)) AS src_prefix,
           LENGTH(text) AS text_len,
           CONTAINS(text, 'spark') AS mentions_spark,
           REPLACE(lang, 'en', 'english') AS lang_replaced,
           LPAD(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id
    FROM documents
    """,
)
def f1_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string function coverage (upper/substr/length/contains/
    replace/lpad) — all whole-stage-codegen expressions."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("source", 1, 3)).alias("src_prefix"),
        F.length("text").alias("text_len"),
        F.col("text").contains("spark").alias("mentions_spark"),
        F.replace(F.col("lang"), F.lit("en"), F.lit("english")).alias(
            "lang_replaced"
        ),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
    )


@_register(
    "f2_dates",
    """
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_1995
    FROM orders
    """,
)
def f2_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage (extract/trunc/diff)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_1995"),
    )


@_register(
    "f3_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def f3_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props column."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


# =========================================================================
# Streaming surface (batch-mode window semantics; readStream variants in
# streaming/ are exercised by tests)
# =========================================================================


@_register(
    "e1_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def e1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (batch mode of the streaming operator)."""
    e = _t(spark, sf_dir, "events")
    return tumbling_window_agg(e, duration="10 minutes", keys=("event_type",))


@_register(
    "e2_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def e2_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) — the oracle reproduces Spark's
    [start, last+gap) semantics via gaps-and-islands SQL."""
    e = _t(spark, sf_dir, "events")
    return session_window_agg(e, gap="30 minutes", keys=("user_id",)).select(
        "user_id", "session_start", "n_events"
    )


# =========================================================================
# LLM-data-pipeline surface: dedup / similarity / text / multimodal
# =========================================================================


@_register(
    "d1_exact_dedup",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id
    FROM documents GROUP BY md5(text)
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup by md5, deterministic survivor (min id)."""
    d = _t(spark, sf_dir, "documents")
    return D.exact_dedup_by_hash(d, "text", "doc_id")


@_register(
    "d2_normalized_dedup",
    r"""
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS content_hash,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def d2_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup level 0: case/punctuation/whitespace-insensitive dedup."""
    d = _t(spark, sf_dir, "documents")
    return D.normalized_dedup(d, "text", "doc_id")


# Shared oracle fragments (ADVICE r8: _D3_SQL hand-duplicated d7's
# inverted-gram-index construction including the normalization regex —
# two copies can silently drift). Defined HERE (the base module) so
# queries_px.py can import them without a circular import; d3, d5, d7
# and d12 (via _D7_SQL) all build on these single definitions.
#
# Spark normalize_text ≡ this lower/strip-punct/collapse-ws chain (the d2
# oracle established the regex-class parity between engines).
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
)

def _grams_select(src: str) -> str:
    """SELECT producing (doc_id, grams) — the distinct word-3-gram set per
    document of ``src`` (any relation with doc_id + text columns). The one
    definition of the gram construction every dedup oracle builds on."""
    return f"""SELECT doc_id,
             list_distinct(list_filter(
               list_transform(
                 range(1, greatest(len(string_split({_NORM_SQL}, ' ')) - 3, 0) + 2),
                 i -> array_to_string(list_slice(string_split({_NORM_SQL}, ' '),
                                                 i, i + 2), ' ')),
               s -> length(s) > 0)) AS grams
      FROM {src}"""


# Inverted-gram-index exact word-3-gram Jaccard: CTE block (sh = distinct
# 3-gram sets, ex = exploded index, sizes, shared = per-pair overlap via
# gram equi-join — never all-pairs). Compose as
# f"WITH {_GRAM_PAIR_CTES} <final select>" (d3) or
# f"WITH RECURSIVE {_GRAM_PAIR_CTES}, <more ctes> ..." (d7).
_GRAM_PAIR_CTES = f"""sh AS (
      {_grams_select("documents")}
    ), ex AS (
      SELECT doc_id, unnest(grams) AS g FROM sh
    ), sizes AS (
      SELECT doc_id, len(grams) AS n FROM sh
    ), shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""

# d3's oracle: exact word-3-gram Jaccard pairs at >= 0.6 via the shared
# inverted gram index (never all-pairs) — the same ground-truth
# construction d7's oracle uses. jaccard = int/int division of identical
# set sizes, so the DOUBLE is bit-identical across engines (d5 precedent).
_D3_SQL = f"""
    WITH {_GRAM_PAIR_CTES}
    SELECT s.id_a, s.id_b,
           CAST(s.c AS DOUBLE) / (ca.n + cb.n - s.c) AS jaccard
    FROM shared s
    JOIN sizes ca ON s.id_a = ca.doc_id
    JOIN sizes cb ON s.id_b = cb.doc_id
    WHERE CAST(s.c AS DOUBLE) / (ca.n + cb.n - s.c) >= 0.6
    """


@_register("d3_minhash_lsh", _D3_SQL)
def d3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-confirmed — upgraded rows-only ->
    hash-green via a LAW-BASED oracle (verdict r7 item 6). The banded LSH
    candidates (64 hashes x 16 bands, the d7 construction whose recall at
    j >= 0.6 was verified exhaustively at sf0.001/0.01/0.1: the data's pair
    Jaccards are >= 0.75 with nothing in (0.35, 0.75), so the banding curve
    has no boundary mass to lose) are confirmed by exact word-3-gram
    Jaccard at 0.6. Candidates ⊇ exact pairs and the confirm removes false
    positives, so the output EQUALS the SQL-computable ground truth — the
    sketch machinery stays in the measured path, its recall contract is
    what the driver hashes. Scale shape unchanged: signature map →
    (band, band_hash) equi-join → two shingle equi-joins; never all-pairs."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # Optimization r11: ONE text pass (gram-hash frame) shared by the
    # banded signatures and the exact confirm — before, candidates and
    # confirm each re-shingled the corpus from raw text; the confirm now
    # joins 8-byte gram hashes instead of n-gram strings (guide §2.3/§2.4).
    h = D.gram_hashes_frame(d)
    cand = D.minhash_lsh_candidates_from_hashes(h)
    return D.jaccard_pairs_from_hashes(h, h, cand, threshold=0.6)


@_register("d4_simhash", None)  # hash-function-specific → rows-only check
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 (quadrant-blocked).
    No SQL oracle: depends on xxhash64 internals; unit-tested on planted
    near-duplicates."""
    d = _t(spark, sf_dir, "documents")
    return D.simhash_near_dups(d, "text", "doc_id", max_hamming=3)


@_register(
    "x1_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             list_reduce(list_transform(list_zip(q.qv, c.cv),
                                        x -> x[1] * x[2]),
                         (acc, v) -> acc + v)
             / (sqrt(list_reduce(list_transform(q.qv, v -> v * v), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(c.cv, v -> v * v), (a, b) -> a + b)))
             AS cosine_sim
      FROM q, c WHERE q.query_id <> c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def x1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 50 vectors. The
    oracle mirrors the exact left-fold summation order, so doubles match
    bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    return SIM.brute_force_topk(queries, emb, k=5).select(
        "query_id", "neighbor_id", "cosine_sim", "rank"
    )


# x2's oracle: the exact brute-force top-5 per query (x1's bit-exact fold)
# aggregated per query over the CLONE-AUGMENTED corpus, plus the recall law
# the LSH run must certify. FLOOR(sim*10000 + 0.5) sidesteps engine round()
# semantics: both engines floor the SAME IEEE double.
_X2_SQL = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings
          UNION ALL
          SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings WHERE vec_id < 50),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             list_reduce(list_transform(list_zip(q.qv, c.cv),
                                        x -> x[1] * x[2]),
                         (acc, v) -> acc + v)
             / (sqrt(list_reduce(list_transform(q.qv, v -> v * v), (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(c.cv, v -> v * v), (a, b) -> a + b)))
             AS cosine_sim
      FROM q, c WHERE q.query_id <> c.neighbor_id
    ), top5 AS (
      SELECT query_id, neighbor_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id,
           MIN(CASE WHEN rank = 1 THEN neighbor_id END) AS nn_id,
           CAST(SUM(CAST(FLOOR(cosine_sim * 10000 + 0.5) AS BIGINT))
                AS BIGINT) AS top5_sim_sum_x1e4,
       -- CONSTRUCTION-GUARANTEED (ADVICE r8, upgraded r10 via the x12
       -- planted-clone pattern): every query has an exact clone planted
       -- in the corpus at vec_id + 2_000_000. The clone is rank 1 of the
       -- true top-5 (cosine ~1.0) AND a guaranteed LSH candidate
       -- (identical vectors -> identical per-table signatures -> collides
       -- in every table), so overlap >= 1 is a theorem of the
       -- construction, not a measured floor. A regenerated dataset
       -- cannot red this without a real LSH regression.
           TRUE AS overlap_ge_1
    FROM top5 WHERE rank <= 5 GROUP BY query_id
    """


@_register("x2_lsh_topk", _X2_SQL)
def x2_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k, recall-certified — upgraded from
    an empirically-measured recall floor to a CONSTRUCTION-GUARANTEED law
    (VERDICT r9 item 4, the x12 planted-clone pattern): an exact clone of
    every query vector is planted into the corpus at vec_id + 2_000_000.
    The clone is rank 1 of the exact brute-force top-5 (cosine ~1.0,
    nothing natural can exceed it) AND a guaranteed LSH candidate —
    identical vectors produce identical per-table signatures, so the
    clone collides in EVERY one of the 24 tables — so ``overlap_ge_1``
    (LSH top-5 ∩ true top-5 nonempty) is a theorem, not a measurement;
    a regenerated dataset cannot red it without a real LSH regression
    (lost bucket, broken signature, wrong rerank). The query emits, per
    query vector: ``nn_id`` — which by construction IS the planted clone
    (query_id + 2_000_000; it certifies the brute-force ranking and the
    planting, NOT natural-data ranking — ADVICE r10), the top-5
    similarity mass (x1's bit-exact fold; the clone contributes one
    constant ~10000 term, ranks 2-5 carry the natural signal), plus the
    certificate. Natural (clone-free) recall stays measured in
    tests/test_operators.py (0.65-0.78 mean at 6 planes x 24 tables). Scale shape: the LSH side
    is the 100 TB path (equi-join on (table, signature) buckets, cost ∝
    true collisions); the clones add |queries| rows — noise at scale."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # bounded 1-row agg: clone-offset guard (the sdd1 pattern)
    _max_id = emb.agg(F.max("vec_id")).first()[0]
    if _max_id is None or _max_id >= 2_000_000:
        raise RuntimeError(
            f"x2 clone offset 2_000_000 collides with real vec_id space "
            f"(max={_max_id}); raise the offset on BOTH engine and oracle"
        )
    queries = emb.where(F.col("vec_id") < 50)
    corpus = emb.unionByName(
        queries.select(
            (F.col("vec_id") + F.lit(2000000)).alias("vec_id"), "embedding"
        )
    )
    bf = SIM.brute_force_topk(queries, corpus, k=5)
    appx = (
        SIM.lsh_topk(queries, corpus, dim=64, k=5, num_planes=6,
                     num_tables=24)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        bf.join(appx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("rank") == 1, F.col("neighbor_id"))
            ).alias("nn_id"),
            F.sum(
                F.floor(F.col("cosine_sim") * 10000 + F.lit(0.5))
            ).cast("bigint").alias("top5_sim_sum_x1e4"),
            (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 1).alias(
                "overlap_ge_1"
            ),
        )
    )


@_register(
    "tx1_token_stats",
    r"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_measured,
           LEN(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                           t -> LENGTH(t) > 0)) AS n_words,
           LEN(list_distinct(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                         t -> LENGTH(t) > 0))) AS n_distinct_words,
           LEN(regexp_extract_all(text,
               '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words, distinct words, BPE-ish regex
    tokens (LLM token-budget proxy)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars_measured"),
        TX.word_count(t).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(TX.tokens(t))).cast("bigint").alias(
            "n_distinct_words"
        ),
        TX.bpe_ish_token_count(t).cast("bigint").alias("n_bpe_tokens"),
    )


@_register(
    "tx2_quality",
    r"""
    WITH toks AS (
      SELECT doc_id, text,
             LENGTH(text) AS n_char,
             LEN(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                             t -> LENGTH(t) > 0)) AS n_word,
             LEN(list_distinct(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                           t -> LENGTH(t) > 0))) AS n_distinct,
             LEN(list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
                 t -> t IN ('the','and','of','to','a','in','is','for','with','on')))
               AS n_stop,
             LENGTH(regexp_replace(text, '[^\p{P}]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           n_char AS q_chars, n_word AS q_words,
           CASE WHEN n_word > 0 THEN CAST(n_distinct AS DOUBLE) / n_word ELSE 0.0 END
             AS q_distinct_ratio,
           CASE WHEN n_word > 0 THEN CAST(n_stop AS DOUBLE) / n_word ELSE 0.0 END
             AS q_stop_ratio,
           CASE WHEN n_char > 0 THEN CAST(n_punct AS DOUBLE) / n_char ELSE 0.0 END
             AS q_punct_ratio
    FROM toks
    """,
)
def tx2_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score features: ratios as raw IEEE divisions of exact integer
    counts (bit-identical across engines, no rounding)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    toks = TX.tokens(t)
    n_char = F.length(t)
    n_word = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = TX.stopword_hits(t, "en")
    n_punct = F.length(F.regexp_replace(t, r"[^\p{P}]", ""))
    return d.select(
        "doc_id",
        n_char.alias("q_chars"),
        n_word.cast("bigint").alias("q_words"),
        F.when(n_word > 0, n_distinct.cast("double") / n_word)
        .otherwise(F.lit(0.0))
        .alias("q_distinct_ratio"),
        F.when(n_word > 0, n_stop.cast("double") / n_word)
        .otherwise(F.lit(0.0))
        .alias("q_stop_ratio"),
        F.when(n_char > 0, n_punct.cast("double") / n_char)
        .otherwise(F.lit(0.0))
        .alias("q_punct_ratio"),
    )


@_register(
    "tx3_language_id",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
                         t -> LENGTH(t) > 0) AS w
      FROM documents
    ), scored AS (
      SELECT doc_id, list_aggregate([
        {'hits': LEN(list_filter(w, t -> t IN ('the','and','of','to','a','in','is','for','with','on'))), 'lang': 'en'},
        {'hits': LEN(list_filter(w, t -> t IN ('el','la','de','que','y','en','un','los','del','por'))), 'lang': 'es'},
        {'hits': LEN(list_filter(w, t -> t IN ('le','la','de','et','les','des','un','une','du','est'))), 'lang': 'fr'},
        {'hits': LEN(list_filter(w, t -> t IN ('der','die','und','das','von','den','ein','mit','ist','im'))), 'lang': 'de'},
        {'hits': LEN(list_filter(w, t -> t IN ('的','是','了','在','和','有','我','不','这','也'))), 'lang': 'zh'}
      ], 'max') AS best
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN best.hits > 0 THEN best.lang ELSE NULL END AS predicted_lang
    FROM scored
    """,
)
def tx3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword language-ID (argmax via struct GREATEST with
    identical lexicographic tie-breaking in both engines)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.detect_language(F.col("text")).alias("predicted_lang")
    )


@_register(
    "tx4_fingerprint",
    """
    SELECT doc_id, md5(text) AS fingerprint, sha256(text) AS sha_fingerprint
    FROM documents
    """,
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content fingerprints (md5 + sha256, engine-portable hex)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fingerprint"),
        F.sha2(F.col("text"), 256).alias("sha_fingerprint"),
    )


@_register(
    "mm1_binary_meta",
    """
    SELECT doc_id,
           OCTET_LENGTH(CAST(text AS BLOB)) AS content_length,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm1_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload column + JVM-side metadata
    (no decode). The decode path (mapInPandas) is unit-tested; this query
    checks the binary schema + cheap-metadata layer against SQL."""
    d = _t(spark, sf_dir, "documents")
    binary = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(binary).cast("bigint").alias("content_length"),
        F.md5(F.col("text")).alias("content_md5"),
    )


from . import queries_ext  # noqa: E402,F401  (extends QUERIES)
from . import queries_px  # noqa: E402,F401  (extends QUERIES)
from . import queries_tpch2  # noqa: E402,F401  (extends QUERIES)
from . import queries_analytics  # noqa: E402,F401  (extends QUERIES)
from . import queries_scale  # noqa: E402,F401  (extends QUERIES)
from . import queries_llm  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave6  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave25  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave26  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave27  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave28  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave29  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave30  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave31  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave32  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave33  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave34  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave35  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave36  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave37  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave38  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave39  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave40  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave41  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave42  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave43  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave44  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave45  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave46  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave47  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave48  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave49  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave50  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave51  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave52  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave53  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave54  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave55  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave56  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave57  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave58  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave59  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave60  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave61  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave62  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave63  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave64  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave65  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave66  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave67  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave68  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave69  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave70  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave71  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave72  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave73  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave74  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave75  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave76  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave77  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave78  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave79  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave80  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave81  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave82  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave83  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave84  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave85  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave86  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave87  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave88  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave89  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave90  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave91  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave92  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave93  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave94  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave95  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave96  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave97  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave98  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave99  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave100  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave101  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave102  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave103  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave104  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave105  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave106  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave107  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave108  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave109  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave110  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave111  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave112  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave113  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave114  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave115  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave116  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave117  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave118  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave119  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave120  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave121  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave122  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave123  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave124  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave125  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave126  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave127  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave128  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave129  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave130  # noqa: E402,F401  (extends QUERIES)
from . import queries_wave131  # noqa: E402,F401  (extends QUERIES; keep last)

# Names surfaced FIRST by all_queries()/all_oracles(). The driver's
# correctness sweep covers a bounded ~50-name prefix of the registry, so
# queries that still need a driver-green row lead; the long-green tail
# follows in registration order. Rotated every round — regenerate with
# tools/rotate_check_first.py once the previous round's
# CORRECTNESS_r*.json lands, then pre-verify the new head with
# tools/driver_repro.py (both sf0.01 and sf0.1).
_CHECK_FIRST: list[str] = [
    # regenerated by tools/rotate_check_first.py — the next 50
    # never-driver-swept names in registration order; pre-verify
    # with tools/driver_repro.py before shipping the round
    "d14_simhash_recall",
    "px9_table_maintenance",
    "io1_elevator_schedule",
    "nm1_integer_sqrt",
    "pid1_autoscaler_replay",
    "kad1_max_subarray",
    "lz1_lz78_dictionary",
    "mrk2_inclusion_proof",
    "topo1_kahn_order",
    "iban1_mod97_check",
    "pq1_product_quantization",
    "zo2_hilbert_locality",
    "trn1_round_robin",
    "ulid1_sortable_ids",
    "mcpi1_monte_carlo_pi",
    "w13_batch_session_window",
    "f24_binary_encodings",
    "vs1_version_ordering",
    "modpow1_square_multiply",
    "sieve1_relational_primes",
    "gcd1_euclid",
    "cyc1_rho_cycle",
    "perm2_cycle_decomposition",
    "collatz1_trajectories",
    "cr1_ring_election",
    "trap1_rain_water",
    "edit1_certified_levenshtein",
    "hmm1_viterbi",
    "kmp1_failure_function",
    "fen1_fenwick_tree",
    "pas1_binomial_row",
    "zeck1_zeckendorf",
    "gray1_reflected_code",
    "coin1_change_dp_vs_greedy",
    "lps1_longest_palindrome",
    "stats4_mergeable_moments",
    "cv2_rolling_origin",
    "tk2_mergeable_topk",
    "w14_ntile_deciles",
    "decay1_halflife_leaderboard",
    "lbl1_leakage_free_labels",
    "bm25_1_ranked_retrieval",
    "il1_slot_interleave",
    "apri1_support_lattice",
    "an4_l_diversity",
    "ssj2_shingle_prefix_join",
    "rsv1_weighted_reservoir",
    "prn1_manifest_pruning",
    "enc1_encoding_stats",
    "est1_join_cardinality",
]
# Highest CORRECTNESS_r{N}.json acknowledged when the head
# above was rotated; the round-boundary tripwire
# (tests/test_evidence_doc.py) tolerates exactly ONE newer
# round before going red.
_CHECK_FIRST_ACK_ROUND: int = 10
# Already-swept names deliberately kept in the head for
# re-certification (--prioritize); not hand-drift.
_CHECK_FIRST_RECHECK: list[str] = []
# end _CHECK_FIRST block (regenerated by rotate_check_first.py)


def _ordered_names() -> list[str]:
    head = [n for n in _CHECK_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(head)]
    return head + rest


def all_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name][0] for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: QUERIES[name][1]
        for name in _ordered_names()
        if QUERIES[name][1] is not None
    }
