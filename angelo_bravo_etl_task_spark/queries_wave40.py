"""Round-3 wave 40: knapsack DP, consistent-hash ring, count-min sketch.

- knap1: 0/1 knapsack per customer — the sequential fold whose state is
  the whole DP TABLE ROW (best value per capacity 0..25); lru1/lis1
  carried lists, knap1 carries the textbook DP vector.
- ring1: consistent hashing with virtual nodes — rdv1's classic
  sibling: keys map to the nearest clockwise vnode; removing a node
  must move ONLY that node's keys (the migration matrix proves it).
- cms1: count-min sketch in exact integers — 4 md5 hash rows x 64
  buckets of plain BIGINT counters, point estimates as min-over-rows
  beside the true counts; the overestimate-only guarantee is checkable
  because every cell is exact (completes the sketch family: hll1/kmv1
  cardinality, ams1 F2, bloom1 membership, cms1 frequency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# knap1: 0/1 knapsack (DP-vector fold)
# =========================================================================

_KNAP1_SQL = """
WITH RECURSIVE items AS (
  SELECT o_custkey,
         CAST(CAST('0x' || substr(md5('w' || CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 10 + 1 AS BIGINT) AS wt,
         CAST(CAST('0x' || substr(md5('x' || CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 + 1 AS BIGINT) AS val,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderkey) AS BIGINT) AS i
  FROM orders
  QUALIFY i <= 12
), r AS (
  SELECT o_custkey, CAST(0 AS BIGINT) AS i,
         list_transform(range(0, 26), x -> CAST(0 AS BIGINT)) AS dp
  FROM (SELECT DISTINCT o_custkey FROM items)
  UNION ALL
  SELECT s.o_custkey, s.i,
         list_transform(range(0, 26), w ->
           CASE WHEN w >= s.wt
                THEN greatest(r.dp[w + 1], r.dp[w - s.wt + 1] + s.val)
                ELSE r.dp[w + 1] END)
  FROM r JOIN items s ON s.o_custkey = r.o_custkey AND s.i = r.i + 1
), final AS (
  SELECT o_custkey, i, dp,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY i DESC) AS rn
  FROM r
)
SELECT o_custkey, CAST(i AS BIGINT) AS n_items,
       dp[26] AS best_value,
       array_to_string(dp, '/') AS dp_state
FROM final WHERE rn = 1 AND i >= 5
"""


@_register("knap1_knapsack", _KNAP1_SQL)
def knap1_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0/1 knapsack per customer (select the best-value subset of their
    first 12 orders under a weight-25 budget — campaign/budget selection
    with indivisible items): the fold state is the full DP vector
    dp[0..25] (best value at each capacity), and each item relaxes
    every capacity cell at once — lru1/lis1 carried lists as state,
    knap1 carries the textbook DP table row. Spark: ONE F.aggregate per
    customer whose step transforms the 26-cell array with the (x, i)
    index lambda and 0-based F.get for dp[w - wt]; DuckDB replays with
    a list_transform over range(0,26) in a recursive CTE. The whole dp
    trajectory is emitted ('/'-joined) so the oracle checks every cell,
    not just the corner. Weights/values are md5-derived so both engines
    see identical instances."""
    o = _t(spark, sf_dir, "orders")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("o_orderkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    items = o.select(
        "o_custkey",
        (_h("w") % 10 + 1).alias("wt"),
        (_h("x") % 100 + 1).alias("val"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 12)
    series = items.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "wt", "val"))),
            lambda st: F.struct(st["wt"].alias("wt"), st["val"].alias("val")),
        ).alias("its"),
    ).where(F.col("n_items") >= 5)
    acc0 = F.expr(
        "transform(sequence(0, 25), x -> CAST(0 AS BIGINT))"
    )

    def step(dp, it):
        return F.transform(
            dp,
            lambda x, i: F.when(
                i >= it["wt"],
                F.greatest(x, F.get(dp, i - it["wt"].cast("int")) + it["val"]),
            ).otherwise(x),
        )

    folded = series.select(
        "o_custkey",
        "n_items",
        F.aggregate("its", acc0, step).alias("dp"),
    )
    return folded.select(
        "o_custkey",
        "n_items",
        F.element_at("dp", 26).alias("best_value"),
        F.array_join(F.col("dp"), "/").alias("dp_state"),
    )


# =========================================================================
# ring1: consistent-hash ring with virtual nodes + removal migration
# =========================================================================

_RING1_SQL = """
WITH vnodes AS (
  SELECT n.n AS node, v.v AS vn,
         CAST('0x' || substr(md5('n' || CAST(n.n AS VARCHAR) || '_'
                  || CAST(v.v AS VARCHAR)), 1, 8) AS BIGINT)
           % 1000000000 AS h
  FROM (SELECT unnest(range(0, 5)) AS n) n
  CROSS JOIN (SELECT unnest(range(0, 8)) AS v) v
), keys AS (
  SELECT DISTINCT user_id,
         CAST('0x' || substr(md5('k' || CAST(user_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000000000 AS kh
  FROM events
), asg AS (
  SELECT k.user_id,
         min_by(vn.node,
                ((vn.h - k.kh + 1000000000) % 1000000000) * 64
                  + vn.node * 8 + vn.vn) AS node_before,
         min_by(vn.node,
                ((vn.h - k.kh + 1000000000) % 1000000000) * 64
                  + vn.node * 8 + vn.vn)
           FILTER (WHERE vn.node <> 4) AS node_after
  FROM keys k CROSS JOIN vnodes vn
  GROUP BY k.user_id
)
SELECT CAST(node_before AS BIGINT) AS from_node,
       CAST(node_after AS BIGINT) AS to_node,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM asg GROUP BY 1, 2
"""


@_register("ring1_consistent_hash", _RING1_SQL)
def ring1_consistent_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring with virtual nodes (rdv1's classic sibling,
    the memcached/Dynamo placement scheme): 5 nodes x 8 vnodes hash onto
    a 10^9 ring; each key goes to the nearest CLOCKWISE vnode —
    expressed shuffle-free as min_by over the broadcast 40-vnode table
    with ring distance (h - kh) mod 10^9 (the mod folds the wraparound
    into the same argmin; distance packs x64 with (node, vn) for a
    deterministic tiebreak). The migration matrix after removing node 4
    (the same argmin FILTERed to surviving vnodes) must have zero
    movement between surviving nodes — the property consistent hashing
    exists to provide, here as checkable rows. At 100 TB the vnode
    table is a broadcast literal and the argmin is one combinable
    aggregate per key."""
    ev = _t(spark, sf_dir, "events")
    nodes = spark.range(0, 5).select(F.col("id").alias("node"))
    vns = spark.range(0, 8).select(F.col("id").alias("vn"))
    vnodes = nodes.crossJoin(vns).select(
        "node",
        "vn",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("n"),
                            F.col("node").cast("string"),
                            F.lit("_"),
                            F.col("vn").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000000
        ).alias("h"),
    )
    keys = ev.select("user_id").distinct().select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("k"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000000
        ).alias("kh"),
    )
    pack = (
        ((F.col("h") - F.col("kh") + 1000000000) % 1000000000) * 64
        + F.col("node") * 8
        + F.col("vn")
    )
    asg = keys.join(F.broadcast(vnodes)).groupBy("user_id").agg(
        F.min_by("node", pack).alias("node_before"),
        F.min_by(
            F.when(F.col("node") != 4, F.col("node")),
            F.when(F.col("node") != 4, pack),
        ).alias("node_after"),
    )
    return asg.groupBy(
        F.col("node_before").cast("bigint").alias("from_node"),
        F.col("node_after").cast("bigint").alias("to_node"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))


# =========================================================================
# cms1: count-min sketch (exact-integer cells, min-over-rows estimate)
# =========================================================================

_CMS1_SQL = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
), cells AS (
  SELECT r.r,
         CAST('0x' || substr(md5('r' || CAST(r.r AS VARCHAR) || '_'
                  || CAST(u.user_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS b,
         CAST(SUM(u.c) AS BIGINT) AS cell
  FROM counts u CROSS JOIN (SELECT unnest(range(0, 4)) AS r) r
  GROUP BY 1, 2
), probes AS (
  SELECT user_id, c FROM counts WHERE user_id % 37 = 0
)
SELECT p.user_id, p.c AS true_count,
       CAST(MIN(cl.cell) AS BIGINT) AS est_count
FROM probes p
JOIN (SELECT unnest(range(0, 4)) AS r) r ON TRUE
JOIN cells cl
  ON cl.r = r.r
 AND cl.b = CAST('0x' || substr(md5('r' || CAST(r.r AS VARCHAR) || '_'
                 || CAST(p.user_id AS VARCHAR)), 1, 8) AS BIGINT) % 64
GROUP BY 1, 2
"""


@_register("cms1_count_min", _CMS1_SQL)
def cms1_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over user event frequencies: 4 md5 hash rows x
    64 buckets of BIGINT counters built by one grouped SUM (the sketch
    is a 256-cell table — mergeable across partitions by cell-wise
    addition, which is its 100 TB story); a probe key's estimate is the
    MIN of its 4 cells and can only OVERESTIMATE (collisions add, never
    subtract) — checkable per row against the true count because every
    cell is an exact integer, completing the oracle-checkable sketch
    family (hll1/kmv1 cardinality, ams1 F2, bloom1 membership). Probes
    are the user_id % 37 slice so both engines query the identical key
    set."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )

    def bucket(row_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("r"),
                            row_col.cast("string"),
                            F.lit("_"),
                            key_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 64
        )

    cells = (
        counts.select(
            "user_id", "c", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
        )
        .select("r", bucket(F.col("r"), F.col("user_id")).alias("b"), "c")
        .groupBy("r", "b")
        .agg(F.sum("c").cast("bigint").alias("cell"))
    )
    probes = counts.where(F.col("user_id") % 37 == 0).select(
        "user_id",
        F.col("c").alias("true_count"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r"),
    )
    probed = probes.withColumn(
        "b", bucket(F.col("r"), F.col("user_id"))
    ).join(F.broadcast(cells), ["r", "b"])
    return probed.groupBy("user_id", "true_count").agg(
        F.min("cell").cast("bigint").alias("est_count")
    )
