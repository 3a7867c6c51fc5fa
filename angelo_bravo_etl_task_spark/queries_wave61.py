"""Round-3 wave 61: ring leader election, trapping rain water.

- cr1: Chang-Roberts leader election on a 16-node md5 ring — the
  winner is the max id, but the interesting output is the exact
  MESSAGE COMPLEXITY: node i's token travels clockwise until it meets
  a larger id, so messages = sum over nodes of the clockwise distance
  to the next larger id (the eventual leader's token travels the full
  ring) — a distributed-protocol cost computed relationally, no
  simulation loop at all.
- trap1: the trapping-rain-water classic — water over bar i is
  min(running max from the left, running max from the right) - h_i —
  entirely two window maxima on BOTH engines; the brute-force per-bar
  check lives in the property layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# cr1: Chang-Roberts election message complexity
# =========================================================================

_CR1_SQL = """
WITH ring AS (
  SELECT CAST(v AS BIGINT) AS pos,
         CAST('0x' || substr(md5('id' || CAST(v AS VARCHAR)), 1, 8)
              AS BIGINT) AS nid
  FROM (SELECT unnest(range(0, 16)) AS v)
), hops AS (
  SELECT a.pos, a.nid,
         COALESCE(MIN(CASE WHEN b.nid > a.nid
                           THEN (b.pos - a.pos + 16) % 16 END), 16) AS travel
  FROM ring a CROSS JOIN ring b
  GROUP BY a.pos, a.nid
)
SELECT pos, nid, CAST(travel AS BIGINT) AS messages,
       travel = 16 AS is_leader,
       CAST(SUM(travel) OVER () AS BIGINT) AS total_messages
FROM hops
"""


@_register("cr1_ring_election", _CR1_SQL)
def cr1_ring_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chang-Roberts leader election on a 16-node unidirectional ring
    with md5 node ids: every node launches its id clockwise and a
    token dies at the first node with a LARGER id — so node i's token
    travels exactly the clockwise distance to the next larger id, and
    the eventual leader's token travels the full ring (16). The
    protocol's total message count — the quantity the algorithm is
    famous for (O(n log n) expected, O(n^2) worst) — is therefore ONE
    relational argmin over ring distances, no step simulation at all
    (the io1 sort-instead-of-simulate insight on a distributed
    protocol). Exactly one leader (travel = 16) must emerge, and a
    Python token-passing SIMULATION must agree with the closed form —
    both in the property layer. `sf_dir` seeds determinism only."""
    _ = sf_dir
    ring = spark.range(0, 16).select(
        F.col("id").cast("bigint").alias("pos"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("id"), F.col("id").cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("nid"),
    )
    a = ring.alias("a")
    b = ring.alias("b")
    hops = (
        a.crossJoin(F.broadcast(b))
        .groupBy(F.col("a.pos").alias("pos"), F.col("a.nid").alias("nid"))
        .agg(
            F.coalesce(
                F.min(
                    F.when(
                        F.col("b.nid") > F.col("a.nid"),
                        (F.col("b.pos") - F.col("a.pos") + 16) % 16,
                    )
                ),
                F.lit(16),
            )
            .cast("bigint")
            .alias("messages")
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hops.select(
        "pos",
        "nid",
        "messages",
        (F.col("messages") == 16).alias("is_leader"),
        F.sum("messages").over(wall).cast("bigint").alias("total_messages"),
    )


# =========================================================================
# trap1: trapping rain water (two window maxima)
# =========================================================================

_TRAP1_SQL = """
WITH seq AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5('ht' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 10 AS BIGINT) AS h,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), walls AS (
  SELECT user_id, i, h,
         MAX(h) OVER (PARTITION BY user_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS lmax,
         MAX(h) OVER (PARTITION BY user_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS rmax,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM seq
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(SUM(least(lmax, rmax) - h) AS BIGINT) AS trapped,
       CAST(SUM(h) AS BIGINT) AS total_height
FROM walls
WHERE n >= 10
GROUP BY user_id, n
"""


@_register("trap1_rain_water", _TRAP1_SQL)
def trap1_rain_water(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapping rain water over each user's md5 bar heights (0-9,
    first 30): water above bar i is min(max height to the left
    INCLUDING i, max to the right INCLUDING i) - h_i — which makes the
    whole classic two frame-bounded window MAXes and one sum, fully
    declarative on BOTH engines (no fold anywhere; the rare classic
    whose optimal form IS the relational form). The property layer
    recomputes per-bar water brute-force and checks the physical
    sanity bounds: trapped >= 0 and trapped <= 9*n - total_height
    (can't hold more than the empty space)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ht"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 10
        ).alias("h"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    wl = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    wn = Window.partitionBy("user_id")
    walls = seq.select(
        "user_id",
        "h",
        F.max("h").over(wl).alias("lmax"),
        F.max("h").over(wr).alias("rmax"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        walls.where(F.col("n") >= 10)
        .groupBy("user_id", F.col("n").cast("bigint").alias("n"))
        .agg(
            F.sum(F.least("lmax", "rmax") - F.col("h"))
            .cast("bigint")
            .alias("trapped"),
            F.sum("h").cast("bigint").alias("total_height"),
        )
    )
