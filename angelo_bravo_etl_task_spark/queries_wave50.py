"""Round-3 wave 50: stencil iteration, Hamming ECC, CRDT G-counter.

- ca1: three rounds of Conway's life on a 16x16 md5-seeded grid — the
  STENCIL iteration pattern (raster/neighborhood computation): each
  round one equi-join against the 8-offset neighbor spine plus the
  birth/survival rule; the canonical raster loop, fully relational.
- ecc1: Hamming(7,4) encode → md5 single-bit corruption → syndrome
  decode — pure bitwise-integer arithmetic end to end, with the
  every-codeword-corrected certificate as a checkable column.
- crdt1: G-counter CRDT gossip — three replicas with md5-prefix views
  of each other's increments, merged by slot-wise MAX; the property
  layer asserts the CRDT laws (commutative, associative, idempotent
  merge) and convergence to the true totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# ca1: Conway stencil rounds on an md5 grid
# =========================================================================

_CA1_SQL = """
WITH cells AS (
  SELECT x.x, y.y,
         CAST('0x' || substr(md5('g' || CAST(x.x AS VARCHAR) || '_'
                  || CAST(y.y AS VARCHAR)), 1, 8) AS BIGINT) % 3 = 0 AS alive
  FROM (SELECT unnest(range(0, 16)) AS x) x
  CROSS JOIN (SELECT unnest(range(0, 16)) AS y) y
), offs AS (
  SELECT dx.dx, dy.dy
  FROM (SELECT unnest([-1, 0, 1]) AS dx) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
  WHERE NOT (dx.dx = 0 AND dy.dy = 0)
), g1 AS (
  SELECT c.x, c.y,
         (nb.n = 3) OR (c.alive AND nb.n = 2) AS alive
  FROM cells c
  LEFT JOIN (
    SELECT c2.x + o.dx AS x, c2.y + o.dy AS y, CAST(COUNT(*) AS BIGINT) AS n
    FROM cells c2 JOIN offs o ON c2.alive
    GROUP BY 1, 2
  ) nb ON nb.x = c.x AND nb.y = c.y
), g2 AS (
  SELECT c.x, c.y,
         (nb.n = 3) OR (c.alive AND nb.n = 2) AS alive
  FROM g1 c
  LEFT JOIN (
    SELECT c2.x + o.dx AS x, c2.y + o.dy AS y, CAST(COUNT(*) AS BIGINT) AS n
    FROM g1 c2 JOIN offs o ON c2.alive
    GROUP BY 1, 2
  ) nb ON nb.x = c.x AND nb.y = c.y
), g3 AS (
  SELECT c.x, c.y,
         (nb.n = 3) OR (c.alive AND nb.n = 2) AS alive
  FROM g2 c
  LEFT JOIN (
    SELECT c2.x + o.dx AS x, c2.y + o.dy AS y, CAST(COUNT(*) AS BIGINT) AS n
    FROM g2 c2 JOIN offs o ON c2.alive
    GROUP BY 1, 2
  ) nb ON nb.x = c.x AND nb.y = c.y
)
SELECT CAST(1 AS BIGINT) AS round, CAST(x AS BIGINT) AS x,
       CAST(y AS BIGINT) AS y
FROM g1 WHERE alive
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(x AS BIGINT), CAST(y AS BIGINT)
FROM g2 WHERE alive
UNION ALL
SELECT CAST(3 AS BIGINT), CAST(x AS BIGINT), CAST(y AS BIGINT)
FROM g3 WHERE alive
"""


@_register("ca1_stencil_rounds", _CA1_SQL)
def ca1_stencil_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of Conway's life on a 16x16 md5-seeded grid (~1/3
    initial density, bounded edges) — the STENCIL pattern behind every
    raster/neighborhood computation (smoothing, morphology, heat
    diffusion): instead of gathering each cell's neighbors, every
    ALIVE cell SCATTERS +1 to its 8 offsets (one join against the
    constant offset spine, one group-by on the landing cell), then the
    birth/survival rule (n=3 births, n=2 keeps) projects the next
    generation. Three fixed rounds = three join+agg stages, exactly how
    iterated stencils run at raster scale (partition by tile, exchange
    halos). Emits the alive cells per round; the property layer replays
    the textbook rules in Python. The `sf_dir` input only seeds
    determinism — the grid is generated, like f23's dialect spine."""
    _ = sf_dir  # generated-spine query (the f23 pattern)
    xs = spark.range(0, 16).select(F.col("id").alias("x"))
    ys = spark.range(0, 16).select(F.col("id").alias("y"))
    cells = xs.crossJoin(ys).select(
        "x",
        "y",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("g"),
                            F.col("x").cast("string"),
                            F.lit("_"),
                            F.col("y").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 3
            == 0
        ).alias("alive"),
    )
    offs = (
        spark.range(-1, 2)
        .select(F.col("id").alias("dx"))
        .crossJoin(spark.range(-1, 2).select(F.col("id").alias("dy")))
        .where(~((F.col("dx") == 0) & (F.col("dy") == 0)))
    )

    def life_round(g: DataFrame) -> DataFrame:
        nb = (
            g.where("alive")
            .crossJoin(F.broadcast(offs))
            .groupBy(
                (F.col("x") + F.col("dx")).alias("nx"),
                (F.col("y") + F.col("dy")).alias("ny"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        return (
            g.join(
                nb,
                (F.col("x") == F.col("nx")) & (F.col("y") == F.col("ny")),
                "left",
            )
            .select(
                "x",
                "y",
                (
                    (F.col("n") == 3)
                    | (F.col("alive") & (F.col("n") == 2))
                ).alias("alive"),
            )
            .fillna({"alive": False})
        )

    g = cells
    out = None
    for rd in (1, 2, 3):
        g = life_round(g)
        frame = g.where("alive").select(
            F.lit(rd).cast("bigint").alias("round"),
            F.col("x").cast("bigint").alias("x"),
            F.col("y").cast("bigint").alias("y"),
        )
        out = frame if out is None else out.unionAll(frame)
    return out


# =========================================================================
# ecc1: Hamming(7,4) encode / corrupt / syndrome-correct
# =========================================================================

_ECC1_SQL = """
WITH src AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('dt' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 16 AS BIGINT) AS data,
         CAST(CAST('0x' || substr(md5('fl' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 7 + 1 AS BIGINT) AS flip_pos
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 30)
), enc AS (
  SELECT key, data, flip_pos,
         data & 1 AS d1, (data >> 1) & 1 AS d2,
         (data >> 2) & 1 AS d3, (data >> 3) & 1 AS d4
  FROM src
), cw AS (
  SELECT key, data, flip_pos, d1, d2, d3, d4,
         -- codeword bits by position 1..7: p1 p2 d1 p3 d2 d3 d4
         xor(xor(d1, d2), d4) AS p1,
         xor(xor(d1, d3), d4) AS p2,
         xor(xor(d2, d3), d4) AS p3
  FROM enc
), packed AS (
  SELECT key, data, flip_pos,
         p1 + 2 * p2 + 4 * d1 + 8 * p3 + 16 * d2 + 32 * d3 + 64 * d4
           AS codeword
  FROM cw
), rx AS (
  SELECT key, data, flip_pos, codeword,
         CAST(xor(codeword, CAST(1 AS BIGINT) << CAST(flip_pos - 1 AS INTEGER))
              AS BIGINT) AS received
  FROM packed
), syn AS (
  SELECT key, data, flip_pos, codeword, received,
         -- parity checks over positions with bit k set in their index
         xor(xor(xor(received & 1, (received >> 2) & 1),
                 (received >> 4) & 1), (received >> 6) & 1) AS s1,
         xor(xor(xor((received >> 1) & 1, (received >> 2) & 1),
                 (received >> 5) & 1), (received >> 6) & 1) AS s2,
         xor(xor(xor((received >> 3) & 1, (received >> 4) & 1),
                 (received >> 5) & 1), (received >> 6) & 1) AS s3
  FROM rx
), fixed AS (
  SELECT key, data, flip_pos, codeword, received,
         CAST(s1 + 2 * s2 + 4 * s3 AS BIGINT) AS syndrome,
         CAST(xor(received,
              CAST(1 AS BIGINT) << CAST(s1 + 2 * s2 + 4 * s3 - 1 AS INTEGER))
              AS BIGINT) AS corrected
  FROM syn
)
SELECT key, data, CAST(codeword AS BIGINT) AS codeword, flip_pos,
       CAST(received AS BIGINT) AS received, syndrome,
       CAST(((corrected >> 2) & 1) + 2 * ((corrected >> 4) & 1)
            + 4 * ((corrected >> 5) & 1) + 8 * ((corrected >> 6) & 1)
            AS BIGINT) AS decoded,
       ((corrected >> 2) & 1) + 2 * ((corrected >> 4) & 1)
         + 4 * ((corrected >> 5) & 1) + 8 * ((corrected >> 6) & 1) = data
         AS recovered
FROM fixed
"""


@_register("ecc1_hamming_correct", _ECC1_SQL)
def ecc1_hamming_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming(7,4) error correction end to end in pure bitwise
    integer arithmetic (data-integrity plumbing for storage/transport):
    4-bit md5 payloads encode into 7-bit codewords (parity bits at
    positions 1/2/4), an md5-chosen single bit flips in transit, and
    the 3-bit syndrome — recomputed parities over the positions whose
    index has that bit set — names the corrupted position exactly, so
    flipping it back recovers the payload. The `recovered` column is
    TRUE for every row (single-bit errors are always correctable at
    distance 3), asserted row-wise in the property layer; the syndrome
    must equal the planted flip position. Narrow codegen projection,
    no joins, no shuffle — bit math rides the scan."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(30)
    )

    def _h8(prefix: str) -> F.Column:
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

    src = o.select(
        F.col("o_orderkey").alias("key"),
        (_h8("dt") % 16).alias("data"),
        (_h8("fl") % 7 + 1).alias("flip_pos"),
    )

    def bit(c, k):
        return F.shiftright(c, k).bitwiseAND(F.lit(1))

    d1 = bit(F.col("data"), 0)
    d2 = bit(F.col("data"), 1)
    d3 = bit(F.col("data"), 2)
    d4 = bit(F.col("data"), 3)
    p1 = d1.bitwiseXOR(d2).bitwiseXOR(d4)
    p2 = d1.bitwiseXOR(d3).bitwiseXOR(d4)
    p3 = d2.bitwiseXOR(d3).bitwiseXOR(d4)
    packed = src.select(
        "key",
        "data",
        "flip_pos",
        (p1 + 2 * p2 + 4 * d1 + 8 * p3 + 16 * d2 + 32 * d3 + 64 * d4)
        .cast("bigint")
        .alias("codeword"),
    )
    rx = packed.withColumn(
        "received",
        F.col("codeword")
        .bitwiseXOR(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(flip_pos - 1 AS INT))")
        )
        .cast("bigint"),
    )
    r = F.col("received")
    s1 = (
        bit(r, 0).bitwiseXOR(bit(r, 2)).bitwiseXOR(bit(r, 4)).bitwiseXOR(bit(r, 6))
    )
    s2 = (
        bit(r, 1).bitwiseXOR(bit(r, 2)).bitwiseXOR(bit(r, 5)).bitwiseXOR(bit(r, 6))
    )
    s3 = (
        bit(r, 3).bitwiseXOR(bit(r, 4)).bitwiseXOR(bit(r, 5)).bitwiseXOR(bit(r, 6))
    )
    syn = rx.withColumn("syndrome", (s1 + 2 * s2 + 4 * s3).cast("bigint"))
    fixed = syn.withColumn(
        "corrected",
        F.col("received")
        .bitwiseXOR(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(syndrome - 1 AS INT))")
        )
        .cast("bigint"),
    )
    c = F.col("corrected")
    decoded = (
        bit(c, 2) + 2 * bit(c, 4) + 4 * bit(c, 5) + 8 * bit(c, 6)
    ).cast("bigint")
    return fixed.select(
        "key",
        "data",
        "codeword",
        "flip_pos",
        "received",
        "syndrome",
        decoded.alias("decoded"),
        (decoded == F.col("data")).alias("recovered"),
    )


# =========================================================================
# crdt1: G-counter CRDT gossip views and slot-wise-max merge
# =========================================================================

_CRDT1_SQL = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST('0x' || substr(md5('rp' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 3 AS owner,
         CAST('0x' || substr(md5('gs' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS gpos
  FROM events
), views AS (
  -- replica v's view of owner-slot o: all of its own increments,
  -- and the md5-gossip prefix (gpos < 60) of other replicas'
  SELECT v.v, e.event_type, e.owner,
         CAST(SUM(CASE WHEN e.owner = v.v OR e.gpos < 60
                       THEN 1 ELSE 0 END) AS BIGINT) AS slot
  FROM ev e CROSS JOIN (SELECT unnest(range(0, 3)) AS v) v
  GROUP BY 1, 2, 3
), merged AS (
  SELECT event_type, owner, CAST(MAX(slot) AS BIGINT) AS merged_slot
  FROM views GROUP BY 1, 2
)
SELECT v.event_type, CAST(v.owner AS BIGINT) AS owner,
       CAST(v.v AS BIGINT) AS replica,
       v.slot, m.merged_slot
FROM views v JOIN merged m
  ON m.event_type = v.event_type AND m.owner = v.owner
"""


@_register("crdt1_gcounter_merge", _CRDT1_SQL)
def crdt1_gcounter_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-counter CRDT (the grow-only distributed counter) simulated
    over the event stream: each event is an increment OWNED by an
    md5-assigned replica; each of the 3 replicas' VIEW of a slot is all
    of its own increments plus the md5-gossip prefix (60%) of everyone
    else's — a deterministic stand-in for partially-propagated state.
    Merge is slot-wise MAX across views (the CRDT join operation),
    emitted beside each view so staleness is visible per row. Because
    a slot's owner has seen all of its own increments, the merged slot
    equals the TRUE per-owner count — convergence — and the property
    layer asserts the semilattice laws (commutativity, associativity,
    idempotence) plus merged-total == event count. One grouped
    aggregate per (replica, type, owner) cell over the scan; at 100 TB
    this is exactly how cross-region counter reconciliation runs."""
    ev = _t(spark, sf_dir, "events")

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("event_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    tagged = ev.select(
        "event_type",
        (_h8("rp") % 3).alias("owner"),
        (_h8("gs") % 100).alias("gpos"),
    )
    replicas = spark.range(0, 3).select(F.col("id").alias("v"))
    views = (
        tagged.crossJoin(F.broadcast(replicas))
        .groupBy("v", "event_type", "owner")
        .agg(
            F.sum(
                F.when(
                    (F.col("owner") == F.col("v")) | (F.col("gpos") < 60), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("slot")
        )
    )
    merged = views.groupBy("event_type", "owner").agg(
        F.max("slot").cast("bigint").alias("merged_slot")
    )
    return views.join(merged, ["event_type", "owner"]).select(
        "event_type",
        F.col("owner").cast("bigint").alias("owner"),
        F.col("v").cast("bigint").alias("replica"),
        "slot",
        "merged_slot",
    )
