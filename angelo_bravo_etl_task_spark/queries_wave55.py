"""Round-3 wave 55: product quantization, Hilbert locality, round-robin.

- pq1: product quantization (the IVF-PQ building block behind
  billion-scale ANN): split each floor-quantized embedding into 4
  subvectors, assign each to its nearest of 4 seeded centroids by
  exact integer L2^2, emit the 4-code word and the exact
  reconstruction error; seeds must self-assign with zero error.
- zo2: Hilbert-curve indexing beside zo1's Z-order — both space-
  filling indexes per cell (Hilbert via the classic 4-level
  rotate-and-accumulate, generated as chained CTEs with per-level
  unique names — the dtw1 lateral-alias lesson; Z by bit
  interleaving); Hilbert's defining property (every consecutive step
  is Manhattan distance 1, where Z-order jumps) is property-asserted.
- trn1: round-robin tournament scheduling by the circle method — the
  combinatorial design (every pair exactly once, every team once per
  round) as a pure arithmetic projection over a (round, slot) spine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# pq1: product quantization with a seeded codebook
# =========================================================================

_PQ1_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, e -> CAST(floor(e * 1000) AS BIGINT)) AS qv
  FROM embeddings
), seeds AS (
  SELECT list(qv ORDER BY vec_id) AS cb FROM q WHERE vec_id < 4
), coded AS (
  SELECT v.vec_id,
         list_transform(range(0, 4), m ->
           list_sort(list_transform(range(0, 4), c ->
             {'d': list_sum(list_transform(range(1, 17), i ->
                     (v.qv[m * 16 + i] - s.cb[c + 1][m * 16 + i])
                     * (v.qv[m * 16 + i] - s.cb[c + 1][m * 16 + i]))),
              'c': c}))[1]) AS best
  FROM q v CROSS JOIN seeds s
)
SELECT vec_id,
       array_to_string(list_transform(best, b -> CAST(b.c AS VARCHAR)), '/')
         AS code,
       CAST(list_sum(list_transform(best, b -> b.d)) AS BIGINT)
         AS recon_err
FROM coded
"""


@_register("pq1_product_quantization", _PQ1_SQL)
def pq1_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the PQ in IVF-PQ, how billion-vector ANN
    indexes compress embeddings to a few bytes: each 64-dim embedding
    (floor-quantized to integers at 1e3 — floor because raw CAST
    rounds on one engine and truncates on the other) splits into 4
    subvectors of 16 dims; each subvector is assigned its nearest of 4
    SEEDED centroids (the quantized subvectors of vec_id 0..3 — no
    k-means iteration, so the codebook is deterministic) by exact
    BIGINT L2^2 with centroid-index tiebreak. Emits the 4-symbol code
    word (the whole vector in 4 small ints) plus the exact
    reconstruction error; the seed vectors must self-assign with zero
    error (property). The codebook is one broadcast cell; assignment
    is a narrow per-row expression — the 100 TB shape."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x * 1000).cast("bigint"),
        ).alias("qv"),
    )
    seeds = q.where(F.col("vec_id") < 4).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "qv"))),
            lambda s: s["qv"],
        ).alias("cb")
    )

    def sub_l2(qv, cent, m):
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(16)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + (
                F.element_at(qv, (m * 16 + i).cast("int"))
                - F.element_at(cent, (m * 16 + i).cast("int"))
            )
            * (
                F.element_at(qv, (m * 16 + i).cast("int"))
                - F.element_at(cent, (m * 16 + i).cast("int"))
            ),
        )

    coded = q.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda m: F.element_at(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(3)),
                        lambda c: F.struct(
                            sub_l2(
                                F.col("qv"),
                                F.element_at(F.col("cb"), (c + 1).cast("int")),
                                m,
                            ).alias("d"),
                            c.cast("bigint").alias("c"),
                        ),
                    )
                ),
                1,
            ),
        ).alias("best"),
    )
    return coded.select(
        "vec_id",
        F.array_join(
            F.transform("best", lambda b: b["c"].cast("string")), "/"
        ).alias("code"),
        F.aggregate(
            F.col("best"),
            F.lit(0).cast("bigint"),
            lambda acc, b: acc + b["d"],
        ).alias("recon_err"),
    )


# =========================================================================
# zo2: Hilbert index vs Z-order index per grid cell
# =========================================================================


def _zo2_oracle() -> str:
    """Generate the chained-CTE oracle: one CTE per Hilbert level with
    globally unique column names (the dtw1 lateral-alias lesson)."""
    ctes = [
        "cells AS (\n"
        "  SELECT x.x AS gx, y.y AS gy\n"
        "  FROM (SELECT unnest(range(0, 16)) AS x) x\n"
        "  CROSS JOIN (SELECT unnest(range(0, 16)) AS y) y\n"
        ")",
        "h0 AS (SELECT gx, gy, gx AS x0, gy AS y0,"
        " CAST(0 AS BIGINT) AS d0 FROM cells)",
    ]
    lvl = 0
    for s in (8, 4, 2, 1):
        i, o = lvl, lvl + 1
        ctes.append(
            f"h{o} AS (\n"
            f"  SELECT gx, gy,\n"
            f"    CASE WHEN (y{i} & {s}) = 0 THEN\n"
            f"      CASE WHEN (x{i} & {s}) > 0 THEN 15 - y{i} ELSE y{i} END\n"
            f"    ELSE x{i} END AS x{o},\n"
            f"    CASE WHEN (y{i} & {s}) = 0 THEN\n"
            f"      CASE WHEN (x{i} & {s}) > 0 THEN 15 - x{i} ELSE x{i} END\n"
            f"    ELSE y{i} END AS y{o},\n"
            f"    d{i} + {s * s} * CAST(\n"
            f"      xor(3 * (CASE WHEN (x{i} & {s}) > 0 THEN 1 ELSE 0 END),\n"
            f"          CASE WHEN (y{i} & {s}) > 0 THEN 1 ELSE 0 END)\n"
            f"      AS BIGINT) AS d{o}\n"
            f"  FROM h{i})"
        )
        lvl = o
    z_terms = " + ".join(
        f"(((gx >> {k}) & 1) << {2 * k + 1}) + (((gy >> {k}) & 1) << {2 * k})"
        for k in range(4)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(gx AS BIGINT) AS x, CAST(gy AS BIGINT) AS y,
       CAST(d{lvl} AS BIGINT) AS hilbert_d,
       CAST({z_terms} AS BIGINT) AS z_d
FROM h{lvl}
"""
    )


@_register("zo2_hilbert_locality", _zo2_oracle())
def zo2_hilbert_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve index beside the Z-order index for every cell of a
    16x16 grid — the two space-filling layouts competing for data
    clustering (zo1 demonstrated Z-order file skipping; zo2 shows WHY
    Hilbert is the premium option): Hilbert via the classic xy2d
    rotate-and-accumulate over 4 bit levels (each level one chained
    projection — generated CTEs with per-level unique names on the
    oracle side), Z by bit interleaving. Both are bijections onto
    0..255 (property), and walking each curve in index order shows
    Hilbert's defining property: EVERY consecutive step is Manhattan
    distance 1, while Z-order's total walk is ~1.6x longer with jumps
    up to 15 — the locality gap that turns into scan amplification at
    layout time. `sf_dir` only seeds determinism; the grid is
    generated (the f23/ca1 pattern)."""
    _ = sf_dir
    xs = spark.range(0, 16).select(F.col("id").alias("gx"))
    ys = spark.range(0, 16).select(F.col("id").alias("gy"))
    g = xs.crossJoin(ys)
    x: Column = F.col("gx")
    y: Column = F.col("gy")
    d: Column = F.lit(0).cast("bigint")
    for s in (8, 4, 2, 1):
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d = d + F.lit(s * s) * (3 * rx).bitwiseXOR(ry).cast("bigint")
        nx = F.when(
            ry == 0, F.when(rx == 1, 15 - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, 15 - x).otherwise(x)
        ).otherwise(y)
        x, y = nx, ny
    z = None
    for k in range(4):
        term = (
            F.shiftleft(F.shiftright(F.col("gx"), k).bitwiseAND(F.lit(1)), 2 * k + 1)
            + F.shiftleft(F.shiftright(F.col("gy"), k).bitwiseAND(F.lit(1)), 2 * k)
        )
        z = term if z is None else z + term
    return g.select(
        F.col("gx").cast("bigint").alias("x"),
        F.col("gy").cast("bigint").alias("y"),
        d.alias("hilbert_d"),
        z.cast("bigint").alias("z_d"),
    )


# =========================================================================
# trn1: round-robin tournament schedule (circle method)
# =========================================================================

_TRN1_SQL = """
WITH team AS (
  SELECT s_suppkey AS tk,
         CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS BIGINT) AS t
  FROM supplier ORDER BY s_suppkey LIMIT 8
), spine AS (
  SELECT r.r, s.s
  FROM (SELECT unnest(range(1, 8)) AS r) r
  CROSS JOIN (SELECT unnest(range(0, 4)) AS s) s
), sched AS (
  SELECT r, s,
         CASE WHEN s = 0 THEN 7
              ELSE (r - 1 + s) % 7 END AS home_t,
         CASE WHEN s = 0 THEN (r - 1) % 7
              ELSE (r - 1 - s + 7) % 7 END AS away_t
  FROM spine
)
SELECT CAST(sc.r AS BIGINT) AS round, CAST(sc.s AS BIGINT) AS slot,
       h.tk AS home, a.tk AS away
FROM sched sc
JOIN team h ON h.t = sc.home_t
JOIN team a ON a.t = sc.away_t
"""


@_register("trn1_round_robin", _TRN1_SQL)
def trn1_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin schedule for the 8 smallest suppliers by the circle
    method — the combinatorial design behind tournament/rotation
    scheduling (and shuffle-round planning): team 7 sits fixed; in
    round r slot 0 it hosts team (r-1) mod 7, and slot s pairs
    (r-1+s) mod 7 against (r-1-s) mod 7 — pure arithmetic over a
    (round, slot) spine, 7 rounds x 4 matches. The property layer
    proves the design: all 28 unordered pairs appear EXACTLY once, and
    every team plays exactly once per round. No folds, no recursion —
    scheduling as a projection."""
    s8 = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .orderBy("s_suppkey")
        .limit(8)
        .withColumn(
            "t",
            F.row_number().over(Window.orderBy("s_suppkey")).cast("bigint") - 1,
        )
    )
    rounds = spark.range(1, 8).select(F.col("id").alias("r"))
    slots = spark.range(0, 4).select(F.col("id").alias("s"))
    sched = rounds.crossJoin(slots).select(
        "r",
        "s",
        F.when(F.col("s") == 0, F.lit(7))
        .otherwise((F.col("r") - 1 + F.col("s")) % 7)
        .cast("bigint")
        .alias("home_t"),
        F.when(F.col("s") == 0, (F.col("r") - 1) % 7)
        .otherwise((F.col("r") - 1 - F.col("s") + 7) % 7)
        .cast("bigint")
        .alias("away_t"),
    )
    h = s8.alias("h")
    a = s8.alias("a")
    return (
        sched.join(F.broadcast(h), F.col("home_t") == F.col("h.t"))
        .join(F.broadcast(a), F.col("away_t") == F.col("a.t"))
        .select(
            F.col("r").cast("bigint").alias("round"),
            F.col("s").cast("bigint").alias("slot"),
            F.col("h.s_suppkey").alias("home"),
            F.col("a.s_suppkey").alias("away"),
        )
    )
