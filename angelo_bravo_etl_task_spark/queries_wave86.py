r"""Round-5 wave 86: delta/zigzag encoding estimator, 2-D histogram with
marginal conservation.

- enc2: enc1 chose BETWEEN encodings; enc2 sizes the winner for
  integer columns — delta + zigzag + fixed-width bit packing, the
  parquet DELTA_BINARY_PACKED idea: per file, consecutive deltas under
  the declared sort are zigzag-folded to non-negatives and the
  smallest ladder width {4,8,16,24,32,64} that holds the worst one is
  charged for every value. Two columns bracket the story — the
  clustered sort key (tiny deltas, big savings) and a shuffled key
  (wide deltas, packing refuses to help) — and the width laws are
  certified per row: max zigzag fits the chosen width AND fails the
  next-smaller one (minimality).
- hist3: the 2-D profiling histogram (quantity × discount) with its
  defining algebra certified: every cell carries its row and column
  marginals and the grand total, and the conservation laws (cells sum
  to marginals, marginals sum to the total) ride as columns — the
  cross-checks that make a heatmap trustworthy, not decorative.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no storage or profiling surface; these extend the layout family
(enc1, zo1, cp1) with the size model writers act on, and the
profiling family (hist1, hist2, dq1, sk2) into two dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# enc2: delta + zigzag + minimal ladder width per simulated file
# =========================================================================

_ENC2_SQL = """
WITH base AS (
  SELECT l_orderkey // 4096 AS file_id, l_orderkey, l_partkey,
         l_linenumber, l_shipdate
  FROM lineitem
), ordered AS (
  SELECT file_id, l_orderkey, l_partkey,
         LAG(l_orderkey) OVER w AS prev_ok,
         LAG(l_partkey) OVER w AS prev_pk
  FROM base
  WINDOW w AS (PARTITION BY file_id
               ORDER BY l_orderkey, l_linenumber, l_shipdate, l_partkey)
), deltas AS (
  SELECT file_id, 'orderkey' AS col_name,
         CASE WHEN prev_ok IS NULL THEN CAST(0 AS BIGINT)
              WHEN l_orderkey - prev_ok >= 0
                THEN 2 * (l_orderkey - prev_ok)
              ELSE -2 * (l_orderkey - prev_ok) - 1 END AS z
  FROM ordered
  UNION ALL
  SELECT file_id, 'partkey',
         CASE WHEN prev_pk IS NULL THEN CAST(0 AS BIGINT)
              WHEN l_partkey - prev_pk >= 0
                THEN 2 * (l_partkey - prev_pk)
              ELSE -2 * (l_partkey - prev_pk) - 1 END
  FROM ordered
), agg AS (
  SELECT file_id, col_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(z) AS BIGINT) AS max_z
  FROM deltas GROUP BY file_id, col_name
), width AS (
  SELECT file_id, col_name, n, max_z,
         CASE WHEN max_z < 16 THEN 4
              WHEN max_z < 256 THEN 8
              WHEN max_z < 65536 THEN 16
              WHEN max_z < 16777216 THEN 24
              WHEN max_z < 4294967296 THEN 32
              ELSE 64 END AS bits
  FROM agg
)
SELECT file_id, col_name, n, max_z, CAST(bits AS BIGINT) AS bits,
       CAST((n * bits + 7) // 8 + 8 AS BIGINT) AS est_bytes,
       CAST(8 * n AS BIGINT) AS plain_bytes,
       CAST((n * bits + 7) // 8 + 8 AS BIGINT)
         / CAST(8 * n AS BIGINT) AS ratio,
       (bits = 64 OR max_z < (CAST(1 AS BIGINT) << bits)) AS fits_ok,
       (bits = 4 OR max_z >= CASE bits WHEN 8 THEN 16 WHEN 16 THEN 256
                                       WHEN 24 THEN 65536
                                       WHEN 32 THEN 16777216
                                       ELSE 4294967296 END) AS minimal_ok
FROM width
"""


@_register("enc2_delta_zigzag", _ENC2_SQL)
def enc2_delta_zigzag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta + zigzag + fixed-width packing estimator (the
    DELTA_BINARY_PACKED size model): per simulated file and column,
    consecutive deltas under the declared unique layout sort are
    zigzag-folded (2d / −2d−1 — sign-free without abs-overflow), the
    smallest ladder width in {4,8,16,24,32,64} holding the worst
    zigzag is selected, and the packed size (n·bits/8 + one 8-byte
    base) is charged against plain 8-byte encoding. The two columns
    bracket the story: the file's own sort key packs tiny (orderkey
    deltas within a file are single steps) while the shuffled partkey
    stays wide — so both savings and refusal fire at every SF. The
    width laws are certified per row: `fits_ok` (max zigzag < 2^bits)
    and `minimal_ok` (it would NOT fit the next width down). The
    ladder is CASE, not log2 — the libm-free discipline; the lag runs
    per (file, column) partition, never a global sort (enc1's shape).
    At 100 TB this is the writer's per-page decision, priced from one
    windowed pass."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") / 4096).cast("bigint").alias("file_id"),
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_shipdate",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("file_id").orderBy(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_partkey"
    )

    def zig(cur, prev):
        d = cur - prev
        return (
            F.when(prev.isNull(), F.lit(0).cast("bigint"))
            .when(d >= 0, 2 * d)
            .otherwise(-2 * d - 1)
            .cast("bigint")
        )

    ordered = base.select(
        "file_id",
        zig(F.col("l_orderkey"), F.lag("l_orderkey").over(w)).alias("z_ok"),
        zig(F.col("l_partkey"), F.lag("l_partkey").over(w)).alias("z_pk"),
    )
    deltas = ordered.select(
        "file_id", F.lit("orderkey").alias("col_name"), F.col("z_ok").alias("z")
    ).unionAll(
        ordered.select(
            "file_id", F.lit("partkey").alias("col_name"), F.col("z_pk").alias("z")
        )
    )
    agg = deltas.groupBy("file_id", "col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("z").cast("bigint").alias("max_z"),
    )
    bits = (
        F.when(F.col("max_z") < 16, 4)
        .when(F.col("max_z") < 256, 8)
        .when(F.col("max_z") < 65536, 16)
        .when(F.col("max_z") < 16777216, 24)
        .when(F.col("max_z") < 4294967296, 32)
        .otherwise(64)
    )
    width = agg.withColumn("bits", bits.cast("bigint"))
    est = F.expr("CAST((n * bits + 7) DIV 8 + 8 AS BIGINT)")
    prev_cap = (
        F.when(F.col("bits") == 8, 16)
        .when(F.col("bits") == 16, 256)
        .when(F.col("bits") == 24, 65536)
        .when(F.col("bits") == 32, 16777216)
        .otherwise(4294967296)
    )
    return width.select(
        "file_id",
        "col_name",
        "n",
        "max_z",
        "bits",
        est.alias("est_bytes"),
        (8 * F.col("n")).cast("bigint").alias("plain_bytes"),
        (est / (8 * F.col("n")).cast("bigint")).alias("ratio"),
        # 1<<64 overflows BIGINT, and pow() is libm — a 64-bit width
        # trivially holds any BIGINT zigzag, so special-case it
        F.expr(
            "(bits = 64 OR max_z < shiftleft(CAST(1 AS BIGINT),"
            " CAST(bits AS INT)))"
        ).alias("fits_ok"),
        ((F.col("bits") == 4) | (F.col("max_z") >= prev_cap)).alias(
            "minimal_ok"
        ),
    )


# =========================================================================
# hist3: 2-D histogram with marginal conservation laws
# =========================================================================

_HIST3_SQL = """
WITH b AS (
  SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT) AS qb,
         CAST(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) // 2
              AS BIGINT) AS db
  FROM lineitem
), cells AS (
  SELECT qb, db, CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY qb, db
), rowm AS (
  SELECT qb, CAST(SUM(n) AS BIGINT) AS row_total FROM cells GROUP BY qb
), colm AS (
  SELECT db, CAST(SUM(n) AS BIGINT) AS col_total FROM cells GROUP BY db
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS grand FROM cells
)
SELECT c.qb, c.db, c.n, r.row_total, m.col_total, t.grand,
       ((SELECT SUM(row_total) FROM rowm) = t.grand
        AND (SELECT SUM(col_total) FROM colm) = t.grand) AS marginals_ok,
       c.n / t.grand AS cell_frac
FROM cells c
JOIN rowm r ON r.qb = c.qb
JOIN colm m ON m.db = c.db
CROSS JOIN tot t
"""


@_register("hist3_2d_histogram", _HIST3_SQL)
def hist3_2d_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D profiling histogram over (quantity decade × discount
    2-percent band) with the algebra that makes a heatmap TRUSTABLE
    certified on every cell: the cell count sits beside its row
    marginal, column marginal, and the grand total, and `marginals_ok`
    asserts both marginal families re-sum to the total — the
    conservation cross-check (hist1/hist2's 1-D discipline lifted to
    two dimensions). Bin arithmetic is integer division (quantities)
    and DECIMAL-exact scaling for discounts (float FLOOR(x·100) is NOT
    portable: the engines disagree on 0.03·100) — bin membership is
    value-identical cross-engine. cell_frac is one
    IEEE division of exact BIGINTs. Plan shape: one combinable
    (qb, db) aggregate; the marginal frames are bin-sized joins; at
    100 TB the histogram is a ~30-cell reduction off one scan."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr("CAST(CAST(l_quantity AS BIGINT) DIV 10 AS BIGINT)").alias(
            "qb"
        ),
        # decimal-exact: FLOOR(l_discount*100) is NOT portable — the two
        # engines disagree on e.g. 0.03*100 (2.9999999999999996 vs 3)
        F.expr(
            "CAST(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"
            " DIV 2 AS BIGINT)"
        ).alias("db"),
    )
    cells = b.groupBy("qb", "db").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rowm = cells.groupBy("qb").agg(
        F.sum("n").cast("bigint").alias("row_total")
    )
    colm = cells.groupBy("db").agg(
        F.sum("n").cast("bigint").alias("col_total")
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("grand"))
    rsum = rowm.agg(F.sum("row_total").cast("bigint").alias("rs"))
    csum = colm.agg(F.sum("col_total").cast("bigint").alias("cs"))
    return (
        cells.join(F.broadcast(rowm), "qb")
        .join(F.broadcast(colm), "db")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rsum))
        .crossJoin(F.broadcast(csum))
        .select(
            "qb",
            "db",
            "n",
            "row_total",
            "col_total",
            "grand",
            (
                (F.col("rs") == F.col("grand"))
                & (F.col("cs") == F.col("grand"))
            ).alias("marginals_ok"),
            (F.col("n") / F.col("grand")).alias("cell_frac"),
        )
    )
