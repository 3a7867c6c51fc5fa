r"""Round-8 wave 114: deletion vectors (dv1) — merge-on-read soft
deletes, the lake-format rung between mg1's MERGE (copy-on-write), cp1's
compaction, prn1's zone maps, and gc1's retention sweep.

A delete in a DV-enabled format never rewrites a data file: it appends
the deleted ROW POSITIONS to a per-file deletion vector, and readers
anti-join (file, position) at scan time. Two overlapping delete commits
are merged idempotently (a position deleted twice is deleted once), and
the read path + per-file accounting ride the driver's hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_DV1_SQL = """
WITH base AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 4 AS BIGINT) AS file_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4
                                 ORDER BY o_orderkey) AS BIGINT) AS pos,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM orders
), dv AS (
  SELECT DISTINCT file_id, pos FROM (
    SELECT file_id, pos FROM base WHERE o_orderkey % 11 = 0
    UNION ALL
    SELECT file_id, pos FROM base WHERE o_orderkey % 33 = 0
  )
), live AS (
  SELECT b.* FROM base b LEFT JOIN dv
    ON b.file_id = dv.file_id AND b.pos = dv.pos
  WHERE dv.pos IS NULL
)
SELECT f.file_id,
       CAST(f.n_total - COALESCE(d.n_del, 0) AS BIGINT) AS live_rows,
       CAST(COALESCE(d.n_del, 0) AS BIGINT) AS deleted_rows,
       CAST(l.live_sum AS BIGINT) AS live_price_sum_c
FROM (SELECT file_id, COUNT(*) AS n_total FROM base GROUP BY file_id) f
LEFT JOIN (SELECT file_id, COUNT(*) AS n_del FROM dv GROUP BY file_id) d
  ON f.file_id = d.file_id
JOIN (SELECT file_id, SUM(price_c) AS live_sum FROM live GROUP BY file_id) l
  ON f.file_id = l.file_id
"""


@_register("dv1_deletion_vectors", _DV1_SQL)
def dv1_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes: orders is laid out as 4 synthetic 'files'
    (file_id = key % 4) with deterministic row POSITIONS (row_number per
    file ordered by key — the physical ordinal a real format records).
    Two delete commits land (keys % 11 and keys % 33 — the second a
    strict subset, so the overlap exercises idempotent merging), their
    positions are unioned + deduped into per-file deletion vectors, and
    the read path reconstructs the live table with a LEFT ANTI join on
    (file_id, pos). Released per file: live/deleted row accounting and
    the live price mass — so a reader that leaks a deleted row, drops a
    live one, or double-counts the overlapping commit reds the hash.

    100 TB shape: THE point of DVs — a delete writes O(|deleted
    positions|) metadata instead of rewriting data files; the scan-side
    anti-join is keyed (file, pos), co-located with the scan in real
    formats (the DV for a file travels with its read task, a broadcast
    here). Compaction (cp1) is what eventually folds DVs back into data
    files; gc1 retires the superseded ones."""
    o = _t(spark, sf_dir, "orders")
    price_c = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    from .operators.windows import with_row_number

    base = with_row_number(
        o.select(
            "o_orderkey",
            (F.col("o_orderkey") % 4).cast("bigint").alias("file_id"),
            price_c.alias("price_c"),
        ),
        ["file_id"],
        [F.col("o_orderkey").asc()],
        "pos",
    ).select(
        "o_orderkey", "file_id", F.col("pos").cast("bigint").alias("pos")
        , "price_c"
    ).localCheckpoint(eager=True)
    dv = (
        base.where(F.col("o_orderkey") % 11 == 0)
        .select("file_id", "pos")
        .unionByName(
            base.where(F.col("o_orderkey") % 33 == 0).select(
                "file_id", "pos"
            )
        )
        .distinct()
    )
    live = base.join(F.broadcast(dv), ["file_id", "pos"], "left_anti")
    totals = base.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    dels = dv.groupBy("file_id").agg(F.count(F.lit(1)).alias("n_del"))
    live_agg = live.groupBy("file_id").agg(
        F.sum("price_c").cast("bigint").alias("live_price_sum_c")
    )
    return (
        totals.join(dels, "file_id", "left")
        .join(live_agg, "file_id")
        .select(
            "file_id",
            (
                F.col("n_total") - F.coalesce(F.col("n_del"), F.lit(0))
            ).cast("bigint").alias("live_rows"),
            F.coalesce(F.col("n_del"), F.lit(0))
            .cast("bigint")
            .alias("deleted_rows"),
            "live_price_sum_c",
        )
    )
