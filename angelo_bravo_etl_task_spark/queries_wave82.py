r"""Round-5 wave 82: orphan-file retention sweep, deterministic token
dropout.

- gc1: the lakehouse janitor (Iceberg remove_orphan_files / snapshot
  expiry) as certified relational logic: a simulated file inventory
  meets the manifest of referenced files and a data-derived retention
  cutoff, and every file row carries its verdict PLUS the two safety
  laws a janitor must never break — referenced files are never
  deleted, young files are never deleted — alongside branch-complete
  coverage (referenced-old, orphan-young, orphan-old all exist at
  every SF by construction).
- aug1: training-data augmentation with seed governance: 10% token
  dropout decided per (doc, position) by md5 — reproducible across
  runs, shards, and partitionings because the coin is a pure function
  of content position, never of execution order. Conservation
  (kept + dropped = total) and an order-preserving preview of the
  first kept tokens are certified per doc; the oracle replays the
  identical coins in SQL.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no maintenance or augmentation surface; these extend the governance
family (cp1, dq4, cdc1, rc1) and the text-pipeline family (tx-, sh1,
sm2) along axes every production corpus pipeline runs nightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# gc1: orphan + retention sweep with the janitor safety laws
# =========================================================================

_GC1_SQL = """
WITH rows_ AS (
  SELECT CAST(o_orderdate AS DATE) AS d FROM orders
), mind AS (
  SELECT MIN(d) AS d0 FROM rows_
), days_ AS (
  SELECT d - (SELECT d0 FROM mind) AS day FROM rows_
), files AS (
  SELECT day // 60 AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MAX(day) AS BIGINT) AS mtime_day
  FROM days_ GROUP BY day // 60
), tagged AS (
  SELECT file_id, n_rows, mtime_day,
         (CAST('0x' || substr(md5('gc:' || CAST(file_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 5 <> 0) AS referenced
  FROM files
), cutoff AS (
  SELECT CAST((MAX(mtime_day) * 6) // 10 AS BIGINT) AS keep_after
  FROM tagged
)
SELECT t.file_id, t.n_rows, t.mtime_day, t.referenced,
       c.keep_after,
       (NOT t.referenced AND t.mtime_day < c.keep_after) AS delete_flag,
       (NOT (NOT t.referenced AND t.mtime_day < c.keep_after)
        OR NOT t.referenced) AS never_deletes_referenced,
       (NOT (NOT t.referenced AND t.mtime_day < c.keep_after)
        OR t.mtime_day < c.keep_after) AS never_deletes_young
FROM tagged t CROSS JOIN cutoff c
"""


@_register("gc1_orphan_retention", _GC1_SQL)
def gc1_orphan_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file retention sweep — the janitor job every table format
    ships (remove_orphan_files + snapshot expiry) — certified as
    relational logic: the file inventory (simulated as 60-day ingestion
    buckets — time-correlated so old and young files BOTH exist, the
    prn1 layout lesson; mtime = each file's newest day offset) is
    tagged referenced
    /orphan by a deterministic md5 manifest membership (~20% orphans at
    every SF), the retention cutoff is DATA-DERIVED (60% of the max
    mtime — the dp2 relative rule, so young and old both exist at every
    SF), and each row carries the delete verdict plus the two safety
    laws a janitor must never break: `never_deletes_referenced` and
    `never_deletes_young` — tautologies OF THE PREDICATE, so a red
    driver hash here means the sweep's logic was edited into something
    unsafe. Plan shape: one combinable aggregate to build the
    inventory, two broadcast scalars (min date, cutoff), map-side
    verdicts. At 100 TB the inventory is object-store listing output
    and this query IS the sweep plan."""
    o = _t(spark, sf_dir, "orders")
    rows_ = o.select(F.col("o_orderdate").cast("date").alias("d"))
    mind = rows_.agg(F.min("d").alias("d0"))
    files = (
        rows_.crossJoin(F.broadcast(mind))
        .select(F.datediff("d", "d0").cast("bigint").alias("day"))
        .groupBy((F.col("day") / 60).cast("bigint").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("day").cast("bigint").alias("mtime_day"),
        )
    )
    h8 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("gc:"), F.col("file_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    tagged = files.withColumn("referenced", (h8 % 5) != 0)
    cutoff = tagged.agg(
        F.expr("CAST((MAX(mtime_day) * 6) DIV 10 AS BIGINT)").alias(
            "keep_after"
        )
    )
    j = tagged.crossJoin(F.broadcast(cutoff))
    delete_flag = (~F.col("referenced")) & (
        F.col("mtime_day") < F.col("keep_after")
    )
    return j.select(
        "file_id",
        "n_rows",
        "mtime_day",
        "referenced",
        "keep_after",
        delete_flag.alias("delete_flag"),
        (~delete_flag | ~F.col("referenced")).alias(
            "never_deletes_referenced"
        ),
        (~delete_flag | (F.col("mtime_day") < F.col("keep_after"))).alias(
            "never_deletes_young"
        ),
    )


# =========================================================================
# aug1: positional md5 token dropout with conservation + order preview
# =========================================================================

_AUG1_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
                     t -> LENGTH(t) > 0) AS ws
  FROM documents
), pos AS (
  SELECT doc_id, i, ws[i] AS tok,
         (CAST('0x' || substr(md5('aug:' || CAST(doc_id AS VARCHAR) || ':'
                              || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
          % 10 <> 0) AS keep
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) _
  WHERE len(ws) > 0
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       (COUNT(*) = SUM(CASE WHEN keep THEN 1 ELSE 0 END)
                   + SUM(CASE WHEN keep THEN 0 ELSE 1 END)) AS conserve_ok,
       array_to_string(list_slice(
           COALESCE(list(tok ORDER BY i) FILTER (WHERE keep),
                    CAST([] AS VARCHAR[])), 1, 5), ' ')
         AS kept_preview
FROM pos GROUP BY doc_id
"""


@_register("aug1_token_dropout", _AUG1_SQL)
def aug1_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% token dropout — the augmentation/regularization
    step with seed GOVERNANCE: each position's coin is md5 of
    (doc_id, position), a pure function of content coordinates, so the
    augmented corpus is bit-reproducible across runs, shards, and any
    partitioning (the rsv1/spl1 discipline — never RNG state, never
    execution order). Per doc: token counts kept/dropped, the
    conservation certificate, and an ORDER-PRESERVING preview of the
    first five kept tokens (concatenated in position order — wrong
    ordering after the filter would scramble it, which is exactly what
    the hash would catch). Plan shape: posexplode + one combinable
    aggregate; the coin is map-side codegen. At 100 TB augmentation
    runs inline with the scan — no second pass, no stored random
    state."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("ws"),
    ).where(F.size("ws") > 0)
    pos = toks.select(
        "doc_id", F.posexplode("ws").alias("i0", "tok")
    ).select(
        "doc_id", (F.col("i0") + 1).alias("i"), "tok"
    )
    h8 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("aug:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    tagged = pos.withColumn("keep", (h8 % 10) != 0)
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_dropped"),
        (
            F.count(F.lit(1))
            == F.sum(F.when(F.col("keep"), 1).otherwise(0))
            + F.sum(F.when(F.col("keep"), 0).otherwise(1))
        ).alias("conserve_ok"),
        F.concat_ws(
            " ",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"), F.struct("i", "tok")
                            )
                        )
                    ),
                    lambda s: s["tok"],
                ),
                1,
                5,
            ),
        ).alias("kept_preview"),
    )
