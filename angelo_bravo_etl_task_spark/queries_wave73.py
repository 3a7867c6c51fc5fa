r"""Round-5 wave 73: manifest zone-map pruning law, columnar encoding
advisor.

- prn1: the mechanism that makes a 100 TB scan touch gigabytes —
  file-level min/max zone maps (Iceberg/Delta manifests, parquet
  row-group stats) — certified as a LAW on real data rather than
  trusted: for every simulated file, the manifest interval, the kept
  /skipped verdict for a date-range predicate, the TRUE matching row
  count, and the no-false-prune certificate (a file with matches is
  NEVER skipped) are emitted side by side, with the false-positive
  case (kept but empty — the cost of coarse stats) kept visible. The
  predicate bounds are data-derived (global min + fixed day offsets)
  so every verdict branch fires at every SF.
- enc1: the layout decision parquet writers make per column —
  dictionary vs run-length friendliness — computed as exact per-file
  statistics under a declared physical sort: runs counted with one
  lag window PER (file, column) partition (never a global sort),
  distinct ratios globally, and the advisor verdicts as relative-
  threshold booleans so low-cardinality (dict), sorted-correlated
  (RLE), and high-cardinality (neither) columns all appear.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no storage-layout surface; these extend the layout/skipping family
(zo1, bk1/bk2, cp1, dpp1, sk2, dq4) with the manifest-pruning law and
the encoding-selection statistics that drive writer behavior at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# prn1: zone-map pruning with the no-false-prune certificate
# =========================================================================

_PRN1_SQL = """
WITH rows_ AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
), mind AS (
  SELECT MIN(d) AS d0 FROM rows_
), days_ AS (
  SELECT o_orderkey, d - (SELECT d0 FROM mind) AS day FROM rows_
), filed AS (
  SELECT day,
         CASE WHEN CAST('0x' || substr(md5('prn:' ||
                         CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
                   % 19 = 0
               AND (day < 150 OR day > 500)
              THEN -1 ELSE day // 60 END AS file_id
  FROM days_
), manifest AS (
  SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MIN(day) AS BIGINT) AS min_day,
         CAST(MAX(day) AS BIGINT) AS max_day,
         CAST(SUM(CASE WHEN day >= 200 AND day <= 400
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_match
  FROM filed GROUP BY file_id
)
SELECT file_id, n_rows, min_day, max_day, n_match,
       (min_day <= 400 AND max_day >= 200) AS kept,
       (n_match = 0 OR (min_day <= 400 AND max_day >= 200))
         AS no_false_prune,
       ((min_day <= 400 AND max_day >= 200) AND n_match = 0)
         AS kept_but_empty
FROM manifest
"""


@_register("prn1_manifest_pruning", _PRN1_SQL)
def prn1_manifest_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (manifest min/max) pruning certified per file: orders is
    sliced into simulated files and, for a day-range predicate
    [200, 400], each file's manifest entry (row count, min/max day) sits
    beside the keep/skip verdict, the TRUE number of matching rows
    inside the file, and the safety law `n_match > 0 ⇒ kept` — the
    property that makes stats-based skipping CORRECT, hash-checked on
    real data instead of assumed. The file layout makes EVERY branch
    fire at every SF: most files are 60-day ingestion buckets (time-
    correlated, so only buckets 3..6 are kept and the other ~35 are
    skipped), while a deterministic md5-selected slice of rows from
    OUTSIDE the predicate's day range lands in one simulated compaction
    file (-1) whose [min, max] interval brackets the whole span — kept
    by the stats, empty in truth: `kept_but_empty`, the false positive
    coarse 1-interval stats admit and the reason z-ordering (zo1)
    exists. Days are BIGINT offsets from the broadcast global min date,
    so the output dtypes are representation-skew-free. Plan shape: one
    combinable aggregate over a map-side file assignment; the 1-row min
    frame broadcasts; nothing global-sorts. At 100 TB the manifest is
    millions of rows, not billions — this exact query IS the planner's
    pruning step, runnable as a Spark job over the manifest table."""
    o = _t(spark, sf_dir, "orders")
    rows_ = o.select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    mind = rows_.agg(F.min("d").alias("d0"))
    days_ = rows_.crossJoin(F.broadcast(mind)).select(
        "o_orderkey", F.datediff("d", "d0").cast("bigint").alias("day")
    )
    h8 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("prn:"), F.col("o_orderkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    filed = days_.select(
        "day",
        F.when(
            (h8 % 19 == 0) & ((F.col("day") < 150) | (F.col("day") > 500)),
            F.lit(-1).cast("bigint"),
        )
        .otherwise((F.col("day") / 60).cast("bigint"))
        .alias("file_id"),
    )
    manifest = filed.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.sum(
            F.when((F.col("day") >= 200) & (F.col("day") <= 400), 1).otherwise(
                0
            )
        ).alias("n_match"),
    )
    kept = (F.col("min_day") <= 400) & (F.col("max_day") >= 200)
    return manifest.select(
        "file_id",
        "n_rows",
        "min_day",
        "max_day",
        "n_match",
        kept.alias("kept"),
        ((F.col("n_match") == 0) | kept).alias("no_false_prune"),
        (kept & (F.col("n_match") == 0)).alias("kept_but_empty"),
    )


# =========================================================================
# enc1: per-column dictionary/RLE encoding advisor under a declared sort
# =========================================================================

_ENC1_SQL = """
WITH base AS (
  SELECT l_orderkey // 4096 AS file_id,
         l_shipdate, l_orderkey, l_linenumber,
         CAST(l_returnflag AS VARCHAR) AS returnflag,
         CAST(l_linestatus AS VARCHAR) AS linestatus,
         CAST(l_partkey AS VARCHAR) AS partkey,
         substr(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), 1, 7) AS shipmonth
  FROM lineitem
), long_ AS (
  SELECT file_id, l_shipdate, l_orderkey, l_linenumber,
         col_name, val
  FROM base
  UNPIVOT (val FOR col_name IN (returnflag, linestatus, partkey, shipmonth))
), runs AS (
  SELECT file_id, col_name,
         CASE WHEN LAG(val) OVER (
                PARTITION BY file_id, col_name
                ORDER BY l_shipdate, l_orderkey, l_linenumber, val
              ) IS DISTINCT FROM val THEN 1 ELSE 0 END AS is_run_start
  FROM long_
)
SELECT col_name,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       (SELECT CAST(COUNT(DISTINCT val) AS BIGINT) FROM long_ l2
        WHERE l2.col_name = r.col_name) AS n_distinct,
       CAST(SUM(is_run_start) AS BIGINT) AS n_runs,
       CAST(COUNT(*) AS BIGINT)
         / CAST(SUM(is_run_start) AS BIGINT) AS avg_run_len,
       ((SELECT COUNT(DISTINCT val) FROM long_ l2
         WHERE l2.col_name = r.col_name) * 100 <= COUNT(*)) AS dict_friendly,
       (SUM(is_run_start) * 4 <= COUNT(*)) AS rle_friendly
FROM runs r
GROUP BY col_name
"""


@_register("enc1_encoding_stats", _ENC1_SQL)
def enc1_encoding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar encoding advisor: for three lineitem columns spanning
    the cardinality-and-order spectrum (l_returnflag ~3 values,
    l_linestatus ~2, l_partkey ~high, plus the ship MONTH — which
    under a time-ordered layout is perfectly sorted with ~30x-day run
    lengths, the RLE best case AT EVERY SF — day-grain runs go short
    once rows-per-day drops below 4 at sf0.001, the dp2 relative-
    threshold lesson), compute under the DECLARED physical layout sort
    (l_shipdate, l_orderkey, l_linenumber) the exact run count — one
    lag window per (file, column) partition, parallel per file, never
    a global sort — plus global distinct counts, average run length
    (one IEEE division of exact BIGINTs), and the two relative-
    threshold advisor verdicts writers act on: dictionary-friendly
    (distinct·100 ≤ n) and RLE-friendly (runs·4 ≤ n). The four columns
    guarantee both branches of both verdicts fire at every SF: shipmonth
    runs ≈ files × distinct months ≪ n (RLE-friendly), status
    flags correlate with ship date (tiny dictionaries) while
    partkey is effectively random (runs ≈ n, dictionary ≈ n). Runs are
    counted with IS DISTINCT FROM so the first row of each (file,
    column) partition starts a run identically in both engines. At
    100 TB this is the per-file stats pass a writer pipelines with the
    data scan; file_id bucketing keeps every window partition bounded
    by file size."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") / 4096).cast("bigint").alias("file_id"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").cast("string").alias("returnflag"),
        F.col("l_linestatus").cast("string").alias("linestatus"),
        F.col("l_partkey").cast("string").alias("partkey"),
        F.substring(
            F.col("l_shipdate").cast("date").cast("string"), 1, 7
        ).alias("shipmonth"),
    )
    long_ = base.unpivot(
        ["file_id", "l_shipdate", "l_orderkey", "l_linenumber"],
        ["returnflag", "linestatus", "partkey", "shipmonth"],
        "col_name",
        "val",
    )
    # val is the terminal tiebreak: the testdata plants duplicate
    # lineitem rows (the d-family's fixtures), so (shipdate, orderkey,
    # linenumber) alone is not unique and run counts would depend on
    # engine-specific tie order
    w = Window.partitionBy("file_id", "col_name").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "val"
    )
    runs = long_.withColumn(
        "is_run_start",
        F.when(
            ~F.lag("val").over(w).eqNullSafe(F.col("val")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    per_col = runs.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.countDistinct("val").alias("n_distinct"),
        F.sum("is_run_start").alias("n_runs"),
    )
    return per_col.select(
        "col_name",
        "n_values",
        "n_distinct",
        "n_runs",
        (F.col("n_values") / F.col("n_runs")).alias("avg_run_len"),
        (F.col("n_distinct") * 100 <= F.col("n_values")).alias(
            "dict_friendly"
        ),
        (F.col("n_runs") * 4 <= F.col("n_values")).alias("rle_friendly"),
    )
