r"""Round-8 wave 117: snapshot time travel (tt1) and group-median
imputation (fe8).

- tt1 completes the table-format story around prn1 (zone-map manifests),
  dv1 (deletion vectors), cp1 (compaction), gc1 (retention): MANIFEST
  VERSIONS are what make reads repeatable while the table evolves. Real
  files, real compaction: v1 lists {A, B}; then B is compacted into B'
  and C is appended; v2 lists {A, B', C}. Reading AS OF v1 from the
  same directory after the rewrite must return the original snapshot
  byte-for-byte — old files still on disk (gc1's retention window),
  old manifests still valid.
- fe8 fills the one missing feature-prep rung next to fe1 binning, fe6
  winsorizing, fe7 z-scoring: per-group exact-median imputation with a
  missing indicator, on deterministically planted nulls (both engines
  plant and impute identically).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

_TT1_SQL = """
WITH r AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM orders
), v1 AS (
  SELECT 1 AS version, COUNT(*) AS n_rows, SUM(price_c) AS sum_c
  FROM r WHERE o_orderkey % 5 <> 0
), v2 AS (
  SELECT 2 AS version, COUNT(*) AS n_rows, SUM(price_c) AS sum_c FROM r
)
SELECT CAST(version AS BIGINT) AS version,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(sum_c AS BIGINT) AS sum_c
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
"""


@_register("tt1_manifest_time_travel", _TT1_SQL)
def tt1_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over manifest versions with a REAL compaction between
    them. Commit 1 writes files A (keys%5 in {1,2}) and B (keys%5 in
    {3,4}) and manifest v1 = [A, B]. Then the table evolves: B is
    COMPACTED into B' (same rows, rewritten file) and C (keys%5 = 0) is
    appended; manifest v2 = [A, B', C]. Both reads go through their
    manifest's file list against the SAME directory: as-of v1 must
    reproduce the pre-compaction snapshot exactly (old files remain on
    disk inside gc1's retention window — deleting them early is
    precisely the failure gc1 guards against), as-of v2 sees the
    compacted + appended table. Per-version row counts and price mass
    ride the driver hash.

    100 TB shape: a snapshot read costs the manifest lookup plus the
    listed files — never a directory listing race (src13's problem
    class) and never blocked by writers: readers pin a version,
    compaction rewrites underneath, GC waits out the retention window.
    This is the core correctness contract of every snapshot-isolation
    table format."""
    o = _t(spark, sf_dir, "orders")
    price_c = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    r = o.select("o_orderkey", price_c.alias("price_c"))
    base = tempfile.mkdtemp(prefix="sg_tt1_")
    try:
        def _write(df: DataFrame, name: str) -> str:
            path = os.path.join(base, name)
            df.repartition(1).write.parquet(path)
            return name

        mod = F.col("o_orderkey") % 5
        f_a = _write(r.where(mod.isin(1, 2)), "A")
        f_b = _write(r.where(mod.isin(3, 4)), "B")
        with open(os.path.join(base, "_manifest-v1.json"), "w") as fh:
            json.dump({"version": 1, "files": [f_a, f_b]}, fh)
        # the table evolves: compaction rewrites B, commit 2 appends C
        f_b2 = _write(r.where(mod.isin(3, 4)), "B_compacted")
        f_c = _write(r.where(mod == 0), "C")
        with open(os.path.join(base, "_manifest-v2.json"), "w") as fh:
            json.dump({"version": 2, "files": [f_a, f_b2, f_c]}, fh)

        def _read_asof(version: int) -> DataFrame:
            with open(
                os.path.join(base, f"_manifest-v{version}.json")
            ) as fh:
                m = json.load(fh)
            paths = [os.path.join(base, f) for f in m["files"]]
            return spark.read.parquet(*paths)

        out = []
        for v in (1, 2):
            agg = _read_asof(v).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("price_c").alias("s"),
            ).collect()[0]
            out.append((v, int(agg["n"]), int(agg["s"])))
        # snapshot law: v1 after the rewrite equals the original commit
        truth1 = r.where(mod != 0).agg(
            F.count(F.lit(1)), F.sum("price_c")
        ).collect()[0]
        assert (out[0][1], out[0][2]) == (int(truth1[0]), int(truth1[1]))
        return local_rows_df(spark, 
            out, "version bigint, n_rows bigint, sum_c bigint"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


_FE8_SQL = """
WITH planted AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CASE WHEN (l_orderkey * 10 + l_linenumber) % 13 = 0 THEN NULL
              ELSE CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
         END AS qty_c
  FROM lineitem
), med AS (
  SELECT l_returnflag,
         CAST(FLOOR(median(qty_c)) AS BIGINT) AS group_median_c
  FROM planted WHERE qty_c IS NOT NULL GROUP BY l_returnflag
)
SELECT CAST(COALESCE(SUM(CASE WHEN p.qty_c IS NULL THEN 1 END), 0) AS BIGINT)
         AS n_imputed,
       CAST(SUM(COALESCE(p.qty_c, m.group_median_c)) AS BIGINT)
         AS imputed_sum_c,
       CAST(MIN(m.group_median_c) AS BIGINT) AS min_group_median_c,
       CAST(MAX(m.group_median_c) AS BIGINT) AS max_group_median_c,
       p.l_returnflag
FROM planted p JOIN med m ON p.l_returnflag = m.l_returnflag
GROUP BY p.l_returnflag
"""


@_register("fe8_group_median_impute", _FE8_SQL)
def fe8_group_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact-median imputation with planted missingness: nulls
    are planted deterministically ((10*key + line) % 13 — both engines
    plant identically), the per-group EXACT median of the surviving
    integer-cents values imputes them, and the released accounting
    (imputed count, post-imputation sum, median bounds per group) rides
    the hash. Exact median over an odd/even count of BIGINTs: Spark
    ``median`` and DuckDB ``median`` both interpolate midpoints — and
    because Spark CAST(double AS BIGINT) truncates while DuckDB rounds
    half-away-from-zero, an EXPLICIT FLOOR is applied on BOTH sides
    before the BIGINT cast so the law holds for any input distribution,
    not just the cents-are-multiples-of-100 fixture (ADVICE r8).

    100 TB shape: one aggregate for the medians (a sort-based exact
    percentile per group — the m1 shape), broadcast back over the
    fact rows as a small per-group frame; the imputation itself is a
    map. The missing-INDICATOR (n_imputed per group) is the feature
    most models actually need alongside the filled value."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = (
        F.col("l_quantity").cast("decimal(18,2)") * 100
    ).cast("bigint")
    planted = li.select(
        "l_returnflag",
        F.when(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")) % 13 == 0,
            F.lit(None).cast("bigint"),
        )
        .otherwise(qty_c)
        .alias("qty_c"),
    )
    med = (
        planted.where(F.col("qty_c").isNotNull())
        .groupBy("l_returnflag")
        .agg(
            F.floor(F.median("qty_c")).cast("bigint")
            .alias("group_median_c")
        )
    )
    return (
        planted.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("qty_c").isNull(), 1)), F.lit(0)
            ).cast("bigint").alias("n_imputed"),
            F.sum(F.coalesce(F.col("qty_c"), F.col("group_median_c")))
            .cast("bigint")
            .alias("imputed_sum_c"),
            F.min("group_median_c").cast("bigint").alias(
                "min_group_median_c"
            ),
            F.max("group_median_c").cast("bigint").alias(
                "max_group_median_c"
            ),
        )
        .select(
            "n_imputed",
            "imputed_sum_c",
            "min_group_median_c",
            "max_group_median_c",
            "l_returnflag",
        )
    )
