r"""Round-5 wave 94: salted two-phase aggregation equality, md5-coin
uniformity audit.

- salt1: the skew-mitigation EVERY hot-key aggregate needs — shard the
  key with a salt, aggregate partials per (key, salt), re-aggregate —
  certified correct by running BOTH phases and the direct aggregate in
  one query and emitting their per-key equality as a column: the
  associativity/commutativity of (SUM, COUNT) is exactly what makes
  the rewrite safe (stats4's mergeable-moments argument applied to the
  salting rewrite sk1 uses for joins). Money stays exact DECIMAL
  through both routes, so equality is bit-level, not approximate.
- rng1: the registry's reproducibility backbone is deterministic md5
  coins (rsv1, spl1, aug1, gc1, d10, wt1 …); rng1 AUDITS that backbone
  by binning the md5 field over the corpus's doc ids into 16 buckets
  and emitting the exact chi-square numerator (integer) with a
  deterministic generous bound — uniform-enough-to-use, measured
  rather than assumed, per bucket and overall.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no scale-mitigation surface; salt1 completes the skew family (sk1
salted join, sk2 profile, AQE plan tests) with the aggregation-side
rewrite, and rng1 closes the loop on the md5-determinism discipline
the round's sampling/splitting queries rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# salt1: (key, salt) partials re-aggregated == direct, certified
# =========================================================================

_SALT1_SQL = """
WITH direct AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_direct,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS sum_direct
  FROM lineitem GROUP BY l_returnflag
), partials AS (
  SELECT l_returnflag, l_orderkey % 16 AS salt,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS s
  FROM lineitem GROUP BY l_returnflag, l_orderkey % 16
), merged AS (
  SELECT l_returnflag,
         CAST(SUM(n) AS BIGINT) AS n_merged,
         CAST(SUM(s) AS DECIMAL(28,2)) AS sum_merged,
         CAST(COUNT(*) AS BIGINT) AS n_salts
  FROM partials GROUP BY l_returnflag
)
SELECT d.l_returnflag, d.n_direct, m.n_merged, m.n_salts,
       CAST(d.sum_direct AS DOUBLE) AS sum_direct,
       CAST(m.sum_merged AS DOUBLE) AS sum_merged,
       (d.n_direct = m.n_merged AND d.sum_direct = m.sum_merged)
         AS two_phase_equal_ok,
       (m.n_salts <= 16) AS salt_bound_ok
FROM direct d JOIN merged m ON m.l_returnflag = d.l_returnflag
"""


@_register("salt1_two_phase_agg", _SALT1_SQL)
def salt1_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-aggregation rewrite, certified instead of assumed:
    the hot-key aggregate (revenue and count per return flag — 3 keys
    over the whole corpus, the textbook skew shape) runs BOTH as a
    direct groupBy and as the two-phase form — partials per (key,
    salt = orderkey mod 16), then a 48-row re-aggregation — and the
    per-key equality of the two routes is a column. The law holds
    because (SUM, COUNT) is a commutative monoid (stats4's mergeable
    argument); money flows through exact DECIMAL on both routes, so
    `two_phase_equal_ok` is bit-level equality, and the terminal
    DOUBLE cast happens only at the output edge. At 100 TB the first
    phase spreads each hot key over 16 reducers and the second phase
    touches keys×16 rows — the rewrite sk1 applies to joins, stated
    here for aggregation with its correctness certificate."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    direct = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_direct"),
        F.sum(price).cast("decimal(28,2)").alias("sum_direct_d"),
    )
    partials = li.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 16).alias("salt")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(price).cast("decimal(28,2)").alias("s"),
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.sum("n").cast("bigint").alias("n_merged"),
        F.sum("s").cast("decimal(28,2)").alias("sum_merged_d"),
        F.count(F.lit(1)).cast("bigint").alias("n_salts"),
    )
    return direct.join(merged, "l_returnflag").select(
        "l_returnflag",
        "n_direct",
        "n_merged",
        "n_salts",
        F.col("sum_direct_d").cast("double").alias("sum_direct"),
        F.col("sum_merged_d").cast("double").alias("sum_merged"),
        (
            (F.col("n_direct") == F.col("n_merged"))
            & (F.col("sum_direct_d") == F.col("sum_merged_d"))
        ).alias("two_phase_equal_ok"),
        (F.col("n_salts") <= 16).alias("salt_bound_ok"),
    )


# =========================================================================
# rng1: uniformity audit of the registry's md5 coin
# =========================================================================

_RNG1_SQL = """
WITH coins AS (
  SELECT CAST('0x' || substr(md5('rng:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 16 AS bucket
  FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM coins
), cells AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS o FROM coins GROUP BY bucket
), chi AS (
  SELECT CAST(SUM((16 * c.o - t.n) * (16 * c.o - t.n)) AS BIGINT)
           AS chi2_num
  FROM cells c CROSS JOIN tot t
)
SELECT c.bucket, c.o, t.n,
       CAST(16 * c.o - t.n AS BIGINT) AS dev_num,
       (ABS(16 * c.o - t.n) <= t.n) AS bucket_dev_ok,
       chi.chi2_num,
       (chi.chi2_num <= 2 * t.n * t.n) AS chi2_bound_ok
FROM cells c CROSS JOIN tot t CROSS JOIN chi
"""

@_register("rng1_md5_uniformity", _RNG1_SQL)
def rng1_md5_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniformity audit of the md5 coin the registry's entire
    reproducibility discipline stands on (rsv1's priorities, spl1's
    splits, aug1's dropout, gc1's manifest, d10's signatures): doc ids
    hash into 16 buckets, and the deviations are certified in EXACT
    integers — per bucket, dev = 16·o − n (zero iff perfectly uniform)
    with |dev| ≤ n (each bucket within ±100% of its fair share —
    ≈5-6σ at every SF, loose enough to survive driver regenerations,
    tight enough that catastrophic skew falsifies it), and globally
    the exact chi-square numerator Σ(16·o − n)² against 2n² (expected
    value ≈ 240·n, so the bound holds with enormous margin for n ≥
    500 while scaling with the corpus).
    These are MEASUREMENTS with margins wide enough to hold at every
    SF under any driver regeneration — md5-uniformity failing them
    would poison every sampling query upstream, which is exactly why
    the audit exists. One map-side hash + one 16-cell aggregate."""
    d = _t(spark, sf_dir, "documents")
    h8 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("rng:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    coins = d.select((h8 % 16).alias("bucket"))
    tot = coins.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cells = coins.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    chi = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (16 * F.col("o") - F.col("n"))
                * (16 * F.col("o") - F.col("n"))
            )
            .cast("bigint")
            .alias("chi2_num")
        )
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "bucket",
            "o",
            "n",
            (16 * F.col("o") - F.col("n")).cast("bigint").alias("dev_num"),
            (F.abs(16 * F.col("o") - F.col("n")) <= F.col("n")).alias(
                "bucket_dev_ok"
            ),
            "chi2_num",
            (F.col("chi2_num") <= 2 * F.col("n") * F.col("n")).alias(
                "chi2_bound_ok"
            ),
        )
    )
