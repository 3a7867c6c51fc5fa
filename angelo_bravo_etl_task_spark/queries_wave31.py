"""Round-3 wave 31: interpolated percentiles pinned exactly, permutation
testing with deterministic relabeling, k-core graph peeling, and
cadence-based bot detection.

- qt4: PERCENTILE_CONT's linear interpolation carried out in 4x-scaled
  integer cents — the engines' built-in percentile_cont/quantile_cont
  differ in float paths; the arithmetic itself is exactly representable,
  so represent it.
- perm1: the permutation test as md5 relabelings; mean differences stay
  rational (cross-multiplied numerator/denominator pairs), the
  more-extreme count compares rationals by cross multiplication —
  resampling-based inference with zero randomness and zero floats
  (boot1's sibling for hypothesis testing).
- kc1: k-core decomposition by 3 unrolled peel rounds — each round one
  degree count over the surviving subgraph + one filter; the fixpoint
  discipline of d6/gr1 applied to vertex peeling.
- bot1: coefficient-of-variation regularity gate in cross-multiplied
  integers over per-user inter-event gaps, with 5 planted exact-hourly
  users so the bot branch fires at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# qt4: PERCENTILE_CONT exactly, in 4x-scaled integers
# =========================================================================

_QT4_SQL = """
WITH c AS (
  SELECT c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
), ranked AS (
  SELECT seg, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY seg
                                 ORDER BY cents, cents) AS BIGINT) AS rn
  FROM c
), sizes AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY seg
), wanted AS (
  SELECT s.seg, s.n, p.p,
         1 + ((s.n - 1) * p.p) // 4 AS lo_idx,
         ((s.n - 1) * p.p) % 4 AS frac4
  FROM sizes s, (SELECT UNNEST([1, 2, 3]) AS p) p
)
SELECT w.seg, CAST(w.p AS BIGINT) AS quartile, w.n,
       CAST(4 * lo.cents + w.frac4 * (COALESCE(hi.cents, lo.cents)
            - lo.cents) AS BIGINT) AS cont_num4
FROM wanted w
JOIN ranked lo ON lo.seg = w.seg AND lo.rn = w.lo_idx
LEFT JOIN ranked hi ON hi.seg = w.seg AND hi.rn = w.lo_idx + 1
"""


@_register("qt4_percentile_cont", _QT4_SQL)
def qt4_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT(p) for p in {0.25, 0.5, 0.75} computed EXACTLY:
    the interpolation position (n-1)*p has denominator 4, so the
    interpolated value 4*lo + frac4*(hi-lo) is an exact integer in
    quarter-cents — pinning the linear-interpolation semantics that the
    engines' float-path builtins (percentile_cont / quantile_cont)
    cannot be hash-compared on. Quartile positions are integer div/mod;
    the two bracketing order statistics come from equi-joins against the
    ranked frame (per-segment windows over the grouped values — the m1
    discipline); a LEFT join + COALESCE handles p landing exactly on the
    maximum (frac4 = 0 at the top index). Completes the quantile family:
    qt1 (type-1 discrete), qt2 (approx sketch), qt3 (weighted), hist2
    (equi-depth) — this is the interpolated variant analysts actually
    call."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    ranked = c.withColumn(
        "rn",
        F.row_number()
        .over(Window.partitionBy("seg").orderBy("cents"))
        .cast("bigint"),
    )
    sizes = c.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    wanted = sizes.select(
        "seg",
        "n",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("p"),
    ).select(
        "seg",
        "n",
        F.col("p").cast("bigint").alias("p"),
        (1 + F.expr("((n - 1) * p) div 4")).alias("lo_idx"),
        F.expr("((n - 1) * p) % 4").alias("frac4"),
    )
    lo = ranked.select(
        F.col("seg").alias("seg_lo"),
        F.col("rn").alias("rn_lo"),
        F.col("cents").alias("lo_cents"),
    )
    hi = ranked.select(
        F.col("seg").alias("seg_hi"),
        F.col("rn").alias("rn_hi"),
        F.col("cents").alias("hi_cents"),
    )
    return (
        wanted.join(
            lo,
            (F.col("seg") == F.col("seg_lo"))
            & (F.col("lo_idx") == F.col("rn_lo")),
        )
        .join(
            hi,
            (F.col("seg") == F.col("seg_hi"))
            & (F.col("lo_idx") + 1 == F.col("rn_hi")),
            "left",
        )
        .select(
            "seg",
            F.col("p").alias("quartile"),
            "n",
            (
                4 * F.col("lo_cents")
                + F.col("frac4")
                * (F.coalesce("hi_cents", "lo_cents") - F.col("lo_cents"))
            )
            .cast("bigint")
            .alias("cont_num4"),
        )
    )


# =========================================================================
# perm1: permutation test with deterministic md5 relabelings
# =========================================================================

_PERM1_SQL = """
WITH sample AS (
  SELECT c_custkey AS k,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           + CASE WHEN c_custkey % 2 = 0 THEN 500 ELSE 0 END AS cents
  FROM customer WHERE c_custkey < 500
), obs AS (
  SELECT CAST(SUM(CASE WHEN k % 2 = 0 THEN cents ELSE 0 END)
              * SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END)
              - SUM(CASE WHEN k % 2 = 1 THEN cents ELSE 0 END)
              * SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_num,
         CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)
              * SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_den,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM sample
), salted AS (
  SELECT s.salt,
         CAST(SUM(CASE WHEN grp = 0 THEN cents ELSE 0 END)
              * SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
              - SUM(CASE WHEN grp = 1 THEN cents ELSE 0 END)
              * SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_num,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
              * SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_den
  FROM (
    SELECT g.salt, sm.cents,
           CAST('0x' || substr(md5(CAST(g.salt AS VARCHAR) || '_'
                                   || CAST(sm.k AS VARCHAR)), 1, 8)
                AS BIGINT) % 2 AS grp
    FROM sample sm, (SELECT UNNEST(generate_series(1, 20)) AS salt) g
  ) s
  GROUP BY s.salt
)
SELECT o.n, o.d_num AS obs_num, o.d_den AS obs_den,
       CAST(20 AS BIGINT) AS n_salts,
       CAST(SUM(CASE WHEN ABS(st.d_num) * o.d_den
                          >= ABS(o.d_num) * st.d_den
                THEN 1 ELSE 0 END) AS BIGINT) AS n_more_extreme
FROM salted st CROSS JOIN obs o
GROUP BY o.n, o.d_num, o.d_den
"""


@_register("perm1_permutation_test", _PERM1_SQL)
def perm1_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test with DETERMINISTIC relabelings — boot1's sibling
    for hypothesis testing: the observed treatment effect (a planted
    +500-cent shift on even customer keys) is compared against 20
    md5-relabeled null assignments. Every mean difference stays an exact
    rational (d_num, d_den) = (sum_t*n_c - sum_c*n_t, n_t*n_c) — group
    sizes differ per relabeling, so 'more extreme' compares rationals by
    CROSS MULTIPLICATION, never by dividing. With the planted effect,
    n_more_extreme lands at 0 (p < 1/20); removing the CASE shift turns
    this into an A/A calibration where it distributes uniformly. One
    scan of the 20x-exploded sample (salt spine explode, no join), one
    group-by on salt, one 1-row observed scalar."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    sample = c.select(
        F.col("c_custkey").alias("k"),
        (
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
            + F.when(F.col("c_custkey") % 2 == 0, 500).otherwise(0)
        ).alias("cents"),
    )

    def diff_agg(df, grp_col):
        return df.agg(
            (
                F.sum(F.when(grp_col == 0, F.col("cents")).otherwise(0))
                * F.sum(F.when(grp_col == 1, 1).otherwise(0))
                - F.sum(F.when(grp_col == 1, F.col("cents")).otherwise(0))
                * F.sum(F.when(grp_col == 0, 1).otherwise(0))
            )
            .cast("bigint")
            .alias("d_num"),
            (
                F.sum(F.when(grp_col == 0, 1).otherwise(0))
                * F.sum(F.when(grp_col == 1, 1).otherwise(0))
            )
            .cast("bigint")
            .alias("d_den"),
            F.count(F.lit(1)).alias("n"),
        )

    obs = diff_agg(sample, F.col("k") % 2).select(
        F.col("d_num").alias("obs_num"),
        F.col("d_den").alias("obs_den"),
        "n",
    )
    exploded = sample.select(
        "k",
        "cents",
        F.explode(F.expr("sequence(1, 20)")).alias("salt"),
    ).select(
        "salt",
        "cents",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("salt").cast("string"),
                            F.lit("_"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("grp"),
    )
    salted = exploded.groupBy("salt").agg(
        (
            F.sum(F.when(F.col("grp") == 0, F.col("cents")).otherwise(0))
            * F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
            - F.sum(F.when(F.col("grp") == 1, F.col("cents")).otherwise(0))
            * F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        )
        .cast("bigint")
        .alias("d_num"),
        (
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
            * F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        )
        .cast("bigint")
        .alias("d_den"),
    )
    return (
        salted.crossJoin(F.broadcast(obs))
        .groupBy("n", "obs_num", "obs_den")
        .agg(
            F.lit(20).cast("bigint").alias("n_salts"),
            F.sum(
                F.when(
                    F.abs(F.col("d_num")) * F.col("obs_den")
                    >= F.abs(F.col("obs_num")) * F.col("d_den"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_more_extreme"),
        )
        .select("n", "obs_num", "obs_den", "n_salts", "n_more_extreme")
    )


# =========================================================================
# kc1: k-core decomposition by unrolled peeling rounds
# =========================================================================

_KC1_SQL = """
WITH raw AS (
  SELECT CAST('0x' || substr(md5('e' || CAST(event_id AS VARCHAR)), 1, 4)
              AS BIGINT) % 5000 AS u,
         CAST('0x' || substr(md5('v' || CAST(event_id AS VARCHAR)), 1, 4)
              AS BIGINT) % 5000 AS v
  FROM events
), ed AS (
  SELECT u, v FROM raw WHERE u <> v
  UNION
  SELECT v, u FROM raw WHERE u <> v
), a1 AS (
  SELECT u AS vertex FROM ed GROUP BY u HAVING COUNT(*) >= 5
), a2 AS (
  SELECT e.u AS vertex FROM ed e
  JOIN a1 x ON x.vertex = e.u JOIN a1 y ON y.vertex = e.v
  GROUP BY e.u HAVING COUNT(*) >= 5
), a3 AS (
  SELECT e.u AS vertex, CAST(COUNT(*) AS BIGINT) AS deg
  FROM ed e
  JOIN a2 x ON x.vertex = e.u JOIN a2 y ON y.vertex = e.v
  GROUP BY e.u HAVING COUNT(*) >= 5
)
SELECT vertex, deg FROM a3
"""


@_register("kc1_kcore_peel", _KC1_SQL)
def kc1_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=5) by iterative peeling: each round drops
    every vertex whose degree WITHIN the surviving subgraph is below k,
    shrinking toward the 5-core — the standard community-core / spam-
    cluster extraction. Three unrolled rounds (the gr1/d6 bounded-
    fixpoint discipline; an unbounded version checkpoints per round and
    stops when no vertex drops); each round is one degree aggregate over
    the survivor-filtered edge list — two semi-join-shaped equi-joins
    plus a combinable count, never anything quadratic. Output: the
    surviving vertices with their round-3 in-core degrees."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid")
    )

    def hx(prefix):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), F.col("eid"))), 1, 4),
            16,
            10,
        ).cast("bigint") % 5000

    raw = ev.select(hx("e").alias("u"), hx("v").alias("v")).where(
        F.col("u") != F.col("v")
    )
    edges = raw.unionAll(
        raw.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()

    alive = None
    deg_df = None
    for _ in range(3):
        e = edges
        if alive is not None:
            au = alive.select(F.col("vertex").alias("u"))
            av = alive.select(F.col("vertex").alias("v"))
            e = e.join(au, "u").join(av, "v")
        deg_df = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= 5)
        )
        alive = deg_df.select(F.col("u").alias("vertex"))
    return deg_df.select(
        F.col("u").alias("vertex"), F.col("deg").cast("bigint").alias("deg")
    )


# =========================================================================
# bot1: cadence-regularity bot detection with planted hourly users
# =========================================================================

_BOT1_SQL = """
WITH real_ev AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), planted AS (
  SELECT CAST(900000 + k AS BIGINT) AS user_id,
         CAST(1704067200000000 + i * 3600000000 AS BIGINT) AS us
  FROM (SELECT UNNEST(generate_series(1, 5)) AS k),
       (SELECT UNNEST(generate_series(0, 29)) AS i)
), allev AS (
  SELECT user_id, us FROM real_ev UNION ALL SELECT user_id, us FROM planted
), gaps AS (
  SELECT user_id,
         (us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, us))
           // 1000000 AS g
  FROM allev
  QUALIFY g IS NOT NULL
), stats AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(g) AS BIGINT) AS sum_gap_s,
         CAST(SUM(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0)) AS sum_g2
  FROM gaps GROUP BY user_id
  HAVING COUNT(*) >= 5
)
SELECT user_id, n_gaps, sum_gap_s,
       ((CAST(n_gaps AS DECIMAL(38,0)) * sum_g2
         - CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s) * 10000
        < CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s) AS is_bot
FROM stats
"""


@_register("bot1_cadence_regularity", _BOT1_SQL)
def bot1_cadence_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot detection by inter-event cadence regularity: a user whose gap
    coefficient of variation is under 1% (variance*n < (sum/100)^2,
    cross-multiplied in DECIMAL(38) — no division, no sqrt) is flagged.
    Five planted users with EXACT hourly cadence (variance zero) fire
    the bot branch at every SF while organic users' random gaps keep the
    human branch populated — the planting rule, applied to fraud
    detection. Gap extraction is one LAG window per user over integer
    seconds; the regularity stats are combinable (n, sum, sum-of-
    squares), so at 100 TB this is the sessionization shuffle plus a
    per-user constant-size reduction."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    planted = (
        spark.range(1, 6)
        .select(
            (900000 + F.col("id")).alias("user_id"),
            F.explode(F.expr("sequence(0, 29)")).alias("i"),
        )
        .select(
            "user_id",
            (F.lit(1704067200000000).cast("bigint")
             + F.col("i") * 3600000000).alias("us"),
        )
    )
    allev = ev.unionAll(planted)
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = (
        allev.withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "user_id",
            F.expr("(us - prev) div 1000000").alias("g"),
        )
    )
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("g").alias("sum_gap_s"),
            F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias(
                "sum_g2"
            ),
        )
        .where(F.col("n_gaps") >= 5)
    )
    n_d = F.col("n_gaps").cast("decimal(38,0)")
    s_d = F.col("sum_gap_s").cast("decimal(38,0)")
    return stats.select(
        "user_id",
        "n_gaps",
        "sum_gap_s",
        (
            (n_d * F.col("sum_g2") - s_d * F.col("sum_gap_s")) * 10000
            < s_d * F.col("sum_gap_s")
        ).alias("is_bot"),
    )
