"""Round-3 wave 45: reservoir sampling, Kendall tau-b, Brier terms.

- res1: Algorithm-R reservoir sampling per user with md5 replacement
  indices — the fixed-memory uniform sample as a deterministic,
  replayable fold (the md5-for-rand discipline applied to the classic
  streaming sampler).
- kt1: Kendall tau-b rank correlation — rk1's (Spearman) sibling built
  from exact concordant/discordant/tie counts over a bounded customer
  slice; only the final tau touches doubles, via the IEEE-portable
  sqrt.
- brier1: per-bin Brier/Murphy terms in exact scaled integers — the
  calibration family's third member (cal3 measures, iso1 repairs,
  brier1 decomposes): reliability numerators, outcome/forecast sums and
  squares per decile, the REL − RES + UNC + WBV identity checked with
  Fractions in the property layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# res1: Algorithm-R reservoir sampling (deterministic md5 indices)
# =========================================================================

_RES1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, CAST(event_id AS VARCHAR) AS eid,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), packed AS (
  SELECT user_id, list(eid ORDER BY i) AS eids, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 10
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i, CAST([] AS VARCHAR[]) AS res,
         eids, n
  FROM packed
  UNION ALL
  SELECT user_id, i + 1,
         CASE WHEN i + 1 <= 5 THEN list_append(res, eids[i + 1])
              WHEN CAST('0x' || substr(md5('j' || eids[i + 1]), 1, 8)
                   AS BIGINT) % (i + 1) < 5
              THEN res[1:CAST(CAST('0x' || substr(md5('j' || eids[i + 1]), 1, 8)
                              AS BIGINT) % (i + 1) AS INTEGER)]
                   || [eids[i + 1]]
                   || res[CAST(CAST('0x' || substr(md5('j' || eids[i + 1]), 1, 8)
                               AS BIGINT) % (i + 1) AS INTEGER) + 2:]
              ELSE res END,
         eids, n
  FROM r WHERE i < n
), final AS (
  SELECT user_id, n, res,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, n, array_to_string(res, '/') AS reservoir
FROM final WHERE rn = 1
"""


@_register("res1_reservoir_sample", _RES1_SQL)
def res1_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algorithm-R reservoir sampling (k=5) over each user's first-30
    event stream, with the would-be-random replacement index j =
    md5(event) % i made deterministic — the md5-for-rand discipline
    (boot1/perm1/neg1) applied to the classic fixed-memory uniform
    sampler: item i replaces slot j iff j < k. The reservoir state is
    an ARRAY fold (positional replace via the (x, idx) index lambda);
    the oracle replays with list slicing in a recursive CTE. Emits the
    final reservoir verbatim, so the oracle checks every replacement
    decision. At 100 TB this is per-key parallel with O(k) state —
    and the same fold shape is exactly how per-key samples for data
    inspection are actually maintained."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_id").cast("string").alias("eid"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_list(F.struct("i", "eid"))).alias("items"),
    ).where(F.col("n") >= 10)
    acc0 = F.expr("CAST(array() AS ARRAY<STRING>)")

    def step(res, it):
        i = it["i"]
        eid = it["eid"]
        j = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("j"), eid)), 1, 8), 16, 10
            ).cast("bigint")
            % i
        )
        replaced = F.transform(
            res,
            lambda x, idx: F.when(idx.cast("bigint") == j, eid).otherwise(x),
        )
        return F.when(i <= 5, F.concat(res, F.array(eid))).otherwise(
            F.when(j < 5, replaced).otherwise(res)
        )

    folded = packed.select(
        "user_id",
        "n",
        F.aggregate("items", acc0, step).alias("res"),
    )
    return folded.select(
        "user_id", "n", F.array_join("res", "/").alias("reservoir")
    )


# =========================================================================
# kt1: Kendall tau-b (exact pair counts, portable-sqrt finish)
# =========================================================================

_KT1_SQL = """
WITH pts AS (
  SELECT c.c_custkey,
         CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey % 7 = 0
  GROUP BY 1, 2
), pairs AS (
  SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
), agg AS (
  SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS discordant,
         CAST(SUM(CASE WHEN xa = xb AND ya <> yb THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_x,
         CAST(SUM(CASE WHEN ya = yb AND xa <> xb THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_y,
         CAST(SUM(CASE WHEN xa = xb AND ya = yb THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_xy
  FROM pairs
)
SELECT n, concordant, discordant, ties_x, ties_y, ties_xy,
       concordant - discordant AS num,
       CAST((concordant + discordant + ties_x + ties_xy) AS BIGINT) AS den_x,
       CAST((concordant + discordant + ties_y + ties_xy) AS BIGINT) AS den_y,
       CAST(concordant - discordant AS DOUBLE)
         / sqrt(CAST((concordant + discordant + ties_x + ties_xy) AS DOUBLE)
                * CAST((concordant + discordant + ties_y + ties_xy) AS DOUBLE))
         AS tau_b
FROM agg
"""


@_register("kt1_kendall_tau", _KT1_SQL)
def kt1_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between customer account balance and their total
    order value (both exact cents), over the custkey % 7 slice: every
    pair classified concordant / discordant / tied-x / tied-y /
    tied-both by pure integer sign tests, tau-b's numerator and both
    denominator factors emitted as exact BIGINTs, and only the final
    statistic touching floating point — one division and one sqrt,
    both IEEE-portable (the fe7 lesson). rk1 gave Spearman; tau-b is
    the tie-aware sibling rank metric. The pair join is bounded by the
    key slice (the relational O(m²) oracle-demo shape — at scale you
    sample or bucket first, exactly as rk1 notes)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    o = _t(spark, sf_dir, "orders")
    pts = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("x"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("y")
        )
    )
    a = pts.alias("a")
    b = pts.alias("b")
    pairs = a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey")).select(
        F.col("a.x").alias("xa"),
        F.col("a.y").alias("ya"),
        F.col("b.x").alias("xb"),
        F.col("b.y").alias("yb"),
    )
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    agg = pairs.agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("bigint").alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("bigint").alias("discordant"),
        F.sum(
            F.when((F.col("xa") == F.col("xb")) & (F.col("ya") != F.col("yb")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("ties_x"),
        F.sum(
            F.when((F.col("ya") == F.col("yb")) & (F.col("xa") != F.col("xb")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("ties_y"),
        F.sum(
            F.when((F.col("xa") == F.col("xb")) & (F.col("ya") == F.col("yb")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("ties_xy"),
    ).crossJoin(pts.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    den_x = (
        F.col("concordant") + F.col("discordant") + F.col("ties_x") + F.col("ties_xy")
    ).cast("bigint")
    den_y = (
        F.col("concordant") + F.col("discordant") + F.col("ties_y") + F.col("ties_xy")
    ).cast("bigint")
    return agg.select(
        "n",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        "ties_xy",
        (F.col("concordant") - F.col("discordant")).alias("num"),
        den_x.alias("den_x"),
        den_y.alias("den_y"),
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.sqrt(den_x.cast("double") * den_y.cast("double"))
        ).alias("tau_b"),
    )


# =========================================================================
# brier1: per-bin Brier/Murphy terms in exact scaled integers
# =========================================================================

_BRIER1_SQL = """
WITH scored AS (
  SELECT CAST(CAST('0x' || substr(md5('p' || CAST(c_custkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS BIGINT) AS f,
         CAST(CASE WHEN (c_custkey % 2 = 0) = (c_custkey % 3 = 0)
              THEN 1 ELSE 0 END AS BIGINT) AS o
  FROM customer
)
SELECT CAST(f // 10 AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(f) AS BIGINT) AS sum_f,
       CAST(SUM(o) AS BIGINT) AS sum_o,
       CAST(SUM(f * f) AS BIGINT) AS sum_f2,
       CAST(SUM(f * o) AS BIGINT) AS sum_fo,
       CAST(SUM((f - 100 * o) * (f - 100 * o)) AS BIGINT) AS brier_num_x1e4,
       CAST((SUM(f) - 100 * SUM(o)) * (SUM(f) - 100 * SUM(o)) AS BIGINT)
         AS rel_num_x1e4
FROM scored GROUP BY 1
"""


@_register("brier1_murphy_terms", _BRIER1_SQL)
def brier1_murphy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile Brier-score terms for the cal3 scorer, every quantity
    an exact integer in 1e-4 (percent-squared) units: the bin's Brier
    numerator sum((f-100o)^2), the reliability numerator
    (sum_f - 100 sum_o)^2 (over denominator n), plus the raw sums and
    the forecast second moment that the Murphy decomposition needs —
    the property layer assembles the GENERALIZED identity Brier =
    REL - RES + UNC + within-bin forecast variance - 2 x within-bin
    forecast-outcome covariance exactly with Fractions (the covariance
    term exists precisely because forecasts vary inside a decile —
    the textbook three-term Murphy form assumes they don't). Completes the calibration
    family: cal3 measures the gap, iso1 repairs it, brier1 decomposes
    the loss into calibration vs resolution. One combinable binned
    aggregate over the scored scan."""
    c = _t(spark, sf_dir, "customer")
    scored = c.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("p"), F.col("c_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        ).alias("f"),
        F.when(
            (F.col("c_custkey") % 2 == 0) == (F.col("c_custkey") % 3 == 0), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("o"),
    )
    g = scored.groupBy(
        F.expr("f div 10").cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("f").cast("bigint").alias("sum_f"),
        F.sum("o").cast("bigint").alias("sum_o"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("sum_f2"),
        F.sum(F.col("f") * F.col("o")).cast("bigint").alias("sum_fo"),
        F.sum(
            (F.col("f") - 100 * F.col("o")) * (F.col("f") - 100 * F.col("o"))
        )
        .cast("bigint")
        .alias("brier_num_x1e4"),
    )
    return g.select(
        "bin",
        "n",
        "sum_f",
        "sum_o",
        "sum_f2",
        "sum_fo",
        "brier_num_x1e4",
        (
            (F.col("sum_f") - 100 * F.col("sum_o"))
            * (F.col("sum_f") - 100 * F.col("sum_o"))
        )
        .cast("bigint")
        .alias("rel_num_x1e4"),
    )
