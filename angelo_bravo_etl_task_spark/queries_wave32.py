"""Round-3 wave 32: causal uplift readout, exact Shapley attribution,
time-weighted averaging, and rendezvous-hash shard assignment.

- up1: treatment-vs-control conversion uplift per segment as exact
  rationals, plus the cumulative (Qini-style) curve over segments ranked
  by scaled uplift — causal marketing analytics without a single float.
- shap1: Shapley values computed EXACTLY by coalition enumeration for a
  3-feature scorer with an interaction term — 6x-scaled integers, with
  the efficiency identity (sum of phis == f(full) - f(empty)) carried as
  a verifiable column.
- twa1: time-weighted average value per user — the piecewise-constant
  integral in exact cent-microseconds over the observed span, the
  finance/monitoring metric a plain AVG silently fakes.
- rdv1: rendezvous (highest-random-weight) hashing — the shard
  assignment primitive behind consistent routing: md5 weights, argmax
  per key, and the 5-shard -> 6-shard migration matrix showing minimal
  movement (~1/6 of keys), the property the algorithm exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# up1: uplift by segment + cumulative curve
# =========================================================================

_UP1_SQL = """
WITH conv AS (
  SELECT c.c_custkey, c.c_mktsegment AS seg,
         c.c_custkey % 2 AS treat,
         CASE WHEN COUNT(o.o_orderkey) >= 2 THEN 1 ELSE 0 END AS converted
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
), seg AS (
  SELECT seg,
         CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treat = 1 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_t,
         CAST(SUM(CASE WHEN treat = 0 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_c
  FROM conv GROUP BY seg
), scored AS (
  SELECT seg, n_t, n_c, conv_t, conv_c,
         CAST((1000000 * (conv_t * n_c - conv_c * n_t))
              // (n_t * n_c) AS BIGINT) AS uplift_scaled
  FROM seg
)
SELECT seg, n_t, n_c, conv_t, conv_c, uplift_scaled,
       CAST(ROW_NUMBER() OVER (ORDER BY uplift_scaled DESC, seg) AS BIGINT)
         AS rank,
       CAST(SUM(conv_t) OVER w AS BIGINT) AS cum_conv_t,
       CAST(SUM(conv_c) OVER w AS BIGINT) AS cum_conv_c,
       CAST(SUM(n_t) OVER w AS BIGINT) AS cum_n_t,
       CAST(SUM(n_c) OVER w AS BIGINT) AS cum_n_c
FROM scored
WINDOW w AS (ORDER BY uplift_scaled DESC, seg
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@_register("up1_uplift_by_segment", _UP1_SQL)
def up1_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift modeling readout: per market segment, the difference in
    conversion rate (>= 2 orders) between the key-parity treatment split
    and control, as the exact rational (conv_t*n_c - conv_c*n_t)/
    (n_t*n_c) emitted in 1e6-scaled integer form; segments are then
    ranked by uplift and the cumulative treated/control conversions form
    the Qini-curve inputs (targeting the top-uplift segments first is
    the whole point of uplift modeling). One customer-grain conversion
    rollup, one 5-row segment aggregate, ranked windows over the tiny
    segment frame — the per-customer join is the only at-scale cost and
    it is FK-shaped."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    conv = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.when(F.count("o_orderkey") >= 2, 1).otherwise(0).alias(
                "converted"
            )
        )
        .select(
            "seg",
            (F.col("c_custkey") % 2).alias("treat"),
            "converted",
        )
    )
    seg = conv.groupBy("seg").agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("treat") == 1, F.col("converted")).otherwise(0))
        .alias("conv_t"),
        F.sum(F.when(F.col("treat") == 0, F.col("converted")).otherwise(0))
        .alias("conv_c"),
    )
    scored = seg.select(
        "seg",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            "CAST((1000000 * (conv_t * n_c - conv_c * n_t))"
            " div (n_t * n_c) AS BIGINT)"
        ).alias("uplift_scaled"),
    )
    order = Window.orderBy(F.col("uplift_scaled").desc(), "seg")
    wcum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return scored.select(
        "seg",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        "uplift_scaled",
        F.row_number().over(order).cast("bigint").alias("rank"),
        F.sum("conv_t").over(wcum).alias("cum_conv_t"),
        F.sum("conv_c").over(wcum).alias("cum_conv_c"),
        F.sum("n_t").over(wcum).alias("cum_n_t"),
        F.sum("n_c").over(wcum).alias("cum_n_c"),
    )


# =========================================================================
# shap1: exact Shapley values by coalition enumeration
# =========================================================================

_SHAP1_SQL = """
WITH feats AS (
  SELECT c_custkey,
         CAST(c_custkey % 2 AS BIGINT) AS a,
         CAST(c_nationkey % 2 AS BIGINT) AS b,
         CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) * 100 > 500000
              THEN 1 ELSE 0 END AS c
  FROM customer WHERE c_custkey < 100
), vals AS (
  SELECT c_custkey, a, b, c,
         0 AS f0,
         10 * a AS fa, 20 * b AS fb, 3 * c AS fc,
         10 * a + 20 * b + 5 * a * b AS fab,
         10 * a + 3 * c AS fac,
         20 * b + 3 * c AS fbc,
         10 * a + 20 * b + 5 * a * b + 3 * c AS fabc
  FROM feats
)
SELECT c_custkey, a, b, c,
       CAST(2 * (fa - f0) + (fab - fb) + (fac - fc) + 2 * (fabc - fbc)
            AS BIGINT) AS phi_a6,
       CAST(2 * (fb - f0) + (fab - fa) + (fbc - fc) + 2 * (fabc - fac)
            AS BIGINT) AS phi_b6,
       CAST(2 * (fc - f0) + (fac - fa) + (fbc - fb) + 2 * (fabc - fab)
            AS BIGINT) AS phi_c6,
       CAST(fabc AS BIGINT) AS f_full,
       (2 * (fa - f0) + (fab - fb) + (fac - fc) + 2 * (fabc - fbc)
        + 2 * (fb - f0) + (fab - fa) + (fbc - fc) + 2 * (fabc - fac)
        + 2 * (fc - f0) + (fac - fa) + (fbc - fb) + 2 * (fabc - fab)
        = 6 * (fabc - f0)) AS efficiency_ok
FROM vals
"""


@_register("shap1_exact_shapley", _SHAP1_SQL)
def shap1_exact_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley attribution computed EXACTLY: for a 3-feature scorer with
    an interaction term (f = 10a + 20b + 5ab + 3c), each row's Shapley
    values come from full coalition enumeration — for 3 players,
    6*phi_a = 2(f(a)-f(0)) + (f(ab)-f(b)) + (f(ac)-f(c)) +
    2(f(abc)-f(bc)) — emitted at 6x scale so everything stays integer.
    The efficiency axiom (phi_a+phi_b+phi_c = f(full)-f(empty)) rides
    along as a checkable column, true on every row. The interaction's
    credit splits between a and b — the behavior that distinguishes
    Shapley from per-feature deltas, visible exactly. Per-row narrow
    projection: the 8 coalition evaluations are expressions, no joins —
    at 100 TB this is how tabular explainability actually runs (small
    feature count, closed-form enumeration, map-side)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    feats = c.select(
        "c_custkey",
        (F.col("c_custkey") % 2).cast("bigint").alias("a"),
        (F.col("c_nationkey") % 2).cast("bigint").alias("b"),
        F.when(
            F.col("c_acctbal").cast("decimal(18,2)") * 100 > 500000, 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("c"),
    )
    a, b, cc = F.col("a"), F.col("b"), F.col("c")
    f0 = F.lit(0)
    fa, fb, fc = 10 * a, 20 * b, 3 * cc
    fab = 10 * a + 20 * b + 5 * a * b
    fac = 10 * a + 3 * cc
    fbc = 20 * b + 3 * cc
    fabc = 10 * a + 20 * b + 5 * a * b + 3 * cc
    phi_a6 = 2 * (fa - f0) + (fab - fb) + (fac - fc) + 2 * (fabc - fbc)
    phi_b6 = 2 * (fb - f0) + (fab - fa) + (fbc - fc) + 2 * (fabc - fac)
    phi_c6 = 2 * (fc - f0) + (fac - fa) + (fbc - fb) + 2 * (fabc - fab)
    return feats.select(
        "c_custkey",
        "a",
        "b",
        "c",
        phi_a6.cast("bigint").alias("phi_a6"),
        phi_b6.cast("bigint").alias("phi_b6"),
        phi_c6.cast("bigint").alias("phi_c6"),
        fabc.cast("bigint").alias("f_full"),
        ((phi_a6 + phi_b6 + phi_c6) == 6 * (fabc - f0)).alias(
            "efficiency_ok"
        ),
    )


# =========================================================================
# twa1: time-weighted average (piecewise-constant integral)
# =========================================================================

_TWA1_SQL = """
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,6)) * 100 AS DECIMAL(38,6)) AS cents
  FROM events
), seg AS (
  SELECT user_id, cents,
         LEAD(us) OVER (PARTITION BY user_id ORDER BY us, cents) - us
           AS dur_us
  FROM pts
  QUALIFY dur_us IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_us) AS BIGINT) AS span_us,
       CAST(CAST(SUM(cents * dur_us) AS DECIMAL(38,6)) AS VARCHAR)
         AS twa_num,
       CAST(CAST(SUM(CAST(cents AS DECIMAL(38,6))) AS DECIMAL(38,6))
            AS VARCHAR) AS plain_sum
FROM seg GROUP BY user_id
HAVING COUNT(*) >= 3
"""


@_register("twa1_time_weighted_avg", _TWA1_SQL)
def twa1_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's value holds
    until the next event, so the mean over TIME is the integral
    sum(value * duration) / span — computed as an exact DECIMAL
    numerator in cent-microseconds over the exact integer span, with
    the plain (event-weighted) sum alongside to expose the bias a naive
    AVG introduces when sampling is irregular (the TWAP / monitoring-
    gauge semantics). One LEAD window per user, combinable aggregates;
    duration ordering is pinned by the (us, cents) sort so timestamp
    ties cannot flip segment attribution."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        (F.col("value").cast("decimal(18,6)") * 100)
        .cast("decimal(38,6)")
        .alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "cents")
    seg = (
        pts.withColumn("nxt", F.lead("us").over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            "user_id",
            "cents",
            (F.col("nxt") - F.col("us")).alias("dur_us"),
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_us").alias("span_us"),
            # exact DECIMAL(38,6) released as its fixed-6-decimal string
            # on BOTH engines — DuckDB's pandas path degrades >18-digit
            # decimals to float64, losing a ULP at twa_num's 1e16
            # magnitudes (round-7 full-replica finding; dt1's fix).
            F.sum(F.col("cents") * F.col("dur_us"))
            .cast("decimal(38,6)")
            .cast("string")
            .alias("twa_num"),
            F.sum(F.col("cents").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .cast("string")
            .alias("plain_sum"),
        )
        .where(F.col("n_segments") >= 3)
    )


# =========================================================================
# rdv1: rendezvous hashing with migration matrix
# =========================================================================

_RDV1_SQL = """
WITH keys AS (
  SELECT p_partkey AS k FROM part
), w5 AS (
  SELECT k, s,
         CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#'
                                 || CAST(s AS VARCHAR)), 1, 8)
              AS BIGINT) AS wt
  FROM keys, (SELECT UNNEST(generate_series(0, 4)) AS s)
), a5 AS (
  SELECT k, s AS shard5 FROM (
    SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k
                                    ORDER BY wt DESC, s) AS rn
    FROM w5
  ) WHERE rn = 1
), w6 AS (
  SELECT k, s,
         CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#'
                                 || CAST(s AS VARCHAR)), 1, 8)
              AS BIGINT) AS wt
  FROM keys, (SELECT UNNEST(generate_series(0, 5)) AS s)
), a6 AS (
  SELECT k, s AS shard6 FROM (
    SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k
                                    ORDER BY wt DESC, s) AS rn
    FROM w6
  ) WHERE rn = 1
)
SELECT CAST(a5.shard5 AS BIGINT) AS shard5,
       CAST(a6.shard6 AS BIGINT) AS shard6,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       (a5.shard5 <> a6.shard6) AS moved
FROM a5 JOIN a6 ON a6.k = a5.k
GROUP BY a5.shard5, a6.shard6
"""


@_register("rdv1_rendezvous_hashing", _RDV1_SQL)
def rdv1_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing — the consistent shard
    assignment primitive: each key routes to the shard with the maximal
    md5(key#shard) weight, so adding a sixth shard moves ONLY the keys
    whose new shard wins (~1/6 of them) and every other assignment is
    untouched — the minimal-migration property that makes rebalancing a
    100 TB keyspace cheap, made visible as the 5-shard -> 6-shard
    migration matrix (off-diagonal cells are exactly the moves to the
    new shard; shard-to-shard churn between surviving shards is ZERO by
    construction). Per key: a 5/6-row shard spine explode + one argmax
    window — embarrassingly parallel, no cross-key communication."""
    keys = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))

    def assign(n_shards, out_name):
        weights = keys.select(
            "k", F.explode(F.expr(f"sequence(0, {n_shards - 1})")).alias("s")
        ).select(
            "k",
            "s",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("k").cast("string"),
                            F.lit("#"),
                            F.col("s").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("wt"),
        )
        w = Window.partitionBy("k").orderBy(F.col("wt").desc(), "s")
        return (
            weights.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("k", F.col("s").alias(out_name))
        )

    a5 = assign(5, "shard5")
    a6 = assign(6, "shard6")
    return (
        a5.join(a6, "k")
        .groupBy(
            F.col("shard5").cast("bigint").alias("shard5"),
            F.col("shard6").cast("bigint").alias("shard6"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.first(F.col("shard5") != F.col("shard6")).alias("moved"),
        )
        .select(
            "shard5",
            "shard6",
            "n_keys",
            (F.col("shard5") != F.col("shard6")).alias("moved"),
        )
    )
