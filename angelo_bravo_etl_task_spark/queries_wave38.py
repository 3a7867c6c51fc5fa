"""Round-3 wave 38: cache-policy simulation and probability calibration.

- lru1: LRU cache replay — the eighth sequential-fold member, and the
  first with LIST-valued state: the cache's content after access t
  depends on the full access order (hits reorder, misses evict), so the
  fold carries (cache array, hit count) per user; the oracle replays the
  identical policy as a recursive CTE over DuckDB lists.
- cal3: reliability-diagram bins + expected calibration error — ev1's
  probabilistic sibling: md5-derived percent scores against a
  deterministic outcome rule, binned into deciles with every quantity an
  exact integer (ECE as a scaled numerator over an explicit
  denominator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# lru1: LRU cache replay (list-state sequential fold)
# =========================================================================

_LRU1_SQL = """
WITH RECURSIVE acc AS (
  SELECT user_id, event_type AS page, epoch_us(ts) AS us, event_id
  FROM events
), seq AS (
  SELECT user_id, page,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) AS BIGINT) AS i
  FROM acc
  QUALIFY i <= 30
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i,
         CAST([] AS VARCHAR[]) AS cache, CAST(0 AS BIGINT) AS hits
  FROM (SELECT DISTINCT user_id FROM seq)
  UNION ALL
  SELECT s.user_id, s.i,
         CASE WHEN list_contains(r.cache, s.page)
              THEN list_prepend(s.page,
                     list_filter(r.cache, y -> y <> s.page))
              ELSE list_prepend(s.page, r.cache[1:3])
         END,
         r.hits + CASE WHEN list_contains(r.cache, s.page)
                       THEN 1 ELSE 0 END
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
), final AS (
  SELECT user_id, i, cache, hits,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, CAST(i AS BIGINT) AS n_accesses, hits,
       array_to_string(cache, '/') AS cache_state
FROM final WHERE rn = 1 AND i >= 10
"""


@_register("lru1_cache_replay", _LRU1_SQL)
def lru1_cache_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LRU cache simulation replayed over each user's first 30 accesses
    (pages = event types, capacity 4): a hit moves the page to the
    front, a miss prepends it and evicts the least-recently-used — state
    that every prior access reshapes, the sequential-fold family's first
    LIST-state member. Spark runs ONE F.aggregate per user with a
    (cache array, hits) struct accumulator over the sorted access
    array; the oracle replays the identical policy as a recursive CTE
    over DuckDB lists (list_prepend/list_filter/list slicing). The
    final cache is emitted as a '/'-joined string (portable list
    rendering). This is how cache/eviction policies are actually
    evaluated before deployment — replay against logged traces; at
    100 TB the replay is per-key parallel with bounded per-key state."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = (
        ev.select(
            "user_id",
            F.col("event_type").alias("page"),
            F.row_number().over(w).cast("bigint").alias("i"),
        )
        .where(F.col("i") <= 30)
    )
    series = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_accesses"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "page"))),
            lambda st: st["page"],
        ).alias("pages"),
    ).where(F.col("n_accesses") >= 10)
    acc0 = F.expr(
        "named_struct('cache', CAST(array() AS ARRAY<STRING>),"
        " 'hits', CAST(0 AS BIGINT))"
    )

    def step(acc, page):
        hit = F.array_contains(acc["cache"], page)
        new_cache = F.when(
            hit,
            F.concat(
                F.array(page),
                F.filter(acc["cache"], lambda y: y != page),
            ),
        ).otherwise(
            F.concat(F.array(page), F.slice(acc["cache"], 1, 3))
        )
        return F.struct(
            new_cache.alias("cache"),
            (acc["hits"] + F.when(hit, 1).otherwise(0)).alias("hits"),
        )

    folded = series.select(
        "user_id",
        "n_accesses",
        F.aggregate("pages", acc0, step).alias("m"),
    )
    return folded.select(
        "user_id",
        "n_accesses",
        F.col("m.hits").alias("hits"),
        F.array_join(F.col("m.cache"), "/").alias("cache_state"),
    )


# =========================================================================
# cal3: reliability bins + expected calibration error
# =========================================================================

_CAL3_SQL = """
WITH scored AS (
  SELECT c_custkey,
         CAST('0x' || substr(md5('p' || CAST(c_custkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS pred_pct,
         CASE WHEN (c_custkey % 2 = 0) = (c_custkey % 3 = 0)
              THEN 1 ELSE 0 END AS outcome
  FROM customer
), binned AS (
  SELECT pred_pct // 10 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pred_pct) AS BIGINT) AS sum_pred_pct,
         CAST(SUM(outcome) AS BIGINT) AS n_pos
  FROM scored GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, n, sum_pred_pct, n_pos,
       CAST(ABS(sum_pred_pct - 100 * n_pos) AS BIGINT) AS gap_num_x100,
       CAST(100 * n AS BIGINT) AS gap_den_x100
FROM binned
"""


@_register("cal3_reliability_bins", _CAL3_SQL)
def cal3_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-calibration audit (ev1's probabilistic sibling):
    md5-derived percent scores vs a deterministic outcome rule, binned
    into score deciles; each bin reports its count, summed predicted
    percent, positives, and the calibration gap |sum_pred - 100*pos| as
    an exact 100x-scaled numerator over its explicit denominator — the
    reliability-diagram row, and the bin terms ECE sums (weighted by
    n/total, still rational). The uncalibrated random scorer shows
    large gaps against the ~constant base rate — exactly what this
    audit exists to catch. One binned combinable aggregate over the
    scored scan."""
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
        ).alias("pred_pct"),
        F.when(
            (F.col("c_custkey") % 2 == 0) == (F.col("c_custkey") % 3 == 0),
            1,
        )
        .otherwise(0)
        .alias("outcome"),
    )
    binned = scored.groupBy(
        F.expr("pred_pct div 10").cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pred_pct").alias("sum_pred_pct"),
        F.sum("outcome").alias("n_pos"),
    )
    return binned.select(
        "bin",
        "n",
        "sum_pred_pct",
        "n_pos",
        F.abs(F.col("sum_pred_pct") - 100 * F.col("n_pos"))
        .cast("bigint")
        .alias("gap_num_x100"),
        (100 * F.col("n")).cast("bigint").alias("gap_den_x100"),
    )
