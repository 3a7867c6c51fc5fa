"""Round-3 wave 46: DGIM window counting, Belady optimal caching.

- dgim1: the Datar-Gionis-Indyk-Motwani sliding-window bit-counting
  sketch — O(log^2 W) state, at most two exponentially-sized buckets
  per size, merge-two-oldest on overflow — replayed per user with the
  window estimate beside the exact count; the <=50% error guarantee is
  property-asserted. The oracle is a one-ACTION-per-row state machine
  (consume a bit OR perform one merge), the iso1 pattern at its
  hardest.
- opt1: Belady's OPT (evict the page needed farthest in the future) —
  the clairvoyant optimum lru1 is measured against; same trace, same
  capacity, and the property layer asserts opt_hits >= lru_hits for
  EVERY user (OPT's optimality, made checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# dgim1: DGIM sliding-window 1-counting sketch
# =========================================================================

_DGIM1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id,
         CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT) AS bit,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), packed AS (
  SELECT user_id, list(bit ORDER BY i) AS bits, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 10
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i,
         CAST([] AS STRUCT(t BIGINT, sz BIGINT)[]) AS st,
         bits, n, CAST(0 AS BIGINT) AS steps
  FROM packed
  UNION ALL
  SELECT user_id,
         CASE WHEN len(list_filter(st, b ->
                len(list_filter(st, b2 -> b2.sz = b.sz)) >= 3)) > 0
              THEN i ELSE i + 1 END,
         CASE WHEN len(list_filter(st, b ->
                len(list_filter(st, b2 -> b2.sz = b.sz)) >= 3)) > 0
              THEN list_sort(
                     list_filter(st, b -> NOT (
                       b.t = list_filter(st, x -> x.sz =
                         list_min(list_transform(list_filter(st, y ->
                           len(list_filter(st, y2 -> y2.sz = y.sz)) >= 3),
                           y -> y.sz)))[1].t
                       OR
                       b.t = list_filter(st, x -> x.sz =
                         list_min(list_transform(list_filter(st, y ->
                           len(list_filter(st, y2 -> y2.sz = y.sz)) >= 3),
                           y -> y.sz)))[2].t))
                     || [{'t': list_filter(st, x -> x.sz =
                            list_min(list_transform(list_filter(st, y ->
                              len(list_filter(st, y2 -> y2.sz = y.sz)) >= 3),
                              y -> y.sz)))[2].t,
                          'sz': 2 * list_min(list_transform(list_filter(st, y ->
                              len(list_filter(st, y2 -> y2.sz = y.sz)) >= 3),
                              y -> y.sz))}])
              WHEN bits[i + 1] = 1
              THEN list_sort(list_filter(st, b -> b.t > i + 1 - 16)
                             || [{'t': i + 1, 'sz': CAST(1 AS BIGINT)}])
              ELSE list_filter(st, b -> b.t > i + 1 - 16)
         END,
         bits, n, steps + 1
  FROM r
  WHERE steps < 3 * n + 3
    AND (len(list_filter(st, b ->
           len(list_filter(st, b2 -> b2.sz = b.sz)) >= 3)) > 0
         OR i < n)
), final AS (
  SELECT user_id, st, bits, n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY steps DESC) AS rn
  FROM r
), scored AS (
  SELECT user_id, n,
         CAST(len(st) AS BIGINT) AS n_buckets,
         CAST(CASE WHEN len(st) = 0 THEN 0
              ELSE 2 * coalesce(list_sum(list_transform(st[2:], b -> b.sz)), 0)
                   + st[1].sz END AS BIGINT) AS est_x2,
         CAST(list_sum(list_transform(range(0, 16), k ->
              CASE WHEN n - k >= 1 AND bits[n - k] = 1
                   THEN 1 ELSE 0 END)) AS BIGINT) AS true_ones,
         coalesce(array_to_string(list_transform(st, b ->
           CAST(b.t AS VARCHAR) || ':' || CAST(b.sz AS VARCHAR)), '/'), '')
           AS buckets
  FROM final WHERE rn = 1
)
SELECT user_id, n, n_buckets, est_x2, true_ones, buckets FROM scored
"""


@_register("dgim1_window_count_sketch", _DGIM1_SQL)
def dgim1_window_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DGIM sliding-window bit counting (clicks in each user's last 16
    positions of a 30-bit trace) in O(log^2 W) state: 1-bits become
    (timestamp, size-1) buckets; a third bucket of any size merges the
    two OLDEST into double size (timestamp = the newer's), cascading
    upward; buckets older than the window expire. The window estimate
    counts every bucket fully except the straddling oldest at half —
    emitted x2 to stay integer — beside the EXACT window count, with
    DGIM's <=50% guarantee asserted in the property layer. Spark folds
    (i, bit) with a bounded inner cascade loop (6 conditional merge
    iterations — window 16 caps sizes at 8); the oracle is a
    one-ACTION-per-row state machine (consume or merge, <=3n steps) —
    the iso1 pattern at its hardest, every bucket timestamp unique by
    construction so list_sort on (t, sz) is a total order. Completes
    the sketch family with its only WINDOWED member."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.when(F.col("event_type") == "click", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("bit"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_list(F.struct("i", "bit"))).alias("items"),
    ).where(F.col("n") >= 10)
    acc0 = F.expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, sz: BIGINT>>)")

    def viol_size(st):
        # smallest size with >= 3 buckets, NULL if none
        sizes = F.transform(st, lambda b: b["sz"])
        viol = F.filter(
            sizes,
            lambda x: F.size(F.filter(sizes, lambda y: y == x)) >= 3,
        )
        return F.array_min(viol)

    def merge_once(st):
        s = viol_size(st)
        two = F.filter(st, lambda b: b["sz"] == s)
        t1 = F.element_at(two, 1)["t"]
        t2 = F.element_at(two, 2)["t"]
        merged = F.struct(t2.alias("t"), (s * 2).alias("sz"))
        kept = F.filter(st, lambda b: (b["t"] != t1) & (b["t"] != t2))
        return F.array_sort(F.concat(kept, F.array(merged)))

    def step(st, it):
        i = it["i"]
        live = F.filter(st, lambda b: b["t"] > i - 16)
        appended = F.array_sort(
            F.concat(
                live,
                F.array(F.struct(i.alias("t"), F.lit(1).cast("bigint").alias("sz"))),
            )
        )
        base = F.when(it["bit"] == 1, appended).otherwise(live)
        # bounded cascade: window 16 caps bucket sizes at 8 -> <=6 merges
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(6)),
            base,
            lambda acc, _k: F.when(
                viol_size(acc).isNotNull(), merge_once(acc)
            ).otherwise(acc),
        )

    folded = packed.select(
        "user_id",
        "n",
        "items",
        F.aggregate("items", acc0, step).alias("st"),
    )
    return folded.select(
        "user_id",
        "n",
        F.size("st").cast("bigint").alias("n_buckets"),
        F.when(F.size("st") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            2
            * F.aggregate(
                F.slice("st", 2, F.greatest(F.size("st") - 1, F.lit(0))),
                F.lit(0).cast("bigint"),
                lambda a, b: a + b["sz"],
            )
            + F.element_at("st", 1)["sz"]
        )
        .cast("bigint")
        .alias("est_x2"),
        F.aggregate(
            F.filter(
                "items", lambda it: it["i"] > F.col("n") - 16
            ),
            F.lit(0).cast("bigint"),
            lambda a, it: a + it["bit"],
        ).alias("true_ones"),
        F.array_join(
            F.transform(
                "st",
                lambda b: F.concat(
                    b["t"].cast("string"), F.lit(":"), b["sz"].cast("string")
                ),
            ),
            "/",
        ).alias("buckets"),
    )


# =========================================================================
# opt1: Belady's optimal (clairvoyant) cache replacement
# =========================================================================

_OPT1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_type AS page,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), packed AS (
  SELECT user_id, list(page ORDER BY i) AS pages,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 10
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i, CAST([] AS VARCHAR[]) AS cache,
         CAST(0 AS BIGINT) AS hits, pages, n
  FROM packed
  UNION ALL
  SELECT user_id, i + 1,
         CASE WHEN list_contains(cache, pages[i + 1]) THEN cache
              WHEN len(cache) < 4 THEN list_sort(list_append(cache, pages[i + 1]))
              ELSE list_sort(list_append(
                     list_filter(cache, qq -> qq <>
                       list_sort(list_transform(cache, q2 ->
                         {'nu': CASE WHEN list_position(pages[i + 2:], q2) = 0
                                     THEN 1000
                                     ELSE list_position(pages[i + 2:], q2)
                                END,
                          'pg': q2}))[len(cache)].pg),
                     pages[i + 1]))
         END,
         hits + CASE WHEN list_contains(cache, pages[i + 1]) THEN 1 ELSE 0 END,
         pages, n
  FROM r WHERE i < n
), final AS (
  SELECT user_id, n, cache, hits,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, n, hits, array_to_string(cache, '/') AS cache_state
FROM final WHERE rn = 1
"""


@_register("opt1_belady_cache", _OPT1_SQL)
def opt1_belady_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Belady's OPT cache replacement over the SAME trace, capacity and
    hit rule as lru1 (each user's first-30 pages, capacity 4): on a
    miss with a full cache, evict the page whose NEXT use lies farthest
    in the future (never-again = +inf, ties by page name desc via the
    packed argmax) — the clairvoyant optimum that online policies are
    benchmarked against, computable here because the replay HAS the
    future (lookahead = list_position over the trace suffix). The
    property layer asserts opt_hits >= lru_hits for every user — OPT's
    optimality among demand-paging policies, as a checkable row-level
    fact. Cache is kept SORTED (eviction choice doesn't depend on
    recency order, unlike LRU), which keeps both engines' states
    identical."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("page"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "page"))),
            lambda st: st["page"],
        ).alias("pages"),
    ).where(F.col("n") >= 10)
    acc0 = F.expr(
        "named_struct('cache', CAST(array() AS ARRAY<STRING>),"
        " 'hits', CAST(0 AS BIGINT))"
    )

    def step(acc, it):
        i = it["i"]
        p = it["p"]
        cache = acc["cache"]
        hit = F.array_contains(cache, p)
        future = F.slice(
            F.col("pages"), (i + 1).cast("int"), F.lit(30)
        )
        scored = F.transform(
            cache,
            lambda q: F.struct(
                # array_position returns 0 (not NULL) when absent —
                # map it to the +inf sentinel DuckDB's NULL coalesces to
                F.when(
                    F.array_position(future, q) == 0,
                    F.lit(1000).cast("bigint"),
                )
                .otherwise(F.array_position(future, q).cast("bigint"))
                .alias("nu"),
                q.alias("q"),
            ),
        )
        victim = F.element_at(F.array_sort(scored), F.size(cache))["q"]
        evicted = F.array_sort(
            F.concat(
                F.filter(cache, lambda q: q != victim), F.array(p)
            )
        )
        new_cache = F.when(hit, cache).otherwise(
            F.when(
                F.size(cache) < 4,
                F.array_sort(F.concat(cache, F.array(p))),
            ).otherwise(evicted)
        )
        return F.struct(
            new_cache.alias("cache"),
            (acc["hits"] + F.when(hit, 1).otherwise(0)).alias("hits"),
        )

    items = packed.select(
        "user_id",
        "n",
        "pages",
        F.transform(
            F.col("pages"),
            lambda p, idx: F.struct(
                (idx + 1).cast("bigint").alias("i"), p.alias("p")
            ),
        ).alias("items"),
    )
    folded = items.select(
        "user_id",
        "n",
        F.aggregate("items", acc0, step).alias("m"),
    )
    return folded.select(
        "user_id",
        "n",
        F.col("m.hits").alias("hits"),
        F.array_join(F.col("m.cache"), "/").alias("cache_state"),
    )
