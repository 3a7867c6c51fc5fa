"""Round-3 wave 47: LFU cache, monotonic-deque window max, BH FDR.

- lfu1: LFU cache replay — completes the cache-policy triptych (lru1
  online recency, lfu1 online frequency, opt1 offline optimal) on the
  identical trace/capacity, so the three hit counts are directly
  comparable per user.
- mdq1: sliding-window max via the monotonic deque — the O(n)
  algorithm whose ORACLE is a plain declarative window MAX: the same
  answer from two completely different computations (algorithmic fold
  vs relational frame), the strongest kind of cross-check.
- bh1: Benjamini-Hochberg FDR control over md5-derived p-values in
  exact 1e-4 units — the step-up cutoff found by cross-multiplied
  integer comparisons, no float thresholds anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# lfu1: LFU cache replay (frequency eviction, page tiebreak)
# =========================================================================

_LFU1_SQL = """
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
  SELECT user_id, CAST(0 AS BIGINT) AS i,
         CAST([] AS STRUCT(c BIGINT, pg VARCHAR)[]) AS st,
         CAST(0 AS BIGINT) AS hits, pages, n
  FROM packed
  UNION ALL
  SELECT user_id, i + 1,
         CASE WHEN len(list_filter(st, e -> e.pg = pages[i + 1])) > 0
              THEN list_sort(list_transform(st, e ->
                     {'c': e.c + CASE WHEN e.pg = pages[i + 1]
                                      THEN 1 ELSE 0 END,
                      'pg': e.pg}))
              WHEN len(st) < 4
              THEN list_sort(list_append(st,
                     {'c': CAST(1 AS BIGINT), 'pg': pages[i + 1]}))
              ELSE list_sort(list_append(st[2:],
                     {'c': CAST(1 AS BIGINT), 'pg': pages[i + 1]}))
         END,
         hits + CASE WHEN len(list_filter(st, e -> e.pg = pages[i + 1])) > 0
                     THEN 1 ELSE 0 END,
         pages, n
  FROM r WHERE i < n
), final AS (
  SELECT user_id, n, st, hits,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, n, hits,
       coalesce(array_to_string(list_transform(st, e ->
         e.pg || ':' || CAST(e.c AS VARCHAR)), '/'), '') AS freq_state
FROM final WHERE rn = 1
"""


@_register("lfu1_cache_replay", _LFU1_SQL)
def lfu1_cache_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LFU cache replay on the identical trace, capacity and hit rule
    as lru1/opt1 (first-30 pages, capacity 4): a hit bumps the page's
    frequency; a miss on a full cache evicts the (lowest count, then
    lexicographically smallest page) entry — the state is kept SORTED
    by (count, page) so eviction is just dropping the head, and the
    deterministic tiebreak is the sort order itself. Completes the
    cache-policy triptych: lru1 (online, recency), lfu1 (online,
    frequency), opt1 (offline optimal) — three hit counts per user,
    directly comparable, with opt1 >= both asserted in the property
    layer. Emits the final (page:count) table verbatim."""
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
        "named_struct('st', CAST(array() AS ARRAY<STRUCT<c: BIGINT,"
        " pg: STRING>>), 'hits', CAST(0 AS BIGINT))"
    )

    def step(acc, page):
        st = acc["st"]
        hit = F.exists(st, lambda e: e["pg"] == page)
        bumped = F.array_sort(
            F.transform(
                st,
                lambda e: F.struct(
                    (e["c"] + F.when(e["pg"] == page, 1).otherwise(0)).alias(
                        "c"
                    ),
                    e["pg"].alias("pg"),
                ),
            )
        )
        newcomer = F.struct(
            F.lit(1).cast("bigint").alias("c"), page.alias("pg")
        )
        inserted = F.array_sort(F.concat(st, F.array(newcomer)))
        evicted = F.array_sort(
            F.concat(
                F.slice(st, 2, F.size(st) - 1), F.array(newcomer)
            )
        )
        new_st = F.when(hit, bumped).otherwise(
            F.when(F.size(st) < 4, inserted).otherwise(evicted)
        )
        return F.struct(
            new_st.alias("st"),
            (acc["hits"] + F.when(hit, 1).otherwise(0)).alias("hits"),
        )

    folded = packed.select(
        "user_id",
        "n",
        F.aggregate("pages", acc0, step).alias("m"),
    )
    return folded.select(
        "user_id",
        "n",
        F.col("m.hits").alias("hits"),
        F.array_join(
            F.transform(
                F.col("m.st"),
                lambda e: F.concat(
                    e["pg"], F.lit(":"), e["c"].cast("string")
                ),
            ),
            "/",
        ).alias("freq_state"),
    )


# =========================================================================
# mdq1: sliding-window max via monotonic deque (oracle = window MAX)
# =========================================================================

_MDQ1_SQL = """
WITH seq AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5('v' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS BIGINT) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
)
SELECT user_id, i,
       CAST(MAX(v) OVER (PARTITION BY user_id ORDER BY i
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS win_max
FROM seq
QUALIFY i >= 5
"""


@_register("mdq1_monotonic_deque", _MDQ1_SQL)
def mdq1_monotonic_deque(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window maximum (window 5) computed by the MONOTONIC
    DEQUE — the O(n) streaming algorithm: pop the back while it's <=
    the incoming value, drop the front once it leaves the window, the
    front IS the max — folded per user over the lis1 value trace with
    the deque and the emitted (i, max) trail as state. The oracle is a
    plain declarative `MAX() OVER (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW)`: the same answer from two completely different
    computations (algorithmic fold vs relational frame) is the
    strongest cross-check in the registry — any deque bug diverges
    immediately. The deque holds at most 5 entries, the per-key state
    bound that makes this THE shape for streaming window maxima at
    100 TB (w6's frame needs the whole window buffered; the deque
    doesn't)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("v"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000
        ).alias("v"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    packed = seq.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("i", "v"))).alias("items")
    )
    acc0 = F.expr(
        "named_struct("
        "'dq', CAST(array() AS ARRAY<STRUCT<i: BIGINT, v: BIGINT>>),"
        "'outs', CAST(array() AS ARRAY<STRUCT<i: BIGINT, mx: BIGINT>>))"
    )

    def step(acc, it):
        i = it["i"]
        v = it["v"]
        # pop back while back.v <= v, then push; drop expired fronts
        kept = F.filter(
            acc["dq"], lambda e: (e["v"] > v) & (e["i"] > i - 5)
        )
        dq = F.concat(
            kept, F.array(F.struct(i.alias("i"), v.alias("v")))
        )
        mx = F.element_at(dq, 1)["v"]
        outs = F.when(
            i >= 5,
            F.concat(
                acc["outs"],
                F.array(F.struct(i.alias("i"), mx.alias("mx"))),
            ),
        ).otherwise(acc["outs"])
        return F.struct(dq.alias("dq"), outs.alias("outs"))

    folded = packed.select(
        "user_id",
        F.aggregate("items", acc0, step)["outs"].alias("outs"),
    )
    ex = folded.select("user_id", F.explode("outs").alias("e"))
    return ex.select(
        "user_id",
        F.col("e.i").alias("i"),
        F.col("e.mx").alias("win_max"),
    )


# =========================================================================
# bh1: Benjamini-Hochberg FDR control in exact integer arithmetic
# =========================================================================

_BH1_SQL = """
WITH hyp AS (
  SELECT p_partkey AS key,
         CAST(CASE WHEN p_partkey % 5 = 0
              THEN CAST('0x' || substr(md5('pv' || CAST(p_partkey AS VARCHAR)),
                        1, 8) AS BIGINT) % 50
              ELSE CAST('0x' || substr(md5('pv' || CAST(p_partkey AS VARCHAR)),
                        1, 8) AS BIGINT) % 10000
              END AS BIGINT) AS p_x1e4
  FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 40)
), ranked AS (
  SELECT key, p_x1e4,
         CAST(ROW_NUMBER() OVER (ORDER BY p_x1e4, key) AS BIGINT) AS k,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM hyp
), cut AS (
  SELECT *,
         CAST(COALESCE(MAX(CASE WHEN p_x1e4 * 10 * m <= k * 10000
                                THEN k END) OVER (), 0) AS BIGINT) AS k_max
  FROM ranked
)
SELECT key, p_x1e4, k, m, k_max,
       k <= k_max AS rejected
FROM cut
"""


@_register("bh1_fdr_control", _BH1_SQL)
def bh1_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control at alpha = 0.1 over 40
    md5-derived p-values (1e-4 units, keyed by the smallest partkeys):
    rank the p-values, find the LARGEST k with p_(k) <= k*alpha/m —
    the comparison done as the exact integer cross product
    p*10*m <= k*10000 — and reject every rank up to it (including
    non-monotone stragglers below the cutoff: the step-up property
    that distinguishes BH from naive per-rank thresholding, asserted
    in the property layer along with Bonferroni ⊆ BH ⊆ raw-alpha).
    One rank window + one unbounded MAX window — the multiple-testing
    gate every metrics platform runs after an experiment sweep."""
    p = (
        _t(spark, sf_dir, "part")
        .select("p_partkey")
        .orderBy("p_partkey")
        .limit(40)
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pv"), F.col("p_partkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    # plant true effects on the key % 5 slice (p <= 0.005) so the
    # cutoff fires at every SF — the x3 vacuous-green lesson
    hyp = p.select(
        F.col("p_partkey").alias("key"),
        F.when(F.col("p_partkey") % 5 == 0, h % 50)
        .otherwise(h % 10000)
        .cast("bigint")
        .alias("p_x1e4"),
    )
    wr = Window.orderBy("p_x1e4", "key")
    ranked = hyp.select(
        "key",
        "p_x1e4",
        F.row_number().over(wr).cast("bigint").alias("k"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("m"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cut = ranked.withColumn(
        "k_max",
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_x1e4") * 10 * F.col("m") <= F.col("k") * 10000,
                    F.col("k"),
                )
            ).over(wall),
            F.lit(0),
        ).cast("bigint"),
    )
    return cut.select(
        "key",
        "p_x1e4",
        "k",
        "m",
        "k_max",
        (F.col("k") <= F.col("k_max")).alias("rejected"),
    )
