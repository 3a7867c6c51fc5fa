"""Round-3 wave 43: stream-stream FULL OUTER join, Misra-Gries fold.

- e12: the full-outer completion of the stream-stream join family
  (e5 inner, e11 left outer): BOTH sides' unmatched rows emit NULLs,
  each gated by its own watermark-derived state-expiry rule — the
  asymmetry (click needs wm past click_ts+30min, purchase only past
  purchase_ts) falls straight out of the interval condition and is
  modeled exactly in the batch oracle.
- mgs1: Misra-Gries heavy hitters as a per-user fold — hh2 uses the
  engine's approx_top_k sketch (rows-only); mgs1 is the ALGORITHM,
  k=3 counters with the decrement-all step, fully oracle-checkable,
  with the (true - est) <= n/k guarantee in the property layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

_E12_RUN_SEQ = [0]


@_register(
    "e12_stream_stream_full_outer",
    """
    WITH c AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, ts AS purchase_ts, value
      FROM events WHERE event_type = 'purchase'
    ), wm AS (
      SELECT LEAST(
        (SELECT MAX(click_ts) FROM c) - INTERVAL '30 minutes',
        (SELECT MAX(purchase_ts) FROM p) - INTERVAL '30 minutes'
      ) AS w
    ), matched AS (
      SELECT c.user_id, c.click_ts, p.purchase_ts,
             CAST(p.value AS DOUBLE) AS purchase_value
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND p.purchase_ts >= c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
    ), unmatched_c AS (
      SELECT c.user_id, c.click_ts,
             CAST(NULL AS TIMESTAMP) AS purchase_ts,
             CAST(NULL AS DOUBLE) AS purchase_value
      FROM c, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = c.user_id
          AND p.purchase_ts >= c.click_ts
          AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
      )
      AND c.click_ts + INTERVAL '30 minutes' < wm.w
    ), unmatched_p AS (
      SELECT p.user_id, CAST(NULL AS TIMESTAMP) AS click_ts,
             p.purchase_ts, CAST(p.value AS DOUBLE) AS purchase_value
      FROM p, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM c
        WHERE c.user_id = p.user_id
          AND p.purchase_ts >= c.click_ts
          AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
      )
      AND p.purchase_ts < wm.w
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_c
    UNION ALL SELECT * FROM unmatched_p
    """,
)
def e12_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the family
    (e5 inner, e11 left outer): non-converting clicks AND orphan
    purchases (purchases with no in-window prior click — the
    direct-buy/attribution-leak rows) each emit NULL-padded once the
    watermark proves their match can no longer arrive. The two expiry
    rules are ASYMMETRIC and fall out of the interval condition
    purchase_ts IN [click_ts, click_ts+30min]: a click's state is live
    until wm passes click_ts+30min (a later purchase could still
    match), but a purchase only until wm passes purchase_ts (any
    matching click is EARLIER, and rows below wm are dropped) — both
    rules modeled exactly in the batch oracle against the
    min-of-branches watermark. Branch watermarks sit AFTER the filters
    on a bare stream (the e10/e11 placement lesson) so the cutoff is
    optimizer-independent."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
    )

    _E12_RUN_SEQ[0] += 1
    sink = f"e12_fouter_sink_{_E12_RUN_SEQ[0]}"
    with stream_partitions(spark):
        clicks = (
            stream_events_raw(spark, sf_dir, watermark=None)
            .where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
            )
            .withWatermark("click_ts", "30 minutes")
        )
        purchases = (
            stream_events_raw(spark, sf_dir, watermark=None)
            .where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("value"),
            )
            .withWatermark("purchase_ts", "30 minutes")
        )
        joined = clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "full_outer",
        ).select(
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
            "click_ts",
            "purchase_ts",
            F.col("value").cast("double").alias("purchase_value"),
        )
        return run_available_now(joined, sink, timeout=120)


# =========================================================================
# mgs1: Misra-Gries heavy hitters (decrement-all fold)
# =========================================================================

_MGS1_SQL = """
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
         CAST([] AS STRUCT(p VARCHAR, c BIGINT)[]) AS st, pages, n
  FROM packed
  UNION ALL
  SELECT user_id, i + 1,
         CASE
           WHEN len(list_filter(st, e -> e.p = pages[i + 1])) > 0
           THEN list_transform(st, e ->
                  {'p': e.p,
                   'c': e.c + CASE WHEN e.p = pages[i + 1]
                                   THEN 1 ELSE 0 END})
           WHEN len(st) < 3
           THEN list_append(st, {'p': pages[i + 1], 'c': CAST(1 AS BIGINT)})
           ELSE list_filter(list_transform(st, e ->
                  {'p': e.p, 'c': e.c - 1}), e -> e.c > 0)
         END,
         pages, n
  FROM r WHERE i < n
), final AS (
  SELECT user_id, n, st,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, n,
       array_to_string(
         list_transform(list_sort(st), e -> e.p || ':' || CAST(e.c AS VARCHAR)),
         '/') AS counters
FROM final WHERE rn = 1
"""


@_register("mgs1_misra_gries", _MGS1_SQL)
def mgs1_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over each user's first-30 page trace
    with k=3 counters: a tracked page increments its counter, a new
    page takes a free slot, and a full table decrements EVERYBODY
    (dropping zeros) — the deterministic streaming-frequency algorithm
    whose guarantee true(p) - est(p) <= n/k makes any page with
    frequency > n/3 impossible to evict. hh2 exposes the engine's
    approx_top_k sketch (rows-only by necessity); mgs1 is the ALGORITHM
    itself, every counter an exact BIGINT, so the final counter table
    is fully oracle-checked (sorted, ':'-rendered). One F.aggregate
    fold per user with an ARRAY<STRUCT<p,c>> accumulator; the guarantee
    and a merge-property live in the property layer. At 100 TB this is
    per-key parallel with O(k) state — the shape production top-k
    trackers use."""
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
    acc0 = F.expr("CAST(array() AS ARRAY<STRUCT<p: STRING, c: BIGINT>>)")

    def step(st, page):
        tracked = F.exists(st, lambda e: e["p"] == page)
        bump = F.transform(
            st,
            lambda e: F.struct(
                e["p"].alias("p"),
                (e["c"] + F.when(e["p"] == page, 1).otherwise(0)).alias("c"),
            ),
        )
        insert = F.concat(
            st,
            F.array(
                F.struct(page.alias("p"), F.lit(1).cast("bigint").alias("c"))
            ),
        )
        decay = F.filter(
            F.transform(
                st,
                lambda e: F.struct(
                    e["p"].alias("p"), (e["c"] - 1).alias("c")
                ),
            ),
            lambda e: e["c"] > 0,
        )
        return F.when(tracked, bump).otherwise(
            F.when(F.size(st) < 3, insert).otherwise(decay)
        )

    folded = packed.select(
        "user_id",
        "n",
        F.aggregate("pages", acc0, step).alias("st"),
    )
    return folded.select(
        "user_id",
        "n",
        F.array_join(
            F.transform(
                F.array_sort("st"),
                lambda e: F.concat(e["p"], F.lit(":"), e["c"].cast("string")),
            ),
            "/",
        ).alias("counters"),
    )
