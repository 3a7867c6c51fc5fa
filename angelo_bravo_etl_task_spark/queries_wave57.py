"""Round-3 wave 57: batch session_window.

- w13: Spark's native session_window() aggregation in BATCH mode — the
  engine-surface sibling of e2 (streaming session windows) and seq2
  (the manual fold): one groupBy(session_window(ts, gap), user) and the
  engine merges overlapping per-event windows itself. The oracle is
  the classic gaps-and-islands rewrite (LAG gap test → running session
  id → group), with Spark's window.end = last_event + gap convention
  mirrored explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_W13_SQL = """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts)
                   - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), ids AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM seq
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ids
GROUP BY user_id, sid
"""


@_register("w13_batch_session_window", _W13_SQL)
def w13_batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window() in BATCH mode (30-minute gap):
    the engine plans each event as [ts, ts+gap) and MERGES overlapping
    windows per key inside the aggregate — the declarative form of
    sessionization, completing the trio with e2 (the same function
    under streaming watermarks) and seq2 (the manual capped fold). The
    oracle is the textbook gaps-and-islands rewrite — LAG gap test,
    running session id, group — with Spark's convention that
    window.end = last event + gap mirrored as MAX(ts) + INTERVAL 30
    minutes. Session count, bounds and sizes must agree exactly; at
    100 TB this is one shuffle on the session key with
    merge-on-overlap state, the same shape the streaming variant keeps
    in its state store."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
