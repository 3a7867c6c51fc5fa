"""Round-3 wave 39: classic sequence algorithms and the F2 sketch.

- lis1: longest increasing subsequence via the patience-sorting fold —
  the list-state fold where the state is the TAILS array (smallest tail
  of an increasing run of each length); each element replaces the first
  tail >= it or extends the list.
- act1: activity selection (max non-overlapping intervals) — the
  earliest-deadline-first greedy as a scalar-state fold over
  end-sorted intervals; the textbook proof-carrying greedy.
- ams1: AMS second-frequency-moment (F2) sketch — 16 independent ±1
  md5 sign hashes, each estimator S_j = sum(sign_j(key)*count) with
  S_j^2 as the estimate, beside the exact F2 — every quantity a plain
  BIGINT, so the sketch itself is oracle-checkable (the hll1/kmv1
  lesson applied to frequency moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# lis1: longest increasing subsequence (patience fold, tails-array state)
# =========================================================================

_LIS1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5('v' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS BIGINT) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS tails
  FROM (SELECT DISTINCT user_id FROM seq)
  UNION ALL
  SELECT s.user_id, s.i,
         CASE WHEN len(list_filter(r.tails, x -> x < s.v)) = len(r.tails)
              THEN list_append(r.tails, s.v)
              ELSE r.tails[1:len(list_filter(r.tails, x -> x < s.v))]
                   || [s.v]
                   || r.tails[len(list_filter(r.tails, x -> x < s.v)) + 2:]
         END
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
), final AS (
  SELECT user_id, i, tails,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, CAST(i AS BIGINT) AS n_values,
       CAST(len(tails) AS BIGINT) AS lis_len,
       array_to_string(tails, '/') AS tails_state
FROM final WHERE rn = 1 AND i >= 10
"""


@_register("lis1_longest_increasing", _LIS1_SQL)
def lis1_longest_increasing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest STRICTLY increasing subsequence of each user's first-30
    md5-derived value trace, by the patience-sorting fold: the state is
    the tails array (tails[k] = smallest possible tail of an increasing
    subsequence of length k+1, always sorted), and each value replaces
    the first tail >= it (position = count of tails < v, since the
    array is sorted) or extends the array. LIS length = len(tails); the
    full tails state is emitted so the oracle checks the trajectory,
    not just the length. Spark runs ONE F.aggregate fold per user with
    an ARRAY<BIGINT> accumulator (F.transform's (x, i) index lambda
    does the positional replace); DuckDB replays with list slicing in a
    recursive CTE. At 100 TB the fold is per-key parallel with state
    bounded by the trace cap."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
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
    series = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "v"))),
            lambda st: st["v"],
        ).alias("vals"),
    ).where(F.col("n_values") >= 10)
    acc0 = F.expr("CAST(array() AS ARRAY<BIGINT>)")

    def step(tails, v):
        pos = F.size(F.filter(tails, lambda x: x < v))
        return F.when(
            pos == F.size(tails), F.concat(tails, F.array(v))
        ).otherwise(
            F.transform(
                tails, lambda x, i: F.when(i == pos, v).otherwise(x)
            )
        )

    folded = series.select(
        "user_id",
        "n_values",
        F.aggregate("vals", acc0, step).alias("tails"),
    )
    return folded.select(
        "user_id",
        "n_values",
        F.size("tails").cast("bigint").alias("lis_len"),
        F.array_join(F.col("tails"), "/").alias("tails_state"),
    )


# =========================================================================
# act1: activity selection (earliest-deadline-first greedy fold)
# =========================================================================

_ACT1_SQL = """
WITH RECURSIVE iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts)
           + (CAST('0x' || substr(md5('d' || CAST(event_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 20 + 1) * 60000000 AS e_us
  FROM events
), seq AS (
  SELECT user_id, s_us, e_us,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY e_us, event_id) AS BIGINT) AS i
  FROM iv
  QUALIFY i <= 30
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i,
         CAST(0 AS BIGINT) AS last_end, CAST(0 AS BIGINT) AS kept
  FROM (SELECT DISTINCT user_id FROM seq)
  UNION ALL
  SELECT s.user_id, s.i,
         CASE WHEN s.s_us >= r.last_end THEN s.e_us ELSE r.last_end END,
         r.kept + CASE WHEN s.s_us >= r.last_end THEN 1 ELSE 0 END
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
), final AS (
  SELECT user_id, i, last_end, kept,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, CAST(i AS BIGINT) AS n_intervals, kept, last_end
FROM final WHERE rn = 1 AND i >= 10
"""


@_register("act1_activity_selection", _ACT1_SQL)
def act1_activity_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum set of non-overlapping intervals (activity selection) per
    user: each event becomes an interval [ts, ts + 1..20 md5-derived
    minutes]; the earliest-deadline-first greedy — provably optimal —
    folds over the END-sorted first 30 intervals keeping one iff it
    starts at/after the last kept end. This is meeting-scheduling /
    ad-slot packing; conc1 answered "how many rooms", act1 answers "how
    many meetings fit in one room". One F.aggregate fold per user with
    a (last_end, kept) struct accumulator; recursive-CTE oracle with
    the identical integer-µs arithmetic."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("d"), F.col("event_id").cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 20
                + 1
            )
            * 60000000
        ).alias("e_us"),
    )
    w = Window.partitionBy("user_id").orderBy("e_us", "event_id")
    seq = iv.withColumn(
        "i", F.row_number().over(w).cast("bigint")
    ).where(F.col("i") <= 30)
    series = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "s_us", "e_us"))),
            lambda st: F.struct(st["s_us"].alias("s"), st["e_us"].alias("e")),
        ).alias("ivs"),
    ).where(F.col("n_intervals") >= 10)
    acc0 = F.expr(
        "named_struct('last_end', CAST(0 AS BIGINT), 'kept', CAST(0 AS BIGINT))"
    )

    def step(acc, it):
        keep = it["s"] >= acc["last_end"]
        return F.struct(
            F.when(keep, it["e"]).otherwise(acc["last_end"]).alias("last_end"),
            (acc["kept"] + F.when(keep, 1).otherwise(0)).alias("kept"),
        )

    folded = series.select(
        "user_id",
        "n_intervals",
        F.aggregate("ivs", acc0, step).alias("m"),
    )
    return folded.select(
        "user_id",
        "n_intervals",
        F.col("m.kept").alias("kept"),
        F.col("m.last_end").alias("last_end"),
    )


# =========================================================================
# ams1: AMS F2 (second frequency moment) sketch in exact integers
# =========================================================================

_AMS1_SQL = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
), est AS (
  SELECT j.j, u.user_id, u.c,
         CASE WHEN CAST('0x' || substr(md5('s' || CAST(j.j AS VARCHAR) || '_'
                          || CAST(u.user_id AS VARCHAR)), 1, 8) AS BIGINT)
                   % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM counts u CROSS JOIN (SELECT unnest(range(0, 16)) AS j) j
)
SELECT CAST(j AS BIGINT) AS j,
       CAST(SUM(sign * c) AS BIGINT) AS s_j,
       CAST(SUM(sign * c) * SUM(sign * c) AS BIGINT) AS est_f2,
       CAST(SUM(c * c) AS BIGINT) AS f2_true
FROM est GROUP BY j
"""


@_register("ams1_f2_sketch", _AMS1_SQL)
def ams1_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS/tug-of-war sketch for the second frequency moment (F2 = sum
    of squared key frequencies — self-join size, skew indicator): 16
    independent ±1 md5 sign hashes over the user-frequency vector; each
    estimator's S_j = sum(sign_j(u)*count(u)) squares to an unbiased F2
    estimate, shown beside the exact F2. Every term is a BIGINT (±1
    times a count), so unlike floating sketches the whole estimator is
    bit-exact and oracle-checkable — the hll1 lesson applied to
    frequency moments. One combinable aggregate per (j); the sketch is
    mergeable across partitions by summing S_j, which is how it runs at
    100 TB (16 numbers of state, any skew)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    est = counts.select(
        "user_id",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
    ).withColumn(
        "sign",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("s"),
                            F.col("j").cast("string"),
                            F.lit("_"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            1,
        ).otherwise(-1),
    )
    agg = est.groupBy(F.col("j").cast("bigint").alias("j")).agg(
        F.sum(F.col("sign") * F.col("c")).cast("bigint").alias("s_j"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_true"),
    )
    return agg.select(
        "j",
        "s_j",
        (F.col("s_j") * F.col("s_j")).cast("bigint").alias("est_f2"),
        "f2_true",
    )
