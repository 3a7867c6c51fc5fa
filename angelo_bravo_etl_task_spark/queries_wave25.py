"""Round-3 wave 25: the at-scale set-similarity join (prefix filtering),
weighted multi-source shortest path, CUSUM changepoint detection,
referential-integrity auditing, and marketing touch attribution.

Same exactness discipline as the rest of the registry (queries.py module
docstring): every aggregate that can reorder runs in integers/decimals;
IEEE doubles never cross an aggregation boundary; DuckDB's
SUM(BIGINT)->HUGEINT promotion is neutralized with explicit CASTs in the
oracle (the u2 lesson).

Scale themes this wave:
- ssj1: the PPJoin-style prefix filter — the textbook way to run a
  set-similarity self-join on 100 TB without an all-pairs stage. Candidate
  generation is an EQUI-join on the rarest tokens of each set, provably
  lossless for Jaccard >= tau;
- sp1: min-plus (tropical) relaxation — BFS generalized to weights; each
  round is one equi-join + one min-aggregate, the frontier stays bounded
  by the vertex set, never by the path count;
- chg1: CUSUM over a pre-aggregated daily frame, exact in scaled integers
  (D*run - t*T avoids the rational mean entirely);
- ri1: four FK audits in one pass, each a distinct-key left join +
  conditional count — the plan a 100 TB contract check wants (no fan-out,
  parent side reduced to its key set before the join);
- att1: per-user ordered windows (rows + range frames) — attribution
  without a purchases-x-clicks range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# ssj1: set-similarity self-join with prefix filtering (PPJoin-lite)
# =========================================================================

_SSJ1_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         regexp_replace(text, ' [a-z0-9]+$', '') AS text
  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 100
), words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
), pos AS (
  SELECT doc_id, w, UNNEST(generate_series(1, len(w))) AS i FROM words
), toks AS (
  SELECT doc_id, i, w[i] AS tok FROM pos
), bg AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bg
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM bg GROUP BY doc_id
), pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM bg x JOIN bg y ON x.bg = y.bg AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter,
       CAST(sa.sz + sb.sz - p.inter AS BIGINT) AS uni
FROM pairs p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE 10 * p.inter >= 7 * (sa.sz + sb.sz - p.inter)
"""


@_register("ssj1_prefix_filter_join", _SSJ1_SQL)
def ssj1_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join (Jaccard >= 0.7 over word-bigram sets) via
    the prefix filter — the All-Pairs/PPJoin candidate generation that
    makes similarity self-joins feasible at 100 TB. Every token is ranked
    by GLOBAL rarity; a document's prefix is its (sz - ceil(0.7*sz) + 1)
    rarest tokens; any pair with J >= tau must (a) share a prefix token
    and (b) satisfy the length filter tau*|b| <= |a| — both provable from
    i >= tau*max(|a|,|b|), so candidate generation is a pure EQUI-join on
    prefix tokens, lossless, never all-pairs. Exact verification then runs
    only over candidates (equi-join on (doc, bigram)). Threshold compare
    is exact-integer cross-multiplication (10*i >= 7*(sa+sb-i)); the oracle
    brute-forces the same pairs. Corpus: every 5th document plus 20
    planted near-duplicates (text minus its last word) so the answer is
    non-empty at every SF. Reference anchor: the reference's only join is
    an exact equi-join (Angelo_ETL_Task.py:158); this is the similarity
    generalization its dedup story needs."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    planted = (
        docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 100))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.regexp_replace("text", " [a-z0-9]+$", "").alias("text"),
        )
    )
    corpus = base.unionAll(planted)

    # bigrams in ONE narrow projection (adjacent-pair zip over the split
    # array) — no positional self-join, no shuffle before the explode.
    # Optimization r11 (guide §2.3): every released column is a set SIZE
    # (inter, uni), never a bigram string, so bigrams live as 64-bit
    # HASHES end-to-end — one xxhash64 per token, one long-mix per
    # adjacent pair, and every downstream shuffle (freq, rank, candidate
    # self-join, verify) carries int64s instead of "tok tok" strings.
    # Tokenization is UNCHANGED (raw split on ' ', no normalization, no
    # empty-token filter — the oracle splits the same way); distinct-hash
    # sets equal distinct-string sets modulo an in-doc xxhash64 collision
    # (~|bigrams|²/2⁶⁴, oracle-verified tri-SF). The rarity tie-break
    # becomes (df, hash) instead of (df, string): prefix-filter
    # completeness holds under any consistent total order, and the exact
    # verify keeps the released rows identical.
    _toks = F.split(F.col("text"), " ")
    _th = F.transform(_toks, lambda s: F.xxhash64(s))
    _n1 = F.greatest(F.size(_th) - 1, F.lit(0))
    bg = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.zip_with(
                    F.slice(_th, 1, _n1),
                    F.slice(_th, 2, _n1),
                    lambda a, b: F.xxhash64(a, b),
                )
            )
        ).alias("bg"),
    )
    # the bigram frame feeds four consumers (sizes, ranks, both verify
    # sides); at sf scale cache it, at 100 TB it would be a staged table
    bg = bg.persist()

    sz = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    # global rarity order: rare tokens first -> smallest candidate lists
    freq = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        bg.join(freq, "bg")
        .join(sz, "doc_id")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "bg")
            ),
        )
    )
    # prefix length p = sz - ceil(7*sz/10) + 1; ceil(7s/10) = (7s+9) div 10
    prefix = ranked.where(
        F.col("r") <= F.col("sz") - F.expr("(7*sz+9) div 10") + 1
    ).select("doc_id", "bg", "sz")

    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "bg", F.col("sz").alias("sa")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "bg", F.col("sz").alias("sb")
    )
    cand = (
        a.join(b, "bg")
        .where(F.col("doc_a") < F.col("doc_b"))
        # length filter: J >= 0.7 implies 7*max <= 10*min
        .where(
            (7 * F.greatest("sa", "sb")) <= (10 * F.least("sa", "sb"))
        )
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )

    # exact verify over candidates only: equi-join both token lists
    xa = bg.select(F.col("doc_id").alias("doc_a"), "bg")
    xb = bg.select(F.col("doc_id").alias("doc_b2"), F.col("bg").alias("bg_b"))
    inter = (
        cand.join(xa, "doc_a")
        .join(
            xb,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("bg") == F.col("bg_b")),
        )
        .groupBy("doc_a", "doc_b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter.where(
        10 * F.col("inter")
        >= 7 * (F.col("sa") + F.col("sb") - F.col("inter"))
    ).select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("sa") + F.col("sb") - F.col("inter")).alias("uni"),
    )


# =========================================================================
# sp1: multi-source weighted shortest path (bounded Bellman-Ford)
# =========================================================================

_SP1_SQL = """
WITH RECURSIVE raw AS (
  SELECT CAST('0x' || substr(md5('e' || CAST(event_id AS VARCHAR)), 1, 4)
              AS BIGINT) % 5000 AS u,
         CAST('0x' || substr(md5('v' || CAST(event_id AS VARCHAR)), 1, 4)
              AS BIGINT) % 5000 AS v,
         1 + CAST('0x' || substr(md5('w' || CAST(event_id AS VARCHAR)), 1, 2)
                 AS BIGINT) % 9 AS w
  FROM events
), both_dirs AS (
  SELECT u, v, w FROM raw WHERE u <> v
  UNION ALL
  SELECT v AS u, u AS v, w FROM raw WHERE u <> v
), ed AS (
  SELECT u, v, CAST(MIN(w) AS BIGINT) AS w FROM both_dirs GROUP BY u, v
), seeds AS (
  SELECT UNNEST(generate_series(0, 4500, 500)) AS vertex
), walk AS (
  SELECT CAST(vertex AS BIGINT) AS vertex, CAST(0 AS BIGINT) AS cost,
         0 AS hop
  FROM seeds
  UNION
  SELECT ed.v AS vertex, w.cost + ed.w AS cost, w.hop + 1 AS hop
  FROM walk w JOIN ed ON ed.u = w.vertex
  WHERE w.hop < 3
)
SELECT vertex, CAST(MIN(cost) AS BIGINT) AS min_cost
FROM walk GROUP BY vertex
"""


@_register("sp1_weighted_shortest_path", _SP1_SQL)
def sp1_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source weighted shortest path within 3 relaxation rounds —
    gr1's BFS lifted to the min-plus (tropical) semiring: each round is
    ONE equi-join (best-so-far x edges) and ONE min-aggregate per vertex,
    so the per-round state is bounded by |V| regardless of how many walks
    exist (the oracle's recursive UNION carries (vertex, cost, hop)
    triples instead, bounded by |V| x costs x hops — equivalent minima,
    different frontier discipline). Edge weights 1..9 are md5-derived per
    event; parallel edges collapse to their min weight BEFORE the
    iteration (GROUP BY u,v), which is both a correctness requirement and
    the at-scale move: the relaxation joins touch the reduced edge list.
    At 100 TB the edge frame is a bucketed table on u and each round
    shuffles only the frontier."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid")
    )

    def hx(prefix: str, nchars: int):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), F.col("eid"))), 1, nchars),
            16,
            10,
        ).cast("bigint")

    raw = ev.select(
        (hx("e", 4) % 5000).alias("u"),
        (hx("v", 4) % 5000).alias("v"),
        (hx("w", 2) % 9 + 1).alias("w"),
    ).where(F.col("u") != F.col("v"))
    # Both edge directions from ONE pass (optimization r11): the previous
    # unionAll(raw.select(v, u, w)) branch re-scanned events and recomputed
    # all three md5 derivations a second time (map-side work that
    # ReuseExchange cannot deduplicate — there is no exchange below the
    # union). Exploding a 2-element array of the forward/reverse structs
    # emits exactly the same rows with the hashes computed once
    # (guide section 2.4; same rows -> same GROUP BY u,v minima).
    edges = (
        raw.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u"), F.col("v"), F.col("w")
                    ),
                    F.struct(
                        F.col("v").alias("u"),
                        F.col("u").alias("v"),
                        F.col("w"),
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v", "e.w")
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .persist()
    )

    best = spark.range(0, 10).select(
        (F.col("id") * 500).alias("vertex"), F.lit(0).cast("bigint").alias("cost")
    )
    for _ in range(3):
        relaxed = (
            best.join(edges, best["vertex"] == edges["u"])
            .select(
                F.col("v").alias("vertex"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        best = (
            best.unionAll(relaxed)
            .groupBy("vertex")
            .agg(F.min("cost").alias("cost"))
        )
    return best.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("cost").cast("bigint").alias("min_cost"),
    )


# =========================================================================
# chg1: CUSUM changepoint detection in scaled integers
# =========================================================================

_CHG1_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
         CAST(SUM(cnt) AS BIGINT) AS t
  FROM daily GROUP BY 1
), cum AS (
  SELECT event_type, day, cnt,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS idx,
         CAST(SUM(cnt) OVER w AS BIGINT) AS run
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), sc AS (
  SELECT c.event_type, c.day,
         CAST(t.d * c.run - c.idx * t.t AS BIGINT) AS scaled_cusum,
         ABS(CAST(t.d * c.run - c.idx * t.t AS BIGINT)) AS mag,
         t.d AS n_days, t.t AS total_events
  FROM cum c JOIN tot t ON t.event_type = c.event_type
)
SELECT event_type, day AS changepoint_day, scaled_cusum,
       CAST(mag AS BIGINT) AS max_mag, n_days, total_events
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY mag DESC, day) AS rn
  FROM sc
) WHERE rn = 1
"""


@_register("chg1_cusum_changepoint", _CHG1_SQL)
def chg1_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type, exact in scaled
    integers: instead of cusum_t = sum_{i<=t}(x_i - T/D) (a rational
    mean), compute D*run_t - t*T — the same argmax, zero float drift.
    The window runs over the AGGREGATED daily frame (<= 30 rows per
    type), never the raw events — the m1/ks1 discipline: order
    statistics and running folds belong on the reduced frame. The
    changepoint is the day of max |scaled CUSUM| (earliest day on
    ties, pinned by the ROW_NUMBER tiebreak). At 100 TB the only
    full-data pass is the pre-aggregation, a map-side-combinable
    group-count."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))

    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"), F.sum("cnt").alias("t")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        .cast("bigint")
        .alias("idx"),
        F.sum("cnt").over(w).alias("run"),
    )
    sc = cum.join(tot, "event_type").select(
        "event_type",
        "day",
        (F.col("d") * F.col("run") - F.col("idx") * F.col("t")).alias(
            "scaled_cusum"
        ),
        F.abs(
            F.col("d") * F.col("run") - F.col("idx") * F.col("t")
        ).alias("mag"),
        F.col("d").alias("n_days"),
        F.col("t").alias("total_events"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("mag").desc(), F.col("day")
    )
    return (
        sc.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            "scaled_cusum",
            F.col("mag").alias("max_mag"),
            "n_days",
            "total_events",
        )
    )


# =========================================================================
# ri1: referential-integrity audit (four FKs, one pass each)
# =========================================================================

_RI1_SQL = """
WITH li AS (
  SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
  UNION ALL SELECT -1, -1, -1
), ords AS (
  SELECT o_orderkey, o_custkey FROM orders
  UNION ALL SELECT -7, -7
), a1 AS (
  SELECT 'lineitem.l_orderkey->orders' AS fk,
         CAST(COUNT(*) AS BIGINT) AS child_rows,
         CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orphan_rows,
         MIN(CASE WHEN p.k IS NULL THEN c.l_orderkey END) AS sample_orphan
  FROM li c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
    ON c.l_orderkey = p.k
), a2 AS (
  SELECT 'lineitem.l_partkey->part',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         MIN(CASE WHEN p.k IS NULL THEN c.l_partkey END)
  FROM li c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
    ON c.l_partkey = p.k
), a3 AS (
  SELECT 'lineitem.l_suppkey->supplier',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         MIN(CASE WHEN p.k IS NULL THEN c.l_suppkey END)
  FROM li c LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
    ON c.l_suppkey = p.k
), a4 AS (
  SELECT 'orders.o_custkey->customer',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         MIN(CASE WHEN p.k IS NULL THEN c.o_custkey END)
  FROM ords c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
    ON c.o_custkey = p.k
)
SELECT * FROM a1 UNION ALL SELECT * FROM a2
UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4
"""


@_register("ri1_referential_integrity", _RI1_SQL)
def ri1_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's four foreign
    keys, each as (child rows, orphan rows, a sample orphan key). Each
    audit is one left join against the parent's DISTINCT key set — the
    parent is reduced to keys before the join, so there is no fan-out
    and the parent side broadcasts at any scale where the key set fits
    (and bucket-joins where it doesn't). One planted orphan per child
    table (key -1 / -7 via unionAll) exercises the violation branch at
    every SF, so both the zero-orphan and orphan>0 paths are verified.
    The reference enforces integrity only implicitly — its depth
    computation crashes on codes missing from the hierarchy
    (Angelo_ETL_Task.py:192); this op is that assertion made explicit
    and scalable."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .unionAll(
            spark.range(1).select(
                F.lit(-1).cast("bigint").alias("l_orderkey"),
                F.lit(-1).cast("bigint").alias("l_partkey"),
                F.lit(-1).cast("bigint").alias("l_suppkey"),
            )
        )
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .unionAll(
            spark.range(1).select(
                F.lit(-7).cast("bigint").alias("o_orderkey"),
                F.lit(-7).cast("bigint").alias("o_custkey"),
            )
        )
    )

    def audit(child: DataFrame, fk_col: str, parent: DataFrame,
              pk_col: str, label: str) -> DataFrame:
        keys = parent.select(F.col(pk_col).cast("bigint").alias("k")).distinct()
        joined = child.join(
            F.broadcast(keys), child[fk_col] == keys["k"], "left"
        )
        return joined.agg(
            F.lit(label).alias("fk"),
            F.count(F.lit(1)).alias("child_rows"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias(
                "orphan_rows"
            ),
            F.min(F.when(F.col("k").isNull(), F.col(fk_col))).alias(
                "sample_orphan"
            ),
        )

    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    ordp = _t(spark, sf_dir, "orders")
    out = audit(li, "l_orderkey", ordp, "o_orderkey",
                "lineitem.l_orderkey->orders")
    out = out.unionAll(
        audit(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey->part")
    )
    out = out.unionAll(
        audit(li, "l_suppkey", supp, "s_suppkey",
              "lineitem.l_suppkey->supplier")
    )
    out = out.unionAll(
        audit(ords, "o_custkey", cust, "c_custkey",
              "orders.o_custkey->customer")
    )
    return out


# =========================================================================
# att1: first/last-touch attribution via ordered windows
# =========================================================================

_ATT1_SQL = """
WITH dedup AS (
  SELECT user_id, ts, event_type,
         CAST(MAX(event_id) AS BIGINT) AS event_id,
         MAX(CASE WHEN event_type = 'click'
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
             END) AS channel
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id, ts, event_type
), stream AS (
  SELECT user_id, ts, event_type, event_id, channel,
         epoch_us(ts) AS us,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN channel END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_channel,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
           AS first_us
  FROM dedup
), conv AS (
  SELECT s.user_id, s.event_id, s.last_channel, f.channel AS first_channel
  FROM stream s
  LEFT JOIN (SELECT user_id, epoch_us(ts) AS us, channel
             FROM dedup WHERE event_type = 'click') f
    ON f.user_id = s.user_id AND f.us = s.first_us
  WHERE s.event_type = 'purchase'
)
SELECT channel,
       CAST(SUM(n_first) AS BIGINT) AS first_touch,
       CAST(SUM(n_last) AS BIGINT) AS last_touch
FROM (
  SELECT first_channel AS channel, 1 AS n_first, 0 AS n_last
  FROM conv WHERE first_channel IS NOT NULL
  UNION ALL
  SELECT last_channel, 0, 1 FROM conv WHERE last_channel IS NOT NULL
) GROUP BY channel
"""


@_register("att1_touch_attribution", _ATT1_SQL)
def att1_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution without a purchases-x-clicks range join: one
    pass over the per-user ordered stream. Last-touch = last click
    channel carried forward by an IGNORE NULLS last_value over a ROWS
    frame (deterministic order key (ts, event_id)); first-touch-in-24h =
    min click timestamp over a RANGE frame of 86400e6 microseconds, then
    one equi-join back to the deduped click table to recover the channel
    (clicks are unique per (user, ts) after the dedup, so the mapping is
    exact). Channels are json-extracted ints mod 5. The final rollup is
    a tiny group-count. At 100 TB this is a single shuffle on user_id —
    the window-carry pattern e.g. ts1's gap-fill uses — instead of the
    quadratic time-range join the naive formulation writes."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    dedup = ev.groupBy("user_id", "ts", "event_type").agg(
        F.max("event_id").alias("event_id"),
        F.max(
            F.when(
                F.col("event_type") == "click",
                F.get_json_object("props", "$.k").cast("bigint") % 5,
            )
        ).alias("channel"),
    )
    us = F.unix_micros(F.col("ts"))
    wrows = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-86400000000, Window.currentRow)
    )
    stream = dedup.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        "channel",
        us.alias("us"),
        F.last(
            F.when(F.col("event_type") == "click", F.col("channel")),
            ignorenulls=True,
        )
        .over(wrows)
        .alias("last_channel"),
        F.min(F.when(F.col("event_type") == "click", us))
        .over(wrange)
        .alias("first_us"),
    )
    clicks = dedup.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.unix_micros(F.col("ts")).alias("cus"),
        F.col("channel").alias("first_channel"),
    )
    conv = (
        stream.where(F.col("event_type") == "purchase")
        .join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("first_us") == F.col("cus")),
            "left",
        )
        .select("user_id", "event_id", "last_channel", "first_channel")
    )
    firsts = conv.where(F.col("first_channel").isNotNull()).select(
        F.col("first_channel").alias("channel"),
        F.lit(1).alias("n_first"),
        F.lit(0).alias("n_last"),
    )
    lasts = conv.where(F.col("last_channel").isNotNull()).select(
        F.col("last_channel").alias("channel"),
        F.lit(0).alias("n_first"),
        F.lit(1).alias("n_last"),
    )
    return (
        firsts.unionAll(lasts)
        .groupBy("channel")
        .agg(
            F.sum("n_first").alias("first_touch"),
            F.sum("n_last").alias("last_touch"),
        )
    )


# =========================================================================
# boot1: deterministic bootstrap confidence interval (md5 resampling)
# =========================================================================

_BOOT1_SQL = """
WITH sample AS (
  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM customer WHERE c_custkey < 100
), draws AS (
  SELECT gb.b, gj.j,
         CAST('0x' || substr(md5('b' || CAST(gb.b AS VARCHAR) || '_'
                                 || CAST(gj.j AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS idx
  FROM generate_series(0, 39) gb(b), generate_series(0, 99) gj(j)
), reps AS (
  SELECT d.b, CAST(SUM(s.cents) AS BIGINT) AS sum_cents
  FROM draws d JOIN sample s ON s.c_custkey = d.idx
  GROUP BY d.b
), ranked AS (
  SELECT sum_cents,
         ROW_NUMBER() OVER (ORDER BY sum_cents, b) AS rn
  FROM reps
)
SELECT CAST(100 AS BIGINT) AS n,
       CAST(40 AS BIGINT) AS n_reps,
       (SELECT CAST(SUM(cents) AS BIGINT) FROM sample) AS point_cents,
       (SELECT sum_cents FROM ranked WHERE rn = 2) AS lo_cents,
       (SELECT sum_cents FROM ranked WHERE rn = 38) AS hi_cents
"""


@_register("boot1_bootstrap_ci", _BOOT1_SQL)
def boot1_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval with DETERMINISTIC resampling — the
    reproducibility requirement every training-data pipeline has and
    rand() cannot give across engines or reruns: the B x n resample index
    matrix is md5-derived (draw (b, j) picks row md5('b<b>_<j>') % n), so
    both engines materialize the identical 40 replicates. The statistic
    is the replicate SUM of account-balance cents (exact integers; the
    mean differs by the constant 1/n); the 90% CI is the pair of type-1
    order statistics at ranks 2 and 38 of the 40 sorted replicate sums.
    The resample is an EQUI-join of the 4000-row draw spine against the
    keyed sample — never a per-row rand() scan, so at 100 TB the spine
    broadcasts and replicates partition-locally. The draw spine itself is
    generated by explode(sequence(..)) — no cross join."""
    cust = _t(spark, sf_dir, "customer")
    sample = cust.where(F.col("c_custkey") < 100).select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    draws = (
        spark.range(0, 40)
        .select(F.col("id").alias("b"), F.explode(F.expr("sequence(0, 99)")).alias("j"))
        .select(
            "b",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("b"),
                                F.col("b").cast("string"),
                                F.lit("_"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 100
            ).alias("idx"),
        )
    )
    reps = (
        draws.join(F.broadcast(sample), draws["idx"] == sample["c_custkey"])
        .groupBy("b")
        .agg(F.sum("cents").alias("sum_cents"))
    )
    from pyspark.sql.window import Window as W

    ranked = reps.withColumn(
        "rn", F.row_number().over(W.orderBy("sum_cents", "b"))
    )
    lo = ranked.where(F.col("rn") == 2).select(
        F.col("sum_cents").alias("lo_cents")
    )
    hi = ranked.where(F.col("rn") == 38).select(
        F.col("sum_cents").alias("hi_cents")
    )
    point = sample.agg(F.sum("cents").alias("point_cents"))
    return (
        point.join(lo)
        .join(hi)
        .select(
            F.lit(100).cast("bigint").alias("n"),
            F.lit(40).cast("bigint").alias("n_reps"),
            "point_cents",
            "lo_cents",
            "hi_cents",
        )
    )


# =========================================================================
# snm1: sorted-neighborhood tolerance pairing (1-D SNM blocking)
# =========================================================================

_SNM1_SQL = """
WITH c AS (
  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM customer
), ranked AS (
  SELECT c_custkey, cents,
         ROW_NUMBER() OVER (ORDER BY cents, c_custkey) AS ord
  FROM c
), offs AS (
  SELECT UNNEST(generate_series(1, 3)) AS off
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       a.cents AS cents_a, b.cents AS cents_b,
       CAST(b.cents - a.cents AS BIGINT) AS diff_cents,
       CAST(o.off AS BIGINT) AS rank_gap
FROM ranked a
JOIN offs o ON TRUE
JOIN ranked b ON b.ord = a.ord + o.off
WHERE b.cents - a.cents <= 50
"""


@_register("snm1_sorted_neighborhood", _SNM1_SQL)
def snm1_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood method: find near-identical account balances
    (within 50 cents) by sorting ONCE on the match key and pairing only
    rows within 3 rank positions — the classic entity-resolution blocking
    that replaces the O(N^2) |a-b|<eps theta-join with sort + bounded
    window. The pair generation is an EQUI-join on (ord + off), off in
    {1,2,3}, from an exploded 3-row offset spine — no inequality join
    anywhere in the plan. Exact integer cents throughout. At 100 TB the
    global sort is a range partition; the only extra work versus this
    plan is replicating w rows across partition boundaries (noted here,
    immaterial at window w=3). Rank-distance semantics (a true-near pair
    separated by >3 intervening rows is not emitted) are inherent to SNM
    and mirrored identically by the oracle."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    ranked = c.withColumn(
        "ord", F.row_number().over(Window.orderBy("cents", "c_custkey"))
    )
    offs = spark.range(1, 4).select(F.col("id").alias("off"))
    a = ranked.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("cents").alias("cents_a"),
        F.col("ord").alias("ord_a"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("cents").alias("cents_b"),
        F.col("ord").alias("ord_b"),
    )
    paired = (
        a.crossJoin(F.broadcast(offs))
        .join(b, F.col("ord_b") == F.col("ord_a") + F.col("off"))
        .where(F.col("cents_b") - F.col("cents_a") <= 50)
    )
    return paired.select(
        "cust_a",
        "cust_b",
        "cents_a",
        "cents_b",
        (F.col("cents_b") - F.col("cents_a")).alias("diff_cents"),
        F.col("off").cast("bigint").alias("rank_gap"),
    )


# =========================================================================
# regr2: Theil-Sen robust slope (median of pairwise slopes)
# =========================================================================

_REGR2_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1
), idx AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS x, y
  FROM daily
), pairs AS (
  SELECT a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM idx a JOIN idx b ON b.x > a.x
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs
), med AS (
  SELECT slope FROM (
    SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, xi, xj) AS rn FROM pairs
  ), m WHERE rn = (m.n_pairs + 1) // 2
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx
), res AS (
  SELECT CAST(i.y AS DOUBLE) - med.slope * CAST(i.x AS DOUBLE) AS r, i.x
  FROM idx i, med
), imed AS (
  SELECT r AS intercept FROM (
    SELECT r, x, ROW_NUMBER() OVER (ORDER BY r, x) AS rn FROM res
  ), nd WHERE rn = (nd.n_days + 1) // 2
)
SELECT nd.n_days, m.n_pairs, med.slope, imed.intercept
FROM nd, m, med, imed
"""


@_register("regr2_theil_sen", _REGR2_SQL)
def regr2_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust regression of the daily click-count trend: slope =
    median of all pairwise slopes, intercept = median residual at that
    slope — the estimator that shrugs off the outlier days that wreck
    regr1's least squares. The quadratic pair set is generated where it
    belongs: INSIDE one array cell of the pre-aggregated 30-row series
    (nested transform over the sorted struct array, exploded back), so no
    join — let alone a cross join — ever touches the raw events; the only
    full-data pass is the map-side-combinable daily count. Slopes are
    single IEEE divisions of exact integers (deterministic, correctly
    rounded, hence portable); medians are type-1 lower order statistics
    at rank (m+1) div 2 with (slope, xi, xj) tiebreak, exactly mirrored
    by the oracle. The 1-row slope scalar broadcasts back onto the
    30-row series for residuals — the sanctioned scalar-subquery shape."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "click")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("x"),
        "y",
    )
    series = idx.agg(
        F.sort_array(F.collect_list(F.struct("x", "y"))).alias("s")
    )
    pairs = series.select(
        F.explode(
            F.expr(
                "flatten(transform(s, (a, ai) ->"
                " transform(slice(s, ai + 2, size(s)),"
                " b -> named_struct('xi', a.x, 'yi', a.y,"
                " 'xj', b.x, 'yj', b.y))))"
            )
        ).alias("p")
    ).select(
        F.col("p.xi").alias("xi"),
        F.col("p.yi").alias("yi"),
        F.col("p.xj").alias("xj"),
        F.col("p.yj").alias("yj"),
        (
            (F.col("p.yj") - F.col("p.yi")).cast("double")
            / (F.col("p.xj") - F.col("p.xi")).cast("double")
        ).alias("slope"),
    )
    pairs = pairs.persist()
    m = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    ranked = pairs.withColumn(
        "rn", F.row_number().over(Window.orderBy("slope", "xi", "xj"))
    )
    med = (
        ranked.join(F.broadcast(m))
        .where(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("slope")
    )
    nd = idx.agg(F.count(F.lit(1)).alias("n_days"))
    res = idx.join(F.broadcast(med)).select(
        (
            F.col("y").cast("double")
            - F.col("slope") * F.col("x").cast("double")
        ).alias("r"),
        "x",
    )
    imed = (
        res.withColumn("rn", F.row_number().over(Window.orderBy("r", "x")))
        .join(F.broadcast(nd))
        .where(F.col("rn") == F.expr("(n_days + 1) div 2"))
        .select(F.col("r").alias("intercept"))
    )
    return (
        nd.join(m)
        .join(med.select(F.col("slope")))
        .join(imed)
        .select("n_days", "n_pairs", "slope", "intercept")
    )


# =========================================================================
# hw1: Holt's linear trend (double exponential smoothing), exact integers
# =========================================================================

_HW1_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE day(ts) <= 16 GROUP BY 1, 2
), idx AS (
  SELECT event_type, day, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS i
  FROM daily
), r AS (
  SELECT event_type, day, i,
         CAST(4 AS BIGINT) AS p4,
         CAST(4 * x AS BIGINT) AS lhat,
         CAST(0 AS BIGINT) AS bhat
  FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.day, idx.i,
         CAST(4 * r.p4 AS BIGINT),
         CAST(2 * r.p4 * idx.x + 2 * r.lhat + 2 * r.bhat AS BIGINT),
         CAST(r.p4 * idx.x - r.lhat + 3 * r.bhat AS BIGINT)
  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1
)
SELECT event_type, day, p4, lhat, bhat,
       CAST(lhat + bhat AS BIGINT) AS forecast1_scaled
FROM r
"""


@_register("hw1_holt_linear_trend", _HW1_SQL)
def hw1_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (alpha = beta =
    1/2) over each type's first 16 daily counts — EXACT: with dyadic
    smoothing weights, level l_t and trend b_t are rationals with
    denominator 4^t, so the fold carries integer-scaled state
    (p4, lhat, bhat) = (4^t, 4^t*l_t, 4^t*b_t) with the recurrences
    lhat_t = 2*p4_{t-1}*x_t + 2*lhat_{t-1} + 2*bhat_{t-1} and
    bhat_t = p4_{t-1}*x_t - lhat_{t-1} + 3*bhat_{t-1} — no division,
    no floats, no cross-engine drift; 16 days keeps 4^16*l inside
    BIGINT with orders of magnitude to spare. Like ewma1 this is a true
    recurrence no window frame expresses; the Spark side is ONE sorted
    in-cell fold over the pre-aggregated per-type series, the oracle the
    identical recurrence as a recursive CTE. The one-step-ahead forecast
    (l+b) shares the 4^t scale, so it is exact too."""
    ev = _t(spark, sf_dir, "events").where(F.dayofmonth("ts") <= 16)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    acc0 = F.expr(
        "CAST(array() AS ARRAY<STRUCT<day: DATE, p4: BIGINT,"
        " lhat: BIGINT, bhat: BIGINT>>)"
    )

    def step(acc, v):
        prev = F.element_at(acc, -1)
        first = F.size(acc) == 0
        p4 = F.when(first, F.lit(4).cast("bigint")).otherwise(
            (4 * prev["p4"]).cast("bigint")
        )
        lhat = F.when(first, (4 * v["x"]).cast("bigint")).otherwise(
            (
                2 * prev["p4"] * v["x"] + 2 * prev["lhat"] + 2 * prev["bhat"]
            ).cast("bigint")
        )
        bhat = F.when(first, F.lit(0).cast("bigint")).otherwise(
            (prev["p4"] * v["x"] - prev["lhat"] + 3 * prev["bhat"]).cast(
                "bigint"
            )
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    v["day"].alias("day"),
                    p4.alias("p4"),
                    lhat.alias("lhat"),
                    bhat.alias("bhat"),
                )
            ),
        )

    folded = series.select(
        "event_type", F.aggregate("s", acc0, step).alias("hw")
    )
    ex = folded.select("event_type", F.explode("hw").alias("p"))
    return ex.select(
        "event_type",
        F.col("p.day").alias("day"),
        F.col("p.p4").alias("p4"),
        F.col("p.lhat").alias("lhat"),
        F.col("p.bhat").alias("bhat"),
        (F.col("p.lhat") + F.col("p.bhat")).alias("forecast1_scaled"),
    )
