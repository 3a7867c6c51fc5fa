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

    # bigrams in ONE narrow projection (adjacent-pair transform over the
    # split array) — no positional self-join, no shuffle before the explode
    bg = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(slice(split(text, ' '), 1,"
                    " size(split(text, ' ')) - 1),"
                    " (x, i) -> concat(x, ' ',"
                    " element_at(split(text, ' '), i + 2)))"
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
    edges = (
        raw.unionAll(
            raw.select(
                F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
            )
        )
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
