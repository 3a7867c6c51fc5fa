"""Round-3 wave 41: isotonic regression, critical path, secretary rule.

- iso1: isotonic (monotone) regression by pool-adjacent-violators —
  cal3 measured miscalibration, iso1 REPAIRS it: the fitted monotone
  step function as exact (sum, count) pool rationals. The oracle is a
  state-machine recursion (push a point OR merge the top pools — at
  most 2n steps), the Spark side an outer fold with a bounded inner
  merge loop.
- cpm1: critical path (longest path) through a layered sparse DAG —
  sp1 ran min-plus Bellman-Ford; cpm1 is the max-plus mirror
  (PERT/scheduling): 3 relaxation joins over locality-bucketed edges.
- sec1: the secretary stopping rule (observe 11 of 30, then take the
  first value beating the observed max) replayed per user, with the
  found-the-global-best flag — a pure array pipeline, no recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# iso1: isotonic regression (PAVA) over the calibration curve
# =========================================================================

_ISO1_SQL = """
WITH RECURSIVE scored AS (
  SELECT CAST(CAST('0x' || substr(md5('p' || CAST(c_custkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS BIGINT) AS x,
         CASE WHEN (c_custkey % 2 = 0) = (c_custkey % 3 = 0)
              THEN 1 ELSE 0 END AS y
  FROM customer
), pts AS (
  SELECT CAST(x AS BIGINT) AS x, CAST(SUM(y) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM scored GROUP BY x
), packed AS (
  SELECT list({'x': x, 's': s, 'c': c} ORDER BY x) AS p,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts
), r AS (
  SELECT CAST(0 AS BIGINT) AS i,
         CAST([] AS STRUCT(lo BIGINT, hi BIGINT, s BIGINT, c BIGINT)[]) AS st,
         p, n, CAST(0 AS BIGINT) AS steps
  FROM packed
  UNION ALL
  SELECT CASE WHEN len(st) >= 2
                   AND st[-2].s * st[-1].c >= st[-1].s * st[-2].c
              THEN i ELSE i + 1 END,
         CASE WHEN len(st) >= 2
                   AND st[-2].s * st[-1].c >= st[-1].s * st[-2].c
              THEN st[1:len(st) - 2]
                   || [{'lo': st[-2].lo, 'hi': st[-1].hi,
                        's': st[-2].s + st[-1].s, 'c': st[-2].c + st[-1].c}]
              ELSE st || [{'lo': p[i + 1].x, 'hi': p[i + 1].x,
                           's': p[i + 1].s, 'c': p[i + 1].c}]
         END,
         p, n, steps + 1
  FROM r
  WHERE steps < 2 * n + 2
    AND ((len(st) >= 2 AND st[-2].s * st[-1].c >= st[-1].s * st[-2].c)
         OR i < n)
), final AS (
  SELECT st, ROW_NUMBER() OVER (ORDER BY steps DESC) AS rn FROM r
)
SELECT CAST(u.pool.lo AS BIGINT) AS x_lo,
       CAST(u.pool.hi AS BIGINT) AS x_hi,
       CAST(u.pool.s AS BIGINT) AS sum_y,
       CAST(u.pool.c AS BIGINT) AS n
FROM final, unnest(final.st) AS u(pool)
WHERE rn = 1
"""


@_register("iso1_isotonic_pava", _ISO1_SQL)
def iso1_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression by pool-adjacent-violators over the cal3
    calibration curve (per-score (sum_y, count) cells, x = md5 percent
    score): the fitted non-decreasing step function, each pool an exact
    (sum, count) rational so the oracle needs no float means — pool
    order is compared by cross multiplication. Spark folds the <=100
    pre-aggregated cells with an outer F.aggregate (push) whose step
    runs a bounded inner F.aggregate (merge top-two pools while they
    violate monotonicity — at most stack-depth merges, expressed as 100
    conditional no-op iterations, evaluated iteratively not unrolled);
    DuckDB replays the SAME machine one ACTION per recursion row (push
    or merge, <= 2n+1 steps). The 100 TB shape: the raw scan reduces to
    <=100 cells by a combinable group-by — the sequential tail is O(bins),
    which is how monotone calibrators are actually fit on large data."""
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
        ).alias("x"),
        F.when(
            (F.col("c_custkey") % 2 == 0) == (F.col("c_custkey") % 3 == 0), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    pts = scored.groupBy("x").agg(
        F.sum("y").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    packed = pts.agg(
        F.array_sort(F.collect_list(F.struct("x", "s", "c"))).alias("p")
    )
    acc0 = F.expr(
        "CAST(array() AS ARRAY<STRUCT<lo: BIGINT, hi: BIGINT,"
        " s: BIGINT, c: BIGINT>>)"
    )

    def violates(st):
        a = F.element_at(st, -2)
        b = F.element_at(st, -1)
        return (F.size(st) >= 2) & (a["s"] * b["c"] >= b["s"] * a["c"])

    def merge_top(st):
        a = F.element_at(st, -2)
        b = F.element_at(st, -1)
        merged = F.struct(
            a["lo"].alias("lo"),
            b["hi"].alias("hi"),
            (a["s"] + b["s"]).alias("s"),
            (a["c"] + b["c"]).alias("c"),
        )
        return F.concat(
            F.slice(st, 1, F.size(st) - 2), F.array(merged)
        )

    def push(st, pt):
        pushed = F.concat(
            st,
            F.array(
                F.struct(
                    pt["x"].alias("lo"),
                    pt["x"].alias("hi"),
                    pt["s"].alias("s"),
                    pt["c"].alias("c"),
                )
            ),
        )
        # bounded merge loop: 100 conditional iterations (stack depth cap)
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(100)),
            pushed,
            lambda acc, _i: F.when(violates(acc), merge_top(acc)).otherwise(acc),
        )

    folded = packed.select(
        F.aggregate("p", acc0, push).alias("pools")
    )
    pool = folded.select(F.explode("pools").alias("pool"))
    return pool.select(
        F.col("pool.lo").alias("x_lo"),
        F.col("pool.hi").alias("x_hi"),
        F.col("pool.s").alias("sum_y"),
        F.col("pool.c").alias("n"),
    )


# =========================================================================
# cpm1: critical path (max-plus longest path) over a layered sparse DAG
# =========================================================================

_CPM1_SQL = """
WITH nodes AS (
  SELECT s_suppkey AS id, s_suppkey % 4 AS layer, s_suppkey // 16 AS bkt
  FROM supplier
), edges AS (
  SELECT u.id AS src, v.id AS dst,
         CAST(CAST('0x' || substr(md5('w' || CAST(u.id AS VARCHAR) || '_'
                  || CAST(v.id AS VARCHAR)), 1, 8) AS BIGINT) % 50 + 1
              AS BIGINT) AS w
  FROM nodes u JOIN nodes v
    ON u.bkt = v.bkt AND v.layer = u.layer + 1
  WHERE CAST('0x' || substr(md5('e' || CAST(u.id AS VARCHAR) || '_'
              || CAST(v.id AS VARCHAR)), 1, 8) AS BIGINT) % 3 < 2
), d0 AS (
  SELECT id, CAST(0 AS BIGINT) AS dist FROM nodes WHERE layer = 0
), d1 AS (
  SELECT e.dst AS id, MAX(d.dist + e.w) AS dist
  FROM d0 d JOIN edges e ON e.src = d.id GROUP BY e.dst
), d2 AS (
  SELECT e.dst AS id, MAX(d.dist + e.w) AS dist
  FROM d1 d JOIN edges e ON e.src = d.id GROUP BY e.dst
), d3 AS (
  SELECT e.dst AS id, MAX(d.dist + e.w) AS dist,
         MIN(e.src) FILTER (
           WHERE d.dist + e.w = (SELECT MAX(d2.dist + e2.w)
                                 FROM d2 JOIN edges e2 ON e2.src = d2.id
                                 WHERE e2.dst = e.dst)
         ) AS best_pred
  FROM d2 d JOIN edges e ON e.src = d.id GROUP BY e.dst
)
SELECT id AS node, CAST(dist AS BIGINT) AS critical_len,
       CAST(best_pred AS BIGINT) AS best_pred
FROM d3
"""


@_register("cpm1_critical_path", _CPM1_SQL)
def cpm1_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical path through a 4-layer task DAG (PERT scheduling): sp1
    ran Bellman-Ford in the MIN-plus semiring, cpm1 is the MAX-plus
    mirror — the longest (schedule-critical) distance to every final-
    layer task, plus the deterministic argmax predecessor (min id among
    maximizers). The DAG is locality-bucketed (edges only within a
    16-key bucket, md5-thinned to ~2/3) so edge generation is an
    EQUI-join on (bucket, adjacent layers) — never all-pairs — and each
    relaxation round is one shuffle-on-dst aggregate; depth is fixed by
    the layer count, so the whole thing is 3 joins, no iteration state.
    Unreachable tasks fall out of the inner joins, exactly as PERT
    treats tasks with no feasible start."""
    s = _t(spark, sf_dir, "supplier")
    nodes = s.select(
        F.col("s_suppkey").alias("id"),
        (F.col("s_suppkey") % 4).alias("layer"),
        F.expr("s_suppkey div 16").alias("bkt"),
    )

    def _h(prefix: str, a: F.Column, b: F.Column) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        a.cast("string"),
                        F.lit("_"),
                        b.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    u = nodes.alias("u")
    v = nodes.alias("v")
    edges = (
        u.join(
            v,
            (F.col("u.bkt") == F.col("v.bkt"))
            & (F.col("v.layer") == F.col("u.layer") + 1),
        )
        .where(_h("e", F.col("u.id"), F.col("v.id")) % 3 < 2)
        .select(
            F.col("u.id").alias("src"),
            F.col("v.id").alias("dst"),
            (_h("w", F.col("u.id"), F.col("v.id")) % 50 + 1).alias("w"),
        )
    )
    dist = nodes.where(F.col("layer") == 0).select(
        "id", F.lit(0).cast("bigint").alias("dist")
    )
    for _round in range(2):
        dist = (
            dist.join(edges, dist["id"] == edges["src"])
            .groupBy("dst")
            .agg(F.max(F.col("dist") + F.col("w")).alias("dist"))
            .select(F.col("dst").alias("id"), "dist")
        )
    last = (
        dist.join(edges, dist["id"] == edges["src"])
        .groupBy("dst")
        .agg(
            F.max(F.col("dist") + F.col("w")).alias("critical_len"),
            F.min_by(
                "src",
                F.struct(
                    (-(F.col("dist") + F.col("w"))).alias("neg"),
                    F.col("src").alias("s"),
                ),
            ).alias("best_pred"),
        )
    )
    return last.select(
        F.col("dst").alias("node"),
        F.col("critical_len").cast("bigint").alias("critical_len"),
        F.col("best_pred").cast("bigint").alias("best_pred"),
    )


# =========================================================================
# sec1: secretary stopping rule replay
# =========================================================================

_SEC1_SQL = """
WITH seq AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5('q' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS BIGINT) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), packed AS (
  SELECT user_id, list({'i': i, 'v': v} ORDER BY i) AS lst,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 15
), staged AS (
  SELECT user_id, lst, n,
         list_max(list_transform(lst[1:11], s0 -> s0.v)) AS obs_max
  FROM packed
), chosen AS (
  SELECT user_id, n, obs_max,
         COALESCE(list_filter(lst, s1 -> s1.i >= 12 AND s1.v > obs_max)[1],
                  lst[-1]) AS pick,
         list_max(list_transform(lst, s2 -> s2.v)) AS best_v
  FROM staged
)
SELECT user_id, n, CAST(obs_max AS BIGINT) AS obs_max,
       CAST(pick.i AS BIGINT) AS chosen_i,
       CAST(pick.v AS BIGINT) AS chosen_v,
       CAST(best_v AS BIGINT) AS best_v,
       pick.v = best_v AS hit_best
FROM chosen
"""


@_register("sec1_secretary_rule", _SEC1_SQL)
def sec1_secretary_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic secretary/optimal-stopping rule replayed per user
    over their first-30 md5 value trace: observe the first 11 (~n/e),
    then commit to the first later value exceeding the observed max,
    falling back to the last value — emitting the pick, the global max,
    and the hit-the-best flag (the ~37% success readout is one AVG over
    this column). Pure array pipeline — slice for the observation
    window, one filter for the first qualifying candidate, coalesce for
    the fallback — no recursion, no shuffle beyond the per-user
    collect; the policy-replay-on-logged-traces pattern (lru1, ops1)
    with a decision rule instead of a cache."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("q"), F.col("event_id").cast("string"))),
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
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_list(F.struct("i", "v"))).alias("lst"),
    ).where(F.col("n") >= 15)
    staged = packed.withColumn(
        "obs_max",
        F.array_max(
            F.transform(F.slice("lst", 1, 11), lambda s: s["v"])
        ),
    )
    chosen = staged.select(
        "user_id",
        "n",
        "obs_max",
        F.coalesce(
            F.try_element_at(
                F.filter(
                    "lst",
                    lambda s: (s["i"] >= 12) & (s["v"] > F.col("obs_max")),
                ),
                F.lit(1),
            ),
            F.element_at("lst", -1),
        ).alias("pick"),
        F.array_max(F.transform("lst", lambda s: s["v"])).alias("best_v"),
    )
    return chosen.select(
        "user_id",
        "n",
        "obs_max",
        F.col("pick.i").alias("chosen_i"),
        F.col("pick.v").alias("chosen_v"),
        "best_v",
        (F.col("pick.v") == F.col("best_v")).alias("hit_best"),
    )
