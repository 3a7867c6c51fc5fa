"""Round-3 wave 60: iterated-map kernels.

- cyc1: rho-shaped cycle detection on a functional graph (x ->
  md5(x) % N) — tail length and cycle length per start, the structure
  under Pollard-rho factoring and random-mapping statistics, found by
  direct trajectory replay with first-revisit detection.
- perm2: cycle decomposition of an md5-derived PERMUTATION — cycle
  count and the sorted cycle-length multiset (lengths must sum to n;
  a permutation's rho has no tail, the contrast with cyc1).
- collatz1: Collatz trajectory lengths and peaks for md5 starts — the
  iterated map with unbounded excursions, folded with a step cap and
  the famous 27 -> 9232 checkpoint pinned in the property layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# cyc1: rho cycle detection on the md5 functional graph
# =========================================================================

_CYC1_SQL = """
WITH RECURSIVE starts AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('st' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 64 AS BIGINT) AS x0
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 15)
), r AS (
  SELECT key, x0, CAST(0 AS BIGINT) AS i, x0 AS x,
         [x0] AS seen, CAST(-1 AS BIGINT) AS hit_at
  FROM starts
  UNION ALL
  SELECT key, x0, i + 1, nx,
         list_append(seen, nx),
         CASE WHEN list_position(seen, nx) > 0
              THEN CAST(list_position(seen, nx) - 1 AS BIGINT)
              ELSE -1 END
  FROM (
    SELECT *, CAST(CAST('0x' || substr(md5('fn' || CAST(x AS VARCHAR)), 1, 8)
                   AS BIGINT) % 64 AS BIGINT) AS nx
    FROM r WHERE hit_at = -1 AND i < 70
  )
), final AS (
  SELECT key, x0, i, hit_at,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY i DESC) AS rn
  FROM r
)
SELECT key, x0,
       hit_at AS tail_len,
       CAST(i - hit_at AS BIGINT) AS cycle_len
FROM final WHERE rn = 1
"""


@_register("cyc1_rho_cycle", _CYC1_SQL)
def cyc1_rho_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rho-shaped cycle structure of the functional graph x ->
    md5(x) % 64, from 15 md5 start points: iterate until the first
    REVISITED value — its first-seen index is the tail length, and the
    steps since are the cycle length (the rho's handle and loop, the
    structure Pollard-rho factoring and random-mapping theory live
    on). On a 64-point space every trajectory closes within 65 steps,
    so the 70-step bound never truncates (certified in the property
    layer along with a full Python replay and the invariant
    tail + cycle <= 65). The seen-list fold is the honest bounded
    replay; Floyd's constant-memory version exists for unbounded
    spaces — noted, not needed at this instance size."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(15)
    )
    starts = o.select(
        F.col("o_orderkey").alias("key"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("st"), F.col("o_orderkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 64
        ).alias("x0"),
    )
    acc0 = F.expr(
        "named_struct('x', CAST(-1 AS BIGINT),"
        " 'seen', CAST(array() AS ARRAY<BIGINT>),"
        " 'hit_at', CAST(-1 AS BIGINT), 'i', CAST(0 AS BIGINT))"
    )

    def step(acc, _k):
        x = F.when(acc["i"] == 0, F.col("x0")).otherwise(acc["x"])
        seen = F.when(acc["i"] == 0, F.array(F.col("x0"))).otherwise(
            acc["seen"]
        )
        nx = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("fn"), x.cast("string"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 64
        )
        pos = F.array_position(seen, nx)
        stepped = F.struct(
            nx.alias("x"),
            F.concat(seen, F.array(nx)).alias("seen"),
            F.when(pos > 0, (pos - 1).cast("bigint"))
            .otherwise(F.lit(-1).cast("bigint"))
            .alias("hit_at"),
            (acc["i"] + 1).alias("i"),
        )
        return F.when(acc["hit_at"] != -1, acc).otherwise(stepped)

    folded = starts.select(
        "key",
        "x0",
        F.aggregate(F.sequence(F.lit(1), F.lit(70)), acc0, step).alias("s"),
    )
    return folded.select(
        "key",
        "x0",
        F.col("s.hit_at").alias("tail_len"),
        (F.col("s.i") - F.col("s.hit_at")).cast("bigint").alias("cycle_len"),
    )


# =========================================================================
# perm2: permutation cycle decomposition
# =========================================================================

_PERM2_SQL = """
WITH RECURSIVE base AS (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5('pm' || CAST(v AS VARCHAR)), v) - 1 AS BIGINT) AS img,
         CAST(v AS BIGINT) AS v
  FROM (SELECT unnest(range(0, 30)) AS v)
), packed AS (
  SELECT list(img ORDER BY v) AS p FROM base
), r AS (
  SELECT CAST(0 AS BIGINT) AS step,
         CAST([] AS BIGINT[]) AS visited,
         CAST([] AS BIGINT[]) AS lens,
         CAST(-1 AS BIGINT) AS cur,
         CAST(-1 AS BIGINT) AS cstart,
         CAST(0 AS BIGINT) AS clen,
         p
  FROM packed
  UNION ALL
  SELECT step + 1,
         CASE WHEN cur = -1 THEN visited ELSE list_append(visited, cur) END,
         CASE WHEN cur <> -1 AND p[CAST(cur AS INTEGER) + 1] = cstart
              THEN list_append(lens, clen + 1) ELSE lens END,
         CASE
           WHEN cur = -1 THEN
             list_min(list_filter(range(0, 30),
                      z -> NOT list_contains(visited, z)))
           WHEN p[CAST(cur AS INTEGER) + 1] = cstart THEN -1
           ELSE p[CAST(cur AS INTEGER) + 1] END,
         CASE
           WHEN cur = -1 THEN
             list_min(list_filter(range(0, 30),
                      z -> NOT list_contains(visited, z)))
           WHEN p[CAST(cur AS INTEGER) + 1] = cstart THEN -1
           ELSE cstart END,
         CASE WHEN cur = -1 THEN 0
              WHEN p[CAST(cur AS INTEGER) + 1] = cstart THEN 0
              ELSE clen + 1 END,
         p
  FROM r
  WHERE step < 62 AND (cur <> -1 OR len(visited) < 30)
), final AS (
  SELECT lens, ROW_NUMBER() OVER (ORDER BY step DESC) AS rn FROM r
)
SELECT CAST(len(lens) AS BIGINT) AS n_cycles,
       array_to_string(list_sort(lens), '/') AS cycle_lengths,
       CAST(list_sum(lens) AS BIGINT) AS total
FROM final WHERE rn = 1
"""


@_register("perm2_cycle_decomposition", _PERM2_SQL)
def perm2_cycle_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cycle decomposition of the md5-derived permutation of 0..29
    (images = ranks of md5 values — ranking any distinct keyset IS a
    permutation): walk each unvisited minimum element around its cycle,
    record the length, repeat — the state machine doing one hop (or one
    cycle-start pick) per step, <=62 steps total. Emits the cycle
    count, the sorted length multiset, and their sum, which MUST be 30
    (permutations partition the domain — the contrast with cyc1's
    rho tails, which only non-bijective maps have). Python replay plus
    the partition identity in the property layer. `sf_dir` seeds
    determinism only (generated spine)."""
    _ = sf_dir
    from pyspark.sql.window import Window

    base = (
        spark.range(0, 30)
        .select(F.col("id").cast("bigint").alias("v"))
        .select(
            "v",
            (
                F.row_number().over(
                    Window.orderBy(
                        F.md5(F.concat(F.lit("pm"), F.col("v").cast("string"))),
                        "v",
                    )
                )
                - 1
            )
            .cast("bigint")
            .alias("img"),
        )
    )
    packed = base.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("v", "img"))),
            lambda s: s["img"],
        ).alias("p")
    )
    acc0 = F.expr(
        "named_struct("
        "'visited', CAST(array() AS ARRAY<BIGINT>),"
        "'lens', CAST(array() AS ARRAY<BIGINT>),"
        "'cur', CAST(-1 AS BIGINT),"
        "'cstart', CAST(-1 AS BIGINT),"
        "'clen', CAST(0 AS BIGINT))"
    )

    def step(acc, _k):
        p = F.col("p")
        cur = acc["cur"]
        nxt_of_cur = F.element_at(p, (cur + 1).cast("int"))
        closing = (cur != -1) & (nxt_of_cur == acc["cstart"])
        fresh = F.array_min(
            F.filter(
                F.sequence(F.lit(0), F.lit(29)).cast("array<bigint>"),
                lambda z: ~F.array_contains(acc["visited"], z),
            )
        )
        new_visited = F.when(cur == -1, acc["visited"]).otherwise(
            F.concat(acc["visited"], F.array(cur))
        )
        new_lens = F.when(
            closing, F.concat(acc["lens"], F.array(acc["clen"] + 1))
        ).otherwise(acc["lens"])
        new_cur = F.when(cur == -1, fresh).otherwise(
            F.when(closing, F.lit(-1).cast("bigint")).otherwise(nxt_of_cur)
        )
        new_cstart = F.when(cur == -1, fresh).otherwise(
            F.when(closing, F.lit(-1).cast("bigint")).otherwise(acc["cstart"])
        )
        new_clen = F.when((cur == -1) | closing, F.lit(0).cast("bigint")).otherwise(
            acc["clen"] + 1
        )
        stepped = F.struct(
            new_visited.alias("visited"),
            new_lens.alias("lens"),
            new_cur.alias("cur"),
            new_cstart.alias("cstart"),
            new_clen.alias("clen"),
        )
        done = (cur == -1) & (F.size(acc["visited"]) >= 30)
        return F.when(done, acc).otherwise(stepped)

    folded = packed.select(
        "p",
        F.aggregate(F.sequence(F.lit(1), F.lit(62)), acc0, step)["lens"].alias(
            "lens"
        ),
    )
    return folded.select(
        F.size("lens").cast("bigint").alias("n_cycles"),
        F.array_join(
            F.transform(F.array_sort("lens"), lambda x: x.cast("string")), "/"
        ).alias("cycle_lengths"),
        F.aggregate(
            F.col("lens"), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("total"),
    )


# =========================================================================
# collatz1: Collatz trajectory statistics
# =========================================================================

_COLLATZ1_SQL = """
WITH RECURSIVE starts AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('cz' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 9999 + 2 AS BIGINT) AS n0
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)
), r AS (
  SELECT key, n0, CAST(0 AS BIGINT) AS steps, n0 AS n, n0 AS peak
  FROM starts
  UNION ALL
  SELECT key, n0, steps + 1,
         CASE WHEN n % 2 = 0 THEN n // 2 ELSE 3 * n + 1 END,
         greatest(peak, CASE WHEN n % 2 = 0 THEN n // 2 ELSE 3 * n + 1 END)
  FROM r WHERE n > 1 AND steps < 300
), final AS (
  SELECT key, n0, steps, n, peak,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY steps DESC) AS rn
  FROM r
)
SELECT key, n0, steps AS trajectory_len, peak,
       n = 1 AS reached_one
FROM final WHERE rn = 1
"""


@_register("collatz1_trajectories", _COLLATZ1_SQL)
def collatz1_trajectories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collatz (3n+1) trajectory length and peak for 20 md5 starts up
    to 10^4 — the iterated map whose excursions wildly overshoot the
    start (peaks routinely 100x n0), folded with a 300-step cap that
    verified-up-to-2^68 mathematics says never binds below 10^4 (max
    trajectory under 10^4 is 261 steps, from 6171; `reached_one` must
    be TRUE on every row). The property layer replays in Python and
    pins the celebrated 27 -> 9232 peak as a direct checkpoint of the
    same fold arithmetic. Per-row bounded fold, scalar state (n, peak,
    steps) — the cyc1/modpow1 shape with a famous open conjecture
    inside."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(20)
    )
    starts = o.select(
        F.col("o_orderkey").alias("key"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cz"), F.col("o_orderkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 9999
            + 2
        ).alias("n0"),
    )
    acc0 = F.expr(
        "named_struct('n', CAST(-1 AS BIGINT), 'peak', CAST(-1 AS BIGINT),"
        " 'steps', CAST(0 AS BIGINT))"
    )

    def step(acc, _k):
        n = F.when(acc["n"] == -1, F.col("n0")).otherwise(acc["n"])
        peak = F.when(acc["peak"] == -1, F.col("n0")).otherwise(acc["peak"])
        nxt = F.when(n % 2 == 0, ((n - n % 2) / 2).cast("bigint")).otherwise(
            3 * n + 1
        )
        stepped = F.struct(
            nxt.alias("n"),
            F.greatest(peak, nxt).alias("peak"),
            (acc["steps"] + 1).alias("steps"),
        )
        done = n <= 1
        return F.when(
            done, F.struct(n.alias("n"), peak.alias("peak"), acc["steps"].alias("steps"))
        ).otherwise(stepped)

    folded = starts.select(
        "key",
        "n0",
        F.aggregate(F.sequence(F.lit(1), F.lit(300)), acc0, step).alias("s"),
    )
    return folded.select(
        "key",
        "n0",
        F.col("s.steps").alias("trajectory_len"),
        F.col("s.peak").alias("peak"),
        (F.col("s.n") == 1).alias("reached_one"),
    )
