"""Round-3 wave 49: bin packing, Morris counter, join-order DP.

- bp1: first-fit-decreasing bin packing — the compaction/shard-output
  planner (pack variable-size files into fixed-capacity outputs): FFD
  as a fold whose state is the bin fill list, with the full assignment
  trail checked and the ceil(total/cap) lower bound asserted.
- morris1: the Morris approximate counter — the ORIGINAL (1977)
  streaming sketch: increment with probability 2^-c, here an md5 coin
  against a modulus carried in state (no pow() anywhere), estimate =
  2^c - 1; completes the sketch shelf with its log-space counter.
- jo1: optimal parenthesization by interval DP (matrix-chain form) —
  the join-order/cost DP every optimizer runs: 15 cells in
  increasing-length order, each the min over split points; the
  property layer brute-forces ALL 42 parenthesizations to certify
  optimality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# bp1: first-fit-decreasing bin packing
# =========================================================================

_BP1_SQL = """
WITH RECURSIVE items AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('sz' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 900 + 100 AS BIGINT) AS sz
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 30)
), ordered AS (
  SELECT key, sz,
         CAST(ROW_NUMBER() OVER (ORDER BY sz DESC, key) AS BIGINT) AS i
  FROM items
), packed AS (
  SELECT list({'key': key, 'sz': sz} ORDER BY i) AS its,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered
), r AS (
  SELECT CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS bins,
         CAST([] AS STRUCT(key BIGINT, sz BIGINT, b BIGINT)[]) AS tr,
         its, n
  FROM packed
  UNION ALL
  SELECT i + 1,
         CASE WHEN fit IS NULL
              THEN list_append(bins, its[i + 1].sz)
              ELSE list_transform(range(0, CAST(len(bins) AS BIGINT)), bi ->
                     bins[bi + 1] + CASE WHEN bi = fit
                                         THEN its[i + 1].sz ELSE 0 END)
         END,
         list_append(tr, {'key': its[i + 1].key, 'sz': its[i + 1].sz,
                          'b': coalesce(fit, CAST(len(bins) AS BIGINT))}),
         its, n
  FROM (
    SELECT *,
           list_filter(range(0, CAST(len(bins) AS BIGINT)), bi ->
             bins[bi + 1] + its[i + 1].sz <= 1000)[1] AS fit
    FROM r WHERE i < n
  )
), final AS (
  SELECT bins, tr, ROW_NUMBER() OVER (ORDER BY i DESC) AS rn FROM r
)
SELECT CAST(u.e.key AS BIGINT) AS key,
       CAST(u.e.sz AS BIGINT) AS sz,
       CAST(u.e.b AS BIGINT) AS bin_idx,
       CAST((SELECT len(f2.bins) FROM final f2 WHERE f2.rn = 1) AS BIGINT)
         AS n_bins
FROM final f, unnest(f.tr) AS u(e)
WHERE f.rn = 1
"""


@_register("bp1_bin_packing", _BP1_SQL)
def bp1_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing bin packing of 30 md5-sized files
    (100-999 units) into capacity-1000 bins — the planner behind
    compaction output sizing and shard packing (cp1 rewrites files;
    bp1 decides what goes together). Items sort by size descending and
    fold through the bin-fill list: each goes to the FIRST bin it fits
    (the index found by filtering the bin-index range), else opens a
    new one. The full assignment trail (item, size, bin) plus the final
    bin count is oracle-checked; the property layer asserts no bin
    overflows, FFD's bins >= ceil(total/capacity) lower bound, and the
    11/9·OPT+1 classical guarantee against that bound. Per-instance
    state is O(bins) — at 100 TB you pack per partition/table, many
    independent instances in parallel."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(30)
    )
    items = o.select(
        F.col("o_orderkey").alias("key"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sz"), F.col("o_orderkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 900
            + 100
        ).alias("sz"),
    )
    wd = Window.orderBy(F.col("sz").desc(), "key")
    ordered = items.withColumn(
        "i", F.row_number().over(wd).cast("bigint")
    )
    packed = ordered.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "key", "sz"))),
            lambda s: F.struct(s["key"].alias("key"), s["sz"].alias("sz")),
        ).alias("its")
    )
    acc0 = F.expr(
        "named_struct('bins', CAST(array() AS ARRAY<BIGINT>),"
        " 'tr', CAST(array() AS ARRAY<STRUCT<key: BIGINT, sz: BIGINT,"
        " b: BIGINT>>))"
    )

    def step(acc, it):
        bins = acc["bins"]
        sz = it["sz"]
        # index the bins themselves (sequence(0, size-1) on an empty
        # list is the DESCENDING [0,-1] trap)
        fit = F.try_element_at(
            F.filter(
                F.transform(
                    bins,
                    lambda b, bi: F.struct(
                        bi.cast("bigint").alias("bi"), b.alias("b")
                    ),
                ),
                lambda s: s["b"] + sz <= 1000,
            ),
            F.lit(1),
        )["bi"]
        grown = F.concat(bins, F.array(sz))
        filled = F.transform(
            bins,
            lambda b, bi: b
            + F.when(bi.cast("bigint") == fit, sz).otherwise(0),
        )
        b_idx = F.coalesce(fit, F.size(bins).cast("bigint"))
        return F.struct(
            F.when(fit.isNull(), grown).otherwise(filled).alias("bins"),
            F.concat(
                acc["tr"],
                F.array(
                    F.struct(
                        it["key"].alias("key"),
                        sz.alias("sz"),
                        b_idx.alias("b"),
                    )
                ),
            ).alias("tr"),
        )

    folded = packed.select(
        F.aggregate("its", acc0, step).alias("m")
    )
    ex = folded.select(
        F.size(F.col("m.bins")).cast("bigint").alias("n_bins"),
        F.explode(F.col("m.tr")).alias("e"),
    )
    return ex.select(
        F.col("e.key").alias("key"),
        F.col("e.sz").alias("sz"),
        F.col("e.b").alias("bin_idx"),
        "n_bins",
    )


# =========================================================================
# morris1: Morris approximate counter (md5 coins, modulus-in-state)
# =========================================================================

_MORRIS1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, CAST(event_id AS VARCHAR) AS eid,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 30
), packed AS (
  SELECT user_id, list(eid ORDER BY i) AS eids, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 10
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS c,
         CAST(1 AS BIGINT) AS m, eids, n
  FROM packed
  UNION ALL
  SELECT user_id, i + 1,
         c + CASE WHEN CAST('0x' || substr(md5('mc' || eids[i + 1]), 1, 8)
                       AS BIGINT) % m = 0 THEN 1 ELSE 0 END,
         m * CASE WHEN CAST('0x' || substr(md5('mc' || eids[i + 1]), 1, 8)
                       AS BIGINT) % m = 0 THEN 2 ELSE 1 END,
         eids, n
  FROM r WHERE i < n
), final AS (
  SELECT user_id, n, c, m,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, n, c, m - 1 AS estimate
FROM final WHERE rn = 1
"""


@_register("morris1_approx_counter", _MORRIS1_SQL)
def morris1_approx_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morris approximate counter (1977 — the first streaming
    sketch) replayed per user: increment the exponent c with
    probability 2^-c, realized as a deterministic md5 coin tested
    against a MODULUS carried in state (m = 2^c, doubled on each
    increment — no pow()/shift anywhere, the hll1 portability
    discipline); the count estimate is m - 1 = 2^c - 1 from log-log
    bits of state. Emitted beside the true n so the property layer can
    assert the estimate is positive, monotone-bounded (c <= n,
    2^c <= 2n... loose sanity), and exactly replayed by hashlib.
    Completes the sketch shelf: hll1/kmv1 distinct, ams1 F2, cms1
    frequency, bloom1 membership, dgim1 windows, morris1 raw counts."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_id").cast("string").alias("eid"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 30)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "eid"))),
            lambda st: st["eid"],
        ).alias("eids"),
    ).where(F.col("n") >= 10)
    acc0 = F.expr(
        "named_struct('c', CAST(0 AS BIGINT), 'm', CAST(1 AS BIGINT))"
    )

    def step(acc, eid):
        coin = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("mc"), eid)), 1, 8), 16, 10
            ).cast("bigint")
            % acc["m"]
            == 0
        )
        return F.struct(
            (acc["c"] + F.when(coin, 1).otherwise(0)).alias("c"),
            (acc["m"] * F.when(coin, 2).otherwise(1)).alias("m"),
        )

    folded = packed.select(
        "user_id",
        "n",
        F.aggregate("eids", acc0, step).alias("s"),
    )
    return folded.select(
        "user_id",
        "n",
        F.col("s.c").alias("c"),
        (F.col("s.m") - 1).alias("estimate"),
    )


# =========================================================================
# jo1: join-order / matrix-chain interval DP
# =========================================================================

_JO1_SQL = """
WITH RECURSIVE dims AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS BIGINT) AS di,
         CAST(CAST('0x' || substr(md5('d' || CAST(p_partkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 20 + 1 AS BIGINT) AS d
  FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 7)
), dpack AS (
  SELECT list(d ORDER BY di) AS d FROM dims
), cells AS (
  SELECT ln.ln, st.st,
         CAST(ROW_NUMBER() OVER (ORDER BY ln.ln, st.st) AS BIGINT) AS ci
  FROM (SELECT unnest(range(2, 7)) AS ln) ln
  JOIN (SELECT unnest(range(1, 7)) AS st) st ON st.st + ln.ln - 1 <= 6
), cpack AS (
  SELECT list({'ln': ln, 'st': st} ORDER BY ci) AS cs,
         CAST(COUNT(*) AS BIGINT) AS nc
  FROM cells
), r AS (
  SELECT CAST(0 AS BIGINT) AS i,
         list_transform(range(0, 36), x -> CAST(0 AS BIGINT)) AS dp,
         CAST([] AS STRUCT(i BIGINT, j BIGINT, cost BIGINT, k BIGINT)[]) AS tr,
         d, cs, nc
  FROM dpack, cpack
  UNION ALL
  SELECT i + 1,
         list_transform(range(0, 36), x ->
           CASE WHEN x = (cs[i + 1].ln - 1) * 6 + cs[i + 1].st - 1
                THEN best.cost ELSE dp[x + 1] END),
         list_append(tr, {'i': cs[i + 1].st,
                          'j': cs[i + 1].st + cs[i + 1].ln - 1,
                          'cost': best.cost, 'k': best.k}),
         d, cs, nc
  FROM (
    SELECT *,
           list_sort(list_transform(
             range(cs[i + 1].st, cs[i + 1].st + cs[i + 1].ln - 1), k ->
               {'cost': dp[(k - cs[i + 1].st + 1 - 1) * 6 + cs[i + 1].st - 1 + 1]
                        + dp[(cs[i + 1].st + cs[i + 1].ln - 1 - k - 1) * 6 + k + 1 - 1 + 1]
                        + d[cs[i + 1].st - 1 + 1] * d[k + 1]
                          * d[cs[i + 1].st + cs[i + 1].ln - 1 + 1],
                'k': k}))[1] AS best
    FROM r WHERE i < nc
  )
), final AS (
  SELECT tr, ROW_NUMBER() OVER (ORDER BY i DESC) AS rn FROM r
)
SELECT CAST(u.e.i AS BIGINT) AS lo,
       CAST(u.e.j AS BIGINT) AS hi,
       CAST(u.e.cost AS BIGINT) AS cost,
       CAST(u.e.k AS BIGINT) AS best_split
FROM final, unnest(final.tr) AS u(e)
WHERE rn = 1
"""


@_register("jo1_join_order_dp", _JO1_SQL)
def jo1_join_order_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal parenthesization by interval DP — the matrix-chain /
    join-order cost recurrence every optimizer runs: 6 relations with
    md5 interface cardinalities d[0..6] (from the 7 smallest partkeys),
    dp[i,j] = min over k of dp[i,k] + dp[k+1,j] + d[i-1]*d[k]*d[j],
    computed over the 15 (length, start) cells in increasing-length
    order so every lookup is already final. The dp table rides the fold
    as a flat 21-slot array keyed by (len-1)*6 + start - 1; each cell's
    argmin split (tiebreak lowest k) is emitted with its cost. The
    property layer brute-forces ALL 42 parenthesizations (Catalan(5))
    and certifies dp[1,6] is the true optimum — the strongest possible
    check for a DP. Scan cost is 7 rows; the point is the in-cell
    recurrence pattern (dtw1/knap1's family) applied to the
    optimizer's own problem."""
    p7 = (
        _t(spark, sf_dir, "part")
        .select("p_partkey")
        .orderBy("p_partkey")
        .limit(7)
    )
    dims = p7.select(
        (
            F.row_number().over(Window.orderBy("p_partkey")).cast("bigint") - 1
        ).alias("di"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("d"), F.col("p_partkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 20
            + 1
        ).alias("d"),
    )
    dpack = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("di", "d"))),
            lambda s: s["d"],
        ).alias("d")
    )
    cells = [
        (ln, st) for ln in range(2, 7) for st in range(1, 7) if st + ln - 1 <= 6
    ]
    cells.sort()
    cs_expr = F.array(
        *[
            F.struct(
                F.lit(ln).cast("bigint").alias("ln"),
                F.lit(st).cast("bigint").alias("st"),
            )
            for ln, st in cells
        ]
    )
    seeded = dpack.select("d", cs_expr.alias("cs"))
    acc0 = F.expr(
        "named_struct("
        "'dp', transform(sequence(0, 35), x -> CAST(0 AS BIGINT)),"
        "'tr', CAST(array() AS ARRAY<STRUCT<i: BIGINT, j: BIGINT,"
        " cost: BIGINT, k: BIGINT>>))"
    )

    def flat(ln, st):
        # dp slot for the interval starting at st with length ln
        return (ln - 1) * 6 + st - 1

    def step(acc, cell):
        dp = acc["dp"]
        ln = cell["ln"]
        st = cell["st"]
        j = st + ln - 1
        d = F.col("d")

        def dval(l2, s2):
            return F.element_at(dp, (flat(l2, s2) + 1).cast("int"))

        cand = F.transform(
            F.sequence(st, j - 1),
            lambda k: F.struct(
                (
                    dval(k - st + 1, st)
                    + dval(j - k, k + 1)
                    + F.element_at(d, st.cast("int"))
                    * F.element_at(d, (k + 1).cast("int"))
                    * F.element_at(d, (j + 1).cast("int"))
                ).alias("cost"),
                k.alias("k"),
            ),
        )
        best = F.element_at(F.array_sort(cand), 1)
        new_dp = F.transform(
            dp,
            lambda x, xi: F.when(
                xi.cast("bigint") == flat(ln, st), best["cost"]
            ).otherwise(x),
        )
        return F.struct(
            new_dp.alias("dp"),
            F.concat(
                acc["tr"],
                F.array(
                    F.struct(
                        st.alias("i"),
                        j.alias("j"),
                        best["cost"].alias("cost"),
                        best["k"].alias("k"),
                    )
                ),
            ).alias("tr"),
        )

    folded = seeded.select(
        F.aggregate("cs", acc0, step)["tr"].alias("tr")
    )
    ex = folded.select(F.explode("tr").alias("e"))
    return ex.select(
        F.col("e.i").alias("lo"),
        F.col("e.j").alias("hi"),
        F.col("e.cost").alias("cost"),
        F.col("e.k").alias("best_split"),
    )
