"""Round-3 wave 44: Weisfeiler-Lehman refinement, stable matching.

- wl1: Weisfeiler-Lehman color refinement — structural graph
  fingerprints (the graph-dedup / graph-isomorphism-screening
  primitive): two rounds of color = md5(own color | sorted neighbor
  colors) over the tc1 md5 graph, emitting the color histogram per
  round; the refinement-only-splits invariant lives in the property
  layer.
- gs1: Gale-Shapley stable matching (proposers = 6 smallest customers,
  acceptors = 6 smallest suppliers, md5 preference orders): one
  proposal per state-machine step, <= 36 steps; the no-blocking-pair
  certificate is asserted independently in the property layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# wl1: Weisfeiler-Lehman color refinement (2 rounds)
# =========================================================================

_WL1_SQL = """
WITH raw AS (
  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-u'), 1, 4)
              AS BIGINT) % 499 AS u0,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-v'), 1, 4)
              AS BIGINT) % 499 AS v0
  FROM orders WHERE o_orderkey < 20000
), edges AS (
  SELECT DISTINCT least(u0, v0) AS u, greatest(u0, v0) AS v
  FROM raw WHERE u0 <> v0
), adj AS (
  SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges
), c0 AS (
  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS color FROM adj GROUP BY a
), c1 AS (
  SELECT n.node,
         CAST('0x' || substr(md5(CAST(n.color AS VARCHAR) || '|' ||
              array_to_string(list_sort(list(m.color)), ',')), 1, 8)
              AS BIGINT) AS color
  FROM c0 n JOIN adj ON adj.a = n.node JOIN c0 m ON m.node = adj.b
  GROUP BY n.node, n.color
), c2 AS (
  SELECT n.node,
         CAST('0x' || substr(md5(CAST(n.color AS VARCHAR) || '|' ||
              array_to_string(list_sort(list(m.color)), ',')), 1, 8)
              AS BIGINT) AS color
  FROM c1 n JOIN adj ON adj.a = n.node JOIN c1 m ON m.node = adj.b
  GROUP BY n.node, n.color
)
SELECT CAST(0 AS BIGINT) AS round, color, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM c0 GROUP BY color
UNION ALL
SELECT CAST(1 AS BIGINT), color, CAST(COUNT(*) AS BIGINT) FROM c1 GROUP BY color
UNION ALL
SELECT CAST(2 AS BIGINT), color, CAST(COUNT(*) AS BIGINT) FROM c2 GROUP BY color
"""


@_register("wl1_weisfeiler_lehman", _WL1_SQL)
def wl1_weisfeiler_lehman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weisfeiler-Lehman color refinement over the tc1 md5 graph
    (queries_px.py:1147's construction — md5-mixed keys onto 499
    vertices, capped key range): colors start as degrees, then two
    rounds of color := md5(own | sorted neighbor multiset) — the
    structural fingerprint used to screen graph isomorphism and dedup
    graph-shaped records (molecule/AST/workflow dedup). Emits the color
    HISTOGRAM per round; refinement can only SPLIT classes, so class
    counts are non-decreasing round over round (property-asserted).
    Each round is one neighbor join + one sorted-list aggregate per
    node — at 100 TB that's the standard iterated message-passing
    shape, state bounded by one color per node."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 20000)

    def mix(tag: str):
        h = F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(tag)))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 499

    raw = o.select(mix("-u").alias("u0"), mix("-v").alias("v0")).where(
        F.col("u0") != F.col("v0")
    )
    edges = raw.select(
        F.least("u0", "v0").alias("u"), F.greatest("u0", "v0").alias("v")
    ).distinct()
    adj = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    ).localCheckpoint(eager=True)
    colors = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("color")
    )

    def refine(c: DataFrame) -> DataFrame:
        n = c.alias("n")
        m = c.alias("m")
        return (
            n.join(adj, F.col("n.node") == F.col("a"))
            .join(m, F.col("m.node") == F.col("b"))
            .groupBy(F.col("n.node").alias("node"), F.col("n.color").alias("oc"))
            .agg(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("oc").cast("string"),
                                F.lit("|"),
                                F.array_join(
                                    F.array_sort(
                                        F.collect_list(F.col("m.color"))
                                    ),
                                    ",",
                                ),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .alias("color")
            )
            .select("node", "color")
        )

    c1 = refine(colors)
    c2 = refine(c1)

    def hist(c: DataFrame, rd: int) -> DataFrame:
        return c.groupBy("color").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes")
        ).select(
            F.lit(rd).cast("bigint").alias("round"), "color", "n_nodes"
        )

    return hist(colors, 0).unionAll(hist(c1, 1)).unionAll(hist(c2, 2))


# =========================================================================
# gs1: Gale-Shapley stable matching (one proposal per recursion step)
# =========================================================================

_GS1_SQL = """
WITH RECURSIVE cust AS (
  SELECT c_custkey AS ck,
         CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS m
  FROM customer ORDER BY c_custkey LIMIT 6
), supp AS (
  SELECT s_suppkey AS sk,
         CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS BIGINT) AS w
  FROM supplier ORDER BY s_suppkey LIMIT 6
), pair AS (
  SELECT c.m, s.w, c.ck, s.sk,
         CAST('0x' || substr(md5('mp' || CAST(c.ck AS VARCHAR) || '_'
                  || CAST(s.sk AS VARCHAR)), 1, 8) AS BIGINT) AS hm,
         CAST('0x' || substr(md5('wp' || CAST(s.sk AS VARCHAR) || '_'
                  || CAST(c.ck AS VARCHAR)), 1, 8) AS BIGINT) AS hw
  FROM cust c CROSS JOIN supp s
), mpref_rows AS (
  SELECT m, list(w ORDER BY hm, w) AS prefs FROM pair GROUP BY m
), wrank_rows AS (
  SELECT w, list(rk ORDER BY m) AS ranks
  FROM (
    SELECT w, m,
           CAST(ROW_NUMBER() OVER (PARTITION BY w ORDER BY hw, m) AS BIGINT)
             AS rk
    FROM pair
  ) GROUP BY w
), packed AS (
  SELECT (SELECT list(prefs ORDER BY m) FROM mpref_rows) AS mpref,
         (SELECT list(ranks ORDER BY w) FROM wrank_rows) AS wrank,
         (SELECT list(ck ORDER BY m) FROM cust) AS cks,
         (SELECT list(sk ORDER BY w) FROM supp) AS sks
), r AS (
  SELECT CAST(0 AS BIGINT) AS step,
         list_transform(range(0, 6), x -> CAST(-1 AS BIGINT)) AS eng,
         list_transform(range(0, 6), x -> CAST(1 AS BIGINT)) AS nxt,
         mpref, wrank, cks, sks
  FROM packed
  UNION ALL
  SELECT step + 1,
         CASE WHEN cur = -1 OR wrank[wp + 1][mf + 1] < wrank[wp + 1][cur + 1]
              THEN list_transform(range(0, 6), i ->
                     CASE WHEN i = wp THEN mf ELSE eng[i + 1] END)
              ELSE eng END,
         list_transform(range(0, 6), i ->
           nxt[i + 1] + CASE WHEN i = mf THEN 1 ELSE 0 END),
         mpref, wrank, cks, sks
  FROM (
    SELECT *, eng[wp + 1] AS cur
    FROM (
      SELECT *, mpref[mf + 1][CAST(nxt[mf + 1] AS INTEGER)] AS wp
      FROM (
        SELECT *,
               list_filter(range(0, 6), m ->
                 NOT list_contains(eng, m) AND nxt[m + 1] <= 6)[1] AS mf
        FROM r WHERE step < 36
      ) WHERE mf IS NOT NULL
    )
  )
), final AS (
  SELECT eng, mpref, wrank, cks, sks,
         ROW_NUMBER() OVER (ORDER BY step DESC) AS rn
  FROM r
)
SELECT CAST(f.sks[u.w + 1] AS BIGINT) AS s_suppkey,
       CAST(f.cks[f.eng[u.w + 1] + 1] AS BIGINT) AS c_custkey,
       CAST(list_position(f.mpref[f.eng[u.w + 1] + 1], u.w) AS BIGINT)
         AS m_rank_of_w,
       CAST(f.wrank[u.w + 1][f.eng[u.w + 1] + 1] AS BIGINT) AS w_rank_of_m
FROM final f, (SELECT unnest(range(0, 6)) AS w) u
WHERE f.rn = 1
"""


@_register("gs1_stable_matching", _GS1_SQL)
def gs1_stable_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gale-Shapley stable matching: the 6 smallest customers propose to
    the 6 smallest suppliers under md5 preference orders (account
    assignment / ad-slot / residency matching). One PROPOSAL per step —
    the lowest-index free proposer offers to the next supplier on his
    list; she accepts if free or if she ranks him above her current
    match (displacing the rival back to free) — at most 36 steps, each
    a pure array update, so the whole run is a bounded fold (Spark:
    F.aggregate over 36 conditional iterations; DuckDB: one action per
    recursion row). Emits each supplier's final customer with both
    sides' ranks; the no-blocking-pair certificate — the property that
    DEFINES stability — is asserted independently in the property
    layer. The instance is deliberately small (matching is global and
    sequential); the 100 TB story is many independent instances
    (per-region pools) keyed and folded in parallel."""
    c6 = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(6)
        .withColumn(
            "m",
            F.row_number().over(Window.orderBy("c_custkey")).cast("bigint") - 1,
        )
    )
    s6 = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .orderBy("s_suppkey")
        .limit(6)
        .withColumn(
            "w",
            F.row_number().over(Window.orderBy("s_suppkey")).cast("bigint") - 1,
        )
    )
    pair = c6.crossJoin(s6).select(
        "m",
        "w",
        "c_custkey",
        "s_suppkey",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("mp"),
                        F.col("c_custkey").cast("string"),
                        F.lit("_"),
                        F.col("s_suppkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hm"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("wp"),
                        F.col("s_suppkey").cast("string"),
                        F.lit("_"),
                        F.col("c_custkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hw"),
    )
    mpref = pair.groupBy("m").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("hm", "w"))),
            lambda s: s["w"],
        ).alias("prefs")
    )
    wrk = Window.partitionBy("w").orderBy("hw", "m")
    wrank = (
        pair.withColumn("rk", F.row_number().over(wrk).cast("bigint"))
        .groupBy("w")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "rk"))),
                lambda s: s["rk"],
            ).alias("ranks")
        )
    )
    packed = (
        mpref.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "prefs"))),
                lambda s: s["prefs"],
            ).alias("mpref")
        )
        .crossJoin(
            wrank.agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("w", "ranks"))),
                    lambda s: s["ranks"],
                ).alias("wrank")
            )
        )
        .crossJoin(
            c6.agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "c_custkey"))),
                    lambda s: s["c_custkey"],
                ).alias("cks")
            )
        )
        .crossJoin(
            s6.agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("w", "s_suppkey"))),
                    lambda s: s["s_suppkey"],
                ).alias("sks")
            )
        )
    )
    acc0 = F.expr(
        "named_struct("
        "'eng', transform(sequence(0, 5), x -> CAST(-1 AS BIGINT)),"
        "'nxt', transform(sequence(0, 5), x -> CAST(1 AS BIGINT)))"
    )

    def step(acc, _i):
        eng = acc["eng"]
        nxt = acc["nxt"]
        mf = F.try_element_at(
            F.filter(
                F.sequence(F.lit(0), F.lit(5)).cast("array<bigint>"),
                lambda m: (~F.array_contains(eng, m))
                & (F.element_at(nxt, (m + 1).cast("int")) <= 6),
            ),
            F.lit(1),
        )
        wp = F.element_at(
            F.element_at(F.col("mpref"), (mf + 1).cast("int")),
            F.element_at(nxt, (mf + 1).cast("int")).cast("int"),
        )
        cur = F.element_at(eng, (wp + 1).cast("int"))
        wr = F.element_at(F.col("wrank"), (wp + 1).cast("int"))
        accept = (cur == -1) | (
            F.element_at(wr, (mf + 1).cast("int"))
            < F.element_at(wr, (cur + 1).cast("int"))
        )
        new_eng = F.when(
            accept,
            F.transform(
                eng,
                lambda x, i: F.when(i.cast("bigint") == wp, mf).otherwise(x),
            ),
        ).otherwise(eng)
        new_nxt = F.transform(
            nxt,
            lambda x, i: x + F.when(i.cast("bigint") == mf, 1).otherwise(0),
        )
        stepped = F.struct(new_eng.alias("eng"), new_nxt.alias("nxt"))
        return F.when(mf.isNull(), acc).otherwise(stepped)

    folded = packed.select(
        "mpref",
        "wrank",
        "cks",
        "sks",
        F.aggregate(F.sequence(F.lit(1), F.lit(36)), acc0, step).alias("st"),
    )
    ex = folded.select(
        "mpref",
        "wrank",
        "cks",
        "sks",
        F.posexplode(F.col("st.eng")).alias("w", "m"),
    )
    return ex.select(
        F.element_at("sks", F.col("w").cast("int") + 1).alias("s_suppkey"),
        F.element_at("cks", (F.col("m") + 1).cast("int")).alias("c_custkey"),
        F.array_position(
            F.element_at("mpref", (F.col("m") + 1).cast("int")),
            F.col("w").cast("bigint"),
        )
        .cast("bigint")
        .alias("m_rank_of_w"),
        F.element_at(
            F.element_at("wrank", F.col("w").cast("int") + 1),
            (F.col("m") + 1).cast("int"),
        ).alias("w_rank_of_m"),
    )
