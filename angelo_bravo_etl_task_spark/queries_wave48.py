"""Round-3 wave 48: Prim's MST, RANSAC line fit, wordpiece tokenizer.

- mst1: Prim's minimum spanning tree over a complete md5-weighted
  12-node graph (keys = smallest suppliers) — one cut-crossing argmin
  edge per step, the pick trail and running total fully checked;
  Kruskal in the property layer confirms the (unique) MST total.
- ransac1: RANSAC robust line fitting — 10 md5-seeded 2-point
  hypotheses over planted inlier/outlier data, inliers counted by the
  exact cross-multiplied band test |(y-y1)dx - (x-x1)dy| <= 2|dx|;
  the winning hypothesis must recover the planted line.
- wp1: greedy longest-match-first subword tokenization against a
  corpus-derived vocab (chars + top 2-/3-grams) — bpe2 LEARNED merges,
  wp1 APPLIES a vocabulary the wordpiece way; round-trip identity
  property (concat(tokens) == word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# mst1: Prim's minimum spanning tree (one edge per step)
# =========================================================================

_MST1_SQL = """
WITH RECURSIVE nd AS (
  SELECT s_suppkey AS sk,
         CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS BIGINT) AS idx
  FROM supplier ORDER BY s_suppkey LIMIT 12
), ed AS (
  SELECT a.idx AS u, b.idx AS v, a.sk AS usk, b.sk AS vsk,
         CAST(CAST('0x' || substr(md5('mw' || CAST(a.sk AS VARCHAR) || '_'
                  || CAST(b.sk AS VARCHAR)), 1, 8) AS BIGINT) % 100 + 1
              AS BIGINT) AS w
  FROM nd a JOIN nd b ON a.idx < b.idx
), packed AS (
  SELECT list({'u': u, 'v': v, 'usk': usk, 'vsk': vsk, 'w': w}
              ORDER BY u, v) AS edges
  FROM ed
), r AS (
  SELECT CAST(0 AS BIGINT) AS step,
         [CAST(0 AS BIGINT)] AS intree,
         CAST([] AS STRUCT(st BIGINT, usk BIGINT, vsk BIGINT, w BIGINT,
                           tot BIGINT)[]) AS tr,
         edges
  FROM packed
  UNION ALL
  SELECT step + 1,
         list_append(intree,
           CASE WHEN list_contains(intree, best.u)
                THEN best.v ELSE best.u END),
         list_append(tr,
           {'st': step + 1, 'usk': best.usk, 'vsk': best.vsk, 'w': best.w,
            'tot': CASE WHEN len(tr) = 0 THEN best.w
                        ELSE tr[-1].tot + best.w END}),
         edges
  FROM (
    SELECT *,
           list_sort(list_transform(
             list_filter(edges, e ->
               list_contains(intree, e.u) <> list_contains(intree, e.v)),
             e -> {'w': e.w, 'u': e.u, 'v': e.v,
                   'usk': e.usk, 'vsk': e.vsk}))[1] AS best
    FROM r WHERE step < 11
  ) WHERE best IS NOT NULL
), final AS (
  SELECT tr, ROW_NUMBER() OVER (ORDER BY step DESC) AS rn FROM r
)
SELECT CAST(u.e.st AS BIGINT) AS step,
       CAST(u.e.usk AS BIGINT) AS u_key,
       CAST(u.e.vsk AS BIGINT) AS v_key,
       CAST(u.e.w AS BIGINT) AS w,
       CAST(u.e.tot AS BIGINT) AS running_total
FROM final, unnest(final.tr) AS u(e)
WHERE rn = 1
"""


@_register("mst1_prim_spanning_tree", _MST1_SQL)
def mst1_prim_spanning_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prim's minimum spanning tree over the complete md5-weighted graph
    on the 12 smallest supplier keys (network/cluster wiring cost): one
    step per recursion row adds the minimum-weight edge crossing the
    (in-tree, out-of-tree) cut — argmin by the sorted (w, u, v) struct,
    a deterministic tiebreak under weight collisions — emitting the
    full 11-edge pick trail with running totals. The property layer
    runs KRUSKAL independently and confirms the total (all MSTs share
    it, even under ties) plus Python-Prim edge-for-edge equality. The
    instance is deliberately small (MST is global); the 100 TB shape is
    Boruvka rounds over partitioned edge lists — per-component argmins
    ARE combinable aggregates — noted here as the scale path."""
    s12 = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .orderBy("s_suppkey")
        .limit(12)
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("s_suppkey")).cast("bigint") - 1,
        )
    )
    a = s12.alias("a")
    b = s12.alias("b")
    ed = a.join(b, F.col("a.idx") < F.col("b.idx")).select(
        F.col("a.idx").alias("u"),
        F.col("b.idx").alias("v"),
        F.col("a.s_suppkey").alias("usk"),
        F.col("b.s_suppkey").alias("vsk"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mw"),
                            F.col("a.s_suppkey").cast("string"),
                            F.lit("_"),
                            F.col("b.s_suppkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
            + 1
        ).alias("w"),
    )
    packed = ed.agg(
        F.array_sort(
            F.collect_list(F.struct("u", "v", "usk", "vsk", "w"))
        ).alias("edges")
    )
    acc0 = F.expr(
        "named_struct("
        "'intree', array(CAST(0 AS BIGINT)),"
        "'tr', CAST(array() AS ARRAY<STRUCT<st: BIGINT, usk: BIGINT,"
        " vsk: BIGINT, w: BIGINT, tot: BIGINT>>))"
    )

    def step(acc, st_no):
        intree = acc["intree"]
        crossing = F.filter(
            F.col("edges"),
            lambda e: F.array_contains(intree, e["u"])
            != F.array_contains(intree, e["v"]),
        )
        # try_element_at: fewer than 12 suppliers (small SFs) exhausts
        # the cut before the padded 11 steps run out — no-op then
        best = F.try_element_at(
            F.array_sort(
                F.transform(
                    crossing,
                    lambda e: F.struct(
                        e["w"].alias("w"),
                        e["u"].alias("u"),
                        e["v"].alias("v"),
                        e["usk"].alias("usk"),
                        e["vsk"].alias("vsk"),
                    ),
                )
            ),
            F.lit(1),
        )
        newcomer = F.when(
            F.array_contains(intree, best["u"]), best["v"]
        ).otherwise(best["u"])
        tot = F.when(
            F.size(acc["tr"]) == 0, best["w"]
        ).otherwise(F.element_at(acc["tr"], -1)["tot"] + best["w"])
        stepped = F.struct(
            F.concat(intree, F.array(newcomer)).alias("intree"),
            F.concat(
                acc["tr"],
                F.array(
                    F.struct(
                        st_no.cast("bigint").alias("st"),
                        best["usk"].alias("usk"),
                        best["vsk"].alias("vsk"),
                        best["w"].alias("w"),
                        tot.alias("tot"),
                    )
                ),
            ).alias("tr"),
        )
        return F.when(best.isNull(), acc).otherwise(stepped)

    folded = packed.select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(11)), acc0, step
        )["tr"].alias("tr")
    )
    ex = folded.select(F.explode("tr").alias("e"))
    return ex.select(
        F.col("e.st").alias("step"),
        F.col("e.usk").alias("u_key"),
        F.col("e.vsk").alias("v_key"),
        F.col("e.w").alias("w"),
        F.col("e.tot").alias("running_total"),
    )


# =========================================================================
# ransac1: RANSAC robust line fit (exact integer band test)
# =========================================================================

_RANSAC1_SQL = """
WITH pts AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS ri,
         CAST((c_custkey // 11) % 50 AS BIGINT) AS x,
         CAST(3 * ((c_custkey // 11) % 50) + 7
              + CASE WHEN c_custkey % 6 = 0
                     THEN CAST('0x' || substr(md5('no' ||
                            CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
                          % 200 - 100
                     ELSE CAST('0x' || substr(md5('no' ||
                            CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
                          % 3 - 1
                END AS BIGINT) AS y
  FROM customer WHERE c_custkey % 11 = 0
), np AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts
), trials AS (
  SELECT t.t,
         CAST('0x' || substr(md5('r1' || CAST(t.t AS VARCHAR)), 1, 8)
              AS BIGINT) % np.n AS i1,
         CAST('0x' || substr(md5('r2' || CAST(t.t AS VARCHAR)), 1, 8)
              AS BIGINT) % np.n AS i2
  FROM (SELECT unnest(range(1, 11)) AS t) t CROSS JOIN np
), lines AS (
  SELECT tr.t, p1.x AS x1, p1.y AS y1,
         p2.x - p1.x AS dx, p2.y - p1.y AS dy
  FROM trials tr
  JOIN pts p1 ON p1.ri = tr.i1
  JOIN pts p2 ON p2.ri = tr.i2
  WHERE p1.x <> p2.x
), scored AS (
  SELECT l.t, l.x1, l.y1, l.dx, l.dy,
         CAST(SUM(CASE WHEN ABS((p.y - l.y1) * l.dx - (p.x - l.x1) * l.dy)
                            <= 2 * ABS(l.dx)
                       THEN 1 ELSE 0 END) AS BIGINT) AS inliers
  FROM lines l CROSS JOIN pts p
  GROUP BY 1, 2, 3, 4, 5
)
SELECT t, x1, y1, dx, dy, inliers,
       inliers = MAX(inliers) OVER () AS is_best
FROM scored
"""


@_register("ransac1_robust_line", _RANSAC1_SQL)
def ransac1_robust_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC line fitting over planted data (y = 3x + 7 ± 1 for five
    of six points, wild md5 outliers for the custkey % 6 slice): 10
    md5-seeded trials each draw two points by rank index, and every
    point votes inlier via the EXACT cross-multiplied band test
    |(y-y1)·dx - (x-x1)·dy| <= 2·|dx| — no slopes materialized, no
    floats anywhere, so consensus counts are bit-stable. Emits each
    hypothesis with its inlier count and the is-best flag; the property
    layer asserts the winner's line contains the planted (3, 7) — the
    robust-fit guarantee Theil-Sen (regr2) gives by medians, here by
    consensus. Trials are a 10-row broadcast spine over one point scan
    (the scale shape: hypotheses tiny, data big)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 11 == 0)
    noise = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("no"), F.col("c_custkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    x = (F.expr("c_custkey div 11") % 50).cast("bigint")
    pts = c.select(
        (
            F.row_number().over(Window.orderBy("c_custkey")).cast("bigint") - 1
        ).alias("ri"),
        x.alias("x"),
        (
            3 * x
            + 7
            + F.when(F.col("c_custkey") % 6 == 0, noise % 200 - 100).otherwise(
                noise % 3 - 1
            )
        )
        .cast("bigint")
        .alias("y"),
    )
    np_ = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    trials = (
        spark.range(1, 11)
        .select(F.col("id").alias("t"))
        .crossJoin(F.broadcast(np_))
        .select(
            "t",
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("r1"), F.col("t").cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n")
            ).alias("i1"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("r2"), F.col("t").cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n")
            ).alias("i2"),
        )
    )
    p1 = pts.alias("p1")
    p2 = pts.alias("p2")
    lines = (
        trials.join(p1, F.col("i1") == F.col("p1.ri"))
        .join(p2, F.col("i2") == F.col("p2.ri"))
        .where(F.col("p1.x") != F.col("p2.x"))
        .select(
            "t",
            F.col("p1.x").alias("x1"),
            F.col("p1.y").alias("y1"),
            (F.col("p2.x") - F.col("p1.x")).alias("dx"),
            (F.col("p2.y") - F.col("p1.y")).alias("dy"),
        )
    )
    scored = (
        pts.crossJoin(F.broadcast(lines))
        .groupBy("t", "x1", "y1", "dx", "dy")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        (F.col("y") - F.col("y1")) * F.col("dx")
                        - (F.col("x") - F.col("x1")) * F.col("dy")
                    )
                    <= 2 * F.abs(F.col("dx")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("inliers")
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "t",
        "x1",
        "y1",
        "dx",
        "dy",
        "inliers",
        (F.col("inliers") == F.max("inliers").over(wall)).alias("is_best"),
    )


# =========================================================================
# wp1: greedy longest-match subword tokenization (wordpiece-style)
# =========================================================================

_WP1_SQL = """
WITH RECURSIVE words AS (
  SELECT word FROM (
    SELECT DISTINCT u.word
    FROM (SELECT list_filter(regexp_split_to_array(TRIM(text), '\\s+'),
                             t -> LENGTH(t) > 0) AS toks
          FROM documents) d,
         unnest(d.toks) AS u(word)
    WHERE LENGTH(u.word) BETWEEN 3 AND 12
  ) ORDER BY word LIMIT 200
), grams2 AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS c
  FROM words, (SELECT unnest(range(1, 12)) AS i) i,
       LATERAL (SELECT substr(word, i.i, 2) AS g) s
  WHERE LENGTH(substr(word, i.i, 2)) = 2
  GROUP BY g
), grams3 AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS c
  FROM words, (SELECT unnest(range(1, 11)) AS i) i,
       LATERAL (SELECT substr(word, i.i, 3) AS g) s
  WHERE LENGTH(substr(word, i.i, 3)) = 3
  GROUP BY g
), v2 AS (
  SELECT list(g ORDER BY g) AS v FROM (
    SELECT g, ROW_NUMBER() OVER (ORDER BY c DESC, g) AS rk FROM grams2
  ) WHERE rk <= 30
), v3 AS (
  SELECT list(g ORDER BY g) AS v FROM (
    SELECT g, ROW_NUMBER() OVER (ORDER BY c DESC, g) AS rk FROM grams3
  ) WHERE rk <= 20
), r AS (
  SELECT w.word, CAST(1 AS BIGINT) AS pos,
         CAST([] AS VARCHAR[]) AS toks, v2.v AS v2, v3.v AS v3
  FROM words w, v2, v3
  UNION ALL
  SELECT word,
         pos + LENGTH(CASE
           WHEN list_contains(v3, substr(word, CAST(pos AS INTEGER), 3))
           THEN substr(word, CAST(pos AS INTEGER), 3)
           WHEN list_contains(v2, substr(word, CAST(pos AS INTEGER), 2))
           THEN substr(word, CAST(pos AS INTEGER), 2)
           ELSE substr(word, CAST(pos AS INTEGER), 1) END),
         list_append(toks, CASE
           WHEN list_contains(v3, substr(word, CAST(pos AS INTEGER), 3))
           THEN substr(word, CAST(pos AS INTEGER), 3)
           WHEN list_contains(v2, substr(word, CAST(pos AS INTEGER), 2))
           THEN substr(word, CAST(pos AS INTEGER), 2)
           ELSE substr(word, CAST(pos AS INTEGER), 1) END),
         v2, v3
  FROM r WHERE pos <= LENGTH(word)
), final AS (
  SELECT word, toks,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos DESC) AS rn
  FROM r
)
SELECT word, CAST(len(toks) AS BIGINT) AS n_tokens,
       array_to_string(toks, '/') AS tokens
FROM final WHERE rn = 1
"""


@_register("wp1_wordpiece_tokenize", _WP1_SQL)
def wp1_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match-first subword tokenization (the wordpiece
    inference rule, minus the ## continuation detail) of 200 corpus
    words against a corpus-DERIVED vocabulary: the top-30 character
    2-grams and top-20 3-grams by frequency (single chars as the
    implicit fallback, so no UNK). bpe2 LEARNED merges iteratively;
    wp1 APPLIES a vocabulary — the other half of the tokenizer
    lifecycle. Spark folds each word's positions (try 3-gram, then
    2-gram, then char) with a (pos, tokens) accumulator over 12
    conditional steps; the oracle recurses one piece per row. The
    concat(tokens) == word round-trip and the longest-match property
    (no emitted char token where a vocab 2/3-gram started at the same
    position... by construction) live in the property layer."""
    from .operators.text import tokens as _tokens

    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .where(F.length("word").between(3, 12))
        .distinct()
        .orderBy("word")
        .limit(200)
    )

    def grams(n: int, top: int):
        g = (
            words.select(
                F.explode(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.length("word") - (n - 1)
                        ),
                        lambda i: F.col("word").substr(i, F.lit(n)),
                    )
                ).alias("g")
            )
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        rk = Window.orderBy(F.col("c").desc(), "g")
        return (
            g.withColumn("rk", F.row_number().over(rk))
            .where(F.col("rk") <= top)
            .agg(F.array_sort(F.collect_list("g")).alias("v"))
        )

    v2 = grams(2, 30)
    v3 = grams(3, 20)
    seeded = words.crossJoin(F.broadcast(v2.select(F.col("v").alias("v2")))).crossJoin(
        F.broadcast(v3.select(F.col("v").alias("v3")))
    )
    acc0 = F.expr(
        "named_struct('pos', CAST(1 AS BIGINT),"
        " 'toks', CAST(array() AS ARRAY<STRING>))"
    )

    def step(acc, _i):
        pos = acc["pos"]
        w = F.col("word")
        p3 = w.substr(pos.cast("int"), F.lit(3))
        p2 = w.substr(pos.cast("int"), F.lit(2))
        p1 = w.substr(pos.cast("int"), F.lit(1))
        piece = F.when(
            F.array_contains(F.col("v3"), p3), p3
        ).otherwise(
            F.when(F.array_contains(F.col("v2"), p2), p2).otherwise(p1)
        )
        advanced = F.struct(
            (pos + F.length(piece)).alias("pos"),
            F.concat(acc["toks"], F.array(piece)).alias("toks"),
        )
        return F.when(pos <= F.length(w), advanced).otherwise(acc)

    folded = seeded.select(
        "word",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(12)), acc0, step
        )["toks"].alias("toks"),
    )
    return folded.select(
        "word",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.array_join("toks", "/").alias("tokens"),
    )
