"""Round-3 wave 30: dataset version fingerprinting, optimizer cardinality
validation, exact polygon measures, and corpus rank-frequency structure.

- mrk1: Merkle-style content fingerprints — the dataset-versioning
  primitive (did ANY byte of this corpus change?) as two levels of
  order-canonicalized md5 rollups; at scale the tree gets deeper, the
  per-level operation (sort keys, hash the concatenation) is unchanged.
- stats3: the companion to stats2 — the textbook join-cardinality
  estimate |A||B|/max(ndv) evaluated AGAINST the actual join count,
  with the error the CBO would have eaten. All integers.
- geo6: shoelace area + centroid numerators over md5-placed pentagon
  rings — exact integer cross products, divisions deferred.
- zipf1: the rank x frequency invariant (Zipf: r*f ~ const) for the
  top-30 words, deviations against the median r*f in exact percent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# mrk1: Merkle dataset fingerprint (two-level md5 rollup)
# =========================================================================

_MRK1_SQL = """
WITH leaves AS (
  SELECT source, md5(text) AS leaf FROM documents
), roots AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_leaves,
         md5(string_agg(leaf, '' ORDER BY leaf)) AS root_md5
  FROM leaves GROUP BY source
), corpus AS (
  SELECT 'corpus' AS scope,
         CAST(SUM(n_leaves) AS BIGINT) AS n_leaves,
         md5(string_agg(root_md5, '' ORDER BY root_md5)) AS root_md5
  FROM roots
)
SELECT 'source:' || source AS scope, n_leaves, root_md5 FROM roots
UNION ALL
SELECT scope, n_leaves, root_md5 FROM corpus
"""


@_register("mrk1_merkle_fingerprint", _MRK1_SQL)
def mrk1_merkle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style dataset fingerprint: leaf = md5(document), source
    root = md5 of the SORTED leaf concatenation, corpus root = md5 of
    the sorted source roots — the content-addressed version identity a
    training-data pipeline pins in its manifest (any byte change
    anywhere flips the corpus root; the per-source level localizes
    WHICH shard changed). Sorting before hashing makes the fingerprint
    canonical under partitioning and row order — the property that
    makes it comparable across engines, reruns, and cluster layouts.
    At 100 TB the tree grows levels (leaf -> file -> partition ->
    shard -> corpus) but every level stays this same combinable
    shape: sort keys, concat, hash."""
    d = _t(spark, sf_dir, "documents")
    leaves = d.select("source", F.md5(F.col("text").cast("binary")).alias("leaf"))
    roots = leaves.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_leaves"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("leaf")), "").cast(
                "binary"
            )
        ).alias("root_md5"),
    )
    corpus = roots.agg(
        F.lit("corpus").alias("scope"),
        F.sum("n_leaves").alias("n_leaves"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("root_md5")), "").cast(
                "binary"
            )
        ).alias("root_md5"),
    )
    return roots.select(
        F.concat(F.lit("source:"), F.col("source")).alias("scope"),
        "n_leaves",
        "root_md5",
    ).unionAll(corpus)


# =========================================================================
# stats3: join-cardinality estimate vs actual (CBO validation)
# =========================================================================

_STATS3_SQL = """
WITH j1 AS (
  SELECT 'orders*customer' AS join_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_left,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_right,
         (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
           AS ndv_left,
         (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer)
           AS ndv_right,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
           AS actual_rows
), j2 AS (
  SELECT 'lineitem*part',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM part),
         (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT) FROM part),
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
), j3 AS (
  SELECT 'lineitem*orders',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
         (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders),
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
), u AS (
  SELECT * FROM j1 UNION ALL SELECT * FROM j2 UNION ALL SELECT * FROM j3
)
SELECT join_name, n_left, n_right, ndv_left, ndv_right, actual_rows,
       CAST((n_left * n_right)
            // (CASE WHEN ndv_left > ndv_right
                     THEN ndv_left ELSE ndv_right END) AS BIGINT)
         AS est_rows,
       CAST(100 * ABS((n_left * n_right)
            // (CASE WHEN ndv_left > ndv_right
                     THEN ndv_left ELSE ndv_right END) - actual_rows)
            // actual_rows AS BIGINT) AS err_pct
FROM u
"""


@_register("stats3_join_card_estimate", _STATS3_SQL)
def stats3_join_card_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation validated against ground truth: the
    textbook equi-join estimate |A|*|B| / max(ndv_A, ndv_B) — exactly
    what a cost-based optimizer computes from stats2's statistics —
    evaluated for the three star joins and compared with the ACTUAL join
    count, error in exact integer percent. On FK joins with complete
    referential integrity the estimate is near-exact (err ~0); where
    integrity or uniformity break, the error column shows the bias the
    planner would have eaten — the observability a 100 TB deployment
    wants over its CBO. Each estimate needs only per-table aggregates;
    each actual is one equi-join count."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def stat(name, left, lk, right, rk):
        nl = left.agg(
            F.count(F.lit(1)).alias("n_left"),
            F.countDistinct(lk).cast("bigint").alias("ndv_left"),
        )
        nr = right.agg(
            F.count(F.lit(1)).alias("n_right"),
            F.countDistinct(rk).cast("bigint").alias("ndv_right"),
        )
        actual = left.join(right, left[lk] == right[rk]).agg(
            F.count(F.lit(1)).alias("actual_rows")
        )
        return (
            nl.join(nr)
            .join(actual)
            .select(
                F.lit(name).alias("join_name"),
                "n_left",
                "n_right",
                "ndv_left",
                "ndv_right",
                "actual_rows",
            )
        )

    u = (
        stat("orders*customer", o, "o_custkey", c, "c_custkey")
        .unionAll(stat("lineitem*part", li, "l_partkey", p, "p_partkey"))
        .unionAll(stat("lineitem*orders", li, "l_orderkey", o, "o_orderkey"))
    )
    est = F.expr("(n_left * n_right) div greatest(ndv_left, ndv_right)")
    return u.select(
        "join_name",
        "n_left",
        "n_right",
        "ndv_left",
        "ndv_right",
        "actual_rows",
        est.cast("bigint").alias("est_rows"),
        F.expr(
            "CAST(100 * abs((n_left * n_right)"
            " div greatest(ndv_left, ndv_right) - actual_rows)"
            " div actual_rows AS BIGINT)"
        ).alias("err_pct"),
    )


# =========================================================================
# geo6: shoelace polygon area + centroid numerators (exact integers)
# =========================================================================

_GEO6_SQL = """
WITH polys AS (
  SELECT s_suppkey AS poly_id,
         1 + CAST('0x' || substr(md5('s' || CAST(s_suppkey AS VARCHAR)),
                                 1, 2) AS BIGINT) % 5 AS sc,
         CAST('0x' || substr(md5('x' || CAST(s_suppkey AS VARCHAR)),
                             1, 4) AS BIGINT) % 1000 AS cx,
         CAST('0x' || substr(md5('y' || CAST(s_suppkey AS VARCHAR)),
                             1, 4) AS BIGINT) % 1000 AS cy
  FROM supplier WHERE s_suppkey < 100
), verts AS (
  SELECT poly_id,
         [{'x': cx + sc * 2, 'y': cy + sc * 0},
          {'x': cx + sc * 1, 'y': cy + sc * 2},
          {'x': cx - sc * 1, 'y': cy + sc * 2},
          {'x': cx - sc * 2, 'y': cy + sc * 0},
          {'x': cx + sc * 0, 'y': cy - sc * 3}] AS ring
  FROM polys
), rolled AS (
  SELECT poly_id,
         list_reduce(
           list_transform(generate_series(1, 5), i -> {
             'a2': ring[i].x * ring[1 + i % 5].y
                   - ring[1 + i % 5].x * ring[i].y,
             'cx3': (ring[i].x + ring[1 + i % 5].x)
                    * (ring[i].x * ring[1 + i % 5].y
                       - ring[1 + i % 5].x * ring[i].y),
             'cy3': (ring[i].y + ring[1 + i % 5].y)
                    * (ring[i].x * ring[1 + i % 5].y
                       - ring[1 + i % 5].x * ring[i].y)
           }),
           (acc, v) -> {'a2': acc.a2 + v.a2,
                        'cx3': acc.cx3 + v.cx3,
                        'cy3': acc.cy3 + v.cy3}
         ) AS m
  FROM verts
)
SELECT poly_id,
       CAST(m.a2 AS BIGINT) AS area2,
       CAST(m.cx3 AS BIGINT) AS centroid_x_num,
       CAST(m.cy3 AS BIGINT) AS centroid_y_num,
       CAST(3 * m.a2 AS BIGINT) AS centroid_den
FROM rolled
"""


@_register("geo6_shoelace_measures", _GEO6_SQL)
def geo6_shoelace_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon area and centroid by the shoelace formula, exact: per
    md5-placed pentagon ring, 2A = sum of cross products x_i*y_{i+1} -
    x_{i+1}*y_i and the centroid is (sum (x_i+x_{i+1})*cross) / (3*2A) —
    emitted as integer numerators over the explicit 3*2A denominator
    (division deferred, the tm1 discipline applied to geometry). The
    whole measure is ONE in-cell fold over the 5-vertex ring array — no
    explode, no join, no shuffle; at 100 TB polygon measures are a
    narrow projection over the geometry column. Complements geo3
    (point-in-polygon tests) with the measure side of computational
    geometry; cross products stay far inside BIGINT (coords < 1100,
    cross < 2.5e6)."""
    s = _t(spark, sf_dir, "supplier").where(F.col("s_suppkey") < 100)

    def hx(prefix, nchars):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("s_suppkey").cast("string"))),
                1,
                nchars,
            ),
            16,
            10,
        ).cast("bigint")

    polys = s.select(
        F.col("s_suppkey").alias("poly_id"),
        (1 + hx("s", 2) % 5).alias("sc"),
        (hx("x", 4) % 1000).alias("cx"),
        (hx("y", 4) % 1000).alias("cy"),
    )
    # pentagon template (CCW, simple): (2,0) (1,2) (-1,2) (-2,0) (0,-3)
    tmpl = [(2, 0), (1, 2), (-1, 2), (-2, 0), (0, -3)]
    ring = F.array(
        *[
            F.struct(
                (F.col("cx") + dx * F.col("sc")).alias("x"),
                (F.col("cy") + dy * F.col("sc")).alias("y"),
            )
            for dx, dy in tmpl
        ]
    )
    verts = polys.select("poly_id", ring.alias("ring"))
    rolled = verts.select(
        "poly_id",
        F.aggregate(
            F.expr(
                "transform(sequence(1, 5), i -> named_struct("
                " 'a2', element_at(ring, i).x"
                "   * element_at(ring, 1 + i % 5).y"
                "   - element_at(ring, 1 + i % 5).x * element_at(ring, i).y,"
                " 'cx3', (element_at(ring, i).x"
                "   + element_at(ring, 1 + i % 5).x)"
                "   * (element_at(ring, i).x * element_at(ring, 1 + i % 5).y"
                "      - element_at(ring, 1 + i % 5).x"
                "        * element_at(ring, i).y),"
                " 'cy3', (element_at(ring, i).y"
                "   + element_at(ring, 1 + i % 5).y)"
                "   * (element_at(ring, i).x * element_at(ring, 1 + i % 5).y"
                "      - element_at(ring, 1 + i % 5).x"
                "        * element_at(ring, i).y)))"
            ),
            F.expr(
                "named_struct('a2', CAST(0 AS BIGINT),"
                " 'cx3', CAST(0 AS BIGINT), 'cy3', CAST(0 AS BIGINT))"
            ),
            lambda acc, v: F.struct(
                (acc["a2"] + v["a2"]).alias("a2"),
                (acc["cx3"] + v["cx3"]).alias("cx3"),
                (acc["cy3"] + v["cy3"]).alias("cy3"),
            ),
        ).alias("m"),
    )
    return rolled.select(
        "poly_id",
        F.col("m.a2").cast("bigint").alias("area2"),
        F.col("m.cx3").cast("bigint").alias("centroid_x_num"),
        F.col("m.cy3").cast("bigint").alias("centroid_y_num"),
        (3 * F.col("m.a2")).cast("bigint").alias("centroid_den"),
    )


# =========================================================================
# zipf1: rank-frequency invariant check
# =========================================================================

_ZIPF1_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), pos AS (
  SELECT UNNEST(toks) AS word FROM w
), freq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM pos GROUP BY word
), top AS (
  SELECT word, f,
         CAST(ROW_NUMBER() OVER (ORDER BY f DESC, word) AS BIGINT) AS r
  FROM freq QUALIFY r <= 30
), rf AS (
  SELECT word, r, f, CAST(r * f AS BIGINT) AS rxf FROM top
), med AS (
  SELECT rxf AS med_rxf FROM (
    SELECT rxf, ROW_NUMBER() OVER (ORDER BY rxf, word) AS rn FROM rf
  ) WHERE rn = 15
)
SELECT rf.word, rf.r, rf.f, rf.rxf,
       CAST(100 * ABS(rf.rxf - med.med_rxf) // med.med_rxf AS BIGINT)
         AS dev_pct
FROM rf CROSS JOIN med
"""


@_register("zipf1_rank_frequency", _ZIPF1_SQL)
def zipf1_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's law as an exact invariant: for a natural-language corpus,
    rank x frequency is roughly constant — so the top-30 words' r*f
    products, normalized against their own type-1 median, expose how
    Zipfian (or, for this synthetic corpus, how uniform) the vocabulary
    is, with deviations in exact integer percent. No logs, no
    regression — the log-log slope fit IS the r*f constancy check,
    rearranged to stay in integers. One word-count aggregate (the only
    full-data pass), a top-30 window, a 1-row median broadcast.
    Corpus-linguistics companion to pmi1 (phrases) and tx9 (novelty):
    this one characterizes the FREQUENCY SPECTRUM, the input to
    tokenizer-vocabulary sizing."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    top = (
        freq.withColumn(
            "r",
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), "word"))
            .cast("bigint"),
        )
        .where(F.col("r") <= 30)
        .select("word", "r", "f", (F.col("r") * F.col("f")).alias("rxf"))
    )
    top = top.persist()
    med = (
        top.withColumn(
            "rn", F.row_number().over(Window.orderBy("rxf", "word"))
        )
        .where(F.col("rn") == 15)
        .select(F.col("rxf").alias("med_rxf"))
    )
    return top.crossJoin(F.broadcast(med)).select(
        "word",
        "r",
        "f",
        "rxf",
        F.expr("CAST(100 * abs(rxf - med_rxf) div med_rxf AS BIGINT)").alias(
            "dev_pct"
        ),
    )
