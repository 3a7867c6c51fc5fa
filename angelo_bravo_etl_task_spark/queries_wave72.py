r"""Round-5 wave 72: prefix-filter set-similarity join, weighted
deterministic reservoir sampling.

- ssj2: the SHINGLE-level sibling of wave 25's token-level ssj1 —
  an UNBOUNDED exact similarity self-join over 3-gram shingle sets
  (d5/d9 brute-force a bounded id window; d3/d7 are probabilistic
  LSH): EXACT Jaccard ≥ 0.6 over ALL pairs with candidate
  generation by the prefix-filtering principle (Chaudhuri et al.,
  SSJoin/PPJoin): order each doc's shingles by ascending global
  document-frequency (rarest first) and index only the first
  n − ⌈τ·n⌉ + 1 of them — any pair with Jaccard ≥ τ MUST share a
  prefix shingle, so joining on prefix shingles loses nothing while
  the rarest-first ordering keeps per-shingle buckets small. The
  whole algorithm is expressible in both engines, so the driver hash
  certifies candidates + verification end-to-end.
- rsv1: weighted sampling without replacement, deterministic and
  cross-engine exact. Efraimidis–Spirakis A-ES keys u^(1/w) are
  float/pow territory (libm-unportable); the identity
  P(u^(1/w) ≤ x) = x^w = P(min of w uniforms ≤ x) replaces each key
  with the MIN of w integer md5 draws — distributionally identical,
  pure integer, replayable. Per-language top-5 by priority runs the
  mergeable-top-k shape (tk2): salted local top-5, then a global
  top-5 over S·16·5 survivors — no single-partition stratum window.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no similarity-join or sampling surface; these extend the dedup family
(d1-d9, dp1) and the sampling family (sm2, mix1, dm1, sh1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# ssj2: prefix-filtering exact shingle-similarity self-join (J >= 0.6)
# =========================================================================

_DUCK_TOKS = (
    "string_split(trim(regexp_replace(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
)

_SSJ2_SQL = rf"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_filter(
           list_transform(
             range(1, greatest(len({_DUCK_TOKS}) - 3, 0) + 2),
             i -> array_to_string(list_slice({_DUCK_TOKS}, i, i + 2), ' ')),
           s -> length(s) > 0)) AS grams
  FROM documents
), shn AS (
  SELECT doc_id, grams, CAST(len(grams) AS BIGINT) AS n
  FROM sh WHERE len(grams) > 0
), ex AS (
  SELECT doc_id, unnest(grams) AS gram FROM shn
), freq AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM ex GROUP BY gram
), ordered AS (
  SELECT e.doc_id, list(e.gram ORDER BY f.c, e.gram) AS gs
  FROM ex e JOIN freq f ON f.gram = e.gram
  GROUP BY e.doc_id
), pre AS (
  SELECT o.doc_id, s.n,
         unnest(list_slice(o.gs, 1, s.n - (6 * s.n + 9) // 10 + 1)) AS gram
  FROM ordered o JOIN shn s ON s.doc_id = o.doc_id
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pre a JOIN pre b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
   AND 10 * LEAST(a.n, b.n) >= 6 * GREATEST(a.n, b.n)
)
SELECT c.id_a, c.id_b,
       sa.n AS n_a, sb.n AS n_b,
       CAST(len(list_intersect(sa.grams, sb.grams)) AS BIGINT) AS n_common,
       CAST(len(list_intersect(sa.grams, sb.grams)) AS BIGINT)
         / (sa.n + sb.n - len(list_intersect(sa.grams, sb.grams))) AS jaccard
FROM cand c
JOIN shn sa ON sa.doc_id = c.id_a
JOIN shn sb ON sb.doc_id = c.id_b
WHERE CAST(len(list_intersect(sa.grams, sb.grams)) AS BIGINT) * 10
        >= 6 * (sa.n + sb.n - len(list_intersect(sa.grams, sb.grams)))
"""


@_register("ssj2_shingle_prefix_join", _SSJ2_SQL)
def ssj2_shingle_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.6 similarity self-join over ALL document pairs
    with prefix-filtering candidate generation — no id-window bound
    (d5/d9's oracle crutch) and no false negatives (d3/d7's LSH risk).
    The law: order each doc's distinct 3-gram shingles rarest-global-
    first and take the first n − ⌈0.6n⌉ + 1; if two sets share NO prefix
    shingle, each must cover the other's non-prefix tail, which caps
    their intersection below the τ threshold — so joining on prefix
    shingles is COMPLETE (property-tested against brute force). It is
    also cheap: the prefix picks each doc's RAREST shingles, so the
    per-shingle join buckets stay small where a join on all shingles
    (or on frequent ones) would quadratically blow up on common grams,
    and the PPJoin length filter (10·min(n_a,n_b) ≥ 6·max — a Jaccard
    ≥ 0.6 pair cannot differ in size by more than 1/0.6×) prunes
    size-mismatched candidates before the set-intersection verify,
    completeness-preserving by the same threshold algebra.
    Verification is exact set arithmetic (|∩| via array_intersect;
    threshold as the integer cross-product inter·10 ≥ 6·union; the
    reported jaccard is one IEEE division of exact BIGINTs, portable).
    At 100 TB: shingling is map-side; the frequency join is a broadcast
    (shingle df table is Zipf-truncatable); candidates shuffle on
    prefix shingle with bounded buckets; the verify join shuffles on
    doc_id. ceil(0.6n) = (6n+9) DIV 10 keeps prefix lengths integer-
    identical on both engines."""
    from .operators.dedup import shingle_hashes
    from .operators.partitioning import spread

    # Optimization r11 (guide §2.3): every released column is a set SIZE
    # (n_a, n_b, n_common) or a ratio of sizes (jaccard), never a gram
    # string — so the whole pipeline runs on 64-bit gram HASHES
    # (shingle_hashes: one xxhash64 per token + (n-1) long-mix passes, no
    # shingle-string materialization). The df-ordering tie-break becomes
    # (c, gram_hash) instead of (c, gram): prefix-filter completeness
    # holds under ANY consistent total order (each doc indexes its first
    # n − ⌈τ·n⌉ + 1 grams in the SAME order), and verification is exact
    # set arithmetic either way, so the released rows are unchanged
    # (identical modulo an in-doc xxhash64 collision, ~|grams|²/2⁶⁴ —
    # oracle-verified tri-SF). Shuffles now carry int64s, not n-gram
    # strings: the freq join, the prefix self-join and the verify join
    # all shrink by ~an order of magnitude in bytes.
    d = spread(_t(spark, sf_dir, "documents"))
    sh = (
        d.select(
            "doc_id", shingle_hashes(F.col("text"), 3).alias("grams")
        )
        .where(F.size("grams") > 0)
        .withColumn("n", F.size("grams").cast("bigint"))
        .persist()
    )
    ex = sh.select("doc_id", F.explode("grams").alias("gram"))
    freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    ordered = (
        ex.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c", "gram"))),
                lambda s: s["gram"],
            ).alias("gs")
        )
    )
    pre = (
        ordered.join(sh.select("doc_id", "n"), "doc_id")
        .select(
            "doc_id",
            "n",
            F.explode(
                F.slice(
                    "gs",
                    F.lit(1),
                    (F.col("n") - (6 * F.col("n") + 9) / F.lit(10) + 1).cast(
                        "int"
                    ),
                )
            ).alias("gram"),
        )
        # persisted: pre feeds BOTH sides of the candidate self-join, and
        # without it Catalyst recomputes the freq-join + per-doc sort
        # pipeline twice (the derived-frame self-join gotcha)
        .persist()
    )
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), "gram")
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            # PPJoin length filter: Jaccard >= 0.6 forces the smaller set
            # to hold >= 0.6 of the larger, so size-mismatched pairs are
            # provably below threshold and never reach verification
            & (
                10 * F.least(F.col("a.n"), F.col("b.n"))
                >= 6 * F.greatest(F.col("a.n"), F.col("b.n"))
            )
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("grams").alias("grams_a"),
        F.col("n").alias("n_a"),
    )
    sb = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("grams").alias("grams_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("bigint")
    union = F.col("n_a") + F.col("n_b") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(inter * 10 >= 6 * union)
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            inter.alias("n_common"),
            (inter / union).alias("jaccard"),
        )
    )


# =========================================================================
# rsv1: deterministic weighted reservoir sample (min-of-w integer draws)
# =========================================================================

_RSV1_SQL = """
WITH w AS (
  SELECT doc_id, lang,
         CAST(1 + LEAST(n_chars // 100, 7) AS BIGINT) AS weight
  FROM documents
), copies AS (
  SELECT doc_id, lang, weight, unnest(range(1, weight + 1)) AS i FROM w
), pri AS (
  SELECT doc_id, lang, weight,
         MIN(CAST('0x' || substr(md5('rsv:' || CAST(doc_id AS VARCHAR)
                                  || ':' || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT)) AS priority
  FROM copies GROUP BY doc_id, lang, weight
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, weight, priority
FROM (
  SELECT lang, doc_id, weight, priority,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY priority, doc_id) AS rnk
  FROM pri
) WHERE rnk <= 5
"""


@_register("rsv1_weighted_reservoir", _RSV1_SQL)
def rsv1_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, per language stratum,
    deterministic and replayable. Efraimidis–Spirakis assigns each item
    the key u^(1/w) and keeps the k largest; u^(1/w) has EXACTLY the
    distribution of min(u_1..u_w) (P(u^(1/w) ≤ x) = x^w), so each doc
    instead draws w integer md5 priorities and keeps the MIN — the same
    sampling design with zero floats, zero pow(), and a trivial Python
    replay (weights are data-derived: 1 + min(n_chars DIV 100, 7)).
    Keeping the k SMALLEST min-priorities per stratum = weighted
    reservoir: P(doc a beats doc b) = w_a/(w_a+w_b). Scale shape: the
    copy expansion is map-side (Σw ≤ 8n rows); selection is tk2's
    mergeable top-k — a salted local top-5 bounds every partition's
    output, then the global top-5 ranks only strata·16·5 survivors, so
    no language ever funnels through a single-partition window."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "lang",
        (1 + F.least(F.floor(F.col("n_chars") / 100), F.lit(7)))
        .cast("bigint")
        .alias("weight"),
    )
    copies = w.select(
        "doc_id",
        "lang",
        "weight",
        F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("i"),
    )
    h8 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("rsv:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    pri = copies.groupBy("doc_id", "lang", "weight").agg(
        F.min(h8).alias("priority")
    )
    # mergeable top-k: salted local rank bounds each partition's output,
    # global rank then sees only strata*16*5 rows (tk2's algebra)
    local_w = Window.partitionBy(
        "lang", F.pmod(F.col("priority"), F.lit(16))
    ).orderBy("priority", "doc_id")
    survivors = (
        pri.withColumn("lrnk", F.row_number().over(local_w))
        .where(F.col("lrnk") <= 5)
        .drop("lrnk")
    )
    glob_w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        survivors.withColumn(
            "rnk", F.row_number().over(glob_w).cast("bigint")
        )
        .where(F.col("rnk") <= 5)
        .select("lang", "rnk", "doc_id", "weight", "priority")
    )
