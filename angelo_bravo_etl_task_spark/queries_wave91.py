r"""Round-5 wave 91: portable MinHash-LSH with hash-certified recall.

- d10: the dedup family's capstone — an END-TO-END ORACLE-CHECKABLE
  MinHash-LSH evaluation. d3/d7 run LSH on xxhash64 signatures, which
  DuckDB cannot compute, so their driver rows are rows-only /
  confirm-stage-only; d10 rebuilds the whole machine on md5 (16
  min-hashes from 60-bit md5 prefixes, 4 bands × 4 rows), generates
  candidates by band-signature equi-join, and scores RECALL against
  COMPLETE Jaccard ≥ 0.5 ground truth produced by the prefix-filter
  algorithm (ssj2's, at τ = 0.5) over a 1/3 doc slice — the planted
  near-dup pairs span the whole id range, so the audit slice must be
  RELATIVE (doc_id mod 3), not an absolute window (measured: an
  id < 300 window finds zero pairs at sf0.1). Every stage is
  identical in both engines, so the driver hash certifies the LSH
  ITSELF for the first time, not just its confirm stage; the theorem
  `exact_dup_detected_ok` (J = 1 ⇒ identical signatures ⇒ detected)
  rides per row and recall is one IEEE division of the emitted
  counts.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no dedup surface; this completes the d-family (d1-d9, dp1) with the
evaluation loop production dedup pipelines run to TUNE banding
parameters before a 100 TB sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

_SEEDS = 16
_BAND_ROWS = 4

_DUCK_TOKS = (
    "string_split(trim(regexp_replace(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
)

# truth: prefix-filter exact similarity join at tau = 0.5 over the slice
# (prefix length n - ceil(n/2) + 1; ceil(n/2) = (n+1) DIV 2; length
# filter 2*min >= max) — the ssj2 machinery, threshold inter*2 >= union
_D10_SQL = rf"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_filter(
           list_transform(
             range(1, greatest(len({_DUCK_TOKS}) - 3, 0) + 2),
             i -> array_to_string(list_slice({_DUCK_TOKS}, i, i + 2), ' ')),
           s -> length(s) > 0)) AS grams
  FROM documents WHERE doc_id % 3 = 0
), shn AS (
  SELECT doc_id, grams, CAST(len(grams) AS BIGINT) AS n
  FROM sh WHERE len(grams) > 0
), ex AS (
  SELECT doc_id, unnest(grams) AS gram FROM shn
), mh AS (
  SELECT e.doc_id, s.i,
         MIN(CAST('0x' || substr(md5(CAST(s.i AS VARCHAR) || ':' || e.gram),
                                 1, 15) AS BIGINT)) AS h
  FROM ex e CROSS JOIN (SELECT unnest(range(0, {_SEEDS})) AS i) s
  GROUP BY e.doc_id, s.i
), sig AS (
  SELECT doc_id, i // {_BAND_ROWS} AS band,
         string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS bsig
  FROM mh GROUP BY doc_id, i // {_BAND_ROWS}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
), freq AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM ex GROUP BY gram
), ordered AS (
  SELECT e.doc_id, list(e.gram ORDER BY f.c, e.gram) AS gs
  FROM ex e JOIN freq f ON f.gram = e.gram
  GROUP BY e.doc_id
), pre AS (
  SELECT o.doc_id, s.n,
         unnest(list_slice(o.gs, 1, s.n - (s.n + 1) // 2 + 1)) AS gram
  FROM ordered o JOIN shn s ON s.doc_id = o.doc_id
), tcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pre a JOIN pre b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
   AND 2 * LEAST(a.n, b.n) >= GREATEST(a.n, b.n)
), truth AS (
  SELECT t.id_a, t.id_b,
         CAST(len(list_intersect(sa.grams, sb.grams)) AS BIGINT) AS inter_n,
         CAST(sa.n + sb.n - len(list_intersect(sa.grams, sb.grams))
              AS BIGINT) AS union_n
  FROM tcand t
  JOIN shn sa ON sa.doc_id = t.id_a
  JOIN shn sb ON sb.doc_id = t.id_b
  WHERE CAST(len(list_intersect(sa.grams, sb.grams)) AS BIGINT) * 2
          >= sa.n + sb.n - len(list_intersect(sa.grams, sb.grams))
), scored AS (
  SELECT t.id_a, t.id_b, t.inter_n, t.union_n,
         t.inter_n / t.union_n AS jaccard,
         (c.id_a IS NOT NULL) AS detected
  FROM truth t LEFT JOIN cand c
    ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT id_a, id_b, inter_n, union_n, jaccard, detected,
       (inter_n <> union_n OR detected) AS exact_dup_detected_ok,
       CAST(SUM(CASE WHEN detected THEN 1 ELSE 0 END)
            OVER () AS BIGINT) AS n_detected,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_truth,
       CAST(SUM(CASE WHEN detected THEN 1 ELSE 0 END) OVER () AS BIGINT)
         / CAST(COUNT(*) OVER () AS BIGINT) AS recall
FROM scored
"""


@_register("d10_minhash_recall", _D10_SQL)
def d10_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with its recall hash-certified end-to-end: 16
    min-hashes per document (60-bit md5 prefixes keyed by seed — the
    portable construction DuckDB can replay, unlike d3/d7's xxhash64),
    4 bands × 4 rows, candidates by band-signature equi-join, recall
    scored against the COMPLETE Jaccard ≥ 0.5 truth from the
    prefix-filter join (ssj2's algorithm at τ = 0.5 — complete by the
    prefix theorem, so the ground truth itself needs no brute force)
    over a relative 1/3 doc slice: the planted near-dup pairs span the
    whole id range, so an absolute id window goes vacuous at larger
    SFs (measured: zero truth pairs at sf0.1 under id < 300) while a
    modular slice keeps ~1/9 of all pairs at every SF. Per true pair:
    exact set arithmetic, the detected flag, and the theorem
    `exact_dup_detected_ok` (J = 1 ⇒ identical signatures ⇒ same
    bands — LSH can never miss an exact duplicate); summary columns
    carry the counts and recall as one IEEE division. At s = 0.5 the
    banding catch probability is 1 − (1 − s⁴)⁴ ≈ 0.23, rising steeply
    toward 1 as s → 1 — on this corpus the planted near-dups sit high
    on that curve and recall measures 1.0 at every SF, which is
    exactly the kind of fact this harness exists to MEASURE rather
    than assume; the property layer replays signatures and truth in
    pure Python."""
    from .operators.dedup import shingles

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    sh = (
        d.select(
            "doc_id",
            F.array_distinct(shingles(F.col("text"), 3)).alias("grams"),
        )
        .where(F.size("grams") > 0)
        .withColumn("n", F.size("grams").cast("bigint"))
        .persist()
    )
    ex = sh.select("doc_id", F.explode("grams").alias("gram"))
    seeds = spark.range(0, _SEEDS).select(F.col("id").cast("int").alias("i"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("i").cast("string"), F.lit(":"), F.col("gram"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    mh = (
        ex.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "i")
        .agg(F.min(h).alias("h"))
    )
    sig = mh.groupBy(
        "doc_id", F.expr(f"i DIV {_BAND_ROWS}").alias("band")
    ).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "h"))),
                lambda s: s["h"].cast("string"),
            ),
        ).alias("bsig")
    )
    cand = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # ground truth: prefix filter at tau = 0.5 (complete by theorem)
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
                    (
                        F.col("n")
                        - F.expr("(n + 1) DIV 2")
                        + 1
                    ).cast("int"),
                )
            ).alias("gram"),
        )
        .persist()
    )
    tcand = (
        pre.alias("a")
        .join(pre.alias("b"), "gram")
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                2 * F.least(F.col("a.n"), F.col("b.n"))
                >= F.greatest(F.col("a.n"), F.col("b.n"))
            )
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("grams").alias("ga"),
        F.col("n").alias("na"),
    )
    sb = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("grams").alias("gb"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("ga", "gb")).cast("bigint")
    union = F.col("na") + F.col("nb") - inter
    truth = (
        tcand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(inter * 2 >= union)
        .select(
            "id_a",
            "id_b",
            inter.alias("inter_n"),
            union.alias("union_n"),
        )
    )
    scored = truth.join(
        cand.withColumn("hit", F.lit(1)), ["id_a", "id_b"], "left"
    ).select(
        "id_a",
        "id_b",
        "inter_n",
        "union_n",
        (F.col("inter_n") / F.col("union_n")).alias("jaccard"),
        F.col("hit").isNotNull().alias("detected"),
    )
    w_all = Window.partitionBy()
    n_det = F.sum(F.when(F.col("detected"), 1).otherwise(0)).over(w_all)
    n_tru = F.count(F.lit(1)).over(w_all)
    return scored.select(
        "id_a",
        "id_b",
        "inter_n",
        "union_n",
        "jaccard",
        "detected",
        ((F.col("inter_n") != F.col("union_n")) | F.col("detected")).alias(
            "exact_dup_detected_ok"
        ),
        n_det.cast("bigint").alias("n_detected"),
        n_tru.cast("bigint").alias("n_truth"),
        (n_det.cast("bigint") / n_tru.cast("bigint")).alias("recall"),
    )
