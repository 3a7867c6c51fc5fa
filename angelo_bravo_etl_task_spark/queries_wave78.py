r"""Round-5 wave 78: ANN recall certification, IVF bucket-balance audit.

- x8: the evaluation that makes an approximate index TRUSTABLE — IVF
  recall@5 against exact brute force, computed END-TO-END inside the
  query for BOTH nprobe=1 and nprobe=2, with the monotonicity law
  (more probes ⇒ candidate superset ⇒ recall can only rise) certified
  per query. x2/x4 ship approximate indexes as rows-only checks; x8
  makes the EVALUATION itself exactly oracle-checkable because every
  step — centroid assignment, probe selection, candidate generation,
  exact top-k, intersection — is deterministic arithmetic with the
  identical left-fold distance in both engines (the x1/km1
  discipline).
- x9: the capacity-planning twin: per-centroid bucket populations and
  the imbalance statistics (max/mean ratio) that set IVF tail
  latency — a skewed bucket is the ANN analogue of a skewed join key
  (sk2). Conservation (bucket sizes sum to the vector count) rides
  along as a certified column.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no vector surface; these extend the similarity family (x1-x7, km1,
x5/x6) with the recall evaluation and the index-health audit that
production ANN deployments run nightly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

_D2_DUCK = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> (x[1] - x[2]) * (x[1] - x[2])), (acc, v) -> acc + v)"
)


def _d2(a: Column, b: Column) -> Column:
    """Squared L2 with the exact left-fold order DuckDB's list_reduce
    uses (0.0 + x1 ≡ x1 in IEEE, so the running sums are bit-equal)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_X8_SQL = rf"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent AS (
  SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 100 = 0
), assign_ AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_D2_DUCK.format(a='v.e', b='c.ce')}, c.cid) AS rnk
    FROM v CROSS JOIN cent c
  ) WHERE rnk = 1
), probes AS (
  SELECT qid, cid, rnk AS probe_rank FROM (
    SELECT q.vec_id AS qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_D2_DUCK.format(a='q.e', b='c.ce')}, c.cid) AS rnk
    FROM v q CROSS JOIN cent c WHERE q.vec_id < 50
  ) WHERE rnk <= 2
), cand AS (
  SELECT p.qid, a.vec_id AS nid, p.probe_rank
  FROM probes p JOIN assign_ a ON a.cid = p.cid
  WHERE a.vec_id <> p.qid
), exact AS (
  SELECT qid, nid FROM (
    SELECT q.vec_id AS qid, n.vec_id AS nid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_D2_DUCK.format(a='q.e', b='n.e')}, n.vec_id) AS rnk
    FROM v q CROSS JOIN v n
    WHERE q.vec_id < 50 AND n.vec_id <> q.vec_id
  ) WHERE rnk <= 5
), hits AS (
  SELECT e.qid,
         CAST(SUM(CASE WHEN c1.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS hits_p1,
         CAST(SUM(CASE WHEN c2.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS hits_p2
  FROM exact e
  LEFT JOIN (SELECT DISTINCT qid, nid FROM cand WHERE probe_rank = 1) c1
    ON c1.qid = e.qid AND c1.nid = e.nid
  LEFT JOIN (SELECT DISTINCT qid, nid FROM cand) c2
    ON c2.qid = e.qid AND c2.nid = e.nid
  GROUP BY e.qid
)
SELECT qid, hits_p1, hits_p2,
       hits_p1 / 5 AS recall_p1,
       hits_p2 / 5 AS recall_p2,
       (hits_p2 >= hits_p1) AS mono_ok
FROM hits
"""


@_register("x8_ivf_recall", _X8_SQL)
def x8_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@5 certified end-to-end: every vector is assigned to
    its nearest coarse centroid (every-100th vector, x4's seeding),
    each of the 50 query vectors probes its 1 or 2 nearest centroids,
    candidates are the probed buckets' members, and recall is the exact
    intersection with the brute-force top-5 — all inside one
    deterministic dataflow, so the DuckDB oracle checks the WHOLE
    evaluation, not a summary. Per query: hits and recall at nprobe=1
    and nprobe=2 plus the monotonicity law `hits_p2 ≥ hits_p1` (probing
    more buckets only grows the candidate set — false would mean the
    candidate join is broken). Distances are squared-L2 left folds in
    the bit-identical order both engines share (x1/km1 discipline);
    every ranking carries a vec_id tiebreak. Scale shape: assignment is
    a broadcast of the centroid table against the vector corpus (one
    map-side pass at 100 TB); the recall evaluation itself runs on the
    50-query sample — the production pattern (audit a fixed query set
    nightly, not the full corpus). recall_pN is an IEEE division of
    exact BIGINTs."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    pairs = emb.crossJoin(F.broadcast(cent))
    w_assign = Window.partitionBy("vec_id").orderBy(
        _d2(F.col("e"), F.col("ce")), "cid"
    )
    assign_ = (
        pairs.withColumn("rnk", F.row_number().over(w_assign))
        .where(F.col("rnk") == 1)
        .select("vec_id", "cid")
    )
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    w_probe = Window.partitionBy("qid").orderBy(
        _d2(F.col("qe"), F.col("ce")), "cid"
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .where(F.col("probe_rank") <= 2)
        .select("qid", "cid", "probe_rank")
    )
    cand = (
        probes.join(assign_, "cid")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"), "probe_rank")
    )
    w_exact = Window.partitionBy("qid").orderBy(
        _d2(F.col("qe"), F.col("ne")), "nid"
    )
    exact = (
        q.crossJoin(
            emb.select(F.col("vec_id").alias("nid"), F.col("e").alias("ne"))
        )
        .where(F.col("nid") != F.col("qid"))
        .withColumn("rnk", F.row_number().over(w_exact))
        .where(F.col("rnk") <= 5)
        .select("qid", "nid")
    )
    c1 = cand.where(F.col("probe_rank") == 1).select("qid", "nid").distinct()
    c2 = cand.select("qid", "nid").distinct()
    hits = (
        exact.join(
            c1.withColumn("h1", F.lit(1)), ["qid", "nid"], "left"
        )
        .join(c2.withColumn("h2", F.lit(1)), ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            F.sum(F.coalesce(F.col("h1"), F.lit(0)))
            .cast("bigint")
            .alias("hits_p1"),
            F.sum(F.coalesce(F.col("h2"), F.lit(0)))
            .cast("bigint")
            .alias("hits_p2"),
        )
    )
    return hits.select(
        "qid",
        "hits_p1",
        "hits_p2",
        (F.col("hits_p1") / 5).alias("recall_p1"),
        (F.col("hits_p2") / 5).alias("recall_p2"),
        (F.col("hits_p2") >= F.col("hits_p1")).alias("mono_ok"),
    )


_X9_SQL = rf"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent AS (
  SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 100 = 0
), assign_ AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_D2_DUCK.format(a='v.e', b='c.ce')}, c.cid) AS rnk
    FROM v CROSS JOIN cent c
  ) WHERE rnk = 1
), buckets AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n FROM assign_ GROUP BY cid
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_vectors,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(MAX(n) AS BIGINT) AS max_bucket
  FROM buckets
)
SELECT b.cid, b.n,
       t.n_vectors, t.n_buckets,
       b.n * t.n_buckets / t.n_vectors AS load_factor,
       (b.n = t.max_bucket) AS is_hottest,
       (t.n_vectors = (SELECT COUNT(*) FROM v)) AS conservation_ok
FROM buckets b CROSS JOIN tot t
"""


@_register("x9_ivf_bucket_balance", _X9_SQL)
def x9_ivf_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health audit: per-centroid bucket population and its
    load factor (n·buckets/total — 1.0 is perfectly balanced), the
    hottest-bucket flag, and the conservation certificate (bucket sizes
    sum to an INDEPENDENTLY counted corpus total — an assignment that
    drops or duplicates a vector breaks it). Bucket skew is ANN's tail latency: a probe into
    the hottest bucket scans load_factor× the average work, exactly the
    skewed-join-key pathology sk2 profiles for joins — and the input to
    rebalancing decisions (split hot centroids, merge cold ones).
    Assignment reuses x8's broadcast-centroid nearest-neighbor pass
    with the bit-identical fold; the audit itself is one combinable
    count over the assignment — at 100 TB this is a map-side pass plus
    a centroid-sized aggregate. load_factor is an IEEE division of
    exact BIGINTs."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        _d2(F.col("e"), F.col("ce")), "cid"
    )
    assign_ = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("rnk", F.row_number().over(w_assign))
        .where(F.col("rnk") == 1)
        .select("vec_id", "cid")
    )
    buckets = assign_.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = buckets.agg(
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
    )
    corpus = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    return buckets.crossJoin(F.broadcast(tot)).crossJoin(
        F.broadcast(corpus)
    ).select(
        "cid",
        "n",
        "n_vectors",
        "n_buckets",
        (F.col("n") * F.col("n_buckets") / F.col("n_vectors")).alias(
            "load_factor"
        ),
        (F.col("n") == F.col("max_bucket")).alias("is_hottest"),
        (F.col("n_vectors") == F.col("n_corpus")).alias("conservation_ok"),
    )
