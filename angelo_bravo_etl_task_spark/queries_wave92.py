r"""Round-5 wave 92: RAG indexing + retrieval pipeline, end-to-end
oracle-checkable.

- px6: the pipeline every retrieval-augmented system runs, composed
  from parts this registry has certified separately and here CHAINED
  with the hash over the whole dataflow: fixed-size chunking (32
  whitespace tokens, ck1's family) → content-addressed embeddings
  (8 dims of md5 arithmetic on the chunk text — deterministic, so
  identical text embeds identically; the mm-family's fake-decode
  discipline) → IVF assignment to deterministic centroids (x4/x8's
  seeding) → nprobe=1 retrieval of top-3 chunks for 5 probe queries
  taken from the corpus itself. Because the probes ARE indexed
  chunks, the pipeline carries a THEOREM: each query's own chunk sits
  in the probed bucket (same vector ⇒ same nearest centroid) at
  distance 0, so `self_first_ok` (rank 1 = the query chunk, distance
  0) certifies index completeness, probe routing, and ranking in one
  boolean. Every float is the shared left-fold L2; ranking ties break
  on (doc, chunk).

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no retrieval surface; px6 joins px1-px5 as the pipeline tier's
serving-side composition, built strictly from certified parts (ck1
chunking, x4 IVF, x8 evaluation, bm25_1's serving shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

_CHUNK = 32
_DIMS = 8

_DUCK_WS = (
    "list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\\s+'),"
    " t -> LENGTH(t) > 0)"
)

_PX6_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_DUCK_WS} AS ws FROM documents
), chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(list_slice(ws, i * {_CHUNK} + 1,
                                    (i + 1) * {_CHUNK}), ' ') AS ctext
  FROM toks, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(ws) / {_CHUNK}.0) AS BIGINT))) AS i
  ) _
  WHERE len(ws) > 0
), emb AS (
  SELECT doc_id, chunk_idx, ctext,
         list_transform(range(0, {_DIMS}), k ->
           CAST(CAST('0x' || substr(md5('e' || CAST(k AS VARCHAR) || ':'
                                        || ctext), 1, 8) AS BIGINT) % 1000
                AS DOUBLE) / 1000.0) AS v
  FROM chunks
), cent AS (
  SELECT doc_id AS cid, v AS cv FROM emb
  WHERE doc_id % 50 = 0 AND chunk_idx = 0
), assign_ AS (
  SELECT doc_id, chunk_idx, v, cid FROM (
    SELECT e.doc_id, e.chunk_idx, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.doc_id, e.chunk_idx
             ORDER BY list_reduce(list_transform(list_zip(e.v, c.cv),
                        x -> (x[1] - x[2]) * (x[1] - x[2])),
                        (a, b) -> a + b), c.cid) AS rnk
    FROM emb e CROSS JOIN cent c
  ) WHERE rnk = 1
), queries AS (
  SELECT doc_id AS qdoc, v AS qv, cid AS qcid
  FROM assign_ WHERE doc_id IN (1, 2, 3, 4, 5) AND chunk_idx = 0
), hits AS (
  SELECT q.qdoc, a.doc_id, a.chunk_idx,
         list_reduce(list_transform(list_zip(q.qv, a.v),
                     x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (acc, b) -> acc + b) AS dist2,
         ROW_NUMBER() OVER (PARTITION BY q.qdoc
           ORDER BY list_reduce(list_transform(list_zip(q.qv, a.v),
                      x -> (x[1] - x[2]) * (x[1] - x[2])),
                      (acc, b) -> acc + b), a.doc_id, a.chunk_idx) AS rnk
  FROM queries q JOIN assign_ a ON a.cid = q.qcid
)
SELECT qdoc, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(chunk_idx AS BIGINT)
         AS chunk_idx, dist2,
       (rnk > 1 OR (doc_id = qdoc AND chunk_idx = 0 AND dist2 = 0))
         AS self_first_ok
FROM hits WHERE rnk <= 3
"""


def _h8_expr(prefix: Column) -> Column:
    return F.conv(F.substring(F.md5(prefix), 1, 8), 16, 10).cast("bigint")


@_register("px6_rag_pipeline", _PX6_SQL)
def px6_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG indexing + retrieval, one certified dataflow: documents are
    chunked into 32-token windows, each chunk embeds as 8 dims of
    content-addressed md5 arithmetic (identical text ⇒ identical
    vector — the property real embedding caches rely on), chunks
    assign to deterministic IVF centroids by the shared left-fold L2,
    and 5 corpus-drawn probe queries retrieve their nprobe=1 bucket's
    top-3. The pipeline carries its own completeness theorem: a
    query's OWN chunk shares its vector, so it must land in the probed
    bucket at distance 0 and rank 1 (`self_first_ok`) — one boolean
    certifying indexing, routing, and ranking together; a dropped
    chunk, a mis-routed probe, or a broken tiebreak each falsify it.
    Scale shape: chunking and embedding are map-side; assignment
    broadcasts the centroid-dimension frame; retrieval joins the probe
    queries to their single bucket (bm25_1's serving shape). All
    ranking ties break on (doc, chunk); distances are the bit-shared
    fold (x1/km1 discipline)."""
    from .operators.partitioning import spread

    # spread (r12, guide §2.5 "input skew"): the documents file is ONE
    # scan split at harness scale, so chunk+embed+assign ran on a single
    # core; a narrow repartition restores map parallelism for the
    # compute-heavy embed/argmin stage (no-op cost at cluster scale).
    d = spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda t: F.length(t) > 0,
        ).alias("ws"),
    ).where(F.size("ws") > 0)
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("ws") / F.lit(float(_CHUNK))).cast("bigint") - 1,
            )
        ).alias("chunk_idx"),
        "ws",
    ).select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(
            " ",
            F.expr(f"slice(ws, chunk_idx * {_CHUNK} + 1, {_CHUNK})"),
        ).alias("ctext"),
    )
    emb = chunks.select(
        "doc_id",
        "chunk_idx",
        F.transform(
            F.sequence(F.lit(0), F.lit(_DIMS - 1)),
            lambda k: (
                _h8_expr(
                    F.concat(
                        F.lit("e"), k.cast("string"), F.lit(":"), F.col("ctext")
                    )
                )
                % 1000
            ).cast("double")
            / 1000.0,
        ).alias("v"),
    )
    cent = emb.where(
        (F.col("doc_id") % 50 == 0) & (F.col("chunk_idx") == 0)
    ).select(F.col("doc_id").alias("cid"), F.col("v").alias("cv"))

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # IVF assignment as a broadcast-pair PARTIAL-AGG argmin (optimization
    # r12, superseding r11's collected-array fold; guide §2.4/§3.1/§5).
    # r11 collapsed ALL centroids into ONE row's array<struct> and folded
    # per chunk — no shuffle, but a single unbounded array element is a
    # 2 GB-element wall at 100 TB (centroid count is |docs|/50 by
    # construction), a harder limit than the broadcast it replaced
    # (VERDICT r11 item 3). This form broadcasts the centroid TABLE
    # (bounded by the ordinary broadcast machinery, spillable build side),
    # pairs each chunk with it through a BroadcastNestedLoopJoin, and
    # reduces the pairs MAP-SIDE with min(struct(d2, cid)) — partial
    # aggregation means pair rows never cross the network; the exchange
    # carries one row per chunk. min(struct(d, cid)) is the same
    # lexicographic (d2, cid) tiebreak as r11's array_min fold and r10's
    # ORDER BY rank-1, so the chosen cid is identical; the per-chunk Sort
    # and Window of r10 stay gone. min("v") over the per-chunk-constant
    # embedding rides the same aggregate (exact: all group rows carry the
    # identical array), so no re-join is needed to keep v.
    assign_ = (
        emb.crossJoin(F.broadcast(cent))
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.min(
                F.struct(
                    d2(F.col("v"), F.col("cv")).alias("d"),
                    F.col("cid").alias("cid"),
                )
            ).alias("best"),
            F.min("v").alias("v"),
        )
        .select("doc_id", "chunk_idx", "v", F.col("best.cid").alias("cid"))
        # assign_ feeds both the probe-query selection and the retrieval
        # join; persisting stops the embed+argmin map work running twice
        .persist()
    )
    queries = assign_.where(
        F.col("doc_id").isin(1, 2, 3, 4, 5) & (F.col("chunk_idx") == 0)
    ).select(
        F.col("doc_id").alias("qdoc"),
        F.col("v").alias("qv"),
        F.col("cid").alias("qcid"),
    )
    w_rank = Window.partitionBy("qdoc").orderBy(
        d2(F.col("qv"), F.col("v")), "doc_id", "chunk_idx"
    )
    hits = (
        F.broadcast(queries)
        .join(assign_, F.col("cid") == F.col("qcid"))
        .withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= 3)
    )
    return hits.select(
        "qdoc",
        F.col("rnk").cast("bigint").alias("rnk"),
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        d2(F.col("qv"), F.col("v")).alias("dist2"),
        (
            (F.col("rnk") > 1)
            | (
                (F.col("doc_id") == F.col("qdoc"))
                & (F.col("chunk_idx") == 0)
                & (d2(F.col("qv"), F.col("v")) == 0)
            )
        ).alias("self_first_ok"),
    )
