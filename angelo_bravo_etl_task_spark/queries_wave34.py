"""Round-3 wave 34: the retrieval pipeline end to end — the composition
capstone for the similarity family, mirroring what d7 is for dedup.

px5 chains the retrieval ops the registry implements piecemeal into ONE
oracle-checked plan: chunk the corpus (ck1's shape) → embed each chunk
(deterministic md5-projection stub — the honest stand-in this container
can verify bit-for-bit; a real model plugs in at exactly this seam, u9's
broadcast-model shape) → cluster chunks to md5 centroids by EXACT integer
L2 (x6's assignment) → route the query to its centroid and search only
that cluster (x4's IVF probe) → exact cosine re-rank of the cluster
(x1's bit-exact fold) → top-5. Every stage is deterministic, so the
whole pipeline is value-hash-comparable against DuckDB — the end-to-end
guarantee a RAG ingestion+serving path needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

_DIM = 8
_K = 4

# embedding component d of a text: md5(text # d) hex8 % 1000, as double
_EMB = (
    "list_transform(generate_series(0, {dmax}), d ->"
    " CAST(CAST('0x' || substr(md5({txt} || '#' || CAST(d AS VARCHAR)),"
    " 1, 8) AS BIGINT) % 1000 AS DOUBLE))"
)

_COS = (
    "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]),"
    " (acc, v) -> acc + v)"
    " / (sqrt(list_reduce(list_transform({a}, v -> v * v), (a, b) -> a + b))"
    " * sqrt(list_reduce(list_transform({b}, v -> v * v), (a, b) -> a + b)))"
)

_PX5_SQL = f"""
WITH chunks AS (
  SELECT doc_id, k AS chunk_idx,
         array_to_string((string_split(text, ' '))[10 * k + 1 : 10 * k + 10],
                         ' ') AS ctext
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS k)
  WHERE len(string_split(text, ' ')) >= 30
), emb AS (
  SELECT doc_id, chunk_idx, ctext,
         {_EMB.format(dmax=_DIM - 1, txt="ctext")} AS v
  FROM chunks
), cents AS (
  SELECT k,
         {_EMB.format(dmax=_DIM - 1,
                      txt="'c' || CAST(k AS VARCHAR) || '_'")} AS cv
  FROM (SELECT UNNEST(generate_series(0, {_K - 1})) AS k)
), assigned AS (
  SELECT e.doc_id, e.chunk_idx, e.ctext, e.v, cl.k AS cluster FROM (
    SELECT e2.doc_id, e2.chunk_idx, c.k,
           ROW_NUMBER() OVER (
             PARTITION BY e2.doc_id, e2.chunk_idx
             ORDER BY list_reduce(list_transform(list_zip(e2.v, c.cv),
                        x -> (x[1] - x[2]) * (x[1] - x[2])),
                        (a, b) -> a + b), c.k
           ) AS rn
    FROM emb e2, cents c
  ) cl
  JOIN emb e ON e.doc_id = cl.doc_id AND e.chunk_idx = cl.chunk_idx
  WHERE cl.rn = 1
), q AS (
  SELECT v AS qv, cluster AS qcluster FROM assigned
  WHERE doc_id = (SELECT MIN(doc_id) FROM assigned) AND chunk_idx = 0
), scored AS (
  SELECT a.doc_id, a.chunk_idx, a.cluster,
         {_COS.format(a="q.qv", b="a.v")} AS cosine
  FROM assigned a, q
  WHERE a.cluster = q.qcluster
)
SELECT doc_id, chunk_idx, CAST(cluster AS BIGINT) AS cluster, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id, chunk_idx)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
"""


@_register("px5_retrieval_pipeline", _PX5_SQL)
def px5_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval pipeline: chunk → embed → cluster → probe →
    re-rank in ONE lazy plan. Chunks are the first three 10-word windows
    of each >=30-word document; the embedding is a deterministic md5
    projection (8 dims of md5(chunk#d) % 1000 — the verifiable stub; a
    real encoder swaps in at this seam as a broadcast model, u9's
    shape); chunks route to the nearest of 4 md5 centroids by EXACT
    integer squared L2 (tie on centroid id — no sqrt, no drift); the
    query (doc 0's first chunk) searches ONLY its own cluster (the IVF
    probe that makes 100 TB ANN serving affordable — the corpus-wide
    stage is the clustering, a broadcast-centroid argmin that is
    embarrassingly parallel); the in-cluster re-rank is x1's bit-exact
    cosine fold; top-5 with pinned tiebreaks. The expected #1 result is
    the query chunk itself at cosine 1.0 — a built-in sanity invariant
    the property test asserts."""
    d = _t(spark, sf_dir, "documents")
    chunks = (
        d.where(F.size(F.split("text", " ")) >= 30)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias(
                "chunk_idx"
            ),
            F.split("text", " ").alias("w"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.expr("slice(w, 10 * chunk_idx + 1, 10)"), " "
            ).alias("ctext"),
        )
    )
    emb_expr = (
        "transform(sequence(0, {dmax}), d ->"
        " CAST(conv(substring(md5({txt} || '#' || CAST(d AS STRING)),"
        " 1, 8), 16, 10) % 1000 AS DOUBLE))"
    )
    emb = chunks.select(
        "doc_id",
        "chunk_idx",
        F.expr(emb_expr.format(dmax=_DIM - 1, txt="ctext")).alias("v"),
    ).persist()
    cents = spark.range(0, _K).select(
        F.col("id").alias("k"),
        F.expr(
            emb_expr.format(
                dmax=_DIM - 1, txt="'c' || CAST(id AS STRING) || '_'"
            )
        ).alias("cv"),
    )
    # exact integer L2^2 assignment (values < 1000 so squares are exact
    # in double; fold order identical on both engines)
    l2 = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    w = Window.partitionBy("doc_id", "chunk_idx").orderBy(l2, "k")
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "chunk_idx", "v", F.col("k").alias("cluster"))
        .persist()
    )
    # query = the FIRST eligible document's first chunk (a hardcoded
    # doc id goes empty-vacuous at SFs where that doc is under 30 words
    # — the x3 lesson)
    qdoc = assigned.agg(F.min("doc_id").alias("qdoc"))
    q = (
        assigned.join(
            F.broadcast(qdoc), F.col("doc_id") == F.col("qdoc")
        )
        .where(F.col("chunk_idx") == 0)
        .select(F.col("v").alias("qv"), F.col("cluster").alias("qcluster"))
    )
    cos = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0 AS DOUBLE),"
        " (a, b) -> a + b)"
        " / (sqrt(aggregate(transform(qv, x -> x * x), CAST(0 AS DOUBLE),"
        " (a, b) -> a + b))"
        " * sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE),"
        " (a, b) -> a + b)))"
    )
    scored = (
        assigned.join(
            F.broadcast(q), F.col("cluster") == F.col("qcluster")
        )
        .select("doc_id", "chunk_idx", "cluster", cos.alias("cosine"))
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("cosine").desc(), "doc_id", "chunk_idx"
                )
            )
            .cast("bigint"),
        )
        .where(F.col("rank") <= 5)
        .select(
            "doc_id",
            "chunk_idx",
            F.col("cluster").cast("bigint").alias("cluster"),
            "cosine",
            "rank",
        )
    )
