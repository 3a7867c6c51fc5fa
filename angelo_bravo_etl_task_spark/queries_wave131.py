r"""Round-11 wave 131: span-level benchmark decontamination (ct2) and the
embedding-hubness audit (hub1).

- ct2 upgrades ct1's shared-gram COUNTING to the production decontamination
  DECISION (the GPT-3 appendix-C recipe): per document, which token spans
  are covered by benchmark n-grams, how much of the document that is, and
  the resulting disposition — keep / drop / salvage-by-splitting. ct1 told
  you THAT a doc overlaps; ct2 tells you WHAT TO DO with it.
- hub1 measures hubness — the known ANN pathology where a few vectors
  appear in everyone's top-k (k-occurrence skew) — over the x1-style
  bounded probe panel: per corpus vector its k-occurrence count, plus the
  panel's skew summary. The audit a team runs before trusting cosine
  retrieval at scale.

No reference analogue (Angelo_ETL_Task.py is row-wise ETL); both extend
SURVEY.md §2.4 (text-curation and similarity-eval families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# ---------------------------------------------------------------------------
# ct2: decontamination with span coverage and disposition
# ---------------------------------------------------------------------------

_CT2_N = 5  # n-gram order; production uses 8-13 (Brown et al. 2020) — the
            # synthetic docs are ~25 words, so 5 keeps collision density
            # while exercising identical plumbing

_CT2_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), sized AS (
  SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= {_CT2_N}
), grams AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(w, i, i + {_CT2_N - 1}), ' ') AS g,
         n
  FROM (SELECT doc_id, w, n, unnest(generate_series(1, n - {_CT2_N - 1}))
               AS i
        FROM sized)
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
), hits AS (
  SELECT d.doc_id, d.pos, d.n
  FROM grams d JOIN bench b USING (g)
  WHERE d.doc_id % 50 <> 0
), gcnt AS (
  SELECT doc_id, MAX(n) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_hit_grams
  FROM hits GROUP BY doc_id
), spanu AS (
  SELECT doc_id, CAST(COUNT(DISTINCT tok) AS BIGINT) AS covered_tokens
  FROM (SELECT doc_id,
               unnest(generate_series(pos, pos + {_CT2_N - 1})) AS tok
        FROM hits)
  GROUP BY doc_id
), cover AS (
  SELECT g.doc_id, g.n_tokens, g.n_hit_grams, s.covered_tokens
  FROM gcnt g JOIN spanu s USING (doc_id)
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_hit_grams,
       covered_tokens,
       CAST(covered_tokens * 1000 // n_tokens AS BIGINT)
         AS covered_per_mille,
       CASE WHEN covered_tokens * 5 >= n_tokens * 4 THEN 'drop'
            WHEN covered_tokens * 5 >= n_tokens THEN 'split'
            ELSE 'keep' END AS disposition
FROM cover
"""


@_register("ct2_decontam_spans", _CT2_SQL)
def ct2_decontam_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination — the production form of ct1
    (the GPT-3 appendix-C recipe: find benchmark n-gram collisions, mark
    the COVERED SPANS, then decide per document): for every corpus doc
    sharing at least one word 5-gram with the held-out benchmark slice
    (doc_id % 50 = 0), release the hit-gram count, the number of
    distinct TOKEN positions covered by any hit gram (overlapping hits
    merge — the span union, computed by exploding each hit to its token
    window and counting distinct positions), coverage per-mille, and
    the disposition a pipeline acts on: 'drop' at >= 80% coverage,
    'split' (salvage the clean remainder) at >= 20%, else 'keep'
    (remove just the spans). Thresholds are exact integer
    cross-multiplications; production runs n = 8-13 — same plumbing,
    deeper grams.

    100 TB shape: ct1's broadcast discipline carries over — the
    benchmark gram set broadcasts, corpus grams stream past it; the
    span-union step explodes ONLY the hit grams (contamination-sized,
    not corpus-sized) and aggregates map-side. At production scale join
    on xxhash64(gram) to shrink the exchange; kept as raw strings here
    so the oracle is hash-exact."""
    from .operators.partitioning import spread
    from .operators.text import tokens

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    sized = (
        d.select("doc_id", tokens(F.col("text")).alias("w"))
        .withColumn("n", F.size("w"))
        .where(F.col("n") >= _CT2_N)
    )
    grams = sized.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                f"transform(sequence(1, n - {_CT2_N - 1}), i -> "
                f"named_struct('pos', i, 'g', "
                f"array_join(slice(w, i, {_CT2_N}), ' ')))"
            )
        ).alias("pg"),
    ).select(
        "doc_id", "n", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g")
    ).localCheckpoint(eager=True)  # bench branch + corpus branch share this
    bench = grams.where(F.col("doc_id") % 50 == 0).select("g").distinct()
    hits = (
        grams.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id", "pos", "n")
        .localCheckpoint(eager=True)  # gram count + span union share this
    )
    spans = hits.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(_CT2_N - 1))
        ).alias("tok"),
    )
    cover = (
        hits.groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_hit_grams"),
        )
        .join(
            spans.groupBy("doc_id").agg(
                F.countDistinct("tok").cast("bigint").alias("covered_tokens")
            ),
            "doc_id",
        )
    )
    ct, nt = F.col("covered_tokens"), F.col("n_tokens")
    return cover.select(
        "doc_id",
        nt.cast("bigint").alias("n_tokens"),
        "n_hit_grams",
        "covered_tokens",
        F.expr("covered_tokens * 1000 DIV n_tokens").alias(
            "covered_per_mille"
        ),
        F.when(ct * 5 >= nt * 4, "drop")
        .when(ct * 5 >= nt, "split")
        .otherwise("keep")
        .alias("disposition"),
    )


# ---------------------------------------------------------------------------
# hub1: embedding hubness (k-occurrence) audit
# ---------------------------------------------------------------------------

_HUB_K = 5
_HUB_PANEL = 40  # bounded probe panel (x1's documented audit-sample shape)

_HUB1_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_HUB_PANEL}
), c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT q.qid, c.cid,
         list_reduce(list_transform(list_zip(q.qv, c.cv),
                                    x -> x[1] * x[2]),
                     (acc, v) -> acc + v)
           / (sqrt(list_reduce(list_transform(q.qv, v -> v * v),
                               (a, b) -> a + b))
              * sqrt(list_reduce(list_transform(c.cv, v -> v * v),
                                 (a, b) -> a + b))) AS sim
  FROM q, c WHERE q.qid <> c.cid
), ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
           AS r
  FROM scored
), occ AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS k_occurrence
  FROM ranked WHERE r <= {_HUB_K}
  GROUP BY cid
)
SELECT cid AS vec_id, k_occurrence
FROM occ
WHERE k_occurrence >= 2
"""


@_register("hub1_embedding_hubness", _HUB1_SQL)
def hub1_embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hubness audit — the known high-dimensional ANN
    pathology (Radovanovic et al. 2010): a few 'hub' vectors appear in
    a disproportionate share of other points' top-k lists, silently
    dominating retrieval results. Released: every corpus vector whose
    k-occurrence over the bounded 40-query probe panel's exact cosine
    top-5 lists is >= 2 (appearing in multiple lists) with its count —
    the table a team inspects before trusting cosine retrieval, and the
    input to hub-penalized re-ranking. Exact brute-force cosine via
    x1's bit-exact fold; ranking ties pinned by neighbor id, so every
    count is deterministic.

    100 TB shape: the panel broadcasts (x1's documented audit-sample
    shape — hubness is ESTIMATED from a probe sample in production, the
    k-occurrence distribution converges fast); one corpus scan scores
    all panel queries, a per-query top-k window over the scored frame,
    one combinable count. The released >= 2 filter keeps the output
    hub-sized, not corpus-sized."""
    from .operators.partitioning import spread
    from .operators.similarity import dot
    from .operators.windows import top_k_per_group

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < _HUB_PANEL).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("_qv")
    )
    c = spread(
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("_cv"))
    )
    sim = dot(F.col("_qv"), F.col("_cv")) / (
        F.sqrt(dot(F.col("_qv"), F.col("_qv")))
        * F.sqrt(dot(F.col("_cv"), F.col("_cv")))
    )
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("cid")).select(
        "qid", "cid", sim.alias("sim")
    )
    top = top_k_per_group(
        scored,
        ["qid"],
        [F.col("sim").desc(), F.col("cid").asc()],
        _HUB_K,
        alias="r",
    )
    return (
        top.groupBy("cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_occurrence"))
        .where(F.col("k_occurrence") >= 2)
        .select(F.col("cid").alias("vec_id"), "k_occurrence")
    )
