"""Round-3 wave 27: materialized-path subtree aggregation (the reference's
hierarchy domain generalized) and the LLM fine-tuning data-prep trio —
SFT example assembly, preference-pair construction, group-aware k-fold
splitting.

- hier1: the reference stores trees as delimited path strings
  (PATH_TO_ROOT, C_FULLNAME — Angelo_ETL_Task.py:32,43); subtree rollup
  is THE aggregation that representation exists for: explode each fact's
  ancestor prefixes (map-side, fan-out = depth) and run one combinable
  group-count — no recursion, no self-joins.
- ft1/pref1/cv1: everything downstream of the cleaning/dedup/curation
  operators (tx*, d*, bud1, mix1, dm1): turn curated documents into
  supervised examples with byte offsets + md5 identity, build
  (chosen, rejected) preference pairs, and split WITHOUT group leakage.
  All-deterministic (md5 splits, integer scores, pinned tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# hier1: materialized-path subtree rollup (ancestor-prefix explode)
# =========================================================================

_HIER1_SQL = """
WITH fact AS (
  SELECT 'R' || CAST(r.r_regionkey AS VARCHAR) AS p1,
         'R' || CAST(r.r_regionkey AS VARCHAR) || '/N'
             || CAST(n.n_nationkey AS VARCHAR) AS p2,
         'R' || CAST(r.r_regionkey AS VARCHAR) || '/N'
             || CAST(n.n_nationkey AS VARCHAR) || '/C'
             || CAST(c.c_custkey AS VARCHAR) AS p3,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
), exploded AS (
  SELECT UNNEST([p1, p2, p3]) AS path, cents FROM fact
)
SELECT path,
       CAST(len(string_split(path, '/')) AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM exploded GROUP BY path
"""


@_register("hier1_subtree_rollup", _HIER1_SQL)
def hier1_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree totals over a materialized-path hierarchy — the aggregation
    the reference's path-string tree encoding (PATH_TO_ROOT
    Angelo_ETL_Task.py:32, C_FULLNAME :43-47) exists to serve: every
    order carries its region/nation/customer path, each fact row explodes
    into its ancestor PREFIXES (depth rows, map-side — no recursion, no
    hierarchy self-join), and one combinable group-count yields order
    counts and exact-cent revenue at EVERY subtree simultaneously.
    Unlike ROLLUP (g1), this is the string-path formulation that works
    when the hierarchy is ragged or arbitrarily deep — the i2b2 ontology
    case. At 100 TB: fan-out equals depth (3 here), the aggregate is
    map-side-combinable, and no shuffle carries more than the distinct
    subtree keys."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    fact = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.concat(F.lit("R"), F.col("r_regionkey").cast("string")).alias(
                "p1"
            ),
            F.concat(
                F.lit("R"),
                F.col("r_regionkey").cast("string"),
                F.lit("/N"),
                F.col("n_nationkey").cast("string"),
            ).alias("p2"),
            F.concat(
                F.lit("R"),
                F.col("r_regionkey").cast("string"),
                F.lit("/N"),
                F.col("n_nationkey").cast("string"),
                F.lit("/C"),
                F.col("c_custkey").cast("string"),
            ).alias("p3"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    exploded = fact.select(
        F.explode(F.array("p1", "p2", "p3")).alias("path"), "cents"
    )
    return exploded.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    ).select(
        "path",
        F.size(F.split("path", "/")).cast("bigint").alias("depth"),
        "n_orders",
        "revenue_cents",
    )


# =========================================================================
# ft1: SFT training-example assembly with offsets + identity
# =========================================================================

_FT1_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), ok AS (
  SELECT doc_id,
         'Summarize the following document:' || chr(10)
           || array_to_string(toks[1:40], ' ') AS prompt,
         array_to_string(toks[41:60], ' ') AS completion
  FROM w WHERE len(toks) >= 60
), asm AS (
  SELECT doc_id, prompt, completion,
         prompt || chr(10) || '### Response' || chr(10) || completion
           AS assembled
  FROM ok
)
SELECT doc_id,
       CAST(LENGTH(prompt) AS BIGINT) AS prompt_chars,
       CAST(LENGTH(completion) AS BIGINT) AS completion_chars,
       CAST(LENGTH(assembled) AS BIGINT) AS total_chars,
       CAST(LENGTH(prompt) + 15 AS BIGINT) AS completion_start,
       md5(assembled) AS sample_md5,
       CASE WHEN CAST('0x' || substr(md5('s' || CAST(doc_id AS VARCHAR)),
                                     1, 8) AS BIGINT) % 10 < 8
            THEN 'train' ELSE 'val' END AS split,
       CAST(ROW_NUMBER() OVER (
         ORDER BY md5('e' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS epoch_pos
FROM asm
"""


@_register("ft1_sft_examples", _FT1_SQL)
def ft1_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised fine-tuning example assembly — the step after cleaning/
    dedup/curation that turns documents into (prompt, completion) training
    records: template + first-40-words prompt, next-20-words completion,
    the assembled text's md5 as a stable sample identity (dedup/lineage
    key across pipeline versions), the completion's 1-based char offset
    (loss masking needs it), an md5 80/20 train/val split (stable under
    re-runs and corpus growth — rows never migrate between splits), and a
    deterministic md5-shuffled epoch position (reproducible training
    order without a global rand()). All string/integer ops — one narrow
    projection plus a single rank over the kept set; at 100 TB the only
    coordination is the epoch-order sort, which is a range partition (or
    per-shard orders at scale, as the docstring of ord1 notes)."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("toks"))
    ok = w.where(F.size("toks") >= 60).select(
        "doc_id",
        F.concat(
            F.lit("Summarize the following document:"),
            F.lit("\n"),
            F.array_join(F.slice("toks", 1, 40), " "),
        ).alias("prompt"),
        F.array_join(F.slice("toks", 41, 20), " ").alias("completion"),
    )
    asm = ok.select(
        "doc_id",
        "prompt",
        "completion",
        F.concat(
            F.col("prompt"),
            F.lit("\n### Response\n"),
            F.col("completion"),
        ).alias("assembled"),
    )
    return asm.select(
        "doc_id",
        F.length("prompt").cast("bigint").alias("prompt_chars"),
        F.length("completion").cast("bigint").alias("completion_chars"),
        F.length("assembled").cast("bigint").alias("total_chars"),
        (F.length("prompt") + 15).cast("bigint").alias("completion_start"),
        F.md5(F.col("assembled").cast("binary")).alias("sample_md5"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 10
            < 8,
            "train",
        )
        .otherwise("val")
        .alias("split"),
        F.row_number()
        .over(
            Window.orderBy(
                F.md5(F.concat(F.lit("e"), F.col("doc_id").cast("string"))),
                "doc_id",
            )
        )
        .cast("bigint")
        .alias("epoch_pos"),
    )


# =========================================================================
# pref1: preference-pair construction (RLHF/DPO data prep)
# =========================================================================

_PREF1_SQL = """
WITH scored AS (
  SELECT doc_id, source,
         CAST(1000 * len(list_distinct(string_split(text, ' ')))
              // len(string_split(text, ' ')) AS BIGINT) AS score
  FROM documents
), best AS (
  SELECT source, doc_id AS chosen_id, score AS chosen_score FROM (
    SELECT source, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY score DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn = 1
), worst AS (
  SELECT source, doc_id AS rejected_id, score AS rejected_score FROM (
    SELECT source, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY score ASC, doc_id) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT b.source, b.chosen_id, w.rejected_id,
       b.chosen_score, w.rejected_score,
       CAST(b.chosen_score - w.rejected_score AS BIGINT) AS margin
FROM best b JOIN worst w ON w.source = b.source
WHERE b.chosen_id <> w.rejected_id
"""


@_register("pref1_preference_pairs", _PREF1_SQL)
def pref1_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for RLHF/DPO: within each source
    group, pair the highest-quality document (chosen) with the lowest
    (rejected), quality = integer lexical diversity (1000 * distinct
    words div total words — exact, no floats), tiebreaks pinned by
    doc_id, degenerate one-document groups dropped by the
    chosen <> rejected guard. Two per-group order statistics over the
    scored frame — at 100 TB a single shuffle on the group key, with the
    scoring scan map-side. The margin column is the exact score gap DPO
    weighting consumes."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(1000 * size(array_distinct(split(text, ' ')))"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("score"),
    )
    wb = Window.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    ww = Window.partitionBy("source").orderBy(F.col("score").asc(), "doc_id")
    best = (
        scored.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select(
            "source",
            F.col("doc_id").alias("chosen_id"),
            F.col("score").alias("chosen_score"),
        )
    )
    worst = (
        scored.withColumn("rn", F.row_number().over(ww))
        .where(F.col("rn") == 1)
        .select(
            F.col("source").alias("source_w"),
            F.col("doc_id").alias("rejected_id"),
            F.col("score").alias("rejected_score"),
        )
    )
    return (
        best.join(worst, best["source"] == worst["source_w"])
        .where(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "source",
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        )
    )


# =========================================================================
# cv1: group-aware k-fold split with leakage audit
# =========================================================================

_CV1_SQL = """
WITH folds AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5('d' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 5 AS fold_naive,
         CAST('0x' || substr(md5('g' || source), 1, 8)
              AS BIGINT) % 5 AS fold_grouped
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fold_naive) AS BIGINT) AS n_folds_naive,
       (COUNT(DISTINCT fold_naive) > 1) AS leaky_naive,
       CAST(COUNT(DISTINCT fold_grouped) AS BIGINT) AS n_folds_grouped,
       (COUNT(DISTINCT fold_grouped) > 1) AS leaky_grouped,
       CAST(MIN(fold_grouped) AS BIGINT) AS group_fold
FROM folds GROUP BY source
"""


@_register("cv1_group_kfold", _CV1_SQL)
def cv1_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment with a leakage audit: the naive
    per-document md5 split scatters every multi-document source across
    folds (train/test leakage when documents within a source are
    correlated — near-dups, shared boilerplate), while the md5-of-GROUP
    split pins each source to exactly one fold. Both assignments are
    computed side by side and audited per source (distinct-fold counts +
    leaky verdicts), so the output demonstrates the failure AND the fix
    in one frame — leaky_naive is true for every multi-doc source,
    leaky_grouped false everywhere, by construction at every SF. One
    group-by on source; md5 keeps assignments stable under corpus
    growth (a new document never moves an existing group's fold)."""
    d = _t(spark, sf_dir, "documents")

    def hmod(prefix: str, col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 8), 16, 10
            ).cast("bigint")
            % 5
        )

    folds = d.select(
        "doc_id",
        "source",
        hmod("d", F.col("doc_id").cast("string")).alias("fold_naive"),
        hmod("g", F.col("source")).alias("fold_grouped"),
    )
    return folds.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fold_naive").cast("bigint").alias("n_folds_naive"),
        (F.countDistinct("fold_naive") > 1).alias("leaky_naive"),
        F.countDistinct("fold_grouped")
        .cast("bigint")
        .alias("n_folds_grouped"),
        (F.countDistinct("fold_grouped") > 1).alias("leaky_grouped"),
        F.min("fold_grouped").alias("group_fold"),
    )
