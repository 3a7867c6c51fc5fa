r"""Shared pieces of the sd2 ExactSubstr rewrite, used by BOTH the
accounting query (queries_wave124.sd2_substring_rewrite) and the
composed clean->pack pipeline (queries_wave127.px8_clean_pack_pipeline)
— ONE definition so the two oracles cannot drift (the r8
shared-fragment lesson).

LEAF MODULE: no package imports at module level (only pyspark), so it
initializes fully no matter which wave module is imported first — the
cross-wave `from .queries_wave124 import ...` form breaks when a test
imports wave124 directly (queries.py's registration chain reaches
wave127 while wave124 is still partially initialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_W = 10  # window width in tokens (matches sd1; Lee et al. use 50 BPE)

# The CTE chain (base -> planted -> win -> rep -> canon -> marked -> cov
# -> toksrc -> kept -> cleaned); compose as f"WITH {_SD2_CTES} <select>".
_SD2_CTES = rf"""base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))),
                                           '\s+'),
                     t -> LENGTH(t) > 0) AS toks0
  FROM documents
), planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 61 = 0
              THEN list_transform(range(1, 13),
                                  i -> 'boiler' || CAST(i AS VARCHAR))
              WHEN doc_id % 13 = 0
              THEN list_concat(list_transform(range(1, 13),
                                              i -> 'boiler' || CAST(i AS VARCHAR)),
                               toks0)
              ELSE toks0 END AS toks
  FROM base
), win AS (
  SELECT doc_id, i,
         md5(array_to_string(list_slice(toks, i, i + {_W} - 1), ' ')) AS wh
  FROM planted, UNNEST(range(1, len(toks) - {_W} + 2)) AS t(i)
  WHERE len(toks) >= {_W}
), rep AS (
  SELECT wh, MIN(doc_id) AS cdoc
  FROM win GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
), canon AS (
  SELECT w.wh, r.cdoc, MIN(w.i) AS ci
  FROM win w JOIN rep r ON w.wh = r.wh AND w.doc_id = r.cdoc
  GROUP BY w.wh, r.cdoc
), marked AS (
  SELECT w.doc_id, w.i
  FROM win w JOIN canon c ON w.wh = c.wh
  WHERE NOT (w.doc_id = c.cdoc AND w.i = c.ci)
), cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, UNNEST(range(i, i + {_W})) AS pos FROM marked
  )
), toksrc AS (
  SELECT doc_id, i, toks[i] AS tok
  FROM planted, UNNEST(range(1, len(toks) + 1)) AS t(i)
), kept AS (
  SELECT t.doc_id, t.i, t.tok
  FROM toksrc t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.pos
  WHERE c.pos IS NULL
), cleaned AS (
  SELECT doc_id, COUNT(*) AS kept_tokens,
         md5(array_to_string(list(tok ORDER BY i), ' ')) AS clean_md5
  FROM kept GROUP BY doc_id
)"""


def sd2_cleaned_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sd2 rewrite pipeline up to (doc_id, toks, kept_toks) — the
    engine-side mirror of ``_SD2_CTES``. Package imports are deferred to
    call time (leaf-module rule above)."""
    from .operators.partitioning import spread
    from .sources.readers import load_table

    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks0 = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda t: F.length(t) > 0,
    )
    boiler = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda i: F.concat(F.lit("boiler"), i.cast("string")),
    )
    planted = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 61 == 0, boiler)
        .when(F.col("doc_id") % 13 == 0, F.concat(boiler, toks0))
        .otherwise(toks0)
        .alias("toks"),
    ).localCheckpoint(eager=True)  # feeds win + the final rewrite join
    win = planted.where(F.size("toks") >= _W).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (_W - 1)),
                lambda i: F.struct(
                    i.alias("i"),
                    F.md5(
                        F.concat_ws(
                            " ", F.slice("toks", i, F.lit(_W))
                        ).cast("binary")
                    ).alias("wh"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", "w.i", "w.wh").localCheckpoint(eager=True)
    # win feeds rep, canon AND marked — materialize once (the
    # signature-frame lesson from the verify gotchas)
    rep = (
        win.groupBy("wh")
        .agg(
            F.count_distinct("doc_id").alias("_nd"),
            F.min("doc_id").alias("cdoc"),
        )
        .where(F.col("_nd") >= 2)
        .select("wh", "cdoc")
    )
    canon = (
        win.join(rep, ["wh"])
        .where(F.col("doc_id") == F.col("cdoc"))
        .groupBy("wh", "cdoc")
        .agg(F.min("i").alias("ci"))
    )
    marked = (
        win.join(canon, ["wh"])
        .where(~((F.col("doc_id") == F.col("cdoc")) & (F.col("i") == F.col("ci"))))
        .select("doc_id", "i")
    )
    cov = (
        marked.select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + (_W - 1))).alias(
                "pos"
            ),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("_cov"))
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, idx: ~F.array_contains(
            F.coalesce(F.col("_cov"), F.array().cast("array<int>")),
            idx + 1,
        ),
    )
    return planted.join(cov, "doc_id", "left").select(
        "doc_id", "toks", kept.alias("kept_toks")
    )
