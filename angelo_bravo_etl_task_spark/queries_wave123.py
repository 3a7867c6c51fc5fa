r"""Round-9 wave 123: exact-substring cross-document dedup (sd1) — the
Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") ExactSubstr method re-expressed relationally: fixed-width token
windows repeated across documents mark spans for removal, and the
released accounting is the per-document repeated-span coverage a
curation pipeline acts on.

Completes the dedup ladder: d1/d2 whole-document exact, d3-d9 document
NEAR-dup, sdd1 semantic, tx11 sentence boilerplate — sd1 is the
SUB-document exact layer those all miss (a verbatim paragraph quoted
across otherwise-distinct documents survives every one of them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_W = 10  # window width in tokens (Lee et al. use 50 BPE tokens at scale)

# Planted positives (the tx11 clean-data-vacuousness rule): every 61st
# doc is REPLACED by a shared 12-token boilerplate run (fires the
# majority-covered removal flag) and every 13th is PREFIXED with it
# (repeated span inside otherwise-unique text), so cross-doc repeated
# windows exist at every SF; natural text flows through as negatives.
# The oracle replays the identical construction.
_SD1_SQL = rf"""
WITH base AS (
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
  SELECT wh FROM win GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
  SELECT w.doc_id, w.i FROM win w JOIN rep r ON w.wh = r.wh
), covered AS (
  SELECT doc_id, COUNT(DISTINCT pos) AS covered_tokens,
         COUNT(DISTINCT i) AS repeated_windows
  FROM (
    SELECT doc_id, i, UNNEST(range(i, i + {_W})) AS pos FROM marked
  ) GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(len(p.toks) AS BIGINT) AS n_toks,
       CAST(COALESCE(c.repeated_windows, 0) AS BIGINT) AS repeated_windows,
       CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       CAST(CASE WHEN COALESCE(c.covered_tokens, 0) * 2 > len(p.toks)
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM planted p LEFT JOIN covered c ON p.doc_id = c.doc_id
"""


@_register("sd1_substring_dedup", _SD1_SQL)
def sd1_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring cross-document dedup (Lee et al. 2021): hash every
    10-token window, keep windows whose hash appears in >= 2 DISTINCT
    documents (within-doc repetition is gq1's domain), and account the
    repeated-span coverage per document — distinct covered token
    positions, repeated window count, and the removal flag (majority of
    the doc covered). Every 13th document is PREFIXED with an identical
    12-token boilerplate run and every 61st is REPLACED by it outright
    (identically in the oracle; the %61 branch wins on overlap), so
    cross-doc repeated chains exist at every SF AND the
    majority-covered removal flag genuinely fires (the all-boilerplate
    docs); natural text flows through as negatives.

    100 TB shape: this is the relational form of the suffix-array
    method — windows are (hash, doc, pos) rows, the repeat detection is
    ONE combinable aggregate on the window hash (the only
    high-cardinality shuffle, ~n_tokens rows), and the coverage union
    is a per-doc distinct-count over the marked windows' offset ranges
    (bounded by doc length). No suffix array, no global sort: the
    window-hash aggregate finds the same >=2x spans, trading the
    suffix array's arbitrary-length maximality for a fixed window
    width — exactly the tradeoff production Spark dedups make. The md5
    window hash is the registry's audited cross-engine hash (d1
    precedent); at real scale it would be xxhash64 on the engine side
    with the oracle tracking (ct1's gram-hash note)."""
    from .operators.partitioning import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
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
    ).localCheckpoint(eager=True)  # window frame + final join reuse it
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
    ).select("doc_id", "w.i", "w.wh")
    rep = (
        win.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("wh")
    )
    marked = win.join(rep, "wh").select("doc_id", "i")
    covered = (
        marked.select(
            "doc_id",
            "i",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (_W - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct("pos").alias("covered_tokens"),
            F.count_distinct("i").alias("repeated_windows"),
        )
    )
    return planted.join(covered, "doc_id", "left").select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.coalesce(F.col("repeated_windows"), F.lit(0))
        .cast("bigint")
        .alias("repeated_windows"),
        F.coalesce(F.col("covered_tokens"), F.lit(0))
        .cast("bigint")
        .alias("covered_tokens"),
        F.when(
            F.coalesce(F.col("covered_tokens"), F.lit(0)) * 2
            > F.size("toks"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flagged"),
    )
