r"""Round-9 wave 120: Gopher-style repetition quality rules (gq1),
fill-in-the-middle training transform (fim1), per-source quota capping
(dom1) — three curation ops every modern LLM data pipeline runs between
dedup and tokenization.

gq1 is the Rae et al. (Gopher) repetition family re-expressed for
single-line documents: fraction of characters covered by the most
common word n-gram, and duplicate-n-gram character mass. fim1 is the
Bavarian et al. FIM split (PSM/SPM modes) with the reassembly law
certified. dom1 is the domain-balancing cap that keeps one hot source
from dominating a mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# ==========================================================================
# gq1: Gopher repetition rules — top-2-gram fraction + duplicate-5-gram mass
# ==========================================================================

# Planted repetition: every 53rd doc's text is replaced by its first 5
# words repeated 10x (identically in both engines), so the reject branch
# fires at every SF. Fractions are released as exact integer
# cross-multiplications (char counts), never floats.
_GQ1_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))),
                                           '\s+'),
                     t -> LENGTH(t) > 0) AS toks0
  FROM documents
), planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 53 = 0 AND len(toks0) >= 5
              THEN flatten(list_transform(range(1, 11),
                                          i -> list_slice(toks0, 1, 5)))
              WHEN doc_id % 59 = 0 AND doc_id % 53 <> 0
              THEN flatten(list_transform(range(1, 4),
                     r -> list_transform(range(1, 11),
                            i -> 'w' || CAST(doc_id * 10 + i AS VARCHAR))))
              ELSE toks0 END AS toks
  FROM base
), grams AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS g2,
         CASE WHEN len(toks) >= 5
              THEN list_transform(range(1, len(toks) - 3),
                     i -> array_to_string(list_slice(toks, i, i + 4), ' '))
              ELSE CAST([] AS VARCHAR[]) END AS g5
  FROM planted
), ex2 AS (
  SELECT doc_id, unnest(g2) AS g FROM grams
), top2 AS (
  SELECT doc_id, MAX(c) AS top2_count FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM ex2 GROUP BY doc_id, g
  ) GROUP BY doc_id
), ex5 AS (
  SELECT doc_id, unnest(g5) AS g FROM grams
), dup5 AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * LENGTH(g) END), 0)
              AS BIGINT) AS dup5_chars
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM ex5 GROUP BY doc_id, g)
  GROUP BY doc_id
), scored AS (
  SELECT g.doc_id,
         CAST(len(g.toks) AS BIGINT) AS n_toks,
         CAST(LENGTH(array_to_string(g.toks, ' ')) AS BIGINT) AS n_chars,
         CAST(COALESCE(t.top2_count, 0) AS BIGINT) AS top2_count,
         CAST(GREATEST(len(g.toks) - 1, 0) AS BIGINT) AS n_g2,
         CAST(COALESCE(d.dup5_chars, 0) AS BIGINT) AS dup5_chars,
         CAST(CASE WHEN len(g.g5) > 0
                   THEN LENGTH(array_to_string(g.g5, ' ')) ELSE 0 END
              AS BIGINT) AS g5_chars
  FROM grams g
  LEFT JOIN top2 t ON g.doc_id = t.doc_id
  LEFT JOIN dup5 d ON g.doc_id = d.doc_id
)
SELECT CASE WHEN n_g2 > 0 AND top2_count * 5 > n_g2
            THEN 'reject_top2'
            WHEN g5_chars > 0 AND dup5_chars * 2 > g5_chars
            THEN 'reject_dup5'
            ELSE 'keep' END AS label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
       CAST(SUM(top2_count) AS BIGINT) AS sum_top2,
       CAST(SUM(dup5_chars) AS BIGINT) AS sum_dup5_chars
FROM scored
GROUP BY 1
"""


@_register("gq1_gopher_repetition", _GQ1_SQL)
def gq1_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules: reject a document when its
    most common word-2-gram covers more than 1/5 of its 2-gram slots
    (``top2_count * 5 > n_g2`` — cross-multiplied, no division) or when
    word-5-grams occurring 2+ times carry more than half the 5-gram
    character mass. Every 53rd document is REPLACED by its first five
    words repeated 10x (identically in the oracle — the dp2 planting
    rule), so both reject branches fire at every SF; thresholds are
    RELATIVE (per-doc fractions), so no data regeneration can make the
    rule vacuous. Released: per-label doc counts plus the token/repeat
    mass sums that would red the hash if any per-doc counter drifts.

    100 TB shape: everything per-document — tokenize, n-gram, count,
    compare — is a pure Column/flatMap pipeline inside whole-stage
    codegen; the ONLY exchange is the final 3-row label aggregate
    (map-side combined). This is the exact shape of the Gopher/C4
    quality pass over a crawl: embarrassingly parallel, no shuffle
    until the audit rollup. The per-doc n-gram counting uses
    higher-order functions (aggregate over the gram array) rather than
    explode+groupBy precisely so no per-gram rows ever shuffle."""
    from .operators.partitioning import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks0 = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                r"\s+"),
        lambda t: F.length(t) > 0,
    )
    # two planted repetition classes (identically in the oracle): %53 →
    # first-5-words x10 (trips the top-2-gram rule); %59 → ten DISTINCT
    # synthetic tokens x3 (top 2-gram only 3/29 slots → passes top2, but
    # every 5-gram repeats → trips the duplicate-5-gram rule), so BOTH
    # reject branches fire at every SF
    planted = d.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 53 == 0) & (F.size(toks0) >= 5),
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(10)),
                    lambda _: F.slice(toks0, 1, 5),
                )
            ),
        )
        .when(
            (F.col("doc_id") % 59 == 0) & (F.col("doc_id") % 53 != 0),
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(3)),
                    lambda _: F.transform(
                        F.sequence(F.lit(1), F.lit(10)),
                        lambda i: F.concat(
                            F.lit("w"),
                            (F.col("doc_id") * 10 + i).cast("string"),
                        ),
                    ),
                )
            ),
        )
        .otherwise(toks0)
        .alias("toks"),
    )
    g2 = F.when(
        F.size("toks") >= 2,
        F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g5 = F.when(
        F.size("toks") >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 4),
            lambda i: F.concat_ws(
                " ", F.slice("toks", i, F.lit(5))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = planted.select("doc_id", "toks", g2.alias("g2"), g5.alias("g5"))

    def _max_count(arr):
        # most-common-element count WITHOUT exploding: count each gram's
        # occurrences via a filter-size fold over the distinct grams
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda g: F.size(F.filter(arr, lambda x: x == g)),
            )
        )

    def _dup_char_mass(arr):
        # chars of grams occurring >= 2 times: per distinct gram,
        # count*len(gram) when count >= 2
        return F.aggregate(
            F.transform(
                F.array_distinct(arr),
                lambda g: F.struct(
                    F.size(F.filter(arr, lambda x: x == g)).alias("c"),
                    F.length(g).alias("l"),
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc
            + F.when(s["c"] >= 2, (s["c"] * s["l"]).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint")),
        )

    scored = grams.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.length(F.concat_ws(" ", F.col("toks")))
        .cast("bigint")
        .alias("n_chars"),
        F.coalesce(
            F.when(F.size("g2") > 0, _max_count(F.col("g2"))), F.lit(0)
        ).cast("bigint").alias("top2_count"),
        F.greatest(F.size("toks") - 1, F.lit(0))
        .cast("bigint")
        .alias("n_g2"),
        F.coalesce(
            F.when(F.size("g5") > 0, _dup_char_mass(F.col("g5"))),
            F.lit(0),
        ).cast("bigint").alias("dup5_chars"),
        F.when(
            F.size("g5") > 0,
            F.length(F.concat_ws(" ", F.col("g5"))).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("g5_chars"),
    )
    label = (
        F.when(
            (F.col("n_g2") > 0)
            & (F.col("top2_count") * 5 > F.col("n_g2")),
            F.lit("reject_top2"),
        )
        .when(
            (F.col("g5_chars") > 0)
            & (F.col("dup5_chars") * 2 > F.col("g5_chars")),
            F.lit("reject_dup5"),
        )
        .otherwise(F.lit("keep"))
    )
    return scored.groupBy(label.alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("sum_toks"),
        F.sum("top2_count").cast("bigint").alias("sum_top2"),
        F.sum("dup5_chars").cast("bigint").alias("sum_dup5_chars"),
    )


# ==========================================================================
# fim1: fill-in-the-middle transform (PSM/SPM) with the reassembly law
# ==========================================================================

_FIM1_SQL = """
WITH split AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
         substring(text, 1, LENGTH(text) // 3) AS pre,
         substring(text, LENGTH(text) // 3 + 1,
                   2 * LENGTH(text) // 3 - LENGTH(text) // 3) AS mid,
         substring(text, 2 * LENGTH(text) // 3 + 1) AS suf,
         LENGTH(text) AS n_total
  FROM documents WHERE LENGTH(text) >= 3
)
SELECT doc_id, mode,
       CAST(LENGTH(pre) AS BIGINT) AS n_pre,
       CAST(LENGTH(mid) AS BIGINT) AS n_mid,
       CAST(LENGTH(suf) AS BIGINT) AS n_suf,
       CAST(n_total AS BIGINT) AS n_total,
       md5(CASE WHEN mode = 'psm'
                THEN '<PRE>' || pre || '<SUF>' || suf || '<MID>' || mid
                ELSE '<SUF>' || suf || '<PRE>' || pre || '<MID>' || mid
           END) AS fim_md5,
       CAST(CASE WHEN LENGTH(pre) + LENGTH(mid) + LENGTH(suf) = n_total
                 THEN 1 ELSE 0 END AS BIGINT) AS reassembles
FROM split
"""


@_register("fim1_fill_in_middle", _FIM1_SQL)
def fim1_fill_in_middle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al.): each
    document splits at deterministic char offsets (len//3, 2*len//3)
    into (prefix, middle, suffix); even doc_ids emit PSM order
    (<PRE>p<SUF>s<MID>m), odd SPM (<SUF>s<PRE>p<MID>m) — the two
    sentinel orders real FIM training mixes. Released per doc: the
    segment lengths, the md5 of the TRANSFORMED sequence (so a
    one-character split drift reds the hash — not a vacuous
    certificate: the md5 content is data), and the reassembly law
    len(p)+len(m)+len(s) == len(text) as an explicit 0/1 column. The
    oracle replays the identical substring arithmetic (1-based, both
    engines; integer // on non-negative lengths).

    100 TB shape: a pure per-row map — zero shuffle, zero Python; FIM
    is free at any scale, which is exactly why it's applied on-the-fly
    in real pipelines. The md5 is the registry's audited cross-engine
    hash (d1 precedent)."""
    d = _t(spark, sf_dir, "documents").where(F.length("text") >= 3)
    mode = F.when(F.col("doc_id") % 2 == 0, F.lit("psm")).otherwise(
        F.lit("spm")
    )
    # identical 1-based substring arithmetic on both sides; `div` =
    # DuckDB's integer `//` on non-negative lengths
    out = d.select(
        "doc_id",
        mode.alias("mode"),
        F.expr("substring(text, 1, length(text) div 3)").alias("pre"),
        F.expr(
            "substring(text, length(text) div 3 + 1,"
            " (2 * length(text)) div 3 - length(text) div 3)"
        ).alias("mid"),
        F.expr(
            "substring(text, (2 * length(text)) div 3 + 1,"
            " length(text) - (2 * length(text)) div 3)"
        ).alias("suf"),
        F.length("text").cast("bigint").alias("n_total"),
    )
    fim = F.when(
        F.col("mode") == "psm",
        F.concat(
            F.lit("<PRE>"), F.col("pre"), F.lit("<SUF>"), F.col("suf"),
            F.lit("<MID>"), F.col("mid"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<SUF>"), F.col("suf"), F.lit("<PRE>"), F.col("pre"),
            F.lit("<MID>"), F.col("mid"),
        )
    )
    return out.select(
        "doc_id",
        "mode",
        F.length("pre").cast("bigint").alias("n_pre"),
        F.length("mid").cast("bigint").alias("n_mid"),
        F.length("suf").cast("bigint").alias("n_suf"),
        "n_total",
        F.md5(fim.cast("binary")).alias("fim_md5"),
        F.when(
            F.length("pre") + F.length("mid") + F.length("suf")
            == F.col("n_total"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("reassembles"),
    )


# ==========================================================================
# dom1: per-source quota capping (domain balancing)
# ==========================================================================

_DOM1_SQL = """
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'srcHOT' ELSE source END AS src,
         CAST(LENGTH(text) AS BIGINT) AS n_chars
  FROM documents
), per_src AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_docs FROM tagged GROUP BY src
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(n_docs) AS BIGINT) AS n_total
  FROM per_src
), ranked AS (
  SELECT t.doc_id, t.src, t.n_chars,
         ROW_NUMBER() OVER (PARTITION BY t.src
                            ORDER BY md5(CAST(t.doc_id AS VARCHAR)),
                                     t.doc_id) AS rk
  FROM tagged t
)
SELECT r.src,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN r.rk * s.n_sources <= s.n_total
                              THEN 1 END), 0) AS BIGINT) AS kept,
       CAST(COALESCE(SUM(CASE WHEN r.rk * s.n_sources > s.n_total
                              THEN 1 END), 0) AS BIGINT) AS dropped,
       CAST(COALESCE(SUM(CASE WHEN r.rk * s.n_sources <= s.n_total
                              THEN r.n_chars END), 0) AS BIGINT)
         AS kept_chars
FROM ranked r CROSS JOIN stats s
GROUP BY r.src
"""


@_register("dom1_source_caps", _DOM1_SQL)
def dom1_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: cap every source at the corpus-mean share
    (kept iff rank * n_sources <= n_total — cross-multiplied, no
    division), where rank within a source is a deterministic md5
    shuffle of doc ids (uniform sample, not head-of-file bias — the
    shuf1 lesson). A HOT source is PLANTED (every 3rd doc re-tagged
    'srcHOT', so one source holds ~1/3 of the corpus at every SF and
    the drop branch genuinely fires; the dp2 relative rule keeps it
    firing after any regeneration). Released per source: doc count,
    kept/dropped counts, and the kept character mass — the mixture
    manifest a sampler consumes downstream.

    100 TB shape: one window rank per source partition (the skewed hot
    source is exactly what AQE skew handling — skew2 — absorbs at
    scale, or shuf1's (epoch, shard) keying for the pathological case),
    one broadcast 2-scalar stats frame, one per-source rollup. Keeping
    the CAP relative to corpus size makes the query a fixed policy, not
    a fixed constant — the difference between config and data."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("srcHOT"))
        .otherwise(F.col("source"))
        .alias("src"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    per_src = d.groupBy("src").agg(F.count(F.lit(1)).alias("n_docs"))
    stats = per_src.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("n_docs").alias("n_total"),
    )
    ranked = d.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("src").orderBy(
                F.md5(F.col("doc_id").cast("string").cast("binary")),
                F.col("doc_id"),
            )
        ),
    )
    keep = F.col("rk") * F.col("n_sources") <= F.col("n_total")
    return (
        ranked.crossJoin(F.broadcast(stats))
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum(F.when(keep, 1)), F.lit(0))
            .cast("bigint")
            .alias("kept"),
            F.coalesce(F.sum(F.when(~keep, 1)), F.lit(0))
            .cast("bigint")
            .alias("dropped"),
            F.coalesce(F.sum(F.when(keep, F.col("n_chars"))), F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )
