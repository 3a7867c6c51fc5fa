r"""Round-11 wave 129: preference fitting, data selection, record linkage,
and context-engineering audits — seven LLM-pipeline operators the registry
was still missing.

- bt1: Bradley-Terry pairwise-preference strength fitting (Hunter 2004 MM
  iterations) in exact fixed-point integer arithmetic, so the classically
  float-iterative model becomes bit-reproducible across engines — the
  lp1/bon1 packed-integer discipline applied to preference modeling (the
  reward-model data-prep step of an RLHF pipeline).
- dsir1: DSIR-style importance resampling (Xie et al. 2023) — hashed
  n-gram importance weights scoring every raw document against a target
  distribution, in add-1-smoothed fixed-point likelihood ratios.
- fs1: Fellegi-Sunter record-linkage weights (m/u agreement probabilities
  per comparison field, estimated from planted labeled duplicates), as
  integer ppm ratios — the scoring model on top of er1/snm1's blocking.
- grp1: GRPO-style per-prompt group reward normalization (advantage =
  (r - mean)/std) — the fe7 z-score portability pattern (exact integer
  sums -> IEEE doubles -> correctly-rounded sqrt) per prompt group.
- chunk1: sliding-window RAG chunking with overlap and deterministic
  chunk fingerprints — full token coverage, short final chunks.
- pad1: padding-waste audit for power-of-two length-bucketed batching,
  with a 1024-token truncation budget — all integer.
- fert1: tokenizer fertility (BPE-ish tokens per whitespace word) per
  language bucket — the multilingual tokenizer-quality audit.

No reference analogue for any of these (Angelo_ETL_Task.py:1-391 is
row-wise ETL); they extend the LLM-data-pipeline surface the brief makes
first-class. Every oracle is exact: integer/fixed-point arithmetic or
IEEE-deterministic expression trees (sqrt is correctly rounded; no other
libm function appears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# ---------------------------------------------------------------------------
# bt1: Bradley-Terry preference strengths, fixed-point MM
# ---------------------------------------------------------------------------

_BT_PLAYERS = 5
_BT_ROUNDS = 3
_BT_SCALE = 1_000_000_000_000  # 1e12 reciprocal scale
_BT_UNIT = 1_000_000  # strengths in micro-units; total normalized to 5e6


def _bt_round_sql(prev: str, k: int) -> str:
    """One MM round in SQL with globally unique column names per CTE
    (DuckDB lateral-alias gotcha)."""
    return f"""d{k} AS (
      SELECT pr.pi AS d{k}i,
             SUM(pr.pn * {_BT_SCALE} // (si.p{k - 1} + sj.p{k - 1}))
               AS d{k}d
      FROM pair pr
      JOIN {prev} si ON pr.pi = si.i{k - 1}
      JOIN {prev} sj ON pr.pj = sj.i{k - 1}
      GROUP BY 1
    ), r{k} AS (
      SELECT w0.wi AS r{k}i,
             GREATEST((w0.ww * {_BT_SCALE}) // d{k}.d{k}d, 1000) AS r{k}p
      FROM wins0 w0 JOIN d{k} ON w0.wi = d{k}.d{k}i
    ), s{k} AS (
      SELECT r{k}i AS i{k},
             r{k}p * {_BT_PLAYERS * _BT_UNIT}
               // (SUM(r{k}p) OVER ()) AS p{k}
      FROM r{k}
    )"""


_BT1_SQL = f"""
WITH games AS (
  SELECT o_custkey % {_BT_PLAYERS} AS ga,
         (o_custkey // {_BT_PLAYERS}) % {_BT_PLAYERS} AS gb,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-bt'), 1, 4)
              AS INT) % 10 AS gt
  FROM orders
  WHERE o_orderkey < 40000
    AND o_custkey % {_BT_PLAYERS} <> (o_custkey // {_BT_PLAYERS}) % {_BT_PLAYERS}
), comp AS (
  SELECT CASE WHEN gt < 5 + ga - gb THEN ga ELSE gb END AS cw,
         CASE WHEN gt < 5 + ga - gb THEN gb ELSE ga END AS cl
  FROM games
), pair AS (
  SELECT pi, pj, CAST(COUNT(*) AS BIGINT) AS pn FROM (
    SELECT cw AS pi, cl AS pj FROM comp
    UNION ALL
    SELECT cl AS pi, cw AS pj FROM comp
  ) GROUP BY 1, 2
), wins0 AS (
  SELECT p.pi AS wi,
         CAST(COALESCE(w.wn, 0) AS BIGINT) AS ww,
         CAST(SUM(p.pn) AS BIGINT) AS wg
  FROM (SELECT pi, SUM(pn) AS pn FROM pair GROUP BY 1) p
  LEFT JOIN (SELECT cw, CAST(COUNT(*) AS BIGINT) AS wn
             FROM comp GROUP BY 1) w ON p.pi = w.cw
  GROUP BY 1, 2
), s0 AS (
  SELECT wi AS i0, CAST({_BT_UNIT} AS BIGINT) AS p0 FROM wins0
), {_bt_round_sql("s0", 1)}, {_bt_round_sql("s1", 2)},
{_bt_round_sql("s2", 3)}
SELECT w.wi AS player_id, w.wg AS games, w.ww AS wins,
       CAST(s3.p3 AS BIGINT) AS strength_micro
FROM wins0 w JOIN s3 ON w.wi = s3.i3
"""


@_register("bt1_bradley_terry", _BT1_SQL)
def bt1_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference-strength fitting — the model a reward-data
    pipeline fits over pairwise human preferences before training a
    reward model. Comparisons are generated Bradley-Terry-faithfully from
    orders (5 players; md5-derived outcome with P(win_a) = (5+a-b)/10, so
    higher-id players are genuinely stronger and the fit has signal).
    Three Hunter-2004 MM iterations p_i' = W_i / sum_j n_ij/(p_i+p_j),
    run ENTIRELY in fixed-point BIGINT (reciprocals at 1e12 scale,
    strengths in micro-units renormalized to 5e6 per round, a 1000-micro
    floor instead of a zero-win singularity): every sum is an integer
    sum (order-free), every division a positive integer division
    (identical truncation in both engines) — the lp1/bon1 determinism
    discipline applied to an iterative numerical fit.

    100 TB shape: the raw comparison scan aggregates immediately to the
    (player, player) pair matrix — |P|^2 rows, dimension-sized — and all
    MM rounds iterate on that tiny frame (equi-joins + a window over the
    |P|-row aggregate, audit-bounded). Cost ∝ one scan + O(rounds *
    |P|^2). Overflow headroom: W_i * 1e12 < 2^63 up to ~9e6 comparisons
    per player; at real RLHF scale shard players or lift to DECIMAL(38).
    """
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 40000)
    a = (F.col("o_custkey") % _BT_PLAYERS).alias("ga")
    b = (
        (F.col("o_custkey") - F.col("o_custkey") % _BT_PLAYERS)
        / _BT_PLAYERS
    ).cast("bigint") % _BT_PLAYERS
    t = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("-bt"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    games = o.select(a, b.alias("gb"), t.alias("gt")).where(
        F.col("ga") != F.col("gb")
    )
    win_a = F.col("gt") < F.lit(5) + F.col("ga") - F.col("gb")
    comp = games.select(
        F.when(win_a, F.col("ga")).otherwise(F.col("gb")).alias("cw"),
        F.when(win_a, F.col("gb")).otherwise(F.col("ga")).alias("cl"),
    )
    pair = (
        comp.select(F.col("cw").alias("pi"), F.col("cl").alias("pj"))
        .unionAll(comp.select(F.col("cl").alias("pi"), F.col("cw").alias("pj")))
        .groupBy("pi", "pj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pn"))
        .localCheckpoint(eager=True)  # every MM round re-joins this frame
    )
    wins = comp.groupBy("cw").agg(F.count(F.lit(1)).cast("bigint").alias("wn"))
    players = (
        pair.groupBy("pi")
        .agg(F.sum("pn").cast("bigint").alias("wg"))
        .join(wins.select(F.col("cw").alias("pi"), "wn"), "pi", "left")
        .select(
            F.col("pi").alias("wi"),
            F.coalesce(F.col("wn"), F.lit(0)).cast("bigint").alias("ww"),
            "wg",
        )
        .localCheckpoint(eager=True)
    )
    s = players.select(
        F.col("wi").alias("i"), F.lit(_BT_UNIT).cast("bigint").alias("p")
    )
    for _ in range(_BT_ROUNDS):
        denom = (
            pair.join(s.select(F.col("i").alias("pi"), F.col("p").alias("_si")), "pi")
            .join(s.select(F.col("i").alias("pj"), F.col("p").alias("_sj")), "pj")
            .groupBy("pi")
            .agg(
                F.sum(
                    F.expr(f"pn * {_BT_SCALE} DIV (_si + _sj)")
                ).alias("_dd")
            )
        )
        raw = players.join(denom.select(F.col("pi").alias("wi"), "_dd"), "wi").select(
            F.col("wi").alias("i"),
            F.greatest(
                F.expr(f"ww * {_BT_SCALE} DIV _dd"), F.lit(1000)
            ).alias("_pr"),
        )
        total = F.sum("_pr").over(Window.partitionBy())
        s = raw.select(
            "i",
            F.expr(f"_pr * {_BT_PLAYERS * _BT_UNIT}").cast("bigint")
            .alias("_num"),
            total.alias("_tot"),
        ).select("i", F.expr("_num DIV _tot").alias("p"))
    return players.join(s.select(F.col("i").alias("wi"), "p"), "wi").select(
        F.col("wi").alias("player_id"),
        F.col("wg").alias("games"),
        F.col("ww").alias("wins"),
        F.col("p").cast("bigint").alias("strength_micro"),
    )


# ---------------------------------------------------------------------------
# dsir1: hashed-n-gram importance resampling (DSIR)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_SCALE = 1_000_000


def dsir_scores(docs: DataFrame, target) -> DataFrame:
    """DSIR scoring core, factored for operator-level reuse and testing:
    given documents (doc_id, text, + whatever columns ``target`` — a
    boolean Column marking the target-distribution slice — references),
    returns (doc_id, n_bigrams, dsir_score) where dsir_score is the
    integer sum over the document's word-bigram occurrences of the
    bucket's add-1-smoothed fixed-point likelihood ratio
    (count_target + 1) * 1e6 DIV (count_all + 1), bigrams md5-hashed
    into 64 buckets. Exact BIGINT arithmetic end to end."""
    from .operators.text import word_ngrams

    grams = docs.select(
        "doc_id",
        target.alias("_is_t"),
        F.explode(word_ngrams(F.col("text"), 2)).alias("g"),
    ).select(
        "doc_id",
        "_is_t",
        (
            F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("bigint")
            % _DSIR_BUCKETS
        ).alias("b"),
    ).localCheckpoint(eager=True)  # weight pass + scoring pass share this
    wts = grams.groupBy("b").agg(
        F.expr(
            f"(SUM(CASE WHEN _is_t THEN 1 ELSE 0 END) + 1)"
            f" * {_DSIR_SCALE} DIV (COUNT(*) + 1)"
        ).alias("wb")
    )
    return (
        grams.join(F.broadcast(wts), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("wb").cast("bigint").alias("dsir_score"),
        )
    )

_DSIR1_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), grams AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(g), 1, 4) AS INT) % {_DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i + 1])) AS g
    FROM toks WHERE len(w) >= 2
  )
), wts AS (
  SELECT b,
         (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)
           * {_DSIR_SCALE}
           // (COUNT(*) + 1) AS wb
  FROM grams GROUP BY b
), scored AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(w.wb) AS BIGINT) AS dsir_score
  FROM grams g JOIN wts w USING (b)
  GROUP BY 1
)
SELECT doc_id, n_bigrams, dsir_score,
       CAST(CASE WHEN dsir_score * (SELECT COUNT(*) FROM scored)
                      >= (SELECT SUM(dsir_score) FROM scored)
            THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM scored
"""


@_register("dsir1_importance_resampling", _DSIR1_SQL)
def dsir1_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, 'Data Selection for
    Language Models via Importance Resampling'): score every raw document
    by how much its hashed-n-gram distribution looks like a target
    distribution, here the lang='en' slice standing in for the curated
    target corpus. Word bigrams hash (md5) into 64 buckets; each bucket's
    weight is the add-1-smoothed likelihood ratio (count_target + 1) /
    (count_raw + 1) in 1e6 fixed point (UNNORMALIZED by the global
    N_raw/N_target factor — a constant across docs, so selection order is
    unchanged and every sum stays exact BIGINT; the pmi1 log-free
    monotone-proxy argument). A document's score is the integer sum of
    its occurrences' bucket weights; `selected` marks docs at or above
    the corpus mean score via exact cross-multiplication (score * n_docs
    >= total_score — no division at all).

    100 TB shape: one n-gram scan aggregates to the 64-row bucket-weight
    table (map-side combinable), which BROADCASTS back onto the gram
    stream — cost is two passes over grams plus a per-doc sum; the
    1-row mean threshold broadcasts (ppl1's sanctioned scalar shape). At
    production scale the bucket count grows (10k buckets in the paper)
    but stays broadcast-sized by construction."""
    from .operators.partitioning import spread

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    scored = dsir_scores(d, F.col("lang") == "en").localCheckpoint(
        eager=True
    )  # consumed by totals + final projection
    totals = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("_nd"),
        F.sum("dsir_score").cast("bigint").alias("_ts"),
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "n_bigrams",
        "dsir_score",
        F.when(F.col("dsir_score") * F.col("_nd") >= F.col("_ts"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("selected"),
    )


# ---------------------------------------------------------------------------
# fs1: Fellegi-Sunter record-linkage weights
# ---------------------------------------------------------------------------

_FS_CLONE_OFFSET = 3_000_000
_FS_PPM = 1_000_000

_FS1_SQL = f"""
WITH recs AS (
  SELECT c_custkey AS rid, c_name AS rname, c_nationkey AS rnat,
         c_mktsegment AS rseg,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS rcents
  FROM customer
  UNION ALL
  SELECT c_custkey + {_FS_CLONE_OFFSET} AS rid, c_name AS rname,
         c_nationkey AS rnat, c_mktsegment AS rseg,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 5000 AS rcents
  FROM customer WHERE c_custkey % 97 = 0
), cand AS (
  SELECT a.rid AS ida, b.rid AS idb,
         CASE WHEN a.rname = b.rname THEN 1 ELSE 0 END AS agr_name,
         CASE WHEN ABS(a.rcents - b.rcents) < 10000 THEN 1 ELSE 0 END
           AS agr_bal,
         CASE WHEN substr(a.rname, LENGTH(a.rname), 1)
                   = substr(b.rname, LENGTH(b.rname), 1)
              THEN 1 ELSE 0 END AS agr_last,
         CASE WHEN b.rid = a.rid + {_FS_CLONE_OFFSET} THEN 1 ELSE 0 END
           AS is_match
  FROM recs a JOIN recs b
    ON a.rnat = b.rnat AND a.rseg = b.rseg AND a.rid < b.rid
), fields AS (
  SELECT fname, agr, is_match FROM (
    SELECT 'name' AS fname, agr_name AS agr, is_match FROM cand
    UNION ALL
    SELECT 'acctbal_band' AS fname, agr_bal AS agr, is_match FROM cand
    UNION ALL
    SELECT 'name_last_char' AS fname, agr_last AS agr, is_match FROM cand
  )
)
SELECT fname AS field,
       CAST(SUM(CASE WHEN is_match = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match_pairs,
       CAST(SUM(CASE WHEN is_match = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonmatch_pairs,
       CAST((SUM(CASE WHEN is_match = 1 AND agr = 1 THEN 1 ELSE 0 END) + 1)
          * {_FS_PPM}
         // (SUM(CASE WHEN is_match = 1 THEN 1 ELSE 0 END) + 2) AS BIGINT)
         AS m_ppm,
       CAST((SUM(CASE WHEN is_match = 0 AND agr = 1 THEN 1 ELSE 0 END) + 1)
          * {_FS_PPM}
         // (SUM(CASE WHEN is_match = 0 THEN 1 ELSE 0 END) + 2) AS BIGINT)
         AS u_ppm,
       CAST(((SUM(CASE WHEN is_match = 1 AND agr = 1 THEN 1 ELSE 0 END) + 1)
           * {_FS_PPM}
          // (SUM(CASE WHEN is_match = 1 THEN 1 ELSE 0 END) + 2))
         * {_FS_PPM}
         // ((SUM(CASE WHEN is_match = 0 AND agr = 1 THEN 1 ELSE 0 END) + 1)
               * {_FS_PPM}
               // (SUM(CASE WHEN is_match = 0 THEN 1 ELSE 0 END) + 2) + 1)
         AS BIGINT) AS weight_scaled
FROM fields
GROUP BY 1
"""


@_register("fs1_fellegi_sunter", _FS1_SQL)
def fs1_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter (1969) record-linkage weight estimation — the
    scoring model that sits on top of blocking (er1) / sorted
    neighborhood (snm1): per comparison field, m = P(agree | match) and
    u = P(agree | non-match), and the field's evidence weight is m/u
    (log m/u classically; released as the integer-scaled ratio — the
    pmi1 log-free monotone proxy). Labeled matches come from planted
    clones (every 97th customer re-inserted at id + 3e6 with acctbal
    shifted $50): the supervised-training-pairs setup real linkage
    systems use. Three fields with deliberately different
    discriminative power: exact name (u ~ 0 — names are unique),
    acctbal within $100 (clones agree by construction: $50 < $100),
    last name character (u ~ 0.1). All counts integer, ratios
    Laplace-smoothed ((agree+1)/(pairs+2)) integer ppm — deterministic
    across engines and sane at tiny labeled-pair counts.

    100 TB shape: candidate generation is the blocked equi-self-join on
    (nation, segment) — never all-pairs; block sizes are data-bounded
    (~N/125) and at production scale the block key gets finer (snm1's
    windowing) without changing this query's aggregation shape. The
    field unpivot triples the candidate rows, then ONE
    map-side-combinable aggregate produces the 3-row weight table."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    base = c.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_name").alias("rname"),
        F.col("c_nationkey").alias("rnat"),
        F.col("c_mktsegment").alias("rseg"),
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("rcents"),
    )
    clones = c.where(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + _FS_CLONE_OFFSET).alias("rid"),
        F.col("c_name").alias("rname"),
        F.col("c_nationkey").alias("rnat"),
        F.col("c_mktsegment").alias("rseg"),
        (F.floor(F.col("c_acctbal") * 100).cast("bigint") + 5000).alias(
            "rcents"
        ),
    )
    recs = base.unionByName(clones).persist()
    a = recs.select(*[F.col(x).alias(f"a_{x}") for x in recs.columns])
    b = recs.select(*[F.col(x).alias(f"b_{x}") for x in recs.columns])
    cand = a.join(
        b,
        (F.col("a_rnat") == F.col("b_rnat"))
        & (F.col("a_rseg") == F.col("b_rseg"))
        & (F.col("a_rid") < F.col("b_rid")),
    ).select(
        F.when(F.col("a_rname") == F.col("b_rname"), 1).otherwise(0).alias(
            "agr_name"
        ),
        F.when(
            F.abs(F.col("a_rcents") - F.col("b_rcents")) < 10000, 1
        ).otherwise(0).alias("agr_bal"),
        F.when(
            F.substring(F.col("a_rname"), -1, 1)
            == F.substring(F.col("b_rname"), -1, 1),
            1,
        ).otherwise(0).alias("agr_last"),
        F.when(
            F.col("b_rid") == F.col("a_rid") + _FS_CLONE_OFFSET, 1
        ).otherwise(0).alias("is_match"),
    )
    fields = (
        cand.select(
            F.lit("name").alias("field"),
            F.col("agr_name").alias("agr"),
            "is_match",
        )
        .unionByName(
            cand.select(
                F.lit("acctbal_band").alias("field"),
                F.col("agr_bal").alias("agr"),
                "is_match",
            )
        )
        .unionByName(
            cand.select(
                F.lit("name_last_char").alias("field"),
                F.col("agr_last").alias("agr"),
                "is_match",
            )
        )
    )
    agg = fields.groupBy("field").agg(
        F.sum(F.when(F.col("is_match") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_match_pairs"),
        F.sum(F.when(F.col("is_match") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonmatch_pairs"),
        F.sum(F.when((F.col("is_match") == 1) & (F.col("agr") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("_ma"),
        F.sum(F.when((F.col("is_match") == 0) & (F.col("agr") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("_ua"),
    )
    m_ppm = F.expr(f"(_ma + 1) * {_FS_PPM} DIV (n_match_pairs + 2)")
    u_ppm = F.expr(f"(_ua + 1) * {_FS_PPM} DIV (n_nonmatch_pairs + 2)")
    return agg.select(
        "field",
        "n_match_pairs",
        "n_nonmatch_pairs",
        m_ppm.alias("m_ppm"),
        u_ppm.alias("u_ppm"),
        F.expr(
            f"((_ma + 1) * {_FS_PPM} DIV (n_match_pairs + 2)) * {_FS_PPM} "
            f"DIV ((_ua + 1) * {_FS_PPM} DIV (n_nonmatch_pairs + 2) + 1)"
        ).alias("weight_scaled"),
    )


# ---------------------------------------------------------------------------
# grp1: GRPO-style per-prompt group reward normalization
# ---------------------------------------------------------------------------

_GRP1_SQL = """
WITH r AS (
  SELECT doc_id, doc_id // 8 AS prompt_id,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-rw'), 1, 4)
                   AS INT) % 1000 AS BIGINT) AS reward
  FROM documents
), g AS (
  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS gn,
         CAST(SUM(reward) AS BIGINT) AS gs,
         CAST(SUM(reward * reward) AS BIGINT) AS gss
  FROM r GROUP BY 1
)
SELECT r.doc_id, r.prompt_id, r.reward, g.gn AS group_n,
       CASE WHEN (CAST(g.gss AS DOUBLE)
                  - CAST(g.gs AS DOUBLE) * CAST(g.gs AS DOUBLE)
                    / CAST(g.gn AS DOUBLE)) / CAST(g.gn AS DOUBLE) > 0
            THEN (CAST(r.reward AS DOUBLE)
                  - CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE))
                 / sqrt((CAST(g.gss AS DOUBLE)
                         - CAST(g.gs AS DOUBLE) * CAST(g.gs AS DOUBLE)
                           / CAST(g.gn AS DOUBLE)) / CAST(g.gn AS DOUBLE))
            ELSE CAST(0.0 AS DOUBLE) END AS advantage
FROM r JOIN g USING (prompt_id)
"""


@_register("grp1_group_reward_norm", _GRP1_SQL)
def grp1_group_reward_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO-style group-relative reward normalization (the advantage
    computation of group-relative policy optimization): responses group
    by prompt (8 sampled responses per prompt; md5-derived integer
    rewards), and each response's advantage is (reward - group mean) /
    group std — population std, zero-variance groups get advantage 0.
    Cross-engine float discipline (the fe7 z-score pattern): sums of
    integer rewards are exact BIGINTs, converted once to double
    (< 2^53, exact), combined through an identical IEEE expression tree
    in both engines, and sqrt is the ONE libm function IEEE 754 requires
    correctly rounded — so the doubles match bit-for-bit.

    100 TB shape: one map-side-combinable aggregate to the per-prompt
    moment frame, one equi-join back — the canonical two-pass
    normalization; no window over raw data, no skew (groups are
    fixed-size by construction)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    r = d.select(
        "doc_id",
        F.expr("doc_id DIV 8").alias("prompt_id"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-rw"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000
        ).alias("reward"),
    )
    g = r.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("gn"),
        F.sum("reward").cast("bigint").alias("gs"),
        F.sum(F.col("reward") * F.col("reward")).cast("bigint").alias("gss"),
    )
    gn = F.col("gn").cast("double")
    gs = F.col("gs").cast("double")
    gss = F.col("gss").cast("double")
    var = (gss - gs * gs / gn) / gn
    mean = gs / gn
    return r.join(g, "prompt_id").select(
        "doc_id",
        "prompt_id",
        "reward",
        F.col("gn").alias("group_n"),
        F.when(
            var > 0,
            (F.col("reward").cast("double") - mean) / F.sqrt(var),
        )
        .otherwise(F.lit(0.0))
        .alias("advantage"),
    )


# ---------------------------------------------------------------------------
# chunk1: sliding-window RAG chunking
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24

_CHUNK1_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents
), sized AS (
  SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= 1
), starts AS (
  SELECT doc_id, w, n, unnest(generate_series(1, n, {_CHUNK_STRIDE})) AS st
  FROM sized
)
SELECT doc_id,
       CAST((st - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(st AS BIGINT) AS start_tok,
       CAST(len(list_slice(w, st, st + {_CHUNK_SIZE - 1})) AS BIGINT)
         AS n_tok,
       md5(array_to_string(list_slice(w, st, st + {_CHUNK_SIZE - 1}), ' '))
         AS chunk_md5
FROM starts
"""


@_register("chunk1_sliding_chunks", _CHUNK1_SQL)
def chunk1_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the retrieval-corpus
    preparation step of every RAG pipeline (px6 consumes pre-chunked
    passages; this is the chunker): 32-token windows at stride 24 (8
    tokens of overlap so no boundary sentence is ever split without a
    covering neighbor), FULL token coverage (chunk starts run to the end
    of the document, so final chunks are short rather than dropping the
    tail — the n=33 case emits chunks [1..32] and [25..33]). Released
    per chunk: deterministic chunk index, 1-based token offset, token
    count, and the md5 fingerprint of the chunk text (the id a vector
    store would key on). Spark `sequence(1, n, step)` and DuckDB
    `generate_series(1, n, step)` are both end-inclusive on positive
    ranges, and `F.slice(w, st, 32)` mirrors end-inclusive
    `list_slice(w, st, st+31)` — measured, not assumed (the wave-120
    range/sequence off-by-one gotcha).

    100 TB shape: pure per-document array work inside codegen (one
    generator explode; no KEY shuffle — the plan's only exchange is the
    deliberate spread() round-robin of the single-file test scan, absent
    on a real multi-split corpus); chunk fan-out is ~n/stride rows per
    doc, the physical minimum for materialized chunks."""
    from .operators.partitioning import spread
    from .operators.text import tokens

    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    sized = d.select(
        "doc_id", tokens(F.col("text")).alias("w")
    ).withColumn("n", F.size("w")).where(F.col("n") >= 1)
    starts = sized.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(_CHUNK_STRIDE))
        ).alias("st"),
    )
    chunk = F.slice(F.col("w"), F.col("st"), _CHUNK_SIZE)
    return starts.select(
        "doc_id",
        F.expr(f"CAST((st - 1) DIV {_CHUNK_STRIDE} AS BIGINT)").alias(
            "chunk_idx"
        ),
        F.col("st").cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# pad1: padding-waste audit for length-bucketed batching
# ---------------------------------------------------------------------------

_PAD_MAX = 1024

_PAD1_SQL = rf"""
WITH lens AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                         t -> LENGTH(t) > 0)) AS n
  FROM documents
), capped AS (
  SELECT doc_id,
         CASE WHEN n > {_PAD_MAX} THEN {_PAD_MAX} ELSE n END AS eff_n,
         CASE WHEN n > {_PAD_MAX} THEN n - {_PAD_MAX} ELSE 0 END
           AS trunc_n,
         CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
              WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
              WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
              ELSE {_PAD_MAX} END AS cap
  FROM lens
)
SELECT CAST(cap AS BIGINT) AS bucket_cap,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(eff_n) AS BIGINT) AS sum_tokens,
       CAST(SUM(cap - eff_n) AS BIGINT) AS sum_padding,
       CAST(SUM(trunc_n) AS BIGINT) AS sum_truncated,
       CAST(SUM(cap - eff_n) * 1000 // SUM(cap) AS BIGINT)
         AS waste_per_mille
FROM capped
GROUP BY 1
"""


@_register("pad1_padding_waste", _PAD1_SQL)
def pad1_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching — the efficiency
    number a training-data team checks before fixing bucket boundaries
    (pk2 assigns buckets; this audits what the assignment costs):
    documents land in power-of-two token-length buckets (16..1024, with
    a 1024 truncation budget a la trunc1), and per bucket the audit
    releases document count, real tokens, padded tokens (cap - length),
    truncated tokens, and waste-per-mille = padding / (padding + real)
    in exact integer arithmetic. The CASE ladder replaces log2 (libm-
    free) and LEAST/GREATEST (decimal-promotion gotcha) — every value is
    BIGINT end to end.

    100 TB shape: one scan, one map-side-combinable aggregate to <= 7
    rows. The token count is a pure Column expression inside codegen."""
    from .operators.text import word_count

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lens = d.select("doc_id", word_count(F.col("text")).alias("n"))
    n = F.col("n")
    capped = lens.select(
        "doc_id",
        F.when(n > _PAD_MAX, _PAD_MAX).otherwise(n).alias("eff_n"),
        F.when(n > _PAD_MAX, n - _PAD_MAX).otherwise(0).alias("trunc_n"),
        F.when(n <= 16, 16)
        .when(n <= 32, 32)
        .when(n <= 64, 64)
        .when(n <= 128, 128)
        .when(n <= 256, 256)
        .when(n <= 512, 512)
        .otherwise(_PAD_MAX)
        .alias("cap"),
    )
    return capped.groupBy("cap").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("eff_n").cast("bigint").alias("sum_tokens"),
        F.sum(F.col("cap") - F.col("eff_n")).cast("bigint").alias(
            "sum_padding"
        ),
        F.sum("trunc_n").cast("bigint").alias("sum_truncated"),
        F.expr(
            "SUM(cap - eff_n) * 1000 DIV SUM(cap)"
        ).alias("waste_per_mille"),
    ).select(
        F.col("cap").cast("bigint").alias("bucket_cap"),
        "n_docs",
        "sum_tokens",
        "sum_padding",
        "sum_truncated",
        "waste_per_mille",
    )


# ---------------------------------------------------------------------------
# fert1: tokenizer fertility per language
# ---------------------------------------------------------------------------

_FERT1_SQL = r"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                t -> LENGTH(t) > 0))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(text,
           '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))) AS BIGINT) AS n_tokens,
       CAST(SUM(len(regexp_extract_all(text,
           '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))) * 1000
         // SUM(len(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                                t -> LENGTH(t) > 0))) AS BIGINT)
         AS fertility_per_mille
FROM documents
GROUP BY lang
"""


@_register("fert1_tokenizer_fertility", _FERT1_SQL)
def fert1_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — tokens produced per whitespace
    word under the BPE-ish pre-tokenizer (tx1's regex), the standard
    multilingual tokenizer-quality audit: a language whose fertility is
    much higher than English's pays proportionally more context budget
    per sentence, and tokenizer/vocab decisions are made from exactly
    this table. Released per language: doc count, word count, token
    count, and fertility in exact integer per-mille (total tokens * 1000
    DIV total words — corpus-weighted, not doc-averaged).

    100 TB shape: one scan, two codegen regex counts per row, one
    map-side-combinable aggregate to |languages| rows."""
    from .operators.partitioning import spread
    from .operators.text import bpe_ish_token_count, word_count

    d = spread(_t(spark, sf_dir, "documents").select("lang", "text"))
    per = d.select(
        "lang",
        word_count(F.col("text")).alias("_w"),
        bpe_ish_token_count(F.col("text")).alias("_t"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_w").cast("bigint").alias("n_words"),
        F.sum("_t").cast("bigint").alias("n_tokens"),
        F.expr("SUM(_t) * 1000 DIV SUM(_w)").alias("fertility_per_mille"),
    )
