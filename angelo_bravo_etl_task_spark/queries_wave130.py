r"""Round-11 wave 130: the composed entity-resolution flagship (px10) and
the dedup threshold-calibration curve (prc1).

- px10 composes the linkage verbs wave 129 (fs1) and the d-family
  certified separately into the nightly entity-resolution loop every
  master-data/identity pipeline runs: PLANT labeled duplicates -> LEARN
  Fellegi-Sunter field weights from them -> SCORE all blocked candidate
  pairs with the learned integer weights -> THRESHOLD on the dominant
  field's evidence -> CLUSTER matches (connected components) ->
  SURVIVORSHIP accounting. One plan, exact integer arithmetic, a px7-style
  runtime premise guard where the construction argument needs a measured
  margin.
- prc1 is the calibration study a dedup team runs before fixing d3/d7's
  confirm threshold: clone pairs CORRUPTED at controlled rates (every
  k-th token replaced, k in {8,4,2} — nested replacement sets, so
  per-pair similarity is provably monotone in k) plus decoy non-pairs,
  swept across confirm thresholds; released as the (class, threshold)
  flag-count matrix. Pure exact-Jaccard on planted pairs — no sketch
  internals, so every count is deterministic in both engines.

No reference analogue (Angelo_ETL_Task.py is row-wise ETL); extends the
dedup/linkage surface of SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

# ---------------------------------------------------------------------------
# px10: entity resolution end-to-end
# ---------------------------------------------------------------------------

_PX10_A_OFF = 3_000_000  # tier-A clones: same name, +$50 (labeled train set)
_PX10_B_OFF = 6_000_000  # tier-B clones: same name, +$150 (outside the band)
_PX10_PPM = 1_000_000

_PX10_SQL = f"""
WITH RECURSIVE recs AS (
  SELECT c_custkey AS rid, c_name AS rname, c_nationkey AS rnat,
         c_mktsegment AS rseg,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS rcents
  FROM customer
  UNION ALL
  SELECT c_custkey + {_PX10_A_OFF}, c_name, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 5000
  FROM customer WHERE c_custkey % 97 = 0
  UNION ALL
  SELECT c_custkey + {_PX10_B_OFF}, c_name, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 15000
  FROM customer WHERE c_custkey % 89 = 0
), cand AS (
  SELECT a.rid AS ida, b.rid AS idb,
         CASE WHEN a.rname = b.rname THEN 1 ELSE 0 END AS agn,
         CASE WHEN ABS(a.rcents - b.rcents) < 10000 THEN 1 ELSE 0 END AS agb,
         CASE WHEN substr(a.rname, LENGTH(a.rname), 1)
                   = substr(b.rname, LENGTH(b.rname), 1)
              THEN 1 ELSE 0 END AS agl,
         CASE WHEN b.rid = a.rid + {_PX10_A_OFF} THEN 1 ELSE 0 END AS lab
  FROM recs a JOIN recs b
    ON a.rnat = b.rnat AND a.rseg = b.rseg AND a.rid < b.rid
), est AS (
  SELECT fid,
         CAST((SUM(CASE WHEN lab = 1 THEN agr ELSE 0 END) + 1) * {_PX10_PPM}
              // (SUM(lab) + 2) AS BIGINT) AS mp,
         CAST((SUM(CASE WHEN lab = 0 THEN agr ELSE 0 END) + 1) * {_PX10_PPM}
              // (SUM(1 - lab) + 2) AS BIGINT) AS up
  FROM (
    SELECT 0 AS fid, agn AS agr, lab FROM cand
    UNION ALL SELECT 1, agb, lab FROM cand
    UNION ALL SELECT 2, agl, lab FROM cand
  ) GROUP BY 1
), wts AS (
  SELECT CAST(MAX(CASE WHEN fid = 0 THEN mp * {_PX10_PPM} // (up + 1) END)
              AS BIGINT) AS wn,
         CAST(MAX(CASE WHEN fid = 1 THEN mp * {_PX10_PPM} // (up + 1) END)
              AS BIGINT) AS wb,
         CAST(MAX(CASE WHEN fid = 2 THEN mp * {_PX10_PPM} // (up + 1) END)
              AS BIGINT) AS wl
  FROM est
), matched AS (
  SELECT c.ida, c.idb
  FROM cand c, wts w
  WHERE c.agn * w.wn + c.agb * w.wb + c.agl * w.wl >= w.wn
), edges AS (
  SELECT ida AS u, idb AS v FROM matched
  UNION
  SELECT idb AS u, ida AS v FROM matched
), walk(node, comp) AS (
  SELECT rid, rid FROM recs
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON w.node = e.u
), comps AS (
  SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node
), sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize FROM comps GROUP BY 1
)
SELECT csize AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(csize) AS BIGINT) AS n_records
FROM sizes GROUP BY 1
"""


@_register("px10_entity_resolution", _PX10_SQL)
def px10_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end — the composed nightly loop of a
    master-data/identity pipeline, built from verbs the registry
    certifies separately (fs1 weight learning, er1-style blocking, d6's
    connected components, d8's survivorship accounting): (1) PLANT two
    duplicate tiers — tier A (every 97th customer, same name, +$50: the
    LABELED training pairs) and tier B (every 89th, same name, +$150:
    outside the acctbal band, so only name+last-char evidence links
    them); (2) LEARN Laplace-smoothed m/u ppm per field from the tier-A
    labels; (3) SCORE every blocked candidate pair with the learned
    integer weights; (4) MATCH at threshold = the name field's weight
    (name evidence alone suffices; weaker fields alone must not reach
    it); (5) CLUSTER matches via connected components (a customer
    divisible by both 97 and 89 transitively merges its two clones into
    one size-3 cluster); (6) release the cluster-size histogram —
    singletons, pairs, triples — whose counts pin every stage at once.

    PREMISE GUARD (px7 pattern): the threshold argument needs
    w_band + w_last < w_name — true by a wide measured margin (unique
    names drive u_name toward 0 ppm while band/last-char coincidences
    keep their u high), but a regenerated dataset could in principle
    compress it, so the guard RAISES on violation instead of letting the
    driver red-hash (and a name-collision u_name > 0 would surface the
    same way).

    100 TB shape: blocking is the equi-self-join on (nation, segment) —
    never all-pairs; weight learning is one map-side-combinable
    aggregate to 3 rows broadcast back as a 1-row scalar frame (the
    sanctioned scalar-subquery shape); components run on MATCHED pairs
    only (planted-scale, not candidate-scale). Reference parity: none —
    §2.4 dedup/linkage extension."""
    from .operators.graph import connected_components

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )

    def rec(src: DataFrame, off: int, cents_shift: int) -> DataFrame:
        return src.select(
            (F.col("c_custkey") + off).alias("rid"),
            F.col("c_name").alias("rname"),
            F.col("c_nationkey").alias("rnat"),
            F.col("c_mktsegment").alias("rseg"),
            (
                F.floor(F.col("c_acctbal") * 100).cast("bigint") + cents_shift
            ).alias("rcents"),
        )

    recs = (
        rec(c, 0, 0)
        .unionByName(rec(c.where(F.col("c_custkey") % 97 == 0), _PX10_A_OFF, 5000))
        .unionByName(rec(c.where(F.col("c_custkey") % 89 == 0), _PX10_B_OFF, 15000))
        .persist()
    )
    a = recs.select(*[F.col(x).alias(f"a_{x}") for x in recs.columns])
    b = recs.select(*[F.col(x).alias(f"b_{x}") for x in recs.columns])
    cand = a.join(
        b,
        (F.col("a_rnat") == F.col("b_rnat"))
        & (F.col("a_rseg") == F.col("b_rseg"))
        & (F.col("a_rid") < F.col("b_rid")),
    ).select(
        F.col("a_rid").alias("ida"),
        F.col("b_rid").alias("idb"),
        F.when(F.col("a_rname") == F.col("b_rname"), 1).otherwise(0).alias("agn"),
        F.when(F.abs(F.col("a_rcents") - F.col("b_rcents")) < 10000, 1)
        .otherwise(0)
        .alias("agb"),
        F.when(
            F.substring(F.col("a_rname"), -1, 1)
            == F.substring(F.col("b_rname"), -1, 1),
            1,
        )
        .otherwise(0)
        .alias("agl"),
        F.when(F.col("b_rid") == F.col("a_rid") + _PX10_A_OFF, 1)
        .otherwise(0)
        .alias("lab"),
    ).localCheckpoint(eager=True)  # learning pass + scoring pass share this

    def w_expr(agr: str) -> F.Column:
        m = f"(SUM(CASE WHEN lab = 1 THEN {agr} ELSE 0 END) + 1) * {_PX10_PPM} DIV (SUM(lab) + 2)"
        u = f"(SUM(CASE WHEN lab = 0 THEN {agr} ELSE 0 END) + 1) * {_PX10_PPM} DIV (SUM(1 - lab) + 2)"
        return F.expr(f"({m}) * {_PX10_PPM} DIV (({u}) + 1)")

    wts = cand.agg(
        w_expr("agn").alias("wn"),
        w_expr("agb").alias("wb"),
        w_expr("agl").alias("wl"),
    )
    w = wts.first()
    if w["wb"] + w["wl"] >= w["wn"]:
        raise RuntimeError(
            f"px10 premise violated: weaker-field evidence wb+wl = "
            f"{w['wb']} + {w['wl']} reaches the name weight {w['wn']} — "
            f"the name-threshold match rule is not safe on this data; "
            f"re-derive the threshold before trusting a red sweep"
        )
    matched = (
        cand.crossJoin(F.broadcast(wts))
        .where(
            F.col("agn") * F.col("wn")
            + F.col("agb") * F.col("wb")
            + F.col("agl") * F.col("wl")
            >= F.col("wn")
        )
        .select("ida", "idb")
    )
    comp = connected_components(matched, src="ida", dst="idb")
    labeled = recs.select("rid").join(
        comp, recs["rid"] == comp["node"], "left"
    ).select(
        F.coalesce(F.col("component"), F.col("rid")).alias("cluster_id")
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("cluster_size").cast("bigint").alias("n_records"),
    )


# ---------------------------------------------------------------------------
# prc1: dedup confirm-threshold calibration curve
# ---------------------------------------------------------------------------

_PRC_KS = (8, 4, 2)  # nested replacement sets: %2 ⊇ %4 ⊇ %8
_PRC_THETAS = (40, 60, 80)  # percent x100 thresholds
_PRC_SLICE = 200  # bounded audit slice (d5/d9's documented oracle shape)


_PRC1_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                     t -> LENGTH(t) > 0) AS w
  FROM documents WHERE doc_id < {_PRC_SLICE}
), sized AS (
  SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= 3
), levels AS (
  SELECT doc_id, w, n, unnest([{", ".join(str(k) for k in _PRC_KS)}]) AS k
  FROM sized
), corrupted AS (
  SELECT doc_id, k, w,
         list_transform(generate_series(1, n),
             i -> CASE WHEN i % k = 0 THEN 'zz' || CAST(i AS VARCHAR)
                       ELSE w[i] END) AS cw,
         n
  FROM levels
), planted AS (
  SELECT doc_id, 'corrupt_k' || CAST(k AS VARCHAR) AS pair_class,
         list_distinct(list_transform(generate_series(1, n - 2),
             i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS ga,
         list_distinct(list_transform(generate_series(1, n - 2),
             i -> cw[i] || ' ' || cw[i + 1] || ' ' || cw[i + 2])) AS gb
  FROM corrupted
), decoys AS (
  SELECT a.doc_id, 'decoy' AS pair_class,
         list_distinct(list_transform(generate_series(1, a.n - 2),
             i -> a.w[i] || ' ' || a.w[i + 1] || ' ' || a.w[i + 2])) AS ga,
         list_distinct(list_transform(generate_series(1, b.n - 2),
             i -> b.w[i] || ' ' || b.w[i + 1] || ' ' || b.w[i + 2])) AS gb
  FROM sized a JOIN sized b ON b.doc_id = a.doc_id + 1
), pairs AS (
  SELECT pair_class,
         len(list_intersect(ga, gb)) * 100 AS i100,
         len(list_distinct(list_concat(ga, gb))) AS u
  FROM (SELECT * FROM planted UNION ALL SELECT * FROM decoys)
), swept AS (
  SELECT pair_class, theta, i100, u
  FROM pairs
  CROSS JOIN (SELECT unnest([{", ".join(str(t) for t in _PRC_THETAS)}])
              AS theta)
)
SELECT pair_class, CAST(theta AS BIGINT) AS theta_pct,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN i100 >= theta * u THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged
FROM swept
GROUP BY 1, 2
"""


@_register("prc1_dedup_threshold_curve", _PRC1_SQL)
def prc1_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confirm-threshold calibration for near-dup detection — the study a
    dedup team runs before fixing d3/d7's Jaccard threshold: clone pairs
    corrupted at CONTROLLED rates (every k-th token replaced with a
    unique junk token, k in 8/4/2 — the k=2 replacement positions are a
    superset of k=4's, which superset k=8's, so each pair's surviving
    3-gram set shrinks monotonically and per-pair similarity is provably
    ordered jac(k=2) <= jac(k=4) <= jac(k=8)) plus decoy pairs (each doc
    against its successor), swept across confirm thresholds 0.40 / 0.60
    / 0.80. Released: the (pair class, threshold) flag-count matrix —
    the empirical operating curve from which a threshold is chosen.
    Flagging compares exact integer cross-products (intersection * 100
    >= theta * union), so no division or float appears anywhere; every
    count is deterministic in both engines.

    100 TB shape: per-pair array work on a bounded audit slice (the
    documented d5/d9 oracle-demo shape — a production calibration
    samples pairs, it never needs the full corpus); the only join is the
    successor equi-join for decoys. The threshold sweep is a constant
    3-row spine (heaps1's cube-by-cutoff shape)."""
    from .operators.partitioning import spread
    from .operators.text import tokens

    d = spread(
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _PRC_SLICE)
        .select("doc_id", "text")
    )
    sized = (
        d.select("doc_id", tokens(F.col("text")).alias("w"))
        .withColumn("n", F.size("w"))
        .where(F.col("n") >= 3)
        .localCheckpoint(eager=True)  # planted + decoy branches share this
    )
    levels = sized.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.array(*[F.lit(k) for k in _PRC_KS])).alias("k"),
    )
    corrupted = levels.select(
        "doc_id",
        "k",
        "w",
        "n",
        F.expr(
            "transform(sequence(1, n), i -> CASE WHEN i % k = 0 "
            "THEN 'zz' || CAST(i AS STRING) ELSE element_at(w, i) END)"
        ).alias("cw"),
    )

    def grams(col: str) -> F.Column:
        return F.array_distinct(
            F.expr(
                f"transform(sequence(1, n - 2), "
                f"i -> concat_ws(' ', element_at({col}, i), "
                f"element_at({col}, i + 1), element_at({col}, i + 2)))"
            )
        )

    planted = corrupted.select(
        "doc_id",
        F.concat(F.lit("corrupt_k"), F.col("k").cast("string")).alias(
            "pair_class"
        ),
        grams("w").alias("ga"),
        grams("cw").alias("gb"),
    )
    a = sized.select(
        F.col("doc_id"), F.col("w").alias("aw"), F.col("n").alias("an")
    )
    b = sized.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("w").alias("bw"),
        F.col("n").alias("bn"),
    )
    decoys = a.join(b, "doc_id").select(
        "doc_id",
        F.lit("decoy").alias("pair_class"),
        F.array_distinct(
            F.expr(
                "transform(sequence(1, an - 2), "
                "i -> concat_ws(' ', element_at(aw, i), "
                "element_at(aw, i + 1), element_at(aw, i + 2)))"
            )
        ).alias("ga"),
        F.array_distinct(
            F.expr(
                "transform(sequence(1, bn - 2), "
                "i -> concat_ws(' ', element_at(bw, i), "
                "element_at(bw, i + 1), element_at(bw, i + 2)))"
            )
        ).alias("gb"),
    )
    pairs = planted.unionByName(decoys).select(
        "pair_class",
        (F.size(F.array_intersect("ga", "gb")) * 100).alias("i100"),
        F.size(F.array_union("ga", "gb")).alias("u"),
    )
    swept = pairs.crossJoin(
        F.broadcast(
            local_rows_df(pairs.sparkSession, 
                [(t,) for t in _PRC_THETAS], "theta int"
            )
        )
    )
    return swept.groupBy("pair_class", "theta").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(F.col("i100") >= F.col("theta") * F.col("u"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_flagged"),
    ).select(
        "pair_class",
        F.col("theta").cast("bigint").alias("theta_pct"),
        "n_pairs",
        "n_flagged",
    )
