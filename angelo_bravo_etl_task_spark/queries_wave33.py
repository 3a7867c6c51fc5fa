"""Round-3 wave 33: banded dynamic time warping, quantile mapping,
largest-remainder apportionment, and group-mode imputation repair.

- dtw1: the DP algorithm NO window or single fold expresses (each cell
  needs the previous row AND the current row's previous cell): Spark
  runs a nested in-cell fold (outer fold over rows, inner fold building
  each row left to right); the oracle is GENERATED SQL — 30 chained
  CTEs, one per DP row, each cell a lateral-alias reference — with
  boundary and band logic resolved at generation time. Exact integer
  costs; Sakoe-Chiba band |i-j| <= 3 keeps the state 7 cells wide.
- qq1: quantile normalization (map one distribution onto another by
  rank) — the domain-adaptation / batch-effect-removal transform, as
  two rank windows and one equi-join on the scaled rank.
- app1: proportional apportionment by largest remainder (Hare quota) —
  the deterministic integer algorithm behind seat/budget/quota splits;
  base = floor share, leftovers to the largest remainders.
- fix1: group-mode imputation with planted nulls — the data-repair op:
  fill missing values from the group's most frequent value with pinned
  tiebreaks, report repair provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# dtw1: banded dynamic time warping (generated row-unrolled oracle)
# =========================================================================

_INF = 10**15
_N = 30
_BAND = 3


def _dtw_sql() -> str:
    """Generate the row-unrolled DTW oracle: one CTE per DP row; each
    in-band cell references the previous row's CTE columns and the
    current row's earlier cells via DuckDB lateral column aliases.
    Boundary cells (row 0 / column 0) and out-of-band references resolve
    to literals AT GENERATION TIME, so the emitted SQL contains only
    valid references."""

    def ref(i: int, j: int, cur_row: bool) -> str:
        # value of D[i][j] as an SQL fragment visible while building row i
        # (cur_row=True) or referencing the materialized previous CTE.
        # column names are globally unique (d<i>_<j>) so a within-row
        # lateral alias can never collide with the previous CTE's columns
        # (DuckDB binds a table column over a lateral alias on collision)
        if i == 0 and j == 0:
            return "0"
        if i == 0 or j == 0 or abs(i - j) > _BAND or j > _N:
            return str(_INF)
        return f"d{i}_{j}"

    ctes = []
    for i in range(1, _N + 1):
        cols = []
        js = [j for j in range(max(1, i - _BAND), min(_N, i + _BAND) + 1)]
        for j in js:
            up = ref(i - 1, j, False)
            diag = ref(i - 1, j - 1, False)
            left = ref(i, j - 1, True)
            cols.append(
                f"CAST(abs(s.av[{i}] - s.bv[{j}])"
                f" + least({up}, {diag}, {left}) AS BIGINT) AS d{i}_{j}"
            )
        prev = f", r{i - 1}" if i > 1 else ""
        ctes.append(
            f"r{i} AS (SELECT {', '.join(cols)} FROM s{prev})"
        )
    return f"""
WITH spine AS (
  SELECT UNNEST(generate_series(1, {_N})) AS i
), clicks AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '2023-12-31' AS BIGINT) AS i,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE event_type = 'click' GROUP BY 1
), views AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '2023-12-31' AS BIGINT) AS i,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE event_type = 'view' GROUP BY 1
), s AS (
  SELECT (SELECT list(COALESCE(c.cnt, 0) ORDER BY sp.i)
          FROM spine sp LEFT JOIN clicks c ON c.i = sp.i) AS av,
         (SELECT list(COALESCE(v.cnt, 0) ORDER BY sp.i)
          FROM spine sp LEFT JOIN views v ON v.i = sp.i) AS bv
), {', '.join(ctes)}
SELECT CAST({_N} AS BIGINT) AS n, CAST({_N} AS BIGINT) AS m,
       CAST(r{_N}.d{_N}_{_N} AS BIGINT) AS dtw_cost
FROM r{_N}
"""


@_register("dtw1_dynamic_time_warping", _dtw_sql())
def dtw1_dynamic_time_warping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping between the click and view daily series
    (Sakoe-Chiba band 3, exact integer |a_i - b_j| costs) — the
    alignment distance for series that drift in phase, and a DP no
    window frame or single fold expresses: D[i][j] needs D[i-1][j],
    D[i-1][j-1] AND D[i][j-1] (same-row dependency). Spark runs the
    textbook recurrence as a NESTED in-cell fold — outer aggregate over
    the 30 rows carrying the previous DP row as the accumulator, inner
    aggregate building each row left to right — over day-spine-completed
    count arrays (missing days count 0, so the series length is pinned
    at 30 at every SF). Out-of-band cells are INF=1e15; every in-band
    cell has an in-band predecessor, so INF never accumulates. The
    oracle is GENERATED row-unrolled SQL (one CTE per row, lateral
    aliases within a row) — band and boundary logic burned in at
    generation time. At 100 TB: per-key DTW over pre-aggregated bounded
    series is a narrow projection; the band keeps each fold O(n*band)."""
    ev = _t(spark, sf_dir, "events")

    def series(etype: str):
        daily = (
            ev.where(F.col("event_type") == etype)
            .groupBy(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("2023-12-31")
                ).alias("i")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        spine = spark.range(1, _N + 1).select(F.col("id").alias("i"))
        return (
            spine.join(daily, "i", "left")
            .select("i", F.coalesce("cnt", F.lit(0)).alias("cnt"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cnt"))),
                    lambda st: st["cnt"],
                ).alias("v")
            )
        )

    a = series("click").select(F.col("v").alias("av"))
    b = series("view").select(F.col("v").alias("bv"))
    s = a.join(b)

    inf = F.lit(_INF).cast("bigint")
    # row 0: D[0][0] = 0, D[0][j>0] = INF  (array index 1..N+1 = j 0..N)
    row0 = F.concat(
        F.array(F.lit(0).cast("bigint")),
        F.array_repeat(inf, _N),
    )

    def inner(acc_prev, i):
        # build row i from the previous row: inner left fold over j
        return F.aggregate(
            F.expr(f"sequence(1, {_N})"),
            F.array(inf),  # D[i][0] = INF
            lambda acc, j: F.concat(
                acc,
                F.array(
                    F.when(
                        F.abs(i - j) > _BAND,
                        inf,
                    ).otherwise(
                        F.abs(
                            F.element_at(F.col("av"), i.cast("int"))
                            - F.element_at(F.col("bv"), j.cast("int"))
                        )
                        + F.least(
                            F.element_at(acc_prev, (j + 1).cast("int")),
                            F.element_at(acc_prev, j.cast("int")),
                            F.element_at(acc, j.cast("int")),
                        )
                    ).cast("bigint")
                ),
            ),
        )

    final_row = F.aggregate(
        F.expr(f"sequence(1, {_N})"),
        row0,
        lambda acc, i: inner(acc, i),
    )
    return s.select(
        F.lit(_N).cast("bigint").alias("n"),
        F.lit(_N).cast("bigint").alias("m"),
        F.element_at(final_row, _N + 1).cast("bigint").alias("dtw_cost"),
    )


# =========================================================================
# qq1: quantile mapping (quantile normalization)
# =========================================================================

_QQ1_SQL = """
WITH src AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'click' GROUP BY 1
), sr AS (
  SELECT day, x,
         CAST(ROW_NUMBER() OVER (ORDER BY x, day) AS BIGINT) AS r,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM src
), tgt AS (
  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
), tr AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents) AS BIGINT) AS tr_rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM tgt
)
SELECT sr.day, sr.x, sr.r, sr.n,
       1 + ((sr.r - 1) * (tr0.m - 1)) // (sr.n - 1) AS target_idx,
       tr.cents AS mapped_cents
FROM sr
CROSS JOIN (SELECT MAX(m) AS m FROM tr) tr0
JOIN tr ON tr.tr_rank = 1 + ((sr.r - 1) * (tr0.m - 1)) // (sr.n - 1)
"""


@_register("qq1_quantile_mapping", _QQ1_SQL)
def qq1_quantile_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: map each click-day count onto the
    customer-balance distribution at the SAME quantile — rank r of n in
    the source looks up rank 1 + (r-1)(m-1) div (n-1) of m in the
    target (type-1, exact integer index arithmetic). This is the
    batch-effect / domain-adaptation transform (make distribution A look
    like distribution B while preserving order) done relationally: two
    rank windows over aggregated frames, one equi-join on the computed
    target rank. Ties pinned by (x, day) / (cents) ordering. At 100 TB
    the target ranking is the m1-style window over the grouped-value
    frame and the mapping join is rank-keyed."""
    ev = _t(spark, sf_dir, "events")
    src = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    sr = src.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("x", "day")).cast("bigint").alias("r"),
    )
    n = src.agg(F.count(F.lit(1)).alias("n"))
    tgt = _t(spark, sf_dir, "customer").select(
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    # The target ranking is the m1-style two-pass: group by VALUE first,
    # then one cumulative window over the AGGREGATED value frame — the
    # global window never sorts raw customer rows (round-10 fix: the
    # original ranked the full table in one partition; flagged by the
    # registry-wide global-window audit). The value at rank k of the raw
    # multiset is the value whose cumulative-count interval contains k,
    # so the released mapping is IDENTICAL.
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tr = (
        tgt.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("_cc"))
        .select(
            "cents",
            F.col("_cc").cast("bigint").alias("_cc"),
            F.sum("_cc").over(wcum).cast("bigint").alias("_cum"),
        )
    )
    m = tgt.agg(F.count(F.lit(1)).alias("m"))
    wanted = sr.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(m)).select(
        "day",
        "x",
        "r",
        "n",
        (1 + F.expr("((r - 1) * (m - 1)) div (n - 1)")).alias("target_idx"),
    )
    # rank-containment lookup: the broadcast side is the aggregated-source
    # frame (|click days| rows), the sanctioned bounded-spine shape
    return F.broadcast(wanted).join(
        tr,
        (wanted["target_idx"] > tr["_cum"] - tr["_cc"])
        & (wanted["target_idx"] <= tr["_cum"]),
    ).select("day", "x", "r", "n", "target_idx", F.col("cents").alias("mapped_cents"))


# =========================================================================
# app1: largest-remainder apportionment (Hare quota)
# =========================================================================

_APP1_SQL = """
WITH votes AS (
  SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS votes
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(votes) AS BIGINT) AS total FROM votes
), base AS (
  SELECT v.seg, v.votes,
         CAST((100 * v.votes) // t.total AS BIGINT) AS base_seats,
         CAST((100 * v.votes) % t.total AS BIGINT) AS remainder
  FROM votes v CROSS JOIN tot t
), leftover AS (
  SELECT CAST(100 - SUM(base_seats) AS BIGINT) AS extra_seats FROM base
), ranked AS (
  SELECT b.seg, b.votes, b.base_seats, b.remainder,
         CAST(ROW_NUMBER() OVER (ORDER BY b.remainder DESC, b.seg)
              AS BIGINT) AS rem_rank
  FROM base b
)
SELECT r.seg, r.votes, r.base_seats, r.remainder, r.rem_rank,
       CAST(CASE WHEN r.rem_rank <= l.extra_seats THEN 1 ELSE 0 END
            AS BIGINT) AS extra,
       CAST(r.base_seats + CASE WHEN r.rem_rank <= l.extra_seats
                                THEN 1 ELSE 0 END AS BIGINT) AS final_seats
FROM ranked r CROSS JOIN leftover l
"""


@_register("app1_largest_remainder", _APP1_SQL)
def app1_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional apportionment by the largest-remainder (Hare quota)
    method: each segment gets floor(100 * votes / total) seats, and the
    seats lost to flooring go to the largest remainders — the
    deterministic integer algorithm behind seat allocation, budget
    splits, and sampling quotas (dm1's per-source caps are its cousin).
    Every step is integer div/mod plus one remainder-ranked window;
    the final seat column sums to exactly 100 by construction (the
    property test asserts it). One join-aggregate to get votes, then
    dimension-sized frames throughout."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    votes = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    tot = votes.agg(F.sum("votes").alias("total"))
    base = votes.crossJoin(F.broadcast(tot)).select(
        "seg",
        "votes",
        F.expr("CAST((100 * votes) div total AS BIGINT)").alias("base_seats"),
        F.expr("CAST((100 * votes) % total AS BIGINT)").alias("remainder"),
    )
    base = base.persist()
    leftover = base.agg(
        (100 - F.sum("base_seats")).cast("bigint").alias("extra_seats")
    )
    ranked = base.withColumn(
        "rem_rank",
        F.row_number()
        .over(Window.orderBy(F.col("remainder").desc(), "seg"))
        .cast("bigint"),
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "seg",
        "votes",
        "base_seats",
        "remainder",
        "rem_rank",
        F.when(F.col("rem_rank") <= F.col("extra_seats"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("extra"),
        (
            F.col("base_seats")
            + F.when(F.col("rem_rank") <= F.col("extra_seats"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("final_seats"),
    )


# =========================================================================
# fix1: group-mode imputation with planted nulls
# =========================================================================

_FIX1_SQL = """
WITH dirty AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_dirty,
         lang AS lang_true
  FROM documents
), modes AS (
  SELECT source, lang_dirty AS mode_lang FROM (
    SELECT source, lang_dirty,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY COUNT(*) DESC, lang_dirty) AS rn
    FROM dirty WHERE lang_dirty IS NOT NULL
    GROUP BY source, lang_dirty
  ) WHERE rn = 1
)
SELECT d.doc_id, d.source,
       (d.lang_dirty IS NULL) AS was_repaired,
       COALESCE(d.lang_dirty, m.mode_lang) AS lang_repaired,
       (COALESCE(d.lang_dirty, m.mode_lang) = d.lang_true)
         AS repair_correct
FROM dirty d JOIN modes m ON m.source = d.source
"""


@_register("fix1_group_mode_impute", _FIX1_SQL)
def fix1_group_mode_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data repair by group-mode imputation: nulls planted on every 7th
    document's language are filled from the source group's most frequent
    surviving language (deterministic (count DESC, value) tiebreak —
    agg3's mode rule), with provenance columns: was_repaired marks the
    filled rows and repair_correct scores the imputation against the
    held-back truth — the honesty metric a repair pipeline must report
    (mode imputation is only right when the group is homogeneous). One
    group-mode aggregate + one broadcast-shaped join; the planting
    keyed on doc_id modulus fires at every SF."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise(F.col("lang"))
        .alias("lang_dirty"),
        F.col("lang").alias("lang_true"),
    )
    modes = (
        d.where(F.col("lang_dirty").isNotNull())
        .groupBy("source", "lang_dirty")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("cnt").desc(), "lang_dirty"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("source", F.col("lang_dirty").alias("mode_lang"))
    )
    return d.join(F.broadcast(modes), "source").select(
        "doc_id",
        "source",
        F.col("lang_dirty").isNull().alias("was_repaired"),
        F.coalesce("lang_dirty", "mode_lang").alias("lang_repaired"),
        (
            F.coalesce("lang_dirty", "mode_lang") == F.col("lang_true")
        ).alias("repair_correct"),
    )
