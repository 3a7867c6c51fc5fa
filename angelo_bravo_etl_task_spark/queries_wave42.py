"""Round-3 wave 42: Huffman cost, bandit replay, greedy set cover.

- huff1: optimal prefix-code (Huffman) cost over a 16-symbol frequency
  table — the merge-two-smallest priority-queue greedy as a bounded
  fold whose state is the sorted weight list; total cost = sum of all
  merge weights (the codebook-sizing readout for token compression).
- band1: epsilon-greedy multi-armed bandit replayed per user — ops1
  evaluated a policy OFF-policy from logs; band1 runs the learner
  ON-policy over the trace: md5 explore coins, integer-scaled-mean
  exploit argmax, per-arm (count, sum) state.
- cov1: greedy set cover — pick 5 documents maximizing marginal
  coverage of the top-50-df term universe; the classic data-selection-
  for-coverage loop in LLM corpus curation, with the whole pick
  trajectory checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# huff1: Huffman code cost (merge-two-smallest fold)
# =========================================================================

_HUFF1_SQL = """
WITH RECURSIVE sym AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS s,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM events GROUP BY 1
), packed AS (
  SELECT list(w ORDER BY w, s) AS st, CAST(COUNT(*) AS BIGINT) AS n
  FROM sym
), r AS (
  SELECT CAST(0 AS BIGINT) AS step, st,
         CAST([] AS STRUCT(i BIGINT, m BIGINT, cum BIGINT)[]) AS tr, n
  FROM packed
  UNION ALL
  SELECT step + 1,
         list_sort(list_append(st[3:], st[1] + st[2])),
         list_append(tr, {'i': CAST(len(tr) + 1 AS BIGINT),
                          'm': st[1] + st[2],
                          'cum': CASE WHEN len(tr) = 0 THEN st[1] + st[2]
                                      ELSE tr[-1].cum + st[1] + st[2] END}),
         n
  FROM r WHERE len(st) >= 2
), final AS (
  SELECT tr, n, ROW_NUMBER() OVER (ORDER BY step DESC) AS rn FROM r
)
SELECT CAST(u.e.i AS BIGINT) AS step,
       CAST(u.e.m AS BIGINT) AS merged_w,
       CAST(u.e.cum AS BIGINT) AS cost_so_far,
       n AS n_symbols
FROM final, unnest(final.tr) AS u(e)
WHERE rn = 1
"""


@_register("huff1_huffman_cost", _HUFF1_SQL)
def huff1_huffman_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huffman coding cost over a 16-symbol alphabet (first hex char of
    md5(user_id), weighted by event frequency): the merge-two-smallest
    greedy — normally a priority queue — as a bounded fold whose state
    is the SORTED weight list (re-sorted after each merge; n-1 real
    steps inside 15 conditional iterations). Each step's merged weight
    is one internal tree node, and their running sum IS the total
    encoded length (sum over symbols of weight x depth) — the classic
    identity, so the final cum is the optimal codebook cost without
    materializing the tree. The whole merge trajectory is emitted and
    oracle-checked; the entropy lower bound lives in the property test.
    Scan reduces to 16 cells by a combinable group-by; the sequential
    tail is O(alphabet) — the iso1/PAVA scale shape again."""
    ev = _t(spark, sf_dir, "events")
    sym = ev.groupBy(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).alias("s")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    seeded = sym.agg(
        F.array_sort(F.collect_list(F.struct("w", "s"))).alias("ws"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).select(
        F.struct(
            F.transform("ws", lambda x: x["w"]).alias("st"),
            F.expr(
                "CAST(array() AS ARRAY<STRUCT<i: BIGINT, m: BIGINT,"
                " cum: BIGINT>>)"
            ).alias("tr"),
        ).alias("acc"),
        "n",
    )

    def step(acc, _i):
        st = acc["st"]
        merged = F.element_at(st, 1) + F.element_at(st, 2)
        cum = F.when(
            F.size(acc["tr"]) == 0, merged
        ).otherwise(F.element_at(acc["tr"], -1)["cum"] + merged)
        nxt = F.struct(
            F.array_sort(
                F.concat(F.slice(st, 3, F.size(st) - 2), F.array(merged))
            ).alias("st"),
            F.concat(
                acc["tr"],
                F.array(
                    F.struct(
                        (F.size(acc["tr"]) + 1).cast("bigint").alias("i"),
                        merged.alias("m"),
                        cum.alias("cum"),
                    )
                ),
            ).alias("tr"),
        )
        return F.when(F.size(st) >= 2, nxt).otherwise(acc)

    folded = seeded.select(
        "n",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(15)), F.col("acc"), step
        )["tr"].alias("tr"),
    )
    ex = folded.select("n", F.explode("tr").alias("e"))
    return ex.select(
        F.col("e.i").alias("step"),
        F.col("e.m").alias("merged_w"),
        F.col("e.cum").alias("cost_so_far"),
        F.col("n").alias("n_symbols"),
    )


# =========================================================================
# band1: epsilon-greedy bandit replay (on-policy learner over the trace)
# =========================================================================

_BAND1_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, CAST(event_id AS VARCHAR) AS eid,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
  FROM events
  QUALIFY i <= 20
), packed AS (
  SELECT user_id, list(eid ORDER BY i) AS eids, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 10
), r AS (
  SELECT user_id, CAST(0 AS BIGINT) AS i,
         list_transform(range(0, 3), x -> CAST(0 AS BIGINT)) AS cnt,
         list_transform(range(0, 3), x -> CAST(0 AS BIGINT)) AS sm,
         CAST(0 AS BIGINT) AS tot, eids, n
  FROM packed
  UNION ALL
  SELECT user_id, i + 1,
         list_transform(range(0, 3), a ->
           cnt[a + 1] + CASE WHEN a = arm THEN 1 ELSE 0 END),
         list_transform(range(0, 3), a ->
           sm[a + 1] + CASE WHEN a = arm THEN rw ELSE 0 END),
         tot + rw, eids, n
  FROM (
    SELECT *,
           CAST(CAST('0x' || substr(md5('r' || CAST(arm AS VARCHAR) || '_'
                    || eids[i + 1]), 1, 8) AS BIGINT) % 100 AS BIGINT) AS rw
    FROM (
      SELECT *,
             CASE WHEN CAST('0x' || substr(md5('c' || eids[i + 1]), 1, 8)
                       AS BIGINT) % 10 < 2
                  THEN CAST('0x' || substr(md5('a' || eids[i + 1]), 1, 8)
                       AS BIGINT) % 3
                  ELSE list_sort(list_transform(range(0, 3), a ->
                         {'ns': -(CASE WHEN cnt[a + 1] = 0
                                       THEN 1000000000000000 - a
                                       ELSE (sm[a + 1] * 1000) // cnt[a + 1]
                                  END),
                          'a': a}))[1].a
             END AS arm
      FROM r WHERE i < n
    )
  )
), final AS (
  SELECT user_id, n, tot, cnt, sm,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) AS rn
  FROM r
)
SELECT user_id, n, tot AS total_reward,
       array_to_string(cnt, '/') AS pulls_state,
       array_to_string(sm, '/') AS rewards_state
FROM final WHERE rn = 1
"""


@_register("band1_epsilon_greedy", _BAND1_SQL)
def band1_epsilon_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-greedy 3-armed bandit replayed per user over their
    first-20 event trace: at each step an md5 coin explores (20%, arm =
    md5%3) or exploits the argmax of the integer-scaled running mean
    (sum*1000 floor-div count — positive operands, so Spark's
    (x - x%c)/c equals DuckDB's // exactly; untried arms first by
    index); the md5 reward depends on the CHOSEN arm, so exploration
    genuinely changes what is learned. ops1 evaluated a fixed policy
    off-policy; band1 runs the LEARNER on-policy — the sequential-fold
    family's adaptive-state member (per-arm counts and sums fold
    through every step). Recursive-CTE oracle with identical
    coin/reward/argmax arithmetic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_id").cast("string").alias("eid"),
        F.row_number().over(w).cast("bigint").alias("i"),
    ).where(F.col("i") <= 20)
    packed = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "eid"))),
            lambda st: st["eid"],
        ).alias("eids"),
    ).where(F.col("n") >= 10)
    acc0 = F.expr(
        "named_struct("
        "'cnt', transform(sequence(0, 2), x -> CAST(0 AS BIGINT)),"
        "'sm', transform(sequence(0, 2), x -> CAST(0 AS BIGINT)),"
        "'tot', CAST(0 AS BIGINT))"
    )

    def _h8(s: F.Column) -> F.Column:
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")

    def _floordiv(num: F.Column, den: F.Column) -> F.Column:
        # exact floor division for POSITIVE operands on both engines
        return ((num - num % den) / den).cast("bigint")

    def step(acc, eid):
        explore = _h8(F.concat(F.lit("c"), eid)) % 10 < 2
        arm_x = _h8(F.concat(F.lit("a"), eid)) % 3
        scores = F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda a: F.struct(
                (
                    -F.when(
                        F.element_at(acc["cnt"], (a + 1).cast("int")) == 0,
                        F.lit(1000000000000000).cast("bigint") - a,
                    ).otherwise(
                        _floordiv(
                            F.element_at(acc["sm"], (a + 1).cast("int"))
                            * 1000,
                            F.element_at(acc["cnt"], (a + 1).cast("int")),
                        )
                    )
                ).alias("ns"),
                a.cast("bigint").alias("a"),
            ),
        )
        arm_g = F.element_at(F.array_sort(scores), 1)["a"]
        arm = F.when(explore, arm_x).otherwise(arm_g)
        rw = (
            _h8(F.concat(F.lit("r"), arm.cast("string"), F.lit("_"), eid))
            % 100
        )
        return F.struct(
            F.transform(
                acc["cnt"],
                lambda x, i: x + F.when(i.cast("bigint") == arm, 1).otherwise(0),
            ).alias("cnt"),
            F.transform(
                acc["sm"],
                lambda x, i: x
                + F.when(i.cast("bigint") == arm, rw).otherwise(0),
            ).alias("sm"),
            (acc["tot"] + rw).alias("tot"),
        )

    folded = packed.select(
        "user_id",
        "n",
        F.aggregate("eids", acc0, step).alias("m"),
    )
    return folded.select(
        "user_id",
        "n",
        F.col("m.tot").alias("total_reward"),
        F.array_join(F.col("m.cnt"), "/").alias("pulls_state"),
        F.array_join(F.col("m.sm"), "/").alias("rewards_state"),
    )


# =========================================================================
# cov1: greedy set cover (coverage-driven data selection)
# =========================================================================

_COV1_SQL = """
WITH RECURSIVE doc_terms AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(TRIM(text), '\\s+'),
                                   t -> LENGTH(t) > 0)) AS terms
  FROM documents
), df AS (
  SELECT u.term, CAST(COUNT(*) AS BIGINT) AS df
  FROM doc_terms, unnest(doc_terms.terms) AS u(term)
  GROUP BY 1
), univ AS (
  SELECT term FROM (
    SELECT term, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rk FROM df
  ) WHERE rk <= 50
), univ_arr AS (
  SELECT list(term ORDER BY term) AS u FROM univ
), cands AS (
  SELECT list({'d': d.doc_id,
               't': list_sort(list_intersect(d.terms, ua.u))}
              ORDER BY d.doc_id) AS cs
  FROM doc_terms d CROSS JOIN univ_arr ua
  WHERE d.doc_id % 11 = 0
), r AS (
  SELECT CAST(0 AS BIGINT) AS rd, CAST([] AS VARCHAR[]) AS cov,
         CAST([] AS STRUCT(rd BIGINT, d BIGINT, g BIGINT, ca BIGINT)[]) AS tr,
         cs
  FROM cands
  UNION ALL
  SELECT rd + 1,
         list_sort(list_distinct(cov || best.t)),
         list_append(tr, {'rd': rd + 1, 'd': best.d,
                          'g': CAST(len(list_filter(best.t,
                                    x -> NOT list_contains(cov, x)))
                                    AS BIGINT),
                          'ca': CAST(len(list_distinct(cov || best.t))
                                     AS BIGINT)}),
         cs
  FROM (
    SELECT *,
           list_sort(list_transform(cs, c ->
             {'ng': -CAST(len(list_filter(c.t,
                          x -> NOT list_contains(cov, x))) AS BIGINT),
              'd': c.d,
              't': c.t}))[1] AS best
    FROM r WHERE rd < 5
  )
), final AS (
  SELECT tr, ROW_NUMBER() OVER (ORDER BY rd DESC) AS rn FROM r
)
SELECT CAST(u.e.rd AS BIGINT) AS round,
       CAST(u.e.d AS BIGINT) AS picked_doc,
       CAST(u.e.g AS BIGINT) AS gain,
       CAST(u.e.ca AS BIGINT) AS covered_after
FROM final, unnest(final.tr) AS u(e)
WHERE rn = 1
"""


@_register("cov1_greedy_set_cover", _COV1_SQL)
def cov1_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy set cover for coverage-driven data selection: pick 5
    documents (candidate slice doc_id % 11 = 0) that maximize marginal
    coverage of the top-50-document-frequency term universe — the
    (1 - 1/e)-approximate loop behind 'which docs do I add to cover the
    eval vocabulary'. Each round takes the argmax of |terms \\ covered|
    (tiebreak min doc_id; 0-gain picks allowed once coverage
    saturates), emitting the full pick trajectory (round, doc, gain,
    covered-count). The candidate set folds into ONE cell (bounded by
    the slice — a few thousand structs at sf1); for unbounded
    candidates each round becomes one relational argmax aggregate, same
    semantics, noted for the 100 TB path. Universe and tokenizer are
    identical on both engines (whitespace split, df-desc/term-asc
    top-50)."""
    from .operators.text import tokens

    d = _t(spark, sf_dir, "documents")
    doc_terms = d.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("terms")
    )
    df = doc_terms.select(F.explode("terms").alias("term")).groupBy(
        "term"
    ).agg(F.count(F.lit(1)).alias("df"))
    rk = Window.orderBy(F.col("df").desc(), "term")
    univ = (
        df.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= 50)
        .agg(F.array_sort(F.collect_list("term")).alias("u"))
    )
    cands = (
        doc_terms.where(F.col("doc_id") % 11 == 0)
        .crossJoin(F.broadcast(univ))
        .select(
            F.struct(
                F.col("doc_id").alias("d"),
                F.array_sort(F.array_intersect("terms", "u")).alias("t"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cs"))
    )
    acc0 = F.expr(
        "named_struct("
        "'cov', CAST(array() AS ARRAY<STRING>),"
        "'tr', CAST(array() AS ARRAY<STRUCT<rd: BIGINT, d: BIGINT,"
        " g: BIGINT, ca: BIGINT>>))"
    )

    def step(acc, rd):
        cov = acc["cov"]
        scored = F.transform(
            F.col("cs"),
            lambda c: F.struct(
                (-F.size(F.array_except(c["t"], cov)).cast("bigint")).alias(
                    "ng"
                ),
                c["d"].alias("d"),
                c["t"].alias("t"),
            ),
        )
        best = F.element_at(F.array_sort(scored), 1)
        new_cov = F.array_sort(F.array_union(cov, best["t"]))
        return F.struct(
            new_cov.alias("cov"),
            F.concat(
                acc["tr"],
                F.array(
                    F.struct(
                        rd.cast("bigint").alias("rd"),
                        best["d"].alias("d"),
                        (-best["ng"]).alias("g"),
                        F.size(new_cov).cast("bigint").alias("ca"),
                    )
                ),
            ).alias("tr"),
        )

    folded = cands.select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(5)), acc0, step
        )["tr"].alias("tr")
    )
    ex = folded.select(F.explode("tr").alias("e"))
    return ex.select(
        F.col("e.rd").alias("round"),
        F.col("e.d").alias("picked_doc"),
        F.col("e.g").alias("gain"),
        F.col("e.ca").alias("covered_after"),
    )
