"""Round-3 wave 64: Fenwick tree, binomial row.

- fen1: a Fenwick (binary indexed) tree BUILT by the textbook
  low-bit update loop and QUERIED by the descend loop — with the
  oracle answering the same prefix sums as a plain window SUM: the
  index structure and the declarative form must agree (the mdq1/kad1
  device applied to a data structure rather than an algorithm).
- pas1: the n=30 binomial coefficient row by the exact multiplicative
  fold C(n,k) = C(n,k-1)*(n-k+1)/k (every division exact by
  construction), with row-sum = 2^30 and symmetry certificates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# fen1: Fenwick tree vs window prefix sums
# =========================================================================

_FEN1_SQL = """
WITH vals AS (
  SELECT CAST(v AS BIGINT) AS i,
         CAST(CAST('0x' || substr(md5('fw' || CAST(v AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS BIGINT) AS x
  FROM (SELECT unnest(range(1, 17)) AS v)
)
SELECT i AS query_idx,
       CAST(SUM(x) OVER (ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS prefix_sum
FROM vals
"""


@_register("fen1_fenwick_tree", _FEN1_SQL)
def fen1_fenwick_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Fenwick (binary indexed) tree over 16 md5 values, built and
    queried by the REAL bit-trick loops — build: for each value, add
    it at idx and climb idx += idx & (-idx); query: descend
    idx -= idx & (-idx) summing tree cells — while the ORACLE answers
    the identical 16 prefix sums with a plain window SUM. The index
    structure's every cell placement and every query descent must
    reproduce what the declarative frame computes for free — the
    two-paradigm device (mdq1, kad1, io1, cr1) applied to a DATA
    STRUCTURE. low-bit arithmetic uses idx & -idx via the bitwise
    surface (f17). The property layer also checks each tree cell
    equals the sum of the 2^r values it is defined to cover.
    `sf_dir` seeds determinism only (generated spine)."""
    _ = sf_dir
    vals = spark.range(1, 17).select(
        F.col("id").cast("bigint").alias("i"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("fw"), F.col("id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        ).alias("x"),
    )
    packed = vals.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "x"))),
            lambda s: s["x"],
        ).alias("xs")
    )
    # build: fold values into the 16-cell tree with the climb loop
    tree0 = F.expr("transform(sequence(1, 16), q -> CAST(0 AS BIGINT))")

    def build_step(tree, i):
        x = F.element_at(F.col("xs"), i.cast("int"))
        # climb: at most 5 hops in a 16-cell tree
        def climb(acc, _h):
            idx = acc["idx"]
            t = acc["t"]
            upd = F.transform(
                t,
                lambda c, ci: c
                + F.when((ci + 1).cast("bigint") == idx, x).otherwise(0),
            )
            nxt = idx + idx.bitwiseAND(-idx)
            return F.struct(
                F.when(idx <= 16, upd).otherwise(t).alias("t"),
                F.when(idx <= 16, nxt).otherwise(idx).alias("idx"),
            )

        out = F.aggregate(
            F.sequence(F.lit(1), F.lit(5)),
            F.struct(tree.alias("t"), i.cast("bigint").alias("idx")),
            climb,
        )
        return out["t"]

    built = packed.select(
        "xs",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(16)).cast("array<bigint>"),
            tree0,
            build_step,
        ).alias("tree"),
    )

    # query: descend loop per query index
    def query(tree, q):
        def descend(acc, _h):
            idx = acc["idx"]
            s = acc["s"]
            cell = F.when(
                idx > 0, F.element_at(tree, idx.cast("int"))
            ).otherwise(F.lit(0).cast("bigint"))
            return F.struct(
                (s + cell).alias("s"),
                F.when(idx > 0, idx - idx.bitwiseAND(-idx))
                .otherwise(idx)
                .alias("idx"),
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(5)),
            F.struct(
                F.lit(0).cast("bigint").alias("s"), q.alias("idx")
            ),
            descend,
        )["s"]

    queries = built.select(
        "tree",
        F.explode(
            F.sequence(F.lit(1), F.lit(16)).cast("array<bigint>")
        ).alias("query_idx"),
    )
    return queries.select(
        "query_idx",
        query(F.col("tree"), F.col("query_idx")).alias("prefix_sum"),
    )


# =========================================================================
# pas1: exact binomial row via the multiplicative fold
# =========================================================================

_PAS1_SQL = """
WITH RECURSIVE r AS (
  SELECT CAST(0 AS BIGINT) AS k, CAST(1 AS BIGINT) AS c
  UNION ALL
  SELECT k + 1, c * (30 - k) // (k + 1)
  FROM r WHERE k < 30
)
SELECT k, c AS binom_30_k,
       CAST(SUM(c) OVER () AS BIGINT) AS row_sum
FROM r
"""


@_register("pas1_binomial_row", _PAS1_SQL)
def pas1_binomial_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n=30 binomial row by the exact multiplicative recurrence
    C(30,k) = C(30,k-1) * (30-k+1) / k — the division is exact at
    every step BECAUSE the running value is a binomial coefficient
    (the classic overflow-free way to tabulate them; max value
    C(30,15) = 155117520 fits easily, intermediate products stay under
    5e9). Emits the full row plus its sum, which must be 2^30 — the
    subset-counting identity — with symmetry C(30,k) = C(30,30-k) and
    agreement with math.comb in the property layer. The number-theory
    shelf's combinatorial member; `sf_dir` seeds determinism only."""
    _ = sf_dir
    acc0 = F.expr(
        "named_struct('row', array(CAST(1 AS BIGINT)), 'c', CAST(1 AS BIGINT))"
    )

    def step(acc, k):
        c = (
            (acc["c"] * (31 - k) - (acc["c"] * (31 - k)) % k) / k
        ).cast("bigint")
        return F.struct(
            F.concat(acc["row"], F.array(c)).alias("row"), c.alias("c")
        )

    row = (
        spark.range(1)
        .select(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(30)).cast("array<bigint>"),
                acc0,
                step,
            )["row"].alias("row")
        )
        .select(F.posexplode("row").alias("k", "binom_30_k"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return row.select(
        F.col("k").cast("bigint").alias("k"),
        "binom_30_k",
        F.sum("binom_30_k").over(wall).cast("bigint").alias("row_sum"),
    )
