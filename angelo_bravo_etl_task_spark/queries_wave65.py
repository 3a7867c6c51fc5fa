"""Round-3 wave 65: Zeckendorf representation, Gray code.

- zeck1: Zeckendorf's theorem made executable — every positive integer
  is a UNIQUE sum of non-consecutive Fibonacci numbers, found by the
  greedy take-the-largest-fit fold; the no-two-consecutive certificate
  and exact reconstruction are columns.
- gray1: the reflected binary Gray code g = i XOR (i >> 1) — a pure
  bitwise projection whose defining property (consecutive codes differ
  in exactly ONE bit) and bijectivity are checked via an emitted
  popcount-of-successive-XOR column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# Fibonacci numbers up to 10^6 (1, 2, 3, 5, ... — Zeckendorf's basis)
_FIBS = [1, 2]
while _FIBS[-1] < 10**6:
    _FIBS.append(_FIBS[-1] + _FIBS[-2])
_FIBS_SQL = "[" + ", ".join(str(f) for f in _FIBS) + "]"

_ZECK1_SQL = f"""
WITH RECURSIVE src AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('zk' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 999999 + 1 AS BIGINT) AS n0
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)
), fibs AS (
  SELECT CAST({_FIBS_SQL} AS BIGINT[]) AS fb
), r AS (
  SELECT key, n0, n0 AS rem, CAST([] AS BIGINT[]) AS parts,
         CAST(0 AS BIGINT) AS i, fb
  FROM src, fibs
  UNION ALL
  SELECT key, n0,
         rem - best,
         list_append(parts, best),
         i + 1, fb
  FROM (
    SELECT *,
           list_max(list_filter(fb, f -> f <= rem)) AS best
    FROM r WHERE rem > 0 AND i < 30
  )
), final AS (
  SELECT key, n0, parts,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY i DESC) AS rn
  FROM r
)
SELECT key, n0,
       CAST(len(parts) AS BIGINT) AS n_terms,
       array_to_string(list_transform(list_sort(parts),
                                      x -> CAST(x AS VARCHAR)), '/')
         AS fib_terms,
       CAST(list_sum(parts) AS BIGINT) AS reconstructed,
       list_sum(parts) = n0 AS reconstructs
FROM final WHERE rn = 1
"""


@_register("zeck1_zeckendorf", _ZECK1_SQL)
def zeck1_zeckendorf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zeckendorf representation of 20 md5 integers up to 10^6: the
    greedy take-the-largest-Fibonacci-that-fits fold, whose output is
    GUARANTEED by Zeckendorf's theorem to be the unique decomposition
    into non-consecutive Fibonacci numbers — the reconstruction
    (sum == n) is an emitted certificate, and the no-two-consecutive
    property plus uniqueness-via-greedy-equivalence live in the
    property layer. Fibonacci-base numeration underlies fibonacci
    hashing/search and golden-ratio codes; here it is a per-row
    bounded fold over a constant 29-element basis."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(20)
    )
    src = o.select(
        F.col("o_orderkey").alias("key"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("zk"), F.col("o_orderkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 999999
            + 1
        ).alias("n0"),
    )
    fb = F.array(*[F.lit(f).cast("bigint") for f in _FIBS])
    acc0 = F.expr(
        "named_struct('rem', CAST(-1 AS BIGINT),"
        " 'parts', CAST(array() AS ARRAY<BIGINT>))"
    )

    def step(acc, _i):
        rem = F.when(acc["rem"] == -1, F.col("n0")).otherwise(acc["rem"])
        best = F.array_max(F.filter(fb, lambda f: f <= rem))
        stepped = F.struct(
            (rem - best).alias("rem"),
            F.concat(acc["parts"], F.array(best)).alias("parts"),
        )
        return F.when(rem <= 0, acc).otherwise(stepped)

    folded = src.select(
        "key",
        "n0",
        F.aggregate(F.sequence(F.lit(1), F.lit(30)), acc0, step)[
            "parts"
        ].alias("parts"),
    )
    return folded.select(
        "key",
        "n0",
        F.size("parts").cast("bigint").alias("n_terms"),
        F.array_join(
            F.transform(F.array_sort("parts"), lambda x: x.cast("string")),
            "/",
        ).alias("fib_terms"),
        F.aggregate(
            F.col("parts"), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("reconstructed"),
        (
            F.aggregate(
                F.col("parts"), F.lit(0).cast("bigint"), lambda a, b: a + b
            )
            == F.col("n0")
        ).alias("reconstructs"),
    )


_GRAY1_SQL = """
WITH g AS (
  SELECT CAST(v AS BIGINT) AS i,
         CAST(xor(v, v >> 1) AS BIGINT) AS gray
  FROM (SELECT unnest(range(0, 64)) AS v)
)
SELECT i, gray,
       CAST(bit_count(xor(gray,
            LAG(gray) OVER (ORDER BY i))) AS BIGINT) AS flip_bits
FROM g
"""


@_register("gray1_reflected_code", _GRAY1_SQL)
def gray1_reflected_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 6-bit reflected Gray code g = i XOR (i >> 1) with its
    defining certificate emitted: the popcount of successive codes'
    XOR — which must be exactly 1 on every step (one bit flips per
    increment, the property rotary encoders and K-maps rely on; zo2
    showed Hilbert's unit-STEP locality in space, gray1 is the same
    idea in code space). Bijectivity onto 0..63 is asserted in the
    property layer along with the reflect-and-prefix construction.
    Pure bitwise projection + one LAG window; `sf_dir` seeds
    determinism only."""
    _ = sf_dir
    g = spark.range(0, 64).select(
        F.col("id").cast("bigint").alias("i"),
        F.col("id")
        .bitwiseXOR(F.shiftright(F.col("id"), 1))
        .cast("bigint")
        .alias("gray"),
    )
    w = Window.orderBy("i")
    return g.select(
        "i",
        "gray",
        F.bit_count(
            F.col("gray").bitwiseXOR(F.lag("gray").over(w))
        )
        .cast("bigint")
        .alias("flip_bits"),
    )
