"""Round-3 wave 59: number-theory kernels.

- modpow1: modular exponentiation by square-and-multiply — the
  folding-over-bits kernel under every token-bucketing/fingerprint
  scheme that needs a^b mod m without bignum blowup.
- sieve1: primality as a RELATION — a number is prime iff no spine
  divisor d with 2 <= d*d <= n divides it: primes to 200 via one
  anti-join-shaped aggregate, with prime gaps as the readout.
- gcd1: Euclid's algorithm as a bounded fold (the mod chain), with
  Bezout-free certificates: gcd divides both inputs and no spine
  value above it does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# modpow1: square-and-multiply modular exponentiation
# =========================================================================

_MODPOW1_SQL = """
WITH RECURSIVE src AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('ba' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 99999 + 2 AS BIGINT) AS a,
         CAST(CAST('0x' || substr(md5('ex' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 1000 + 1 AS BIGINT) AS b,
         CAST(999983 AS BIGINT) AS m
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)
), r AS (
  SELECT key, a, b, m, CAST(0 AS BIGINT) AS i,
         a % m AS base, CAST(1 AS BIGINT) AS acc, b AS e
  FROM src
  UNION ALL
  SELECT key, a, b, m, i + 1,
         (base * base) % m,
         CASE WHEN e % 2 = 1 THEN (acc * base) % m ELSE acc END,
         e // 2
  FROM r WHERE e > 0 AND i < 10
), final AS (
  SELECT key, a, b, m, acc,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY i DESC) AS rn
  FROM r
)
SELECT key, a, b, m, acc AS a_pow_b_mod_m
FROM final WHERE rn = 1
"""


@_register("modpow1_square_multiply", _MODPOW1_SQL)
def modpow1_square_multiply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modular exponentiation a^b mod 999983 (a prime modulus) by
    square-and-multiply: fold over the exponent's bits — square the
    base each step, multiply it in when the low bit is set, halve the
    exponent — 10 bounded steps for b <= 1000, every intermediate
    < m^2 < 10^12 so BIGINT never overflows. This is the kernel under
    rolling-hash fingerprints, Rabin-Karp, and modular bucketing
    schemes; pow(a, b, m) in the property layer certifies every row.
    Per-row bounded fold — embarrassingly parallel, no state beyond
    (base, acc, e)."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(20)
    )

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("o_orderkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    src = o.select(
        F.col("o_orderkey").alias("key"),
        (_h8("ba") % 99999 + 2).alias("a"),
        (_h8("ex") % 1000 + 1).alias("b"),
        F.lit(999983).cast("bigint").alias("m"),
    )
    acc0 = F.expr(
        "named_struct('base', CAST(0 AS BIGINT), 'acc', CAST(1 AS BIGINT),"
        " 'e', CAST(-1 AS BIGINT))"
    )

    def step(acc, _i):
        base = F.when(acc["e"] == -1, F.col("a") % F.col("m")).otherwise(
            acc["base"]
        )
        e = F.when(acc["e"] == -1, F.col("b")).otherwise(acc["e"])
        done = e <= 0
        new_acc = F.when(
            e % 2 == 1, (acc["acc"] * base) % F.col("m")
        ).otherwise(acc["acc"])
        stepped = F.struct(
            ((base * base) % F.col("m")).alias("base"),
            new_acc.alias("acc"),
            ((e - e % 2) / 2).cast("bigint").alias("e"),
        )
        return F.when(done, acc).otherwise(stepped)

    folded = src.select(
        "key",
        "a",
        "b",
        "m",
        F.aggregate(F.sequence(F.lit(1), F.lit(11)), acc0, step)["acc"].alias(
            "a_pow_b_mod_m"
        ),
    )
    return folded


# =========================================================================
# sieve1: primality as a relation (divisor anti-join)
# =========================================================================

_SIEVE1_SQL = """
WITH n AS (
  SELECT unnest(range(2, 201)) AS v
), primes AS (
  SELECT v FROM n
  WHERE NOT EXISTS (
    SELECT 1 FROM n d WHERE d.v * d.v <= n.v AND n.v % d.v = 0 AND d.v >= 2
  )
)
SELECT CAST(v AS BIGINT) AS prime,
       CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS idx,
       CAST(v - LAG(v) OVER (ORDER BY v) AS BIGINT) AS gap
FROM primes
"""


@_register("sieve1_relational_primes", _SIEVE1_SQL)
def sieve1_relational_primes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primality as a RELATION: n in [2, 200] is prime iff no divisor
    d with d*d <= n divides it — one anti-join-shaped NOT EXISTS over
    the same spine, no sieve state at all (the declarative dual of
    Eratosthenes), plus the prime index and the gap to the previous
    prime (the readout number theorists chart). The property layer
    checks against a Python trial-division sieve and pins the classics:
    46 primes below 200, the only even prime is 2, and twin pairs
    (gap 2) exist. `sf_dir` only seeds determinism — the spine is
    generated (f23/ca1/zo2 pattern); the point is the anti-join shape,
    the same plan as every 'rows with no disqualifying witness'
    compliance query."""
    _ = sf_dir
    n = spark.range(2, 201).select(F.col("id").alias("v"))
    d = spark.range(2, 15).select(F.col("id").alias("dv"))
    composite = (
        n.join(
            F.broadcast(d),
            (F.col("dv") * F.col("dv") <= F.col("v"))
            & (F.col("v") % F.col("dv") == 0),
        )
        .select("v")
        .distinct()
    )
    primes = n.join(composite, "v", "left_anti")
    w = Window.orderBy("v")
    return primes.select(
        F.col("v").cast("bigint").alias("prime"),
        F.row_number().over(w).cast("bigint").alias("idx"),
        (F.col("v") - F.lag("v").over(w)).cast("bigint").alias("gap"),
    )


# =========================================================================
# gcd1: Euclid's algorithm as a bounded fold
# =========================================================================

_GCD1_SQL = """
WITH RECURSIVE src AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('g1' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 1000000 + 1 AS BIGINT) AS x,
         CAST(CAST('0x' || substr(md5('g2' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 1000000 + 1 AS BIGINT) AS y
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)
), r AS (
  SELECT key, x, y, CAST(0 AS BIGINT) AS i, x AS a, y AS b
  FROM src
  UNION ALL
  SELECT key, x, y, i + 1, b, a % b
  FROM r WHERE b > 0 AND i < 45
), final AS (
  SELECT key, x, y, a,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY i DESC) AS rn
  FROM r
)
SELECT key, x, y, a AS gcd,
       x % a = 0 AND y % a = 0 AS divides_both,
       CAST((x // a) * (y // a) * a AS BIGINT) AS lcm
FROM final WHERE rn = 1
"""


@_register("gcd1_euclid", _GCD1_SQL)
def gcd1_euclid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclid's algorithm on 20 md5 pairs up to 10^6: the mod chain
    (a, b) -> (b, a mod b) folded to fixation — 45 steps bounds the
    worst case (consecutive Fibonacci numbers need ~log_phi(10^6) ~ 29)
    — emitting the gcd, the divides-both certificate as a column, and
    the lcm recovered exactly as (x/g)*(y/g)*g (ordered to stay inside
    BIGINT). The property layer certifies against math.gcd and checks
    maximality: no integer above the reported gcd divides both. The
    last member of the number-theory kernel shelf (nm1 isqrt, iban1
    mod-97, modpow1, sieve1)."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(20)
    )

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("o_orderkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    src = o.select(
        F.col("o_orderkey").alias("key"),
        (_h8("g1") % 1000000 + 1).alias("x"),
        (_h8("g2") % 1000000 + 1).alias("y"),
    )
    acc0 = F.expr(
        "named_struct('a', CAST(-1 AS BIGINT), 'b', CAST(-1 AS BIGINT))"
    )

    def step(acc, _i):
        a = F.when(acc["a"] == -1, F.col("x")).otherwise(acc["a"])
        b = F.when(acc["b"] == -1, F.col("y")).otherwise(acc["b"])
        stepped = F.struct(b.alias("a"), (a % b).alias("b"))
        return F.when(b <= 0, F.struct(a.alias("a"), b.alias("b"))).otherwise(
            stepped
        )

    folded = src.select(
        "key",
        "x",
        "y",
        F.aggregate(F.sequence(F.lit(1), F.lit(46)), acc0, step)["a"].alias(
            "g"
        ),
    )
    return folded.select(
        "key",
        "x",
        "y",
        F.col("g").alias("gcd"),
        ((F.col("x") % F.col("g") == 0) & (F.col("y") % F.col("g") == 0)).alias(
            "divides_both"
        ),
        (
            (F.col("x") / F.col("g")).cast("bigint")
            * (F.col("y") / F.col("g")).cast("bigint")
            * F.col("g")
        )
        .cast("bigint")
        .alias("lcm"),
    )
