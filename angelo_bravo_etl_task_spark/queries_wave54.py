"""Round-3 wave 54: Kahn topological ordering, mod-97 big-number check.

- topo1: Kahn's algorithm over cpm1's bucketed layered DAG — the
  deterministic lowest-id-first topological order (the tie-broken
  schedule a build system or DAG runner actually emits), one node per
  state-machine step with the in-degree test recomputed against the
  remaining set.
- iban1: IBAN-style mod-97 validation of 24-digit account strings —
  the big-number-mod-small-modulus trick (fold digit by digit,
  r = (r*10 + d) % 97) that validates numbers far beyond BIGINT, with
  planted corruptions so both verdict branches fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# topo1: Kahn's algorithm (lowest-id-first topological order)
# =========================================================================

_TOPO1_SQL = """
WITH RECURSIVE nodes AS (
  SELECT s_suppkey AS id, s_suppkey % 4 AS layer, s_suppkey // 16 AS bkt
  FROM supplier WHERE s_suppkey // 16 < 3
), edges AS (
  SELECT u.id AS src, v.id AS dst
  FROM nodes u JOIN nodes v
    ON u.bkt = v.bkt AND v.layer = u.layer + 1
  WHERE CAST('0x' || substr(md5('e' || CAST(u.id AS VARCHAR) || '_'
              || CAST(v.id AS VARCHAR)), 1, 8) AS BIGINT) % 3 < 2
), packed AS (
  SELECT (SELECT list(id ORDER BY id) FROM nodes) AS ns,
         (SELECT coalesce(list({'s': src, 'd': dst} ORDER BY src, dst),
                          CAST([] AS STRUCT(s BIGINT, d BIGINT)[]))
          FROM edges) AS es
), r AS (
  SELECT CAST(0 AS BIGINT) AS step, ns AS remaining,
         CAST([] AS BIGINT[]) AS ord, es
  FROM packed
  UNION ALL
  SELECT step + 1,
         list_filter(remaining, x -> x <> nxt),
         list_append(ord, nxt),
         es
  FROM (
    SELECT *,
           list_min(list_filter(remaining, nd ->
             len(list_filter(es, e -> e.d = nd
                 AND list_contains(remaining, e.s))) = 0)) AS nxt
    FROM r WHERE len(remaining) > 0
  )
), final AS (
  SELECT ord, es, ROW_NUMBER() OVER (ORDER BY step DESC) AS rn FROM r
)
SELECT CAST(list_position(f.ord, u.nd) AS BIGINT) AS position,
       CAST(u.nd AS BIGINT) AS node
FROM final f, unnest(f.ord) AS u(nd)
WHERE f.rn = 1
"""


@_register("topo1_kahn_order", _TOPO1_SQL)
def topo1_kahn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kahn's topological sort over cpm1's layered DAG restricted to
    the first 3 locality buckets (<=48 tasks): each step removes the
    LOWEST-ID node whose every predecessor is already emitted — the
    deterministic schedule a DAG runner (or this engine's own stage
    planner) would execute, with the in-degree test recomputed against
    the remaining set so rule and state can't drift apart. Emits
    (position, node); the property layer replays Kahn in Python,
    checks the order is a permutation of the nodes, and certifies
    topological validity edge by edge (every src before its dst) —
    the certificate that matters regardless of tiebreak. Layered
    construction guarantees acyclicity, so the machine always drains."""
    s = _t(spark, sf_dir, "supplier").where(
        F.expr("s_suppkey div 16") < 3
    )
    nodes = s.select(
        F.col("s_suppkey").alias("id"),
        (F.col("s_suppkey") % 4).alias("layer"),
        F.expr("s_suppkey div 16").alias("bkt"),
    )
    u = nodes.alias("u")
    v = nodes.alias("v")
    edges = (
        u.join(
            v,
            (F.col("u.bkt") == F.col("v.bkt"))
            & (F.col("v.layer") == F.col("u.layer") + 1),
        )
        .where(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("e"),
                            F.col("u.id").cast("string"),
                            F.lit("_"),
                            F.col("v.id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 3
            < 2
        )
        .select(F.col("u.id").alias("s"), F.col("v.id").alias("d"))
    )
    packed = nodes.agg(
        F.array_sort(F.collect_list("id")).alias("ns")
    ).crossJoin(
        edges.agg(
            F.array_sort(F.collect_list(F.struct("s", "d"))).alias("es")
        )
    )
    acc0 = F.expr(
        "named_struct('remaining', CAST(array() AS ARRAY<BIGINT>),"
        " 'ord', CAST(array() AS ARRAY<BIGINT>))"
    )

    def step(acc, st_no):
        remaining = F.when(st_no == 1, F.col("ns")).otherwise(
            acc["remaining"]
        )
        ready = F.filter(
            remaining,
            lambda nd: ~F.exists(
                F.col("es"),
                lambda e: (e["d"] == nd)
                & F.array_contains(remaining, e["s"]),
            ),
        )
        nxt = F.array_min(ready)
        stepped = F.struct(
            F.filter(remaining, lambda x: x != nxt).alias("remaining"),
            F.concat(acc["ord"], F.array(nxt)).alias("ord"),
        )
        return F.when(nxt.isNull(), acc).otherwise(stepped)

    folded = packed.select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(48)),
            acc0,
            step,
        )["ord"].alias("ord")
    )
    ex = folded.select(F.posexplode("ord").alias("pos", "node"))
    return ex.select(
        (F.col("pos") + 1).cast("bigint").alias("position"),
        F.col("node").cast("bigint").alias("node"),
    )


# =========================================================================
# iban1: mod-97 big-number checksum validation
# =========================================================================

_IBAN1_SQL = """
WITH RECURSIVE acct AS (
  SELECT c_custkey AS key,
         substr(md5('ac' || CAST(c_custkey AS VARCHAR)), 1, 22) AS hx,
         c_custkey % 9 = 0 AS tampered
  FROM (SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 40)
), digits AS (
  -- 24-digit account string: per hex char take value % 10, then the
  -- 2 check digits that make the whole number = 1 mod 97 appended by
  -- the issuer; tampering flips one digit
  SELECT key, tampered,
         list_transform(range(1, 23), i ->
           CAST('0x' || substr(hx, CAST(i AS INTEGER), 1) AS BIGINT) % 10)
           AS body
  FROM acct
), r AS (
  SELECT key, tampered, body, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS rem
  FROM digits
  UNION ALL
  SELECT key, tampered, body, i + 1, (rem * 10 + body[i + 1]) % 97
  FROM r WHERE i < 22
), base AS (
  SELECT key, tampered, body, rem,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY i DESC) AS rn
  FROM r
), issued AS (
  -- issuer appends check digits cd so that (rem*100 + cd) % 97 = 1
  SELECT key, tampered, body,
         CAST((1 - (rem * 100) % 97 + 97) % 97 AS BIGINT) AS cd
  FROM base WHERE rn = 1
), wire AS (
  SELECT key, tampered,
         CASE WHEN tampered
              THEN list_transform(body, x -> (x + 1) % 10)
              ELSE body END AS body,
         cd
  FROM issued
), v AS (
  SELECT key, tampered, body, cd,
         CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS rem
  FROM wire
  UNION ALL
  SELECT key, tampered, body, cd, i + 1, (rem * 10 + body[i + 1]) % 97
  FROM v WHERE i < 22
), vfinal AS (
  SELECT key, tampered, cd, rem,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY i DESC) AS rn
  FROM v
)
SELECT key, tampered, cd AS check_digits,
       CAST((rem * 100 + cd) % 97 AS BIGINT) AS residue,
       (rem * 100 + cd) % 97 = 1 AS valid
FROM vfinal WHERE rn = 1
"""


@_register("iban1_mod97_check", _IBAN1_SQL)
def iban1_mod97_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBAN-style mod-97 validation of 22-digit md5 account bodies plus
    2 issuer check digits: the check digits are chosen so the full
    number is ≡ 1 (mod 97), and the validator recomputes the residue by
    the big-number trick — fold digit by digit with r = (r*10 + d) % 97
    — because the 24-digit number itself overflows BIGINT. The
    custkey % 9 slice is tampered in transit (every digit bumped mod
    10), so BOTH verdict branches fire at every SF (the planted-
    violation rule); valid must be TRUE exactly off the tampered slice,
    asserted with a Python big-int replay ((int(digits) % 97 == 1) —
    the fold and true big-number arithmetic must agree). luhn1 pinned
    the card checksum; iban1 adds the modular-arithmetic validator
    whose state is one remainder."""
    c = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(40)
    )
    acct = c.select(
        F.col("c_custkey").alias("key"),
        F.substring(
            F.md5(F.concat(F.lit("ac"), F.col("c_custkey").cast("string"))),
            1,
            22,
        ).alias("hx"),
        (F.col("c_custkey") % 9 == 0).alias("tampered"),
    )
    digits = acct.select(
        "key",
        "tampered",
        F.transform(
            F.sequence(F.lit(1), F.lit(22)),
            lambda i: F.conv(
                F.col("hx").substr(i.cast("int"), F.lit(1)), 16, 10
            ).cast("bigint")
            % 10,
        ).alias("body"),
    )

    def mod97(body):
        return F.aggregate(
            body,
            F.lit(0).cast("bigint"),
            lambda rem, d: (rem * 10 + d) % 97,
        )

    issued = digits.select(
        "key",
        "tampered",
        "body",
        (((1 - (mod97(F.col("body")) * 100) % 97) + 97) % 97)
        .cast("bigint")
        .alias("cd"),
    )
    wire = issued.select(
        "key",
        "tampered",
        F.when(
            F.col("tampered"),
            F.transform(F.col("body"), lambda x: (x + 1) % 10),
        )
        .otherwise(F.col("body"))
        .alias("body"),
        "cd",
    )
    return wire.select(
        "key",
        "tampered",
        F.col("cd").alias("check_digits"),
        ((mod97(F.col("body")) * 100 + F.col("cd")) % 97)
        .cast("bigint")
        .alias("residue"),
        ((mod97(F.col("body")) * 100 + F.col("cd")) % 97 == 1).alias("valid"),
    )
