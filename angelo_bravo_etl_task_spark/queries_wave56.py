"""Round-3 wave 56: sortable IDs, deterministic Monte Carlo.

- ulid1: ULID-style sortable identifiers — 10 Crockford-base32 chars
  of millisecond time plus 16 md5-derived chars — with the property
  that makes them THE id design for event logs: lexicographic order
  equals chronological order (asserted, plus bit-exact replay).
- mcpi1: Monte Carlo estimation of pi by the quarter-circle test over
  md5-derived points — every count an exact integer (x^2 + y^2 <= R^2
  in BIGINT), so the classic randomized estimator becomes a
  deterministic, oracle-checkable query; doubles as a uniformity test
  of the md5-indexing discipline the whole registry leans on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_B32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

# =========================================================================
# ulid1: sortable time-ordered identifiers
# =========================================================================

_ULID1_SQL = f"""
WITH src AS (
  SELECT event_id, epoch_ms(ts) AS ms,
         md5('ul' || CAST(event_id AS VARCHAR)) AS hx
  FROM (SELECT event_id, ts FROM events ORDER BY event_id LIMIT 100)
), built AS (
  SELECT event_id, CAST(ms AS BIGINT) AS ms,
         array_to_string(list_transform(range(0, 10), i ->
           substr('{_B32}',
                  CAST((ms >> (45 - 5 * i)) & 31 AS INTEGER) + 1, 1)), '')
         || array_to_string(list_transform(range(0, 16), i ->
           substr('{_B32}',
                  CAST(CAST('0x' || substr(hx, CAST(2 * i + 1 AS INTEGER), 2)
                       AS BIGINT) % 32 AS INTEGER) + 1, 1)), '')
           AS ulid
  FROM src
)
SELECT event_id, ms, ulid FROM built
"""


@_register("ulid1_sortable_ids", _ULID1_SQL)
def ulid1_sortable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ULID-style sortable identifiers for the first 100 events: 10
    Crockford-base32 characters encode the 48-bit millisecond
    timestamp (5-bit groups, high bits first — the part that makes
    string order equal time order), followed by 16 md5-derived
    characters (deterministic stand-in for the random tail;
    hex-pair % 32 per char, documented as ULID-LIKE rather than
    spec-bit-exact). This is the id design that lets an event log be
    range-scanned by time with no timestamp column — the property
    layer sorts by the string and asserts millisecond order never
    decreases, replays the encoding bit-for-bit in Python, and checks
    the alphabet excludes the ambiguous I/L/O/U. Pure codegen
    projection — no shuffle, no state."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts")
        .orderBy("event_id")
        .limit(100)
    )
    src = ev.select(
        "event_id",
        # integer DIV: micros exceed 2^53, double division would round
        F.expr("unix_micros(ts) div 1000").cast("bigint").alias("ms"),
        F.md5(F.concat(F.lit("ul"), F.col("event_id").cast("string"))).alias(
            "hx"
        ),
    )
    alphabet = F.lit(_B32)
    # shiftright needs a PYTHON int count (gotcha) — inside the lambda
    # the level is a Column, so divide by a precomputed power instead
    powers = F.array(
        *[F.lit(2 ** (45 - 5 * k)).cast("bigint") for k in range(10)]
    )
    time_part = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: alphabet.substr(
                (
                    (
                        (
                            F.col("ms")
                            - F.col("ms") % F.element_at(powers, (i + 1).cast("int"))
                        )
                        / F.element_at(powers, (i + 1).cast("int"))
                    ).cast("bigint")
                    % 32
                    + 1
                ).cast("int"),
                F.lit(1),
            ),
        ),
        "",
    )
    rand_part = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: alphabet.substr(
                (
                    F.conv(
                        F.col("hx").substr((2 * i + 1).cast("int"), F.lit(2)),
                        16,
                        10,
                    ).cast("bigint")
                    % 32
                    + 1
                ).cast("int"),
                F.lit(1),
            ),
        ),
        "",
    )
    return src.select(
        "event_id", "ms", F.concat(time_part, rand_part).alias("ulid")
    )


# =========================================================================
# mcpi1: deterministic Monte Carlo pi (quarter-circle test)
# =========================================================================

_MCPI1_SQL = """
WITH pts AS (
  SELECT CAST('0x' || substr(md5('px' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000000 AS x,
         CAST('0x' || substr(md5('py' || CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000000 AS y
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN x * x + y * y <= 1000000000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS in_circle,
       CAST(4 * SUM(CASE WHEN x * x + y * y <= 1000000000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS pi_num,
       CAST(COUNT(*) AS BIGINT) AS pi_den
FROM pts
"""


@_register("mcpi1_monte_carlo_pi", _MCPI1_SQL)
def mcpi1_monte_carlo_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte Carlo pi with the randomness made deterministic: every
    event contributes an md5-derived point in the 10^6 square, counted
    inside the quarter circle by the exact BIGINT test
    x^2 + y^2 <= 10^12, and the estimate is emitted as the exact
    rational (4*in, n). Beyond the classic demo this is a UNIFORMITY
    AUDIT of the md5-indexing discipline the whole registry leans on
    for sampling/splits/coins: if md5-derived coordinates were biased,
    the ratio would drift off pi — the property layer asserts the
    estimate lands within 3 binomial sigma (5/sqrt(n)) at every SF
    (and exactly replays the counts in hashlib). One combinable aggregate over the scan; the
    oracle is the same two sums."""
    ev = _t(spark, sf_dir, "events")

    def _h8(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(prefix), F.col("event_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    pts = ev.select(
        (_h8("px") % 1000000).alias("x"), (_h8("py") % 1000000).alias("y")
    )
    inside = F.when(
        F.col("x") * F.col("x") + F.col("y") * F.col("y")
        <= F.lit(1000000000000),
        1,
    ).otherwise(0)
    return pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(inside).cast("bigint").alias("in_circle"),
        (4 * F.sum(inside)).cast("bigint").alias("pi_num"),
        F.count(F.lit(1)).cast("bigint").alias("pi_den"),
    )
