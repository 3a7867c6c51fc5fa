"""Round-3 wave 51: disk scheduling, Newton isqrt, PID autoscaler.

- io1: SCAN (elevator) vs FCFS disk scheduling over md5 cylinder
  requests — both service orders and both total seek distances from
  pure windows and aggregates (no fold at all: the elevator order is
  just a two-key sort), with SCAN's advantage visible per instance.
- nm1: integer square root by Newton's method — the exact fixed-point
  iteration (g' = (g + x div g) div 2, stop on non-decrease), every
  intermediate a BIGINT; the isqrt^2 <= x < (isqrt+1)^2 certificate is
  emitted as columns.
- pid1: a P+I feedback controller replayed over the hourly demand
  series — the autoscaler loop (error, integral, capacity update in
  integer arithmetic), the control-systems member of the
  sequential-fold family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _register, _t

# =========================================================================
# io1: SCAN (elevator) vs FCFS disk scheduling
# =========================================================================

_IO1_SQL = """
WITH req AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('cy' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) % 200 AS BIGINT) AS pos,
         CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS arrival
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)
), jumps AS (
  SELECT ABS(pos - COALESCE(LAG(pos) OVER (ORDER BY arrival), 100)) AS jump
  FROM req
), fcfs AS (
  SELECT SUM(jump) AS tot FROM jumps
), scan_ord AS (
  SELECT key, pos, arrival,
         CAST(ROW_NUMBER() OVER (
           ORDER BY CASE WHEN pos >= 100 THEN 0 ELSE 1 END,
                    CASE WHEN pos >= 100 THEN pos ELSE -pos END,
                    key) AS BIGINT) AS scan_order
  FROM req
), scan_tot AS (
  SELECT CASE WHEN MIN(pos) >= 100 THEN MAX(pos) - 100
              WHEN MAX(pos) < 100 THEN 100 - MIN(pos)
              ELSE (MAX(CASE WHEN pos >= 100 THEN pos END) - 100)
                   + (MAX(CASE WHEN pos >= 100 THEN pos END)
                      - MIN(CASE WHEN pos < 100 THEN pos END))
         END AS tot
  FROM req
)
SELECT s.key, s.pos, s.arrival AS fcfs_order, s.scan_order,
       CAST(f.tot AS BIGINT) AS fcfs_total,
       CAST(t.tot AS BIGINT) AS scan_total
FROM scan_ord s CROSS JOIN fcfs f CROSS JOIN scan_tot t
"""


@_register("io1_elevator_schedule", _IO1_SQL)
def io1_elevator_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCAN (elevator) vs FCFS disk-arm scheduling over 20 md5 cylinder
    requests (head at 100, sweeping up first): the elevator's service
    order needs NO fold — it is literally a two-key sort (side of the
    head, then position ascending above / descending below), and its
    total seek is a closed-form over min/max per side, while FCFS's
    total is one LAG window sum over arrival order. Emits every request
    with both service orders and both totals; the property layer
    replays both policies in Python and asserts the totals equal the
    sum of jumps along each emitted order — and that SCAN never loses
    to FCFS on this workload shape. The same sort-instead-of-simulate
    insight is how batched IO/compaction ordering is planned at scale."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(20)
    )
    req = o.select(
        F.col("o_orderkey").alias("key"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cy"), F.col("o_orderkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 200
        ).alias("pos"),
        F.row_number()
        .over(Window.orderBy("o_orderkey"))
        .cast("bigint")
        .alias("arrival"),
    )
    wf = Window.orderBy("arrival")
    fcfs = req.select(
        F.abs(
            F.col("pos") - F.coalesce(F.lag("pos").over(wf), F.lit(100))
        ).alias("jump")
    ).agg(F.sum("jump").alias("tot"))
    scan_ord = req.withColumn(
        "scan_order",
        F.row_number()
        .over(
            Window.orderBy(
                F.when(F.col("pos") >= 100, 0).otherwise(1),
                F.when(F.col("pos") >= 100, F.col("pos")).otherwise(
                    -F.col("pos")
                ),
                "key",
            )
        )
        .cast("bigint"),
    )
    up_max = F.max(F.when(F.col("pos") >= 100, F.col("pos")))
    dn_min = F.min(F.when(F.col("pos") < 100, F.col("pos")))
    scan_tot = req.agg(
        F.when(F.min("pos") >= 100, F.max("pos") - 100)
        .otherwise(
            F.when(F.max("pos") < 100, 100 - F.min("pos")).otherwise(
                (up_max - 100) + (up_max - dn_min)
            )
        )
        .alias("tot")
    )
    return (
        scan_ord.crossJoin(F.broadcast(fcfs.select(F.col("tot").cast("bigint").alias("fcfs_total"))))
        .crossJoin(
            F.broadcast(
                scan_tot.select(F.col("tot").cast("bigint").alias("scan_total"))
            )
        )
        .select(
            "key",
            "pos",
            F.col("arrival").alias("fcfs_order"),
            "scan_order",
            "fcfs_total",
            "scan_total",
        )
    )


# =========================================================================
# nm1: integer square root by Newton's method
# =========================================================================

_NM1_SQL = """
WITH RECURSIVE src AS (
  SELECT o_orderkey AS key,
         CAST(CAST('0x' || substr(md5('nx' || CAST(o_orderkey AS VARCHAR)),
              1, 12) AS BIGINT) % 1000000000000 + 1 AS BIGINT) AS x
  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20)
), r AS (
  SELECT key, x, x AS g, CAST(0 AS BIGINT) AS it, FALSE AS done
  FROM src
  UNION ALL
  SELECT key, x,
         CASE WHEN (g + x // g) // 2 >= g THEN g
              ELSE (g + x // g) // 2 END,
         it + 1,
         (g + x // g) // 2 >= g
  FROM r WHERE NOT done AND it < 60
), final AS (
  SELECT key, x, g, it,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY it DESC) AS rn
  FROM r
)
SELECT key, x, CAST(g AS BIGINT) AS isqrt, CAST(it AS BIGINT) AS iters,
       g * g <= x AS lower_ok,
       (g + 1) * (g + 1) > x AS upper_ok
FROM final WHERE rn = 1
"""


@_register("nm1_integer_sqrt", _NM1_SQL)
def nm1_integer_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer square root of 20 md5 values up to 10^12 by Newton's
    method in pure BIGINT — the exact fixed-point iteration g' =
    (g + x div g) div 2 from g0 = x, which decreases monotonically
    until it reaches floor(sqrt(x)) and is stopped the first time it
    fails to decrease (the classic termination rule that dodges the
    +/-1 oscillation). Both the floor-division arithmetic and the stop
    test replay identically in the recursive-CTE oracle; the
    isqrt^2 <= x < (isqrt+1)^2 certificate is emitted as columns and
    must be TRUE on every row — this is the sqrt you use when libm is
    banned (every gotcha about pow/log portability) or when x exceeds
    double's 2^53 exactness. Iteration count rides along: ~40 halvings
    from g0 = x, so the 60-step bound never truncates."""
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
                    F.md5(F.concat(F.lit("nx"), F.col("o_orderkey").cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000000000
            + 1
        ).alias("x"),
    )
    acc0 = F.expr(
        "named_struct('g', CAST(0 AS BIGINT), 'it', CAST(0 AS BIGINT),"
        " 'done', CAST(false AS BOOLEAN))"
    )

    def _fdiv(a, b):
        # exact floor division for positive BIGINTs (values < 2^53)
        return ((a - a % b) / b).cast("bigint")

    def step(acc, _i):
        g = F.when(acc["it"] == 0, F.col("x")).otherwise(acc["g"])
        nxt = _fdiv(g + _fdiv(F.col("x"), g), F.lit(2))
        stop = nxt >= g
        stepped = F.struct(
            F.when(stop, g).otherwise(nxt).alias("g"),
            (acc["it"] + 1).alias("it"),
            stop.alias("done"),
        )
        return F.when(acc["done"], acc).otherwise(stepped)

    folded = src.select(
        "key",
        "x",
        F.aggregate(F.sequence(F.lit(1), F.lit(60)), acc0, step).alias("s"),
    )
    return folded.select(
        "key",
        "x",
        F.col("s.g").alias("isqrt"),
        F.col("s.it").alias("iters"),
        (F.col("s.g") * F.col("s.g") <= F.col("x")).alias("lower_ok"),
        ((F.col("s.g") + 1) * (F.col("s.g") + 1) > F.col("x")).alias(
            "upper_ok"
        ),
    )


# =========================================================================
# pid1: P+I feedback controller (autoscaler) replay
# =========================================================================

_PID1_SQL = """
WITH RECURSIVE hours AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS demand
  FROM events GROUP BY 1
), series AS (
  SELECT demand,
         CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t
  FROM hours
  QUALIFY t <= 48
), packed AS (
  SELECT list(demand ORDER BY t) AS ds, CAST(COUNT(*) AS BIGINT) AS n
  FROM series
), r AS (
  SELECT CAST(0 AS BIGINT) AS t, CAST(100 AS BIGINT) AS cap,
         CAST(0 AS BIGINT) AS integral,
         CAST([] AS STRUCT(t BIGINT, demand BIGINT, cap BIGINT, err BIGINT,
                           integral BIGINT)[]) AS tr,
         ds, n
  FROM packed
  UNION ALL
  SELECT t + 1,
         cap + (50 * (ds[t + 1] - cap) + 10 * (integral + ds[t + 1] - cap))
               // 100,
         integral + ds[t + 1] - cap,
         list_append(tr, {'t': t + 1, 'demand': ds[t + 1],
                          'cap': cap + (50 * (ds[t + 1] - cap)
                                 + 10 * (integral + ds[t + 1] - cap)) // 100,
                          'err': ds[t + 1] - cap,
                          'integral': integral + ds[t + 1] - cap}),
         ds, n
  FROM r WHERE t < n
), final AS (
  SELECT tr, ROW_NUMBER() OVER (ORDER BY t DESC) AS rn FROM r
)
SELECT CAST(u.e.t AS BIGINT) AS t,
       CAST(u.e.demand AS BIGINT) AS demand,
       CAST(u.e.cap AS BIGINT) AS capacity,
       CAST(u.e.err AS BIGINT) AS error,
       CAST(u.e.integral AS BIGINT) AS integral
FROM final, unnest(final.tr) AS u(e)
WHERE rn = 1
"""


@_register("pid1_autoscaler_replay", _PID1_SQL)
def pid1_autoscaler_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A proportional+integral feedback controller replayed over the
    first 48 hourly demand counts — the autoscaler loop every capacity
    platform runs: error = demand - capacity, integral accumulates it,
    capacity += (Kp*error + Ki*integral) div 100 with Kp=50, Ki=10, all
    BIGINT. DuckDB's integer // TRUNCATES toward zero (measured:
    -5820//100 = -58 — the pca1 floor-vs-truncate note applies to
    other forms), and Spark's (a - a%100)/100 with Java-sign %
    truncates identically, so the mixed-sign update agrees exactly
    on both engines. The full (t, demand,
    capacity, error, integral) trajectory is oracle-checked; the
    property layer replays it in Python and asserts the controller
    actually tracks (terminal |error| bounded by the demand swing).
    Scan reduces to <=48 cells before the fold — the iso1/huff1 scale
    shape."""
    ev = _t(spark, sf_dir, "events")
    hours = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("demand")
    )
    series = hours.select(
        "demand",
        F.row_number().over(Window.orderBy("h")).cast("bigint").alias("t"),
    ).where(F.col("t") <= 48)
    packed = series.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "demand"))),
            lambda s: s["demand"],
        ).alias("ds")
    )
    acc0 = F.expr(
        "named_struct('cap', CAST(100 AS BIGINT),"
        " 'integral', CAST(0 AS BIGINT),"
        " 'tr', CAST(array() AS ARRAY<STRUCT<t: BIGINT, demand: BIGINT,"
        " cap: BIGINT, err: BIGINT, integral: BIGINT>>))"
    )

    def _floordiv100(a):
        # TRUNCATING division by 100 (DuckDB's integer // truncates
        # toward zero — measured, not assumed — and Spark's % takes the
        # dividend's sign, so (a - a%100)/100 truncates identically)
        return ((a - a % 100) / 100).cast("bigint")

    def step(acc, demand):
        err = demand - acc["cap"]
        integral = acc["integral"] + err
        delta = _floordiv100(50 * err + 10 * integral)
        cap = acc["cap"] + delta
        t = F.size(acc["tr"]) + 1
        return F.struct(
            cap.alias("cap"),
            integral.alias("integral"),
            F.concat(
                acc["tr"],
                F.array(
                    F.struct(
                        t.cast("bigint").alias("t"),
                        demand.alias("demand"),
                        cap.alias("cap"),
                        err.alias("err"),
                        integral.alias("integral"),
                    )
                ),
            ).alias("tr"),
        )

    folded = packed.select(
        F.aggregate("ds", acc0, step)["tr"].alias("tr")
    )
    ex = folded.select(F.explode("tr").alias("e"))
    return ex.select(
        F.col("e.t").alias("t"),
        F.col("e.demand").alias("demand"),
        F.col("e.cap").alias("capacity"),
        F.col("e.err").alias("error"),
        F.col("e.integral").alias("integral"),
    )
