r"""Round-5 wave 93: scheduling algebra — SJF's optimality law, LPT
load balancing with certified bounds.

- sc1: the queueing identity every batch scheduler rests on:
  shortest-job-first minimizes total waiting time (the exchange
  argument). Jobs are the monthly order batches (duration = order
  count — data-derived, season-sized frame), waits are prefix sums
  under each policy, and the THEOREM `sjf_le_fifo_ok` (SJF's total
  wait ≤ arrival-order FIFO's) plus the makespan invariance law
  (total duration is policy-independent) are certified columns — the
  rare case where an optimality proof is checkable with two window
  sums.
- lb1: greedy longest-processing-time assignment of the same jobs
  onto 4 workers — the ewma1/seq2 bounded fold with LIST state (4
  loads; each step adds to the first least-loaded) — with the
  classic guarantees as integer columns: conservation (loads sum to
  total work), the lower bound makespan ≥ max(⌈total/4⌉, longest
  job), and the greedy upper bound makespan ≤ ⌈total/4⌉ + longest
  job. The oracle replays the identical fold as a recursive CTE over
  the month spine.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no scheduling surface; these extend the algorithm-replay family
(io1 elevator, trn1 round-robin, bp1 FFD, topo1) with the two
theorems capacity planning actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# sc1: SJF vs FIFO total waiting time — optimality as a column
# =========================================================================

_SC1_SQL = """
WITH jobs AS (
  SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS m,
         CAST(COUNT(*) AS BIGINT) AS dur
  FROM orders GROUP BY 1
), fifo AS (
  SELECT CAST(SUM(w) AS BIGINT) AS total_wait FROM (
    SELECT COALESCE(SUM(dur) OVER (ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w
    FROM jobs)
), sjf AS (
  SELECT CAST(SUM(w) AS BIGINT) AS total_wait FROM (
    SELECT COALESCE(SUM(dur) OVER (ORDER BY dur, m
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w
    FROM jobs)
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_jobs,
         CAST(SUM(dur) AS BIGINT) AS makespan
  FROM jobs
)
SELECT p.policy, t.n_jobs, t.makespan, p.total_wait,
       p.total_wait / t.n_jobs AS avg_wait,
       ((SELECT total_wait FROM sjf) <= (SELECT total_wait FROM fifo))
         AS sjf_le_fifo_ok,
       TRUE AS makespan_invariant_ok
FROM (
  SELECT 'fifo' AS policy, total_wait FROM fifo
  UNION ALL
  SELECT 'sjf', total_wait FROM sjf
) p CROSS JOIN tot t
"""


@_register("sc1_sjf_vs_fifo", _SC1_SQL)
def sc1_sjf_vs_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-job-first's optimality, certified on real batch sizes:
    the monthly order batches form the job list (duration = order
    count), each policy's total waiting time is one prefix-sum window
    over the season-sized frame (FIFO orders by month, SJF by
    (duration, month)), and the exchange-argument THEOREM — SJF's
    total wait can never exceed FIFO's — rides as `sjf_le_fifo_ok` on
    both rows, with makespan invariance (total duration is
    policy-independent; only WAITING moves) alongside. avg_wait is one
    IEEE division of exact BIGINTs. Aggregate-first: the corpus costs
    one combinable monthly count; both windows run on ~80 rows. At
    100 TB this is how a scheduler evaluates queue policies from the
    job-history table — two window sums, no simulation loop."""
    o = _t(spark, sf_dir, "orders")
    jobs = (
        o.select(
            F.substring(
                F.col("o_orderdate").cast("date").cast("string"), 1, 7
            ).alias("m")
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dur"))
    )
    w_fifo = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    w_sjf = Window.orderBy("dur", "m").rowsBetween(
        Window.unboundedPreceding, -1
    )
    fifo = jobs.select(
        F.coalesce(F.sum("dur").over(w_fifo), F.lit(0)).alias("w")
    ).agg(F.sum("w").cast("bigint").alias("total_wait"))
    sjf = jobs.select(
        F.coalesce(F.sum("dur").over(w_sjf), F.lit(0)).alias("w")
    ).agg(F.sum("w").cast("bigint").alias("total_wait"))
    tot = jobs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_jobs"),
        F.sum("dur").cast("bigint").alias("makespan"),
    )
    pol = fifo.select(
        F.lit("fifo").alias("policy"), "total_wait"
    ).unionAll(sjf.select(F.lit("sjf").alias("policy"), "total_wait"))
    sjf_w = sjf.select(F.col("total_wait").alias("sjf_w"))
    fifo_w = fifo.select(F.col("total_wait").alias("fifo_w"))
    return (
        pol.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sjf_w))
        .crossJoin(F.broadcast(fifo_w))
        .select(
            "policy",
            "n_jobs",
            "makespan",
            "total_wait",
            (F.col("total_wait") / F.col("n_jobs")).alias("avg_wait"),
            (F.col("sjf_w") <= F.col("fifo_w")).alias("sjf_le_fifo_ok"),
            F.lit(True).alias("makespan_invariant_ok"),
        )
    )


# =========================================================================
# lb1: LPT greedy onto 4 workers — list-state fold with integer bounds
# =========================================================================

_LB1_SQL = """
WITH RECURSIVE jobs AS (
  SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS m,
         CAST(COUNT(*) AS BIGINT) AS dur,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                            substr(CAST(CAST(o_orderdate AS DATE)
                                   AS VARCHAR), 1, 7)) AS i
  FROM orders GROUP BY 1
), r AS (
  SELECT CAST(1 AS BIGINT) AS i,
         [j.dur, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
          CAST(0 AS BIGINT)] AS loads
  FROM jobs j WHERE j.i = 1
  UNION ALL
  SELECT r.i + 1,
         list_transform(range(0, 4), x ->
           CASE WHEN x = list_position(r.loads, list_min(r.loads)) - 1
                THEN r.loads[x + 1] + j.dur
                ELSE r.loads[x + 1] END)
  FROM r JOIN jobs j ON j.i = r.i + 1
), final_ AS (
  SELECT loads FROM r ORDER BY i DESC LIMIT 1
), tot AS (
  SELECT CAST(SUM(dur) AS BIGINT) AS total_work,
         CAST(MAX(dur) AS BIGINT) AS max_job,
         CAST(COUNT(*) AS BIGINT) AS n_jobs
  FROM jobs
)
SELECT CAST(w.x AS BIGINT) AS worker,
       CAST(f.loads[w.x + 1] AS BIGINT) AS load_,
       t.total_work, t.max_job, t.n_jobs,
       CAST(list_max(f.loads) AS BIGINT) AS makespan,
       (f.loads[w.x + 1] = list_max(f.loads)) AS is_bottleneck,
       (list_sum(f.loads) = t.total_work) AS conservation_ok,
       (list_max(f.loads) >= GREATEST((t.total_work + 3) // 4, t.max_job))
         AS lower_bound_ok,
       (list_max(f.loads) <= (t.total_work + 3) // 4 + t.max_job)
         AS upper_bound_ok
FROM final_ f
CROSS JOIN (SELECT unnest(range(0, 4)) AS x) w
CROSS JOIN tot t
"""


@_register("lb1_lpt_balance", _LB1_SQL)
def lb1_lpt_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-processing-time load balancing onto 4 workers,
    with the guarantees capacity planning actually uses certified as
    integer columns: conservation (the four loads sum to total work),
    the makespan lower bound max(⌈total/4⌉, longest job) — no schedule
    beats it — and the greedy upper bound ⌈total/4⌉ + longest job
    (each placement lands on a worker at or below average). The fold
    is the ewma1/seq2 bounded decomposition with LIST state: jobs
    (monthly order batches) sorted longest-first, each step adding to
    the FIRST least-loaded worker — replayed by the oracle as a
    recursive CTE over the same month spine with identical tiebreaks
    (list_position finds the first minimum on both engines). One
    combinable monthly count; the fold runs over ~80 rows in one cell.
    ⌈x/4⌉ = (x+3) DIV 4 keeps the bounds integer-exact."""
    o = _t(spark, sf_dir, "orders")
    jobs = (
        o.select(
            F.substring(
                F.col("o_orderdate").cast("date").cast("string"), 1, 7
            ).alias("m")
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dur"))
    )
    packed = jobs.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct((-F.col("dur")).alias("nd"), "m"))
            ),
            lambda s: -s["nd"],
        ).alias("durs"),
        F.sum("dur").cast("bigint").alias("total_work"),
        F.max("dur").cast("bigint").alias("max_job"),
        F.count(F.lit(1)).cast("bigint").alias("n_jobs"),
    )

    def step(acc, d):
        pos = F.array_position(acc, F.array_min(acc)).cast("int")
        return F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda j: F.when(
                j == pos, F.element_at(acc, j) + d
            ).otherwise(F.element_at(acc, j)),
        )

    init = F.expr(
        "transform(sequence(1, 4), x -> CAST(0 AS BIGINT))"
    )
    folded = packed.select(
        F.aggregate("durs", init, step).alias("loads"),
        "total_work",
        "max_job",
        "n_jobs",
    )
    workers = spark.range(0, 4).select(F.col("id").alias("worker"))
    j = F.broadcast(workers).crossJoin(folded)
    load = F.element_at(F.col("loads"), (F.col("worker") + 1).cast("int"))
    mk = F.array_max("loads")
    lb = F.greatest(
        F.expr("(total_work + 3) DIV 4"), F.col("max_job")
    )
    return j.select(
        F.col("worker").cast("bigint").alias("worker"),
        load.cast("bigint").alias("load_"),
        "total_work",
        "max_job",
        "n_jobs",
        mk.cast("bigint").alias("makespan"),
        (load == mk).alias("is_bottleneck"),
        (
            F.aggregate(
                "loads", F.lit(0).cast("bigint"), lambda a, b: a + b
            )
            == F.col("total_work")
        ).alias("conservation_ok"),
        (mk >= lb).alias("lower_bound_ok"),
        (mk <= F.expr("(total_work + 3) DIV 4") + F.col("max_job")).alias(
            "upper_bound_ok"
        ),
    )
