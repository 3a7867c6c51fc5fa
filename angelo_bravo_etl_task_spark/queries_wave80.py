r"""Round-5 wave 80: table-argument UDTF (partitioned polymorphic table
function), grouped applyInArrow.

- u12: the Spark 4 UDTF form that receives a whole TABLE argument with
  `PARTITION BY ... ORDER BY ...` — the SQL-standard polymorphic table
  function shape (the machinery behind things like SQL MATCH_RECOGNIZE
  and session analyzers): the engine feeds each partition's rows to one
  UDTF instance in order, eval() buffers, terminate() emits — giving
  per-partition sequential logic WITH the engine owning partitioning
  and sort. The computation (per-nation running account-balance prefix
  sums in exact cents plus each partition's row count) is deliberately
  window-expressible so the DuckDB oracle checks the machinery
  end-to-end.
- u13: grouped applyInArrow — the zero-pandas path for per-group
  Python: each group arrives as ONE pyarrow.Table (no pandas
  conversion cost or dtype coercions), results return as arrow. u6
  covers cogrouped pandas, u2 applyInPandas, u10 mapInArrow; u13
  completes the grouped-arrow corner. Arithmetic is exact-integer
  (cents), so the oracle is a plain grouped aggregate.

Reference parity note: the reference script (Angelo_ETL_Task.py) has
no Python-extension surface; these complete the UDF/UDTF matrix
(u1-u11) along Spark 4's two newest axes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# =========================================================================
# u12: UDTF over TABLE(...) PARTITION BY ... ORDER BY ...
# =========================================================================

_U12_SQL = """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT c_nationkey,
       c_custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       CAST(SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS running_cents,
       CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_part
FROM c
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
"""


@_register("u12_udtf_table_arg", _U12_SQL)
def u12_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic table function over a TABLE argument: the UDTF is
    invoked as `balance_fold(TABLE(v) PARTITION BY c_nationkey ORDER BY
    c_custkey)`, so Spark shuffles by nation, sorts each partition by
    custkey, streams the rows into eval(), and terminate() emits the
    fold — per-partition sequential Python with the ENGINE owning
    distribution and order (u7's analyze() made the schema polymorphic;
    u12 makes the INPUT a relation). The fold here — running
    account-balance prefix sum in exact cents, sequence number, and the
    partition's total row count stamped on every row — is deliberately
    window-expressible, so the oracle certifies the whole
    partition/order/buffer/emit machinery against plain SQL windows.
    Balances pass through DECIMAL(18,2)·100 → BIGINT before the UDTF,
    keeping Python arithmetic integer-exact. At 100 TB each nation
    partition streams through one task exactly like a window — the
    shape to reach for when per-partition logic outgrows window frames
    (state machines, pattern matching) but the data layout should stay
    engine-managed."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "c_nationkey bigint, c_custkey bigint, seq bigint, "
            "running_cents bigint, n_part bigint"
        )
    )
    class BalanceFold:
        def __init__(self):
            self.rows = []

        def eval(self, row):
            self.rows.append((row["c_nationkey"], row["c_custkey"], row["cents"]))

        def terminate(self):
            run = 0
            n = len(self.rows)
            for i, (nk, ck, cents) in enumerate(self.rows, 1):
                run += cents
                yield (nk, ck, i, run, n)

    spark.udtf.register("balance_fold", BalanceFold)
    (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .select(
            "c_nationkey",
            "c_custkey",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .createOrReplaceTempView("_u12_cust")
    )
    return spark.sql(
        """
        SELECT s.* FROM balance_fold(
          TABLE(_u12_cust)
          PARTITION BY c_nationkey
          ORDER BY c_custkey
        ) s
        """
    )


# =========================================================================
# u13: grouped applyInArrow — per-group Python without pandas
# =========================================================================

_U13_SQL = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(MAX(cents) - MIN(cents) AS BIGINT) AS spread_cents
FROM o GROUP BY o_orderpriority
"""


@_register("u13_apply_in_arrow", _U13_SQL)
def u13_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow — per-group Python that never touches
    pandas: each priority group arrives as ONE pyarrow.Table, compute
    runs via pyarrow.compute kernels (vectorized C++, no dtype
    coercions, no object columns — binary/decimal columns survive
    exactly), and one arrow Table returns per group. This is the
    grouped sibling of u10's mapInArrow and the coercion-free
    alternative to u2's applyInPandas — the right extension point when
    group payloads are binary/nested (multimodal shards) or when pandas
    dtype round-trips are the bug source. Money is pre-converted to
    exact BIGINT cents JVM-side; the oracle is the equivalent grouped
    aggregate. At 100 TB groups shuffle once by key and each streams
    through one Arrow batch pipeline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fold(table: pa.Table) -> pa.Table:
        cents = table.column("cents")
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [table.column("o_orderpriority")[0].as_py()], pa.string()
                ),
                "n": pa.array([table.num_rows], pa.int64()),
                "total_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "spread_cents": pa.array(
                    [pc.max(cents).as_py() - pc.min(cents).as_py()], pa.int64()
                ),
            }
        )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return o.groupBy("o_orderpriority").applyInArrow(
        fold,
        schema=(
            "o_orderpriority string, n bigint, "
            "total_cents bigint, spread_cents bigint"
        ),
    )
