r"""Round-8 wave 115: runtime bloom-filter join pruning (rtf1) — the
optimizer's injected semi-join filter, plan-asserted.

When one side of a shuffle join is selective, Spark 4 injects a BLOOM
FILTER built from the selective side's join keys into the OTHER side's
scan (`might_contain(...)` in the physical plan), discarding non-joining
rows BEFORE the shuffle — at 100 TB this is the difference between
shuffling the full fact table and shuffling only the ~joining fraction.
dpp1 certifies the partition-level cousin (dynamic partition pruning);
this certifies the row-level one, with the injection PROVEN from the
executed plan, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

_RTF1_SQL = """
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS qty_c
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 500000
GROUP BY l.l_returnflag
"""


@_register("rtf1_runtime_bloom_filter", _RTF1_SQL)
def rtf1_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective orders slice (o_totalprice > 500000) joined to lineitem
    under a forced shuffle join: the optimizer must inject a runtime
    bloom filter — lineitem rows are tested with ``might_contain``
    against a bloom built from the filtered orders keys BEFORE the
    exchange. The injection is ASSERTED from the executed plan; the
    joined aggregate rides the driver hash, so the filter is also proven
    lossless (a bloom that drops a true-joining row changes the counts).

    Session-conf note: the broadcast threshold is disabled (broadcast
    joins don't need bloom filters — the whole build side ships anyway)
    and the application-side scan-size threshold is zeroed because the
    test parquet is ~MBs; at production scale the DEFAULT threshold
    (10GB+) triggers the same injection organically. Both confs are
    restored in ``finally`` — the shared session stays clean for the
    next registered query.

    100 TB shape: the bloom is a fixed-size aggregate of the selective
    side (map-side combined, broadcast to the fact scan); the fact side
    discards non-joining rows AT THE SCAN, so the shuffle carries only
    the joining fraction — the row-level sibling of dpp1's
    partition-level pruning."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf_scan = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    prev_scan = spark.conf.get(conf_scan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(conf_scan, "0")
    try:
        li = _t(spark, sf_dir, "lineitem")
        o = _t(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 500000
        )
        qty_c = (
            F.col("l_quantity").cast("decimal(18,2)") * 100
        ).cast("bigint")
        out = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(qty_c).cast("bigint").alias("qty_c"),
            )
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            "runtime bloom filter was not injected:\n" + plan[:2000]
        )
        # materialize under the temporary confs so the asserted plan is
        # the executed one
        rows = out.collect()
        return local_rows_df(spark, 
            rows, "l_returnflag string, n_rows bigint, qty_c bigint"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(conf_scan, prev_scan)
