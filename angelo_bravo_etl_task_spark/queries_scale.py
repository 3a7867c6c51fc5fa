"""Scale-technique queries: each one demonstrates a 100 TB survival tactic
with an oracle proving the tactic changes the PLAN, not the ANSWER.

- sk1: salted shuffle join on an extreme-skew key (3-value join key) ==
  plain join (the oracle runs the unsalted SQL).
- sm1: deterministic md5 stratified sampling — engine-portable by
  construction, so the oracle IS the same predicate in DuckDB.
- pp1: partition-pruned scan — write events partitioned by event_type,
  read one partition back; the oracle computes the same answer from the
  unpartitioned source (pruning asserted by plan test, equality here).
- src1/src2: JSON and ORC source round-trips — write, read back with an
  explicit schema, aggregate; the oracle aggregates the original rows, so
  any serialization loss (types, precision, timestamps) breaks the hash.
- e5: stream-stream interval join (watermarked both sides) run as a REAL
  streaming query == the static interval join.
- bk1: bucketed co-located join — both sides bucketBy(8, key), merge-hinted
  join runs with ZERO Exchange below the SortMergeJoin (plan-asserted).

Scratch space: ``.scratch/`` under the repo root (gitignored) — sinks are
rewritten per invocation (mode=overwrite), so repeated runs are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.agg import dec
from .queries import _register, _t

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

_FLAG_DIM = [
    ("A", "accepted"),
    ("N", "none"),
    ("R", "returned"),
]


@_register(
    "sk1_salted_join",
    """
    WITH dim(flag, flag_desc) AS (
      VALUES ('A', 'accepted'), ('N', 'none'), ('R', 'returned')
    )
    SELECT d.flag_desc,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    GROUP BY d.flag_desc
    """,
)
def sk1_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join (operators/partitioning.py::salted_join): the
    join key ``l_returnflag`` has THREE values — a textbook hot-key shuffle
    (every row of a flag lands on one reducer). The fact side is salted by
    hashing ``l_orderkey`` into 16 sub-keys, the dim is replicated per salt,
    and the shuffle_hash-hinted join spreads each flag over 16 reducers.
    The oracle runs the UNSALTED SQL join — value equality proves salting
    is plan-only."""
    from .operators.partitioning import salted_join

    li = _t(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(_FLAG_DIM, "flag string, flag_desc string")
    fact = li.select(
        F.col("l_returnflag").alias("flag"),
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("_rev"),
    )
    joined = salted_join(fact, dim, on="flag", n_salts=16, salt_from="_rev")
    return (
        joined.groupBy("flag_desc")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_rev").cast("double").alias("revenue"),
        )
    )


@_register(
    "sm1_stratified_sample",
    """
    WITH keyed AS (
      SELECT l_returnflag, l_quantity,
             substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                        || CAST(l_linenumber AS VARCHAR)), 1, 4) AS bucket
      FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_sampled,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM keyed
    WHERE (l_returnflag = 'A' AND bucket < '4000')
       OR (l_returnflag = 'N' AND bucket < '2000')
       OR (l_returnflag = 'R' AND bucket < '1000')
    GROUP BY l_returnflag
    """,
)
def sm1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/sampling.py): md5-keyed
    per-stratum rates (A 25%, N 12.5%, R 6.25%) — a pure narrow filter that
    any engine reproduces bit-for-bit, unlike ``df.sample()`` whose RNG
    stream depends on partition layout. The oracle applies the identical
    predicate in DuckDB; matching aggregates prove row-for-row agreement."""
    from .operators.sampling import stratified_hash_sample

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    sampled = stratified_hash_sample(
        li, key, "l_returnflag", {"A": 0.25, "N": 0.125, "R": 0.0625}
    )
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@_register(
    "pp1_partition_pruned",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
)
def pp1_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink + pruned scan: events are written
    ``partitionBy(event_type)`` (the layout a 100 TB event store needs so a
    one-type query reads 1/5th of the data), read back, and filtered to one
    partition — Catalyst prunes to the single ``event_type=click``
    directory (asserted by the plan test; ``PartitionFilters`` non-empty,
    one partition scanned). The oracle aggregates the unpartitioned
    original, so layout round-trip fidelity (timestamps, doubles) is also
    checked."""
    sink = os.path.join(_SCRATCH, "pp1_events_" + os.path.basename(sf_dir.rstrip("/")))
    ev = _t(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(sink)
    back = spark.read.parquet(sink).where(F.col("event_type") == "click")
    return (
        back.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
        )
    )


@_register(
    "src1_json_roundtrip",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id < 5000
    GROUP BY event_type
    """,
)
def src1_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source: write a bounded slice as JSONL, read it back with
    an EXPLICIT schema (never schema inference on a 100 TB lake — one
    inference pass reads everything twice), aggregate. The oracle
    aggregates the original parquet rows, so double round-trip fidelity
    through JSON text (Jackson shortest-repr) is part of the check."""
    sink = os.path.join(_SCRATCH, "src1_json_" + os.path.basename(sf_dir.rstrip("/")))
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 5000)
    ev.select("event_id", "event_type", "value").write.mode("overwrite").json(sink)
    back = spark.read.schema("event_id long, event_type string, value double").json(sink)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
    )


@_register(
    "src2_orc_roundtrip",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
)
def src2_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip (the other columnar format a lake
    migration meets): full events table out and back, timestamp fidelity
    (micros) checked by min/max against the parquet original."""
    sink = os.path.join(_SCRATCH, "src2_orc_" + os.path.basename(sf_dir.rstrip("/")))
    ev = _t(spark, sf_dir, "events")
    ev.select("event_id", "ts", "event_type").write.mode("overwrite").orc(sink)
    back = spark.read.orc(sink)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


_E5_RUN_SEQ = [0]


@_register(
    "e5_stream_stream_join",
    """
    SELECT c.user_id,
           c.ts AS click_ts,
           p.ts AS purchase_ts,
           CAST(p.value AS DOUBLE) AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    """,
)
def e5_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join as a REAL streaming query: clicks and
    purchases (both watermarked) joined per user where the purchase lands
    within 30 minutes after the click — the attribution join every event
    pipeline runs. Watermark + time bound let Spark expire join state (a
    click can stop waiting once the purchase watermark passes ts+30min);
    without them state grows with the stream. availableNow -> memory sink;
    the oracle is the equivalent static interval join."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
    )

    _E5_RUN_SEQ[0] += 1
    sink = f"e5_join_sink_{_E5_RUN_SEQ[0]}"
    with stream_partitions(spark):
        clicks = (
            stream_events_raw(spark, sf_dir, watermark="30 minutes")
            .where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
            )
        )
        purchases = (
            stream_events_raw(spark, sf_dir, watermark="30 minutes")
            .where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("value"),
            )
        )
        joined = clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "inner",
        ).select(
            F.col("c_user").alias("user_id"),
            "click_ts",
            "purchase_ts",
            F.col("value").alias("purchase_value"),
        )
        return run_available_now(joined, sink, timeout=120)


@_register(
    "bk1_bucketed_join",
    """
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def bk1_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — THE shuffle-elimination layout for
    repeated big-big joins at 100 TB: both fact tables are written
    ``bucketBy(8, key).sortBy(key)`` so the join executes as a SortMergeJoin
    with ZERO Exchange on either side (asserted by the plan test) — the
    shuffle happened once at write time and is amortized over every
    subsequent join on that key. A ``merge`` hint pins the SortMergeJoin
    strategy IN the plan (a scoped conf change would not survive until the
    caller's deferred action) so the bucket path shows even at harness
    volume, where the dimension side would otherwise broadcast. The oracle
    joins the ORIGINAL parquet, so bucket-layout round-trip fidelity is
    value-checked too."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_tbl, o_tbl = f"bk1_lineitem_{tag}", f"bk1_orders_{tag}"
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    for df, tbl, key in ((li, li_tbl, "l_orderkey"), (o, o_tbl, "o_orderkey")):
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(_SCRATCH, tbl))
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(tbl)
        )
    lb, ob = spark.table(li_tbl), spark.table(o_tbl).hint("merge")
    joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
    )


@_register(
    "dq1_profile_columns",
    """
    SELECT 'o_orderkey' AS col_name,
           COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
           COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
)
def dq1_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling (operators/profile.py::profile_columns): null
    count, exact distinct count, min/max per column in ONE aggregation over
    ONE scan — the deequ-style expectations primitive. The oracle computes
    each column's row independently; the engine's whole point is that all
    three columns ride the same partial-aggregate pass (single-scan shape
    is plan-asserted in the unit test). Profiled columns are integer- and
    string-typed so the stringified min/max are representation-identical
    across engines (double/timestamp formatting differs)."""
    from .operators.profile import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )


@_register(
    "src3_schema_evolution",
    """
    SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS BIGINT), o_totalprice
    FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def src3_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches — the ingest reality of any
    long-lived dataset: batch 1 writes (o_orderkey, o_custkey), batch 2
    writes (o_orderkey, o_totalprice); a mergeSchema read reconciles both
    under one superset schema with NULL-extension for each batch's missing
    column. The oracle reproduces the union-by-name semantics from the
    original rows, so any column misalignment, type drift, or dropped rows
    in the merged scan breaks the hash. (At 100 TB, mergeSchema's footer
    sampling is the cheap part; the discipline is additive-only schema
    changes, which this models.)"""
    base = os.path.join(
        _SCRATCH, "src3_" + os.path.basename(sf_dir.rstrip("/"))
    )
    o = _t(spark, sf_dir, "orders")
    (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_custkey")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "batch=1"))
    )
    (
        o.where(F.col("o_orderkey") % 3 == 1)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "batch=2"))
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return merged.select("o_orderkey", "o_custkey", "o_totalprice")


@_register(
    "bk2_bucketed_agg",
    """
    SELECT l_orderkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    """,
)
def bk2_bucketed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation on a bucketed table with ZERO exchange — bk1's layout
    amortization applied to group-bys: the table is bucketed on the grouping
    key, so the scan's hash distribution already satisfies the aggregate's
    required clustering and Spark plans a single full HashAggregate with NO
    shuffle (plan-asserted). At 100 TB this is the difference between a
    full-data exchange per rollup and none at all for every aggregate keyed
    on the bucket column — the write-once shuffle pays for reads forever.
    The oracle aggregates the ORIGINAL parquet, so the bucketed round-trip
    is value-checked too."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tbl = f"bk2_lineitem_{tag}"
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (
        li.write.mode("overwrite")
        .option("path", os.path.join(_SCRATCH, tbl))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .saveAsTable(tbl)
    )
    return (
        spark.table(tbl)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )
