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
from .operators.localframe import local_rows_df

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
    dim = local_rows_df(spark, _FLAG_DIM, "flag string, flag_desc string")
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


# =========================================================================
# e8: stream-static join — enrich a stream against a batch dimension
# =========================================================================

_E8_RUN_SEQ = [0]


@_register(
    "e8_stream_static_join",
    """
    WITH dim(event_type, category, weight) AS (
      VALUES ('click', 'engagement', 1), ('view', 'engagement', 2),
             ('purchase', 'revenue', 5), ('signup', 'growth', 3)
    ), agg AS (
      SELECT d.category,
             time_bucket(INTERVAL '10 minutes', e.ts) AS window_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * d.weight) AS DOUBLE)
               AS weighted_value
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY 1, 2
    ), wm AS (
      SELECT MAX(ts) - INTERVAL '30 minutes' AS horizon FROM events
    )
    SELECT category, window_start, n_events, weighted_value
    FROM agg, wm
    WHERE agg.window_start + INTERVAL '10 minutes' <= wm.horizon
    """,
)
def e8_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join, the third join mode Structured Streaming offers
    (e5 covers stream-stream; this is the enrichment pattern: events flow,
    the dimension sits in batch storage). The static side is tiny so it
    broadcasts — per micro-batch, a stateless hash probe with NO join
    state to expire, which is why stream-static inner joins need no
    watermark on the static side. Downstream the enriched stream feeds a
    tumbling-window weighted aggregate in append mode, which emits only
    watermark-finalized windows — the oracle reproduces that cutoff
    (window_end <= max event time - 30 min), exactly as e3 does. The
    'error' type is absent from the dim — inner-join semantics drop it,
    which the oracle mirrors. Weighted sums are exact DECIMAL * integer
    weight."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
    )

    _E8_RUN_SEQ[0] += 1
    sink = f"e8_enrich_sink_{_E8_RUN_SEQ[0]}"
    dim = local_rows_df(spark, 
        [
            ("click", "engagement", 1),
            ("view", "engagement", 2),
            ("purchase", "revenue", 5),
            ("signup", "growth", 3),
        ],
        "event_type string, category string, weight int",
    )
    with stream_partitions(spark):
        stream = stream_events_raw(spark, sf_dir, watermark="30 minutes")
        enriched = stream.join(F.broadcast(dim), "event_type").select(
            "category",
            "ts",
            (F.col("value").cast("decimal(18,2)") * F.col("weight")).alias(
                "wv"
            ),
        )
        agg = (
            enriched.groupBy(
                "category", F.window("ts", "10 minutes").alias("w")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("wv").cast("double").alias("weighted_value"),
            )
            .select(
                "category",
                F.col("w.start").alias("window_start"),
                "n_events",
                "weighted_value",
            )
        )
        return run_available_now(agg, sink, timeout=120)


# =========================================================================
# src4: dynamic partition overwrite — idempotent partition-scoped rewrite
# =========================================================================


@_register(
    "src4_dynamic_overwrite",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 200 AS BIGINT)
                    ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               END) AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def src4_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill primitive for
    a partitioned lake: a reprocessed slice replaces ONLY the partitions it
    contains, never the whole table. Step 1 lands all of orders partitioned
    by priority; step 2 overwrites just the 1-URGENT partition with
    reprocessed rows (prices doubled) under
    ``partitionOverwriteMode=dynamic``; the read-back aggregates the final
    table. The oracle computes what the table MUST now hold — original
    rows for untouched partitions, doubled cents for the rewritten one —
    so both the overwrite scoping (did another partition get clobbered?)
    and the rewrite content are value-checked. At 100 TB this is the daily
    backfill: recompute day X, swap exactly day X's directory."""
    sink = os.path.join(
        _SCRATCH, "src4_orders_" + os.path.basename(sf_dir.rstrip("/"))
    )
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = o.select("o_orderkey", "o_orderpriority", cents.alias("cents"))
    base.write.mode("overwrite").partitionBy("o_orderpriority").parquet(sink)
    urgent_redo = base.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).withColumn("cents", F.col("cents") * 2)
    (
        urgent_redo.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(sink)
    )
    back = spark.read.parquet(sink)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )


# =========================================================================
# zo1: Z-order (Morton) clustering for multi-column data skipping
# =========================================================================


def _spread_bits(col):
    """Interleave-ready bit spread: 16-bit int -> 32-bit with zeros between
    bits (classic Morton dilation, pure Column bit arithmetic)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(a, b):
    """Morton code of two 16-bit keys — locality on BOTH dimensions."""
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


@_register(
    "zo1_zorder_scan",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM lineitem
    WHERE l_partkey BETWEEN 40 AND 119 AND l_suppkey BETWEEN 2 AND 7
    GROUP BY l_returnflag
    """,
)
def zo1_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering — multi-column data skipping without partition
    explosion: lineitem is rewritten range-partitioned AND sorted by the
    Morton interleave of (l_partkey, l_suppkey), so parquet row-group
    min/max stats become tight rectangles in BOTH key dimensions and a
    2-D range predicate prunes most files (single-column sort would only
    skip on the leading key; partitioning by either key at 100 TB would
    create millions of directories). The interleave is pure Column bit
    arithmetic (shiftleft/AND/OR) — no UDF. The query then range-filters
    the z-ordered copy; the oracle runs the same filter on the ORIGINAL
    rows, proving the rewrite is content-preserving. File-level skipping
    is asserted in tests/test_plans.py by reading each file's key ranges."""
    sink = os.path.join(
        _SCRATCH, "zo1_lineitem_" + os.path.basename(sf_dir.rstrip("/"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    z = li.withColumn(
        "zval", zorder_value(F.col("l_partkey"), F.col("l_suppkey"))
    )
    (
        z.repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(sink)
    )
    # range chosen to be non-empty at every shipped SF (sf0.001 keys only
    # reach partkey 199 / suppkey 9)
    back = spark.read.parquet(sink).where(
        F.col("l_partkey").between(40, 119)
        & F.col("l_suppkey").between(2, 7)
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
    )


# =========================================================================
# src5: columnar codec round-trip (zstd) — storage-efficiency control
# =========================================================================


@_register(
    "src5_zstd_roundtrip",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS sum_cents,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def src5_zstd_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec control: the full lineitem rewritten as
    zstd-compressed parquet (the lake default worth choosing at 100 TB —
    typically ~30% smaller than snappy at similar scan speed, directly
    cutting both storage and scan I/O), read back and aggregated with
    timestamp min/max so codec round-trip fidelity of every value class
    (strings, decimals-from-doubles, timestamps) is hash-checked against
    the original rows."""
    sink = os.path.join(
        _SCRATCH, "src5_zstd_" + os.path.basename(sf_dir.rstrip("/"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        "l_extendedprice",
        "l_shipdate",
    )
    li.write.mode("overwrite").option("compression", "zstd").parquet(sink)
    back = spark.read.parquet(sink)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                "bigint"
            )
        ).alias("sum_cents"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


# =========================================================================
# src7: custom Python DataSource (Spark 4 connector API)
# =========================================================================


@_register(
    "src7_python_datasource",
    """
    WITH r AS (
      SELECT i AS reading_id, i % 7 AS sensor_id, (i * i) % 1000 AS value
      FROM generate_series(0, 9999) AS t(i)
    )
    SELECT sensor_id, COUNT(*) AS n_readings,
           CAST(SUM(value) AS BIGINT) AS sum_value, MAX(value) AS max_value
    FROM r GROUP BY sensor_id
    """,
)
def src7_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python DataSource API
    (sources/pydatasource.py): a registered ``spark.read.format(
    'range_sensor')`` source whose reader declares EIGHT InputPartitions —
    each read as an independent task, which is the entire scale contract of
    a V2 connector (a REST/queue wrapper partitions by page/shard the same
    way). Row content is pure id arithmetic, so the DuckDB oracle rebuilds
    the identical dataset from generate_series and the aggregate checks
    both the values and that no partition was dropped or duplicated."""
    from .sources.pydatasource import RangeSensorDataSource

    try:
        spark.dataSource.register(RangeSensorDataSource)
    except Exception:
        pass  # already registered in this session
    r = (
        spark.read.format("range_sensor")
        .option("n_rows", "10000")
        .option("n_parts", "8")
        .load()
    )
    return r.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )


# =========================================================================
# cp1: small-file compaction — the lake-maintenance job
# =========================================================================


@_register(
    "cp1_compaction",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type
    """,
)
def cp1_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every streaming/CDC
    ingest needs: a deliberately fragmented copy of events (64 files of a
    few KB each — the shape micro-batch sinks produce) is rewritten into
    4 right-sized files with one repartition. Small files are the silent
    100 TB killer: each costs a scan task, a name-node/object-store
    round-trip, and a parquet footer read, so a 1000x file-count reduction
    is routinely a 10x scan speedup. The oracle aggregates the ORIGINAL
    rows, proving compaction is content-preserving; the file counts before
    and after are asserted in the unit test."""
    frag = os.path.join(
        _SCRATCH, "cp1_frag_" + os.path.basename(sf_dir.rstrip("/"))
    )
    compact = os.path.join(
        _SCRATCH, "cp1_compact_" + os.path.basename(sf_dir.rstrip("/"))
    )
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(
        compact
    )
    back = spark.read.parquet(compact)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("sum_cents"),
    )


_E11_RUN_SEQ = [0]


@_register(
    "e11_stream_stream_left_outer",
    """
    WITH c AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, ts AS purchase_ts, value
      FROM events WHERE event_type = 'purchase'
    ), wm AS (
      SELECT LEAST(
        (SELECT MAX(click_ts) FROM c) - INTERVAL '30 minutes',
        (SELECT MAX(purchase_ts) FROM p) - INTERVAL '30 minutes'
      ) AS w
    ), matched AS (
      SELECT c.user_id, c.click_ts, p.purchase_ts,
             CAST(p.value AS DOUBLE) AS purchase_value
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND p.purchase_ts >= c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
    ), unmatched AS (
      SELECT c.user_id, c.click_ts,
             CAST(NULL AS TIMESTAMP) AS purchase_ts,
             CAST(NULL AS DOUBLE) AS purchase_value
      FROM c, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = c.user_id
          AND p.purchase_ts >= c.click_ts
          AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
      )
      AND c.click_ts + INTERVAL '30 minutes' < wm.w
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def e11_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — e5's attribution join
    keeping the clicks that DIDN'T convert, which is the half an
    attribution model actually trains on. The advanced semantics is the
    NULL-emission rule: an unmatched click can only emit once the
    watermark proves no in-window purchase can still arrive (click_ts +
    30min below the global watermark); Spark holds it in state until
    then. Each branch is watermarked AFTER its filter on a bare stream
    (stream_events_raw(watermark=None)) so each branch watermark is
    max(that type's ts) - delay and the global min-policy watermark is
    exactly LEAST(branch watermarks) — e10's pushdown lesson applied;
    with the default pre-filter watermark placement the cutoff would be
    optimizer-dependent and the oracle unwritable. The oracle computes
    matched pairs plus watermark-provably-unmatched clicks."""
    from .streaming.windows import (
        run_available_now,
        stream_events_raw,
        stream_partitions,
    )

    _E11_RUN_SEQ[0] += 1
    sink = f"e11_louter_sink_{_E11_RUN_SEQ[0]}"
    with stream_partitions(spark):
        clicks = (
            stream_events_raw(spark, sf_dir, watermark=None)
            .where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
            )
            .withWatermark("click_ts", "30 minutes")
        )
        purchases = (
            stream_events_raw(spark, sf_dir, watermark=None)
            .where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("value"),
            )
            .withWatermark("purchase_ts", "30 minutes")
        )
        joined = clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "left_outer",
        ).select(
            F.col("c_user").alias("user_id"),
            "click_ts",
            "purchase_ts",
            F.col("value").cast("double").alias("purchase_value"),
        )
        return run_available_now(joined, sink, timeout=120)
