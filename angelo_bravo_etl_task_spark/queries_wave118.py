r"""Round-9 wave 118: the full 3-clause MERGE INTO with merge-on-read
writes (merge1) and the AQE skew-join split, plan-asserted (skew2).

merge1 closes the lakehouse verb the registry modeled around but never
named (VERDICT r8 item 4): dv1 has deletion vectors, tt1 has manifest
time travel, mg1 has the 2-clause upsert join — merge1 is the keyed
MERGE that PRODUCES them: WHEN MATCHED AND cond THEN DELETE / WHEN
MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT, written
merge-on-read style (updates and deletes mark the old row's position in
a deletion vector; updated and inserted rows append to a new file).

skew2 certifies AQE's skew-join split the way rtf1 certified runtime
bloom pruning (VERDICT r8 item 5): a skewed join key is PLANTED, the
skewed-partition thresholds are lowered to fire at test scale, and the
``skew=true`` marker is ASSERTED from the executed adaptive plan — at
100 TB a skewed key is the #1 shuffle killer and this proves the
engine's runtime mitigation actually engages, not just that a conf
exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

# The oracle replays MERGE as the INSERT/UPDATE/DELETE end-state it is
# equivalent to: base rows keyed to (file_id, pos) exactly like dv1's
# layout; the delta classifies each key D/U (mutually exclusive by
# construction: D wins on keys divisible by both 13 and 7) or I; DVs
# collect the positions of deleted AND updated rows; the new file 4
# appends updated images + inserts with fresh deterministic positions.
_MERGE1_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 4 AS BIGINT) AS file_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % 4
                                 ORDER BY o_orderkey) AS BIGINT) AS pos,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM orders
), delta AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 + 500 AS BIGINT)
           AS new_price_c
  FROM orders WHERE o_orderkey % 13 = 0 OR o_orderkey % 7 = 0
  UNION ALL
  SELECT -(o_orderkey + 1), 'I',
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
  FROM orders WHERE o_orderkey % 11 = 0
), matched AS (
  SELECT b.file_id, b.pos, d.k, d.op, d.new_price_c
  FROM base b JOIN delta d ON b.k = d.k
), dv AS (
  SELECT file_id, pos FROM matched WHERE op IN ('D', 'U')
), appended AS (
  SELECT CAST(4 AS BIGINT) AS file_id,
         CAST(ROW_NUMBER() OVER (ORDER BY k) AS BIGINT) AS pos,
         k, new_price_c AS price_c, op
  FROM (
    SELECT k, op, new_price_c FROM matched WHERE op = 'U'
    UNION ALL
    SELECT k, op, new_price_c FROM delta WHERE op = 'I'
  )
), live AS (
  SELECT b.file_id, b.price_c FROM base b LEFT JOIN dv
    ON b.file_id = dv.file_id AND b.pos = dv.pos
  WHERE dv.pos IS NULL
  UNION ALL
  SELECT file_id, price_c FROM appended
), acct AS (
  SELECT file_id,
         CAST(COUNT(*) AS BIGINT) AS live_rows,
         CAST(SUM(price_c) AS BIGINT) AS live_price_sum_c
  FROM live GROUP BY file_id
), dvc AS (
  SELECT file_id, CAST(COUNT(*) AS BIGINT) AS dv_marked
  FROM dv GROUP BY file_id
), ins AS (
  SELECT file_id,
         CAST(COALESCE(SUM(CASE WHEN op = 'U' THEN 1 END), 0) AS BIGINT)
           AS updated_rows,
         CAST(COALESCE(SUM(CASE WHEN op = 'I' THEN 1 END), 0) AS BIGINT)
           AS inserted_rows
  FROM appended GROUP BY file_id
)
SELECT a.file_id, a.live_rows,
       COALESCE(d.dv_marked, 0) AS dv_marked,
       COALESCE(i.updated_rows, 0) AS updated_rows,
       COALESCE(i.inserted_rows, 0) AS inserted_rows,
       a.live_price_sum_c
FROM acct a
LEFT JOIN dvc d ON a.file_id = d.file_id
LEFT JOIN ins i ON a.file_id = i.file_id
"""


@_register("merge1_merge_into_dv", _MERGE1_SQL)
def merge1_merge_into_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 3-clause MERGE INTO, written merge-on-read: the base table is
    laid out as 4 synthetic files with physical row positions (dv1's
    layout — file_id = key % 4, pos = row_number per file ordered by
    key); the delta classifies keys deterministically — DELETE every 13th
    key, UPDATE (+5.00 reprice) every 7th non-13th key, INSERT fresh
    negated 11th keys (the mg1 -(k+1) rule: key 0 exists). Clause order
    is the standard first-match-wins: DELETE's predicate is checked
    before UPDATE's, made mutually exclusive in the delta construction
    so source keys stay unique (a MERGE precondition).

    The WRITE is merge-on-read, not copy-on-write: matched DELETEs and
    UPDATEs both mark the OLD row's (file_id, pos) in a deletion vector;
    updated images and inserts append to a new file (file 4) with fresh
    deterministic positions. Released per file: live rows, DV marks,
    appended update/insert counts, and the live price mass — a reader
    that resurrects a deleted row, loses an update's new image, or
    double-appends reds the hash. The oracle replays the equivalent
    INSERT/UPDATE/DELETE end-state in pure SQL.

    100 TB shape: ONE shuffle on the merge key (the matched join); the
    delta side is the small side and would broadcast in production (here
    both derive from orders, so the join stays keyed); the DV write is
    O(|touched positions|) metadata and the append is O(|delta|) — the
    base files are never rewritten, which is the entire point of
    merge-on-read MERGE. cp1's compaction later folds the DVs in;
    tt1's manifests version the before/after states."""
    from .operators.windows import with_row_number

    o = _t(spark, sf_dir, "orders")
    price_c = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    base = with_row_number(
        o.select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderkey") % 4).cast("bigint").alias("file_id"),
            price_c.alias("price_c"),
        ),
        ["file_id"],
        [F.col("k").asc()],
        "pos",
    ).select(
        "k", "file_id", F.col("pos").cast("bigint").alias("pos"), "price_c"
    ).localCheckpoint(eager=True)
    upserts = o.where(
        (F.col("o_orderkey") % 13 == 0) | (F.col("o_orderkey") % 7 == 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        (price_c + 500).cast("bigint").alias("new_price_c"),
    )
    inserts = o.where(F.col("o_orderkey") % 11 == 0).select(
        (-(F.col("o_orderkey") + 1)).alias("k"),
        F.lit("I").alias("op"),
        price_c.alias("new_price_c"),
    )
    delta = upserts.unionByName(inserts)
    matched = base.join(delta, "k").select(
        "file_id", "pos", "k", "op", "new_price_c"
    )
    dv = matched.where(F.col("op").isin("D", "U")).select("file_id", "pos")
    # The appended file's physical positions are narrative-only (no
    # released column reads them), so the engine side does NOT compute
    # them — a global single-partition row_number here would be a wasted
    # sort/exchange if Catalyst failed to prune it (ADVICE r9). The
    # oracle's position arithmetic stays self-contained in the SQL.
    appended = (
        matched.where(F.col("op") == "U")
        .select("k", "op", "new_price_c")
        .unionByName(
            delta.where(F.col("op") == "I").select("k", "op", "new_price_c")
        )
        .select(
            F.lit(4).cast("bigint").alias("file_id"),
            "k",
            F.col("new_price_c").alias("price_c"),
            "op",
        )
    )
    live = (
        base.join(F.broadcast(dv), ["file_id", "pos"], "left_anti")
        .select("file_id", "price_c")
        .unionByName(appended.select("file_id", "price_c"))
    )
    # Per-file accounting as ONE tagged union + ONE groupBy instead of
    # three per-file aggregates joined back together: (a) one shuffle,
    # not three plus two joins; (b) the appended file's constant
    # file_id=4 would constant-fold a join key into a non-equi predicate
    # and plan a BroadcastNestedLoopJoin (found by the registry-wide
    # plan sweep) — with a union there is no join to degrade.
    tagged = (
        live.select("file_id", F.lit("live").alias("tag"), "price_c")
        .unionByName(
            dv.select(
                "file_id",
                F.lit("dv").alias("tag"),
                F.lit(0).cast("bigint").alias("price_c"),
            )
        )
        .unionByName(
            appended.select(
                "file_id",
                F.concat(F.lit("app_"), F.col("op")).alias("tag"),
                F.lit(0).cast("bigint").alias("price_c"),
            )
        )
    )
    is_tag = lambda t: F.when(F.col("tag") == t, 1)  # noqa: E731
    return tagged.groupBy("file_id").agg(
        F.coalesce(F.sum(is_tag("live")), F.lit(0))
        .cast("bigint")
        .alias("live_rows"),
        F.coalesce(F.sum(is_tag("dv")), F.lit(0))
        .cast("bigint")
        .alias("dv_marked"),
        F.coalesce(F.sum(is_tag("app_U")), F.lit(0))
        .cast("bigint")
        .alias("updated_rows"),
        F.coalesce(F.sum(is_tag("app_I")), F.lit(0))
        .cast("bigint")
        .alias("inserted_rows"),
        F.coalesce(
            F.sum(F.when(F.col("tag") == "live", F.col("price_c"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("live_price_sum_c"),
    )


# skew2's oracle: the planted-skew join aggregate — every even lineitem
# key folds onto dim key 0 (half the fact table on ONE join key), odd
# keys join 1:1. The aggregate is over the join output, so a skew split
# that loses or duplicates a row reds the hash. payload_len_sum is
# 32 * n by construction (md5 hex is always 32 chars): its JOB is to
# force an incompressible column through the shuffle on the engine side
# (see the compression gotcha in the docstring), not to add information.
_SKEW2_SQL = """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE l_orderkey END AS sk,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
  FROM lineitem
), dim AS (
  SELECT o_orderkey AS k, o_orderstatus AS status FROM orders
)
SELECT d.status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.qty_c) AS BIGINT) AS qty_sum_c,
       CAST(32 * COUNT(*) AS BIGINT) AS payload_len_sum
FROM fact f JOIN dim d ON f.sk = d.k
GROUP BY d.status
"""


@_register("skew2_aqe_split", _SKEW2_SQL)
def skew2_aqe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join split, plan-asserted (the rtf1 pattern applied to
    VERDICT r8 item 5): half the fact table is FOLDED onto one join key
    (even lineitem keys -> dim key 0), the join is forced to shuffle
    (broadcast disabled), and AQE's runtime skew mitigation must split
    the monster partition — asserted by the ``skew=true`` marker in the
    EXECUTED adaptive plan, after materialization, so the asserted plan
    is the one that ran. The joined aggregate rides the driver hash: a
    split that drops or duplicates rows of the skewed key changes the
    counts.

    Two scale lessons were needed to make the split actually ENGAGE,
    both measured live (the FIXTURES.md class of finding):
    (1) SINGLE-MAPPER SHUFFLES CANNOT SPLIT — AQE splits a skewed
    reduce partition into ranges of MAP outputs, so a shuffle fed by
    one map task (the single-file testdata scan) has nothing to split;
    the fact side is repartition(16)'d first so the sk-shuffle has 16
    mappers (production fact scans have thousands organically).
    (2) AQE MEASURES COMPRESSED BYTES, NOT ROWS — the hot key's rows
    (constant sk=0, low-cardinality qty) lz4-compressed to the same
    size as the uniform partitions, hiding a 9x row skew completely
    (measured: max 47KB vs median 26KB); an incompressible md5 payload
    column carried through the shuffle restores the byte skew. Real
    skewed payloads (text, events) are naturally high-entropy, but a
    pipeline whose hot key carries only low-cardinality columns will
    genuinely NOT trigger AQE skew handling — row skew without byte
    skew is invisible to MapOutputStatistics.

    Session-conf note: skewedPartitionThresholdInBytes / advisory
    partition size are lowered because the test parquet is ~MBs — at
    production scale the DEFAULTS (256MB/64MB) catch the same skew
    organically. forceOptimizeSkewedJoin covers the extra-shuffle veto
    (the downstream groupBy reshuffles regardless). All confs restored
    in ``finally``.

    100 TB shape: this is THE mitigation for the #1 shuffle killer — a
    hot key (null surrogate, default enum, celebrity entity) that turns
    one reducer into the job's critical path. AQE splits the oversized
    partition into advisory-sized chunks and replicates the matching
    build-side rows per chunk; cost is bounded replication of ONE key's
    build rows, against which the alternative is a straggler that runs
    as long as the whole rest of the stage. salt1 shows the manual
    (pre-AQE) two-phase form of the same idea."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # repartition(16): gotcha (1) — the sk-shuffle needs multiple
        # mappers or its skewed partition has no map-ranges to split
        li = _t(spark, sf_dir, "lineitem").repartition(16)
        o = _t(spark, sf_dir, "orders")
        fact = li.select(
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(0).cast("bigint"))
            .otherwise(F.col("l_orderkey"))
            .alias("sk"),
            (F.col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("qty_c"),
            # gotcha (2) — incompressible payload so the row skew is a
            # BYTE skew in MapOutputStatistics; consumed by the agg so
            # column pruning can't drop it before the exchange
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey"),
                    F.col("l_linenumber"),
                    F.col("l_quantity"),
                ).cast("binary")
            ).alias("payload"),
        )
        dim = o.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
        )
        out = (
            fact.join(dim, fact["sk"] == dim["k"])
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("qty_c").cast("bigint").alias("qty_sum_c"),
                F.sum(F.length("payload"))
                .cast("bigint")
                .alias("payload_len_sum"),
            )
        )
        # materialize FIRST: AQE decides the split at runtime, so the
        # marker only exists in the final adaptive plan
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # explicit raise, not `assert`: plan certifications must survive
        # `python -O` (ADVICE r9)
        if "skew=true" not in plan:
            raise RuntimeError(
                "AQE did not split the planted skewed partition:\n"
                + plan[:2000]
            )
        return local_rows_df(spark, 
            rows,
            "status string, n_rows bigint, qty_sum_c bigint, "
            "payload_len_sum bigint",
        )
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
