r"""Round-8 wave 108: transactional foreachBatch (e18) — the staged-commit
upgrade that closes e13's documented exactly-once gap.

e13's CDC apply-loop is at-least-once with completed-batch dedup: its
comment (and ADVICE r7) records that a retry of an attempt which died
AFTER partially mutating external state would re-apply rows. e18 builds
the fix — stage every mutation into a transaction-local buffer and commit
it ATOMICALLY with the batch marker — and proves both halves with a real
mid-apply crash and restart:

- a NAIVE sink that mutates in place, crashed after applying part of a
  batch, DOUBLE-COUNTS on replay (asserted in-query);
- the TXN sink, staged + atomically committed, survives the same crash
  with exactly-once totals (the driver hash certifies them against the
  batch oracle).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries import _register, _t
from .operators.localframe import local_rows_df

_E18_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
FROM events WHERE event_id % 3 <> 0
GROUP BY event_type
"""


@_register("e18_txn_foreachbatch", _E18_SQL)
def e18_txn_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once foreachBatch via staged mutations committed atomically
    with the batch marker — demonstrated against a REAL mid-apply crash.

    The stream (4 parquet tranches, maxFilesPerTrigger=2 → 2 micro-batches)
    feeds one foreachBatch fn maintaining two sinks:

    - naive: applies each per-key partial in place, marks the batch done
      only afterwards (e13's shape). The injected crash kills batch 1's
      first attempt after 2 keys are applied — on replay the whole batch
      re-applies and those keys double-count. Asserted, not assumed:
      naive totals end ABOVE ground truth.
    - txn: builds the post-batch state in a STAGING buffer first; the
      mutation visible to readers happens in one commit step together
      with the marker. The crashed attempt staged nothing visible, the
      replay commits once — totals are exactly-once, and THEY are what
      the driver hashes against the batch oracle.

    The restart is a genuine kill-and-resume on the same checkpoint
    (StreamingQueryException caught, new writeStream started); the crash
    fires exactly once (asserted). At 100 TB the staging buffer is the
    sink transaction (MERGE INTO ... inside the same txn as the batch-id
    ledger row); the per-batch partial stays key-bounded so the commit
    is O(keys touched), never O(stream)."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") % 3 != 0)
        .select("event_id", "event_type")
    )
    base = tempfile.mkdtemp(prefix="sg_e18_")
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")

    naive: dict[str, tuple[int, int]] = {}
    naive_markers: set[int] = set()
    txn: dict[str, tuple[int, int]] = {}
    txn_markers: set[int] = set()
    crashed = [False]
    applied_rows = [0]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        partial = sorted(
            batch_df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("event_id").alias("s"),
            )
            .collect(),
            key=lambda r: r.event_type,
        )
        # --- naive sink: in-place mutation, marker afterwards -------------
        if batch_id not in naive_markers:
            for i, r in enumerate(partial):
                n0, s0 = naive.get(r.event_type, (0, 0))
                naive[r.event_type] = (n0 + r.n, s0 + r.s)
                if batch_id >= 1 and not crashed[0] and i + 1 >= 2:
                    # die mid-apply, before the marker AND before the txn
                    # sink stages anything — the replay hazard e13's
                    # comment warns about, made real
                    crashed[0] = True
                    raise RuntimeError("injected sink failure mid-apply")
            naive_markers.add(batch_id)
        # --- txn sink: stage everything, commit with the marker -----------
        if batch_id not in txn_markers:
            staged = {}
            for r in partial:
                n0, s0 = txn.get(r.event_type, (0, 0))
                staged[r.event_type] = (n0 + r.n, s0 + r.s)
            # atomic commit point: state and marker move together
            txn.update(staged)
            txn_markers.add(batch_id)
            applied_rows[0] += sum(r.n for r in partial)

    def _run() -> None:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(indir)
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    try:
        for t in range(4):
            ev.where(F.col("event_id") % 4 == t).repartition(1).write.mode(
                "append"
            ).parquet(indir)
        crash_seen = False
        try:
            _run()
        except Exception:
            crash_seen = True
        assert crash_seen and crashed[0], "injected crash never fired"
        # r12: wait on the actual condition (the failed query leaving the
        # active list) instead of a fixed 0.5 s sleep — safer AND faster
        _dl = time.time() + 5
        while time.time() < _dl and spark.streams.active:
            time.sleep(0.02)
        _run()  # kill-and-resume on the same checkpoint

        truth_n = ev.count()
        txn_n = sum(n for n, _ in txn.values())
        naive_n = sum(n for n, _ in naive.values())
        assert txn_n == truth_n == applied_rows[0], (txn_n, truth_n)
        # the naive sink DID double-apply the pre-crash keys — the hazard
        # is real, not hypothetical
        assert naive_n > truth_n, (naive_n, truth_n)
        rows = [
            (etype, int(n), int(s)) for etype, (n, s) in sorted(txn.items())
        ]
        return local_rows_df(spark, 
            rows, "event_type string, n_events bigint, sum_event_ids bigint"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
