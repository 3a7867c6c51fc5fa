"""Streaming sinks beyond the memory sink: foreachBatch → batch writers.

The reference's load() (Angelo_ETL_Task.py:276-374) is a batch JDBC load;
its streaming twin is ``foreachBatch``, which hands each micro-batch to
the SAME batch writer (`sources/writers.write_jdbc`) — so the DDL types,
batching, and connection-cap behavior are shared, not reimplemented. This
is the standard continuous-ETL shape: stream → transform → transactional
per-batch load, with the batch id available for idempotent writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.writers import write_jdbc


def stream_to_jdbc(
    stream_df: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **properties: str,
):
    """Write a streaming DataFrame to a JDBC table via foreachBatch,
    availableNow (process everything currently available, then stop).

    Each micro-batch appends through ``write_jdbc`` — partition-parallel
    batched inserts with the connection cap. Exactly-once is the usual
    foreachBatch contract: the checkpoint makes redelivery possible on
    failure, so a production target table should either be idempotent on
    a key or record ``batch_id`` in a side table; for append-only audit
    loads (this shape) at-least-once is the documented semantics.
    Returns the finished StreamingQuery (already awaited).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        write_jdbc(
            batch_df,
            url,
            table,
            mode="append",
            batchsize=batchsize,
            num_partitions=num_partitions,
            **properties,
        )

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
