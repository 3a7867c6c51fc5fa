"""Instrumented measurement of the streaming-family floor (VERDICT r11
item 3): where do the ~3 s/query of the Structured Streaming rows go?

Runs a representative streaming query set in this process (bench confs)
and, for each, prints:
  - wall-clock construct vs execute (the bench action),
  - per-batch ``durationMs`` components from the query's progress events
    (captured via a StreamingQueryListener: triggerExecution, addBatch,
    getBatch, latestOffset, queryPlanning, commitOffsets, walCommit,
    stateStore commit times when present),
  - dead time = wall-clock minus the sum of trigger executions (checkpoint
    dir setup, query start/stop, driver latency between batches).

Usage:
    python tools/stream_floor_probe.py e5_stream_stream_join st1_stateful_sessions ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from angelo_bravo_etl_task_spark.queries import QUERIES  # noqa: E402
from angelo_bravo_etl_task_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    progress_log: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            progress_log.append({"event": "started", "t": time.perf_counter()})

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            progress_log.append(
                {
                    "event": "progress",
                    "t": time.perf_counter(),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryTerminated(self, event):  # noqa: N802
            progress_log.append({"event": "terminated", "t": time.perf_counter()})

    spark = get_spark(app_name="stream-floor", adaptive=False,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(_L())

    for name in args.names:
        fn = QUERIES[name][0]
        if not args.no_warmup:
            try:
                fn(spark, WARMUP_DIR).count()
            except Exception as exc:  # noqa: BLE001
                print(f"warmup failed {name}: {exc}")
        progress_log.clear()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        n = df.count()
        t2 = time.perf_counter()
        # listener events are delivered async; give the bus a beat
        time.sleep(0.5)
        print(f"\n== {name}: construct {t1 - t0:.3f}s, execute "
              f"{t2 - t1:.3f}s, rows={n}")
        trig_total = 0.0
        for e in progress_log:
            if e["event"] != "progress":
                rel = e["t"] - t0
                print(f"   [{rel:7.3f}s] {e['event']}")
                continue
            d = e["durationMs"]
            trig_total += d.get("triggerExecution", 0) / 1000.0
            rel = e["t"] - t0
            comp = ", ".join(
                f"{k}={v}" for k, v in sorted(d.items()) if v
            )
            print(f"   [{rel:7.3f}s] batch {e['batchId']} "
                  f"rows={e['numInputRows']}: {comp}")
        print(f"   sum(triggerExecution)={trig_total:.3f}s, "
              f"construct-wall dead time="
              f"{t1 - t0 - trig_total:.3f}s (if stream runs in construct)")
    spark.stop()


if __name__ == "__main__":
    main()
