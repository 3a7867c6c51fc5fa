"""Capture `.explain("formatted")` for named queries into plans/r11/.

Usage:
    python tools/plan_capture.py --suffix before [--sf /root/testdata/sf0.1] name...
    python tools/plan_capture.py --suffix after name...

Writes plans/r11/<name>_<suffix>.txt. Plan capture only analyzes/optimizes,
it does not execute, so it is cheap and safe to run alongside other work.
Streaming queries (whose builder executes a run) are skipped unless --exec
is given.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from angelo_bravo_etl_task_spark.queries import QUERIES  # noqa: E402
from angelo_bravo_etl_task_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r11"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    # Mirror the bench harness confs (AQE off / 8 shuffle parts below sf1)
    # so the captured plan is the plan the bench actually runs.
    spark = get_spark(app_name="plan-capture", adaptive=False,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm  # type: ignore[attr-defined]

    for name in args.names:
        if name not in QUERIES:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        fn = QUERIES[name][0]
        out = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        try:
            df = fn(spark, args.sf)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")  # type: ignore
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {exc}\n"
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
