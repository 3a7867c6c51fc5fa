"""Interleaved fresh-JVM A/B between two repo checkouts (VERDICT r11 item 1/8).

Machine-era drift makes cross-bench subtraction unreliable; the only
trustworthy per-query comparison on this host is same-minute alternation of
old/new checkouts, each sample in a FRESH JVM (subprocess), with the bench
confs (AQE off, 8 shuffle partitions at sub-SF-1) and a sf0.001 warmup.

Usage:
    python tools/ab_interleave.py --a /root/wt_r12_base --b /root/repo \
        --rounds 3 px1_loinc_i2b2_pipeline [more names...]
    python tools/ab_interleave.py --one <repo> <name>   # internal child

Prints per-round samples and the median per side. Exit code is always 0 —
the adjudication is the human's (or the log's), not the tool's.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def _child(repo: str, name: str) -> None:
    sys.path.insert(0, repo)
    from angelo_bravo_etl_task_spark.queries import QUERIES  # noqa: PLC0415
    from angelo_bravo_etl_task_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app_name="ab", adaptive=False, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name][0]
    try:
        fn(spark, WARMUP_DIR).count()
    except Exception as exc:  # noqa: BLE001
        print(f"# warmup failed: {exc}", file=sys.stderr)
    t0 = time.perf_counter()
    fn(spark, SF_DIR).count()
    dt = time.perf_counter() - t0
    print(json.dumps({"sec": round(dt, 3)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", help="checkout A (e.g. old worktree)")
    ap.add_argument("--b", help="checkout B (e.g. working tree)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--one", nargs=2, metavar=("REPO", "NAME"),
                    help="internal: child mode")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.one:
        _child(*args.one)
        return

    assert args.a and args.b and args.names
    for name in args.names:
        samples: dict[str, list[float]] = {"A": [], "B": []}
        for r in range(args.rounds):
            for label, repo in (("A", args.a), ("B", args.b)):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--one", repo, name],
                    capture_output=True, text=True, timeout=600,
                )
                line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
                try:
                    sec = json.loads(line)["sec"]
                except (ValueError, KeyError):
                    print(f"{name} {label} round {r}: FAILED\n{out.stderr[-2000:]}")
                    continue
                samples[label].append(sec)
                print(f"{name} {label} round {r}: {sec}s", flush=True)
        for label, repo in (("A", args.a), ("B", args.b)):
            s = samples[label]
            med = statistics.median(s) if s else float("nan")
            print(f"== {name} {label} ({repo}): median {med:.3f}s of "
                  f"{sorted(round(x, 3) for x in s)}")


if __name__ == "__main__":
    main()
