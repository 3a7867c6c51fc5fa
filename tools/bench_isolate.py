"""Fresh-JVM isolation A/B for bench drift adjudication (VERDICT r8 item 2).

Round 8 showed a diffuse +28% round-over-round drift across the identical
470-query set with zero code change to the affected queries. Two hypotheses:

  (a) SUITE AGING — 493 queries (incl. 23 heavy streaming additions) in one
      JVM accrete heap/GC/state-store/temp-view overhead that slows the
      tail of the in-suite sweep;
  (b) ENVIRONMENT — the machine itself got slower (contention, cgroup
      change), in which case a fresh JVM reproduces the slow times too.

Protocol (prescribed verbatim by VERDICT r8): take the biggest swings from
tools/bench_delta.py, run EACH in a FRESH JVM one-at-a-time (subprocess =
new JVM; same bench confs: AQE off, 8 shuffle partitions at sub-SF-1), with
a sf0.001 warmup pass and a median-of-3 timed measurement at sf0.1, and
compare against the in-suite times from the r7 and r8 snapshots.

Decision rule printed at the end:
  solo-fresh ~= r7 level (ratio vs r7 <= 1.15 for the majority) -> aging;
  solo-fresh ~= r8 level  -> environment change.

Load markers (loadavg, MemAvailable) are recorded per query so a contended
run is visible in the artifact (VERDICT r8 item 2's "record load markers").

Usage:
    python tools/bench_isolate.py q8_market_share j6_null_safe_join ...
    python tools/bench_isolate.py --one <name>    # internal: child mode
Writes bench_isolation.json next to the repo's bench_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def _load_markers() -> dict:
    m: dict = {}
    try:
        m["loadavg_1m"] = os.getloadavg()[0]
    except OSError:
        pass
    try:
        for line in open("/proc/meminfo"):
            if line.startswith("MemAvailable:"):
                m["mem_available_kb"] = int(line.split()[1])
                break
    except OSError:
        pass
    return m


def child(name: str) -> None:
    """Fresh-JVM single-query measurement; prints one JSON line."""
    from angelo_bravo_etl_task_spark.queries import QUERIES
    from angelo_bravo_etl_task_spark.session import get_spark

    spark = get_spark(
        app_name=f"isolate-{name}", adaptive=False, shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name][0]
    if os.path.isdir(WARMUP_DIR):
        fn(spark, WARMUP_DIR).count()
    samples = []
    for _ in range(3):
        start = time.perf_counter()
        fn(spark, SF_DIR).count()
        samples.append(round(time.perf_counter() - start, 3))
    print(json.dumps({"name": name, "samples": sorted(samples),
                      "median": statistics.median(samples)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--one", default=None)
    ap.add_argument("--r7", default=None,
                    help="r7 bench_result.json for comparison")
    ap.add_argument("--r8", default=None,
                    help="r8 bench_result.json for comparison")
    args = ap.parse_args()
    if args.one:
        child(args.one)
        return

    r7 = json.load(open(args.r7))["queries"] if args.r7 else {}
    r8 = (json.load(open(args.r8))["queries"] if args.r8
          else json.load(open(os.path.join(REPO, "bench_result.json")))
          ["queries"])

    results = []
    for name in args.names:
        markers = _load_markers()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except ValueError:
            rec = {"name": name, "error": out.stderr[-500:]}
        rec.update(markers)
        rec["r7_insuite"] = r7.get(name)
        rec["r8_insuite"] = r8.get(name)
        if rec.get("median") and r7.get(name):
            rec["ratio_vs_r7"] = round(rec["median"] / r7[name], 2)
        if rec.get("median") and r8.get(name):
            rec["ratio_vs_r8"] = round(rec["median"] / r8[name], 2)
        results.append(rec)
        print(f"# {name}: fresh-JVM median={rec.get('median')} "
              f"r7={rec.get('r7_insuite')} r8={rec.get('r8_insuite')} "
              f"vs_r7={rec.get('ratio_vs_r7')} vs_r8={rec.get('ratio_vs_r8')}",
              file=sys.stderr, flush=True)

    ok = [r for r in results if r.get("ratio_vs_r7")]
    at_r7 = sum(1 for r in ok if r["ratio_vs_r7"] <= 1.15)
    verdict = (
        "suite-aging (fresh-JVM times match r7: in-suite accretion is the "
        "drift cause)" if ok and at_r7 >= len(ok) / 2 else
        "environment (fresh-JVM reproduces the slow r8 times: machine/env "
        "change)" if ok else "inconclusive"
    )
    artifact = {
        "sf_dir": SF_DIR,
        "decision_rule": "majority ratio_vs_r7 <= 1.15 -> suite-aging",
        "at_r7_level": at_r7,
        "measured": len(ok),
        "verdict": verdict,
        "results": results,
    }
    path = os.path.join(REPO, "bench_isolation.json")
    json.dump(artifact, open(path, "w"), indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("at_r7_level", "measured", "verdict")}))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
