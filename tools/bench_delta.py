"""Compare two bench_result.json snapshots and list per-query swings.

Round 6 lost time chasing six >1.5x swings that were JVM variance;
bench.py now records median-of-3 for the expensive tail, and this tool
makes the round-over-round comparison one command:

    python tools/bench_delta.py                     # HEAD's committed
                                                    # bench_result.json vs
                                                    # the one on disk
    python tools/bench_delta.py old.json new.json   # explicit files
    python tools/bench_delta.py --threshold 1.5

Queries whose time grew past the threshold print as REGRESSION (suffix
'(median)' when the new time is a median-of-3 — those are trustworthy;
single-run swings are labeled 'single-run' and should be re-measured
before acting). Exit code 1 if any median-backed regression exists.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    return json.load(open(path))


def _load_git(ref: str) -> dict:
    raw = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{ref}:bench_result.json"]
    )
    return json.loads(raw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", help="old bench JSON (default: HEAD)")
    ap.add_argument("new", nargs="?",
                    help="new bench JSON (default: bench_result.json)")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore queries faster than this in BOTH runs")
    ap.add_argument("--write-median-set", action="store_true",
                    help="add single-run queries that swung >1.5x in "
                         "EITHER direction to bench_median_set.json so "
                         "the next bench.py run measures them "
                         "median-of-3 (verdict r7 item 4)")
    args = ap.parse_args()

    old = _load(args.old) if args.old else _load_git("HEAD")
    new = _load(args.new) if args.new else _load(
        os.path.join(REPO, "bench_result.json"))
    oq, nq = old["queries"], new["queries"]
    n_med = new.get("median_of", {})

    print(f"old: sum={old.get('sum_all_queries_sec')}s "
          f"px1={old.get('value')}s | "
          f"new: sum={new.get('sum_all_queries_sec')}s "
          f"px1={new.get('value')}s")
    hard = []
    swung = []  # single-run >1.5x movers, either direction
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a is None or b is None or a < 0 or b < 0:
            continue
        if max(a, b) < args.min_sec:
            continue
        if name not in n_med and max(a, b) > 1.5 * min(a, b):
            swung.append(name)
        if b > args.threshold * a:
            kind = "median" if name in n_med else "single-run"
            print(f"REGRESSION {name}: {a}s -> {b}s "
                  f"({b / a:.2f}x, {kind})")
            if name in n_med:
                hard.append(name)
        elif a > args.threshold * b:
            print(f"improved   {name}: {a}s -> {b}s ({b / a:.2f}x)")
    if args.write_median_set and swung:
        path = os.path.join(REPO, "bench_median_set.json")
        doc = json.load(open(path))
        added = [n for n in swung if n not in set(doc["queries"])]
        if added:
            doc["queries"].extend(added)
            with open(path, "w") as fh:
                json.dump(doc, fh, indent=2)
                fh.write("\n")
            print(f"median set += {added}")
    gone = sorted(set(oq) - set(nq))
    added = sorted(set(nq) - set(oq))
    if gone:
        print(f"removed queries: {gone}")
    if added:
        print(f"new queries: {added}")
    if hard:
        print(f"\n{len(hard)} median-backed regression(s): {hard}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
