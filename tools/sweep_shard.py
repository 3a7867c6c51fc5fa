"""Sharded full-registry repro sweep — fresh JVM per shard (VERDICT r9
item 2).

Rounds 8 and 9 both hit the same failure class in the closing tri-SF
sweep: running the FULL ~500-query registry through ONE long-lived JVM
at sf0.1 degrades partway (contention-class task crashes / executor
thread death), producing dozens of in-sweep "failures" that all re-run
clean on a quiet machine — zero data divergences, pure environment.
The fix prescribed by the round-9 verdict: shard the sweep across K
fresh JVMs so no single JVM lives long enough to degrade, and run the
shards SEQUENTIALLY so they never contend with each other.

Each shard is a subprocess invocation of tools/driver_repro.py (the
byte-faithful driver-hash replica) over a contiguous slice of the
registry in registration order, writing a per-shard report that this
orchestrator merges. Load markers are recorded per shard (the
bench_isolate discipline) so a contended run is visible in the
artifact.

Usage:
    python tools/sweep_shard.py --sf /root/testdata/sf0.1 [--shards 4]
    python tools/sweep_shard.py --all-sfs        # the full tri-SF sweep

Exit code is nonzero if any query diverges, so the round-close recipe
can gate on it. Artifact: /tmp/sweep_<sfname>.json per SF (merged
per-query report + per-shard markers/timings).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]


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


def sweep_one_sf(sf_dir: str, shards: int) -> dict:
    from angelo_bravo_etl_task_spark.queries import all_queries

    names = list(all_queries())
    per = (len(names) + shards - 1) // shards
    sfname = os.path.basename(sf_dir.rstrip("/"))
    merged: dict[str, list[str]] = {}
    shard_meta = []
    for i in range(shards):
        chunk = names[i * per: (i + 1) * per]
        if not chunk:
            continue
        out_path = f"/tmp/sweep_{sfname}_shard{i}.json"
        # ADVICE r10: a shard that crashes before driver_repro writes its
        # report must not silently merge a STALE per-shard file from a
        # previous sweep — remove it up front, and treat a nonzero
        # returncode as ERROR even if a (now fresh) file parses.
        try:
            os.remove(out_path)
        except FileNotFoundError:
            pass
        markers = _load_markers()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "driver_repro.py"),
             "--sf", sf_dir, "--out", out_path, *chunk],
            capture_output=True, text=True, cwd=REPO,
        )
        elapsed = round(time.perf_counter() - t0, 1)
        try:
            if proc.returncode != 0:
                raise ValueError(f"returncode {proc.returncode}")
            report = json.load(open(out_path))
        except (OSError, ValueError):
            report = {n: [f"ERROR: shard {i} crashed "
                          f"(rc={proc.returncode}): "
                          f"{proc.stderr[-300:]}"] for n in chunk}
        merged.update(report)
        hard = sorted(
            k for k, v in report.items()
            if any(p.startswith(("HARD", "ERROR")) for p in v)
        )
        shard_meta.append({
            "shard": i, "n_queries": len(chunk), "seconds": elapsed,
            "hard_bad": hard, "returncode": proc.returncode, **markers,
        })
        print(f"# shard {i}/{shards} ({sfname}): {len(chunk)} queries in "
              f"{elapsed}s, hard_bad={hard}", file=sys.stderr, flush=True)

    hard_bad = sorted(
        k for k, v in merged.items()
        if any(p.startswith(("HARD", "ERROR")) for p in v)
    )
    rows_only = [k for k, v in merged.items()
                 if v and v[0].startswith("(rows-only")]
    checked = len(merged) - len(rows_only)
    summary = {
        "sf_dir": sf_dir,
        "shards": shard_meta,
        "total": len(merged),
        "hash_safe": checked - len(hard_bad),
        "checked": checked,
        "rows_only_clean": len(rows_only),
        "hard_bad": hard_bad,
        "report": merged,
    }
    art = f"/tmp/sweep_{sfname}.json"
    json.dump(summary, open(art, "w"), indent=1, default=str)
    print(f"{sfname}: {summary['hash_safe']}/{checked} hash-safe "
          f"(+{len(rows_only)} rows-only), hard_bad={hard_bad} -> {art}")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=None)
    ap.add_argument("--all-sfs", action="store_true")
    ap.add_argument("--shards", type=int, default=4)
    args = ap.parse_args()
    sfs = SFS if args.all_sfs else [args.sf or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")]
    bad = 0
    for sf in sfs:
        bad += len(sweep_one_sf(sf, args.shards)["hard_bad"])
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
