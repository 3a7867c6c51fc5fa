"""Independent Python-reference properties for the wave 39 algorithms."""

from __future__ import annotations

import bisect
import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_lis1_matches_python_patience(spark, sf_dir):
    """lis1's tails trajectory == textbook patience sorting with
    bisect_left over the identical md5-derived value trace; and the
    reported length is a true LIS length (spot-checked against the
    O(n^2) DP on the first few users)."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append(
            (r["ts"], r["event_id"], _h(f"v{r['event_id']}") % 1000)
        )
    expect = {}
    vals_by_uid = {}
    for uid, acc in traces.items():
        acc.sort()
        vals = [v for _, _, v in acc[:30]]
        if len(vals) < 10:
            continue
        tails: list = []
        for v in vals:
            p = bisect.bisect_left(tails, v)
            if p == len(tails):
                tails.append(v)
            else:
                tails[p] = v
        expect[uid] = (len(vals), len(tails), "/".join(map(str, tails)))
        vals_by_uid[uid] = vals
    got = {
        r.user_id: (r.n_values, r.lis_len, r.tails_state)
        for r in QUERIES["lis1_longest_increasing"][0](spark, sf_dir).collect()
    }
    assert got == expect
    # O(n^2) DP cross-check of the LENGTH on a few users
    for uid in sorted(vals_by_uid)[:5]:
        vals = vals_by_uid[uid]
        dp = [1] * len(vals)
        for i in range(len(vals)):
            for j in range(i):
                if vals[j] < vals[i]:
                    dp[i] = max(dp[i], dp[j] + 1)
        assert got[uid][1] == max(dp)


def test_act1_greedy_is_feasible_and_matches_python(spark, sf_dir):
    """act1's kept count == the Python EDF greedy over the identical
    interval set, and kept <= n_intervals with some user keeping >1."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        s = int(r["ts"].timestamp() * 1_000_000)
        d = (_h(f"d{r['event_id']}") % 20 + 1) * 60_000_000
        traces[r["user_id"]].append((s + d, r["event_id"], s))
    expect = {}
    for uid, iv in traces.items():
        iv.sort()
        iv = iv[:30]
        if len(iv) < 10:
            continue
        last_end = 0
        kept = 0
        for e, _, s in iv:
            if s >= last_end:
                kept += 1
                last_end = e
        expect[uid] = (len(iv), kept, last_end)
    got = {
        r.user_id: (r.n_intervals, r.kept, r.last_end)
        for r in QUERIES["act1_activity_selection"][0](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(k > 1 for _, k, _ in expect.values())


def test_ams1_replays_in_python_and_is_unbiased_in_structure(spark, sf_dir):
    """ams1's S_j and exact F2 == a hashlib replay; the mean of the 16
    estimates is within 5x of the true F2 (loose sanity — AMS variance
    is bounded by 2*F2^2, so gross blowups indicate a sign-hash bug)."""
    counts: dict = defaultdict(int)
    for r in _rows(sf_dir, "events"):
        counts[r["user_id"]] += 1
    f2 = sum(c * c for c in counts.values())
    expect = {}
    for j in range(16):
        s = sum(
            (1 if _h(f"s{j}_{u}") % 2 == 0 else -1) * c
            for u, c in counts.items()
        )
        expect[j] = (s, s * s, f2)
    rows = QUERIES["ams1_f2_sketch"][0](spark, sf_dir).collect()
    got = {r.j: (r.s_j, r.est_f2, r.f2_true) for r in rows}
    assert got == expect
    mean_est = sum(e for _, e, _ in got.values()) / 16
    assert f2 / 5 <= mean_est <= 5 * f2
