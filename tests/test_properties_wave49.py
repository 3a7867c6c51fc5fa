"""Independent Python-reference properties for the wave 49 algorithms."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_bp1_matches_python_ffd_and_bounds(spark, sf_dir):
    """bp1's assignment trail == a Python FFD replay; no bin overflows;
    and the bin count respects ceil(total/cap) <= bins <=
    (11/9)*LB + 1 (FFD's classical guarantee vs the volume bound)."""
    keys = sorted(r["o_orderkey"] for r in _rows(sf_dir, "orders"))[:30]
    items = sorted(
        ((_h(f"sz{k}") % 900 + 100, k) for k in keys),
        key=lambda t: (-t[0], t[1]),
    )
    bins: list = []
    trail = []
    for sz, k in items:
        fit = next((i for i, b in enumerate(bins) if b + sz <= 1000), None)
        if fit is None:
            bins.append(sz)
            trail.append((k, sz, len(bins) - 1))
        else:
            bins[fit] += sz
            trail.append((k, sz, fit))
    rows = QUERIES["bp1_bin_packing"][0](spark, sf_dir).collect()
    got = sorted((r.key, r.sz, r.bin_idx) for r in rows)
    assert got == sorted(trail)
    assert all(r.n_bins == len(bins) for r in rows)
    assert all(b <= 1000 for b in bins)
    lb = math.ceil(sum(sz for sz, _ in items) / 1000)
    assert lb <= len(bins) <= (11 / 9) * lb + 1


def test_morris1_matches_python_and_is_logspace(spark, sf_dir):
    """morris1 replays exactly in hashlib; the exponent never exceeds
    what n events could produce (c increments at most once per event,
    and the first event always increments); estimate = 2^c - 1."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append((r["ts"], r["event_id"]))
    expect = {}
    for uid, acc in traces.items():
        acc.sort()
        eids = [str(e) for _, e in acc[:30]]
        n = len(eids)
        if n < 10:
            continue
        c, m = 0, 1
        for eid in eids:
            if _h(f"mc{eid}") % m == 0:
                c += 1
                m *= 2
        expect[uid] = (n, c, m - 1)
        assert 1 <= c <= n
        assert m - 1 == 2**c - 1
    got = {
        r.user_id: (r.n, r.c, r.estimate)
        for r in QUERIES["morris1_approx_counter"][0](spark, sf_dir).collect()
    }
    assert got == expect


def test_jo1_matches_dp_and_brute_force_optimum(spark, sf_dir):
    """jo1's full dp table == the textbook Python interval DP, and the
    root cost dp[1,6] == the minimum over ALL 42 parenthesizations
    enumerated recursively — the DP is certified optimal."""
    keys = sorted(r["p_partkey"] for r in _rows(sf_dir, "part"))[:7]
    d = [_h(f"d{k}") % 20 + 1 for k in keys]
    INF = 10**15
    dp = [[0] * 7 for _ in range(7)]
    split = [[0] * 7 for _ in range(7)]
    for ln in range(2, 7):
        for i in range(1, 8 - ln):
            j = i + ln - 1
            best = (INF, 0)
            for k in range(i, j):
                c = dp[i][k] + dp[k + 1][j] + d[i - 1] * d[k] * d[j]
                if (c, k) < best:
                    best = (c, k)
            dp[i][j], split[i][j] = best
    expect = sorted(
        (i, i + ln - 1, dp[i][i + ln - 1], split[i][i + ln - 1])
        for ln in range(2, 7)
        for i in range(1, 8 - ln)
    )
    rows = QUERIES["jo1_join_order_dp"][0](spark, sf_dir).collect()
    got = sorted((r.lo, r.hi, r.cost, r.best_split) for r in rows)
    assert got == expect

    def brute(i, j):
        if i == j:
            return [0]
        costs = []
        for k in range(i, j):
            for a in brute(i, k):
                for b in brute(k + 1, j):
                    costs.append(a + b + d[i - 1] * d[k] * d[j])
        return costs

    all_costs = brute(1, 6)
    assert len(all_costs) == 42  # Catalan(5)
    assert dp[1][6] == min(all_costs)
