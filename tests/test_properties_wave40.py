"""Independent Python-reference properties for the wave 40 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_knap1_matches_python_dp_and_brute_force(spark, sf_dir):
    """knap1's dp trajectory == the textbook Python DP; and on a few
    customers the corner value == brute-force best over all subsets."""
    items: dict = defaultdict(list)
    for r in _rows(sf_dir, "orders"):
        items[r["o_custkey"]].append(r["o_orderkey"])
    expect = {}
    sets = {}
    for ck, keys in items.items():
        keys.sort()
        its = [(_h(f"w{k}") % 10 + 1, _h(f"x{k}") % 100 + 1) for k in keys[:12]]
        if len(its) < 5:
            continue
        dp = [0] * 26
        for wt, val in its:
            dp = [
                max(dp[w], dp[w - wt] + val) if w >= wt else dp[w]
                for w in range(26)
            ]
        expect[ck] = (len(its), dp[25], "/".join(map(str, dp)))
        sets[ck] = its
    got = {
        r.o_custkey: (r.n_items, r.best_value, r.dp_state)
        for r in QUERIES["knap1_knapsack"][0](spark, sf_dir).collect()
    }
    assert got == expect
    for ck in sorted(sets)[:3]:
        its = sets[ck]
        best = max(
            (
                sum(v for _, v in sub)
                for n in range(len(its) + 1)
                for sub in combinations(its, n)
                if sum(w for w, _ in sub) <= 25
            ),
        )
        assert got[ck][1] == best


def _ring_assign(kh: int, nodes: list[int]) -> int:
    best = None
    for n in nodes:
        for v in range(8):
            h = _h(f"n{n}_{v}") % 10**9
            pack = ((h - kh) % 10**9) * 64 + n * 8 + v
            if best is None or pack < best[0]:
                best = (pack, n)
    return best[1]


def test_ring1_zero_churn_between_survivors(spark, sf_dir):
    """Removing node 4 moves ONLY node 4's keys (every off-diagonal row
    has from_node == 4), the totals match the distinct-key count, and a
    Python ring replay agrees with the matrix."""
    uids = {r["user_id"] for r in _rows(sf_dir, "events")}
    expect: dict = defaultdict(int)
    for u in uids:
        kh = _h(f"k{u}") % 10**9
        b = _ring_assign(kh, [0, 1, 2, 3, 4])
        a = _ring_assign(kh, [0, 1, 2, 3])
        expect[(b, a)] += 1
    rows = QUERIES["ring1_consistent_hash"][0](spark, sf_dir).collect()
    got = {(r.from_node, r.to_node): r.n_keys for r in rows}
    assert got == dict(expect)
    assert sum(got.values()) == len(uids)
    for (b, a), n in got.items():
        if b != a:
            assert b == 4, "only the removed node's keys may move"


def test_cms1_overestimates_and_replays(spark, sf_dir):
    """Every count-min estimate >= the true count (collisions only
    add), and the (cells, estimates) replay exactly in Python."""
    counts: dict = defaultdict(int)
    for r in _rows(sf_dir, "events"):
        counts[r["user_id"]] += 1
    cells: dict = defaultdict(int)
    for u, c in counts.items():
        for r in range(4):
            cells[(r, _h(f"r{r}_{u}") % 64)] += c
    expect = {}
    for u, c in counts.items():
        if u % 37 == 0:
            expect[u] = (c, min(cells[(r, _h(f"r{r}_{u}") % 64)] for r in range(4)))
    rows = QUERIES["cms1_count_min"][0](spark, sf_dir).collect()
    got = {r.user_id: (r.true_count, r.est_count) for r in rows}
    assert got == expect
    for u, (c, e) in got.items():
        assert e >= c
