"""Independent Python-reference properties for the wave 44 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str, k: int = 8) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:k], 16)


def test_wl1_matches_python_and_only_splits(spark, sf_dir):
    """wl1's per-round histograms == a Python WL replay; refinement can
    only split color classes, so the class count is non-decreasing and
    every later-round class nests inside an earlier one."""
    adj: dict = defaultdict(set)
    for r in _rows(sf_dir, "orders"):
        k = r["o_orderkey"]
        if k >= 20000:
            continue
        u = _h(f"{k}-u", 4) % 499
        v = _h(f"{k}-v", 4) % 499
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    colors = {n: len(ns) for n, ns in adj.items()}
    hists = {0: defaultdict(int)}
    for n, c in colors.items():
        hists[0][c] += 1
    parts = {0: dict(colors)}
    for rd in (1, 2):
        nxt = {}
        for n in colors:
            sig = f"{colors[n]}|" + ",".join(
                map(str, sorted(colors[b] for b in adj[n]))
            )
            nxt[n] = _h(sig)
        colors = nxt
        parts[rd] = dict(colors)
        hists[rd] = defaultdict(int)
        for c in colors.values():
            hists[rd][c] += 1
    rows = QUERIES["wl1_weisfeiler_lehman"][0](spark, sf_dir).collect()
    got = defaultdict(dict)
    for r in rows:
        got[r.round][r.color] = r.n_nodes
    assert {rd: dict(h) for rd, h in hists.items()} == dict(got)
    assert len(got[0]) <= len(got[1]) <= len(got[2])
    # same round-2 color => same round-1 color (classes only split)
    by_c2: dict = {}
    for n, c2 in parts[2].items():
        if c2 in by_c2:
            assert parts[1][n] == by_c2[c2]
        else:
            by_c2[c2] = parts[1][n]


def test_gs1_matching_is_stable_and_matches_python(spark, sf_dir):
    """gs1 == a Python Gale-Shapley replay; the matching is perfect and
    admits NO blocking pair (the definition of stability)."""
    cks = sorted(r["c_custkey"] for r in _rows(sf_dir, "customer"))[:6]
    sks = sorted(r["s_suppkey"] for r in _rows(sf_dir, "supplier"))[:6]
    mpref = {
        m: sorted(range(6), key=lambda w: (_h(f"mp{cks[m]}_{sks[w]}"), w))
        for m in range(6)
    }
    worder = {
        w: sorted(range(6), key=lambda m: (_h(f"wp{sks[w]}_{cks[m]}"), m))
        for w in range(6)
    }
    wrank = {w: {m: i + 1 for i, m in enumerate(worder[w])} for w in range(6)}
    eng = [-1] * 6
    nxt = [0] * 6
    while True:
        free = [m for m in range(6) if m not in eng and nxt[m] < 6]
        if not free:
            break
        m = free[0]
        w = mpref[m][nxt[m]]
        nxt[m] += 1
        cur = eng[w]
        if cur == -1 or wrank[w][m] < wrank[w][cur]:
            eng[w] = m
    expect = {
        sks[w]: (
            cks[eng[w]],
            mpref[eng[w]].index(w) + 1,
            wrank[w][eng[w]],
        )
        for w in range(6)
    }
    rows = QUERIES["gs1_stable_matching"][0](spark, sf_dir).collect()
    got = {r.s_suppkey: (r.c_custkey, r.m_rank_of_w, r.w_rank_of_m) for r in rows}
    assert got == expect
    assert sorted(c for c, _, _ in got.values()) == cks  # perfect matching
    # no blocking pair
    match_of_m = {eng[w]: w for w in range(6)}
    for m in range(6):
        for w in range(6):
            if eng[w] == m:
                continue
            m_prefers = mpref[m].index(w) < mpref[m].index(match_of_m[m])
            w_prefers = wrank[w][m] < wrank[w][eng[w]]
            assert not (m_prefers and w_prefers), f"blocking pair {m},{w}"
