"""Independent Python-reference properties for the wave 48 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_mst1_matches_prim_and_kruskal_total(spark, sf_dir):
    """mst1 == a Python Prim replay edge-for-edge; the total equals an
    independent Kruskal run (unique across all MSTs); the picked edges
    form a spanning tree (n-1 edges, acyclic by union-find)."""
    sks = sorted(r["s_suppkey"] for r in _rows(sf_dir, "supplier"))[:12]
    n = len(sks)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            w = _h(f"mw{sks[i]}_{sks[j]}") % 100 + 1
            edges.append((w, i, j))
    # Prim with (w, u, v) tiebreak
    intree = {0}
    trail = []
    tot = 0
    while len(intree) < n:
        best = min(
            (e for e in edges if (e[1] in intree) != (e[2] in intree))
        )
        w, u, v = best
        intree.add(v if u in intree else u)
        tot += w
        trail.append((len(trail) + 1, sks[u], sks[v], w, tot))
    rows = QUERIES["mst1_prim_spanning_tree"][0](spark, sf_dir).collect()
    got = sorted(
        (r.step, r.u_key, r.v_key, r.w, r.running_total) for r in rows
    )
    assert got == trail
    # Kruskal total (independent algorithm)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ktot = 0
    for w, u, v in sorted(edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            ktot += w
    assert got[-1][4] == ktot
    assert len(got) == n - 1


def test_ransac1_winner_recovers_planted_line(spark, sf_dir):
    """The inlier counts replay in Python, and the best hypothesis's
    line passes the planted (slope 3, intercept 7) within the band:
    its two defining points must both be inliers of y=3x+7."""
    pts = []
    for r in sorted(_rows(sf_dir, "customer"), key=lambda r: r["c_custkey"]):
        k = r["c_custkey"]
        if k % 11 != 0:
            continue
        x = (k // 11) % 50
        nz = _h(f"no{k}")
        y = 3 * x + 7 + (nz % 200 - 100 if k % 6 == 0 else nz % 3 - 1)
        pts.append((x, y))
    n = len(pts)
    expect = {}
    for t in range(1, 11):
        i1 = _h(f"r1{t}") % n
        i2 = _h(f"r2{t}") % n
        x1, y1 = pts[i1]
        x2, y2 = pts[i2]
        if x1 == x2:
            continue
        dx, dy = x2 - x1, y2 - y1
        inl = sum(
            1
            for x, y in pts
            if abs((y - y1) * dx - (x - x1) * dy) <= 2 * abs(dx)
        )
        expect[t] = (x1, y1, dx, dy, inl)
    rows = QUERIES["ransac1_robust_line"][0](spark, sf_dir).collect()
    got = {r.t: (r.x1, r.y1, r.dx, r.dy, r.inliers) for r in rows}
    assert got == expect
    best = max(rows, key=lambda r: (r.inliers, -r.t))
    assert best.is_best
    # winner's defining points lie on (or within noise of) y = 3x + 7
    for x, y in ((best.x1, best.y1), (best.x1 + best.dx, best.y1 + best.dy)):
        assert abs(y - (3 * x + 7)) <= 1, "winner should be built on inliers"
    # and the winner's consensus is a clear majority
    assert best.inliers * 3 >= n * 2


def test_wp1_round_trip_and_longest_match(spark, sf_dir):
    """concat(tokens) == word for every word; and a Python replay of
    the greedy longest-match over the same derived vocab agrees."""
    words = sorted(
        {
            w
            for r in _rows(sf_dir, "documents")
            for w in r["text"].strip().split()
            if w and 3 <= len(w) <= 12
        }
    )[:200]
    g2: dict = defaultdict(int)
    g3: dict = defaultdict(int)
    for w in words:
        for i in range(len(w) - 1):
            g2[w[i : i + 2]] += 1
        for i in range(len(w) - 2):
            g3[w[i : i + 3]] += 1
    v2 = {g for g, _ in sorted(g2.items(), key=lambda kv: (-kv[1], kv[0]))[:30]}
    v3 = {g for g, _ in sorted(g3.items(), key=lambda kv: (-kv[1], kv[0]))[:20]}
    expect = {}
    for w in words:
        toks = []
        p = 0
        while p < len(w):
            if w[p : p + 3] in v3:
                toks.append(w[p : p + 3])
                p += 3
            elif w[p : p + 2] in v2:
                toks.append(w[p : p + 2])
                p += 2
            else:
                toks.append(w[p])
                p += 1
        expect[w] = (len(toks), "/".join(toks))
        assert "".join(toks) == w
    got = {
        r.word: (r.n_tokens, r.tokens)
        for r in QUERIES["wp1_wordpiece_tokenize"][0](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(n < len(w) for w, (n, _) in got.items()), (
        "multigram pieces should compress at least one word"
    )
