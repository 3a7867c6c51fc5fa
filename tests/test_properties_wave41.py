"""Independent Python-reference properties for the wave 41 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_iso1_matches_python_pava_and_is_monotone(spark, sf_dir):
    """iso1's pools == textbook Python PAVA over the identical cells;
    pool means strictly increase; pools partition [min_x, max_x] and
    conserve total (sum, count)."""
    cells: dict = {}
    for r in _rows(sf_dir, "customer"):
        k = r["c_custkey"]
        x = _h(f"p{k}") % 100
        y = 1 if (k % 2 == 0) == (k % 3 == 0) else 0
        s, c = cells.get(x, (0, 0))
        cells[x] = (s + y, c + 1)
    stack: list = []
    for x in sorted(cells):
        s, c = cells[x]
        stack.append([x, x, s, c])
        while len(stack) >= 2 and (
            stack[-2][2] * stack[-1][3] >= stack[-1][2] * stack[-2][3]
        ):
            lo, _, s2, c2 = stack.pop(-2)
            stack[-1] = [lo, stack[-1][1], s2 + stack[-1][2], c2 + stack[-1][3]]
    expect = [tuple(p) for p in stack]
    rows = QUERIES["iso1_isotonic_pava"][0](spark, sf_dir).collect()
    got = sorted((r.x_lo, r.x_hi, r.sum_y, r.n) for r in rows)
    assert got == sorted(expect)
    means = [Fraction(s, n) for _, _, s, n in sorted(got)]
    assert all(a < b for a, b in zip(means, means[1:]))
    assert sum(n for _, _, _, n in got) == sum(c for _, c in cells.values())
    assert sum(s for _, _, s, _ in got) == sum(s for s, _ in cells.values())
    # pools tile the observed x range with no overlap
    spans = sorted((lo, hi) for lo, hi, _, _ in got)
    for (_, h1), (l2, _) in zip(spans, spans[1:]):
        assert h1 < l2


def test_cpm1_matches_python_longest_path(spark, sf_dir):
    """cpm1's critical lengths and argmax predecessors == a Python
    max-plus replay over the identical md5-thinned layered DAG."""
    nodes = [r["s_suppkey"] for r in _rows(sf_dir, "supplier")]
    by_layer: dict = defaultdict(list)
    for n in nodes:
        by_layer[n % 4].append(n)
    edges: dict = defaultdict(list)  # src -> [(dst, w)]
    for layer in range(3):
        for u in by_layer[layer]:
            for v in by_layer[layer + 1]:
                if u // 16 == v // 16 and _h(f"e{u}_{v}") % 3 < 2:
                    edges[u].append((v, _h(f"w{u}_{v}") % 50 + 1))
    dist = {n: 0 for n in by_layer[0]}
    for layer in range(3):
        nxt: dict = {}
        pred: dict = {}
        for u, d in dist.items():
            for v, w in edges.get(u, []):
                cand = d + w
                if v not in nxt or cand > nxt[v] or (
                    cand == nxt[v] and u < pred[v]
                ):
                    if v not in nxt or cand > nxt[v]:
                        nxt[v], pred[v] = cand, u
                    elif cand == nxt[v] and u < pred[v]:
                        pred[v] = u
        dist = nxt
    rows = QUERIES["cpm1_critical_path"][0](spark, sf_dir).collect()
    got = {r.node: (r.critical_len, r.best_pred) for r in rows}
    assert got == {v: (dist[v], pred[v]) for v in dist}
    assert len(got) > 0


def test_sec1_matches_python_policy(spark, sf_dir):
    """sec1's picks == the Python stopping-rule replay; some users hit
    the global best and some miss (both branches live)."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append(
            (r["ts"], r["event_id"], _h(f"q{r['event_id']}") % 1000)
        )
    expect = {}
    for uid, acc in traces.items():
        acc.sort()
        vals = [v for _, _, v in acc[:30]]
        n = len(vals)
        if n < 15:
            continue
        obs_max = max(vals[:11])
        pick_i, pick_v = n, vals[-1]
        for i in range(11, n):
            if vals[i] > obs_max:
                pick_i, pick_v = i + 1, vals[i]
                break
        best = max(vals)
        expect[uid] = (n, obs_max, pick_i, pick_v, best, pick_v == best)
    rows = QUERIES["sec1_secretary_rule"][0](spark, sf_dir).collect()
    got = {
        r.user_id: (r.n, r.obs_max, r.chosen_i, r.chosen_v, r.best_v, r.hit_best)
        for r in rows
    }
    assert got == expect
    hits = [h for *_, h in got.values()]
    assert any(hits) and not all(hits)
