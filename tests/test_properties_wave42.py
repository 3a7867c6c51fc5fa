"""Independent Python-reference properties for the wave 42 algorithms."""

from __future__ import annotations

import hashlib
import heapq
import math
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_huff1_matches_heapq_and_bounds(spark, sf_dir):
    """huff1's merge trajectory == a heapq replay (with the same
    smallest-two-by-value tie order, since values pop before identity
    matters only through weights), and the final cost sits between the
    entropy lower bound and the fixed-4-bit upper bound."""
    weights: dict = defaultdict(int)
    for r in _rows(sf_dir, "events"):
        weights[hashlib.md5(str(r["user_id"]).encode()).hexdigest()[0]] += 1
    heap = sorted(weights.values())
    heapq.heapify(heap)
    trace = []
    cum = 0
    while len(heap) >= 2:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        cum += a + b
        trace.append((len(trace) + 1, a + b, cum))
        heapq.heappush(heap, a + b)
    rows = QUERIES["huff1_huffman_cost"][0](spark, sf_dir).collect()
    got = sorted((r.step, r.merged_w, r.cost_so_far) for r in rows)
    assert got == trace
    assert all(r.n_symbols == len(weights) for r in rows)
    total = sum(weights.values())
    entropy_bits = sum(
        w * math.log2(total / w) for w in weights.values()
    )
    cost = got[-1][2]
    assert entropy_bits <= cost + 1e-9
    assert cost <= total * math.ceil(math.log2(len(weights)))


def test_band1_matches_python_learner(spark, sf_dir):
    """band1's (pulls, rewards, total) == a plain-Python epsilon-greedy
    replay with identical md5 coins and floor-div exploit argmax; and
    exploitation concentrates pulls (some user pulls one arm more than
    half the time)."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append((r["ts"], r["event_id"]))
    expect = {}
    for uid, acc in traces.items():
        acc.sort()
        eids = [str(e) for _, e in acc[:20]]
        if len(eids) < 10:
            continue
        cnt = [0, 0, 0]
        sm = [0, 0, 0]
        tot = 0
        for eid in eids:
            if _h(f"c{eid}") % 10 < 2:
                arm = _h(f"a{eid}") % 3
            else:
                scores = [
                    (10**15 - a) if cnt[a] == 0 else (sm[a] * 1000) // cnt[a]
                    for a in range(3)
                ]
                arm = min(range(3), key=lambda a: (-scores[a], a))
            rw = _h(f"r{arm}_{eid}") % 100
            cnt[arm] += 1
            sm[arm] += rw
            tot += rw
        expect[uid] = (
            len(eids),
            tot,
            "/".join(map(str, cnt)),
            "/".join(map(str, sm)),
        )
    rows = QUERIES["band1_epsilon_greedy"][0](spark, sf_dir).collect()
    got = {
        r.user_id: (r.n, r.total_reward, r.pulls_state, r.rewards_state)
        for r in rows
    }
    assert got == expect
    assert any(
        max(map(int, p.split("/"))) * 2 > n
        for n, _, p, _ in expect.values()
    )


def test_cov1_matches_python_greedy(spark, sf_dir):
    """cov1's pick trajectory == the Python greedy over the identical
    universe; marginal gains are non-increasing and coverage counts
    non-decreasing."""
    doc_terms = {}
    df: dict = defaultdict(int)
    for r in _rows(sf_dir, "documents"):
        ts = {t for t in r["text"].strip().split() if t}
        doc_terms[r["doc_id"]] = ts
        for t in ts:
            df[t] += 1
    univ = {
        t for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    }
    cands = {
        d: ts & univ for d, ts in doc_terms.items() if d % 11 == 0
    }
    covered: set = set()
    trace = []
    for rd in range(1, 6):
        best = min(
            cands.items(), key=lambda kv: (-len(kv[1] - covered), kv[0])
        )
        gain = len(best[1] - covered)
        covered |= best[1]
        trace.append((rd, best[0], gain, len(covered)))
    rows = QUERIES["cov1_greedy_set_cover"][0](spark, sf_dir).collect()
    got = sorted((r.round, r.picked_doc, r.gain, r.covered_after) for r in rows)
    assert got == trace
    gains = [g for _, _, g, _ in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    cas = [c for *_, c in got]
    assert all(a <= b for a, b in zip(cas, cas[1:]))
    assert gains[0] > 0
