"""Independent Python-reference properties for the wave 61 classics."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_cr1_closed_form_matches_token_simulation(spark, sf_dir):
    """The relational closed form == an actual Python token-passing
    simulation of Chang-Roberts; exactly one leader; it holds the max
    id; and total messages is between n (best case) and n(n+1)/2."""
    ids = {p: _h(f"id{p}") for p in range(16)}
    # simulate: each token hops clockwise until a larger id kills it
    travel = {}
    for p in range(16):
        hops = 0
        q = p
        while True:
            q = (q + 1) % 16
            hops += 1
            if ids[q] > ids[p]:
                break
            if q == p:
                break
        travel[p] = hops
    rows = QUERIES["cr1_ring_election"][0](spark, sf_dir).collect()
    got = {r.pos: (r.nid, r.messages, r.is_leader) for r in rows}
    for p in range(16):
        assert got[p][0] == ids[p]
        assert got[p][1] == travel[p]
    leaders = [p for p, (_, _, lead) in got.items() if lead]
    assert len(leaders) == 1
    assert ids[leaders[0]] == max(ids.values())
    total = rows[0].total_messages
    assert total == sum(travel.values())
    assert 16 <= total <= 16 * 17 // 2


def test_trap1_matches_brute_force_and_bounds(spark, sf_dir):
    """trap1 == the brute-force per-bar computation; 0 <= trapped <=
    empty space above the bars; and somebody traps something."""
    tr: dict = defaultdict(list)
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        tr[r["user_id"]].append((r["ts"], r["event_id"]))
    expect = {}
    for uid, acc in tr.items():
        acc.sort()
        hs = [_h(f"ht{e}") % 10 for _, e in acc[:30]]
        n = len(hs)
        if n < 10:
            continue
        water = sum(
            min(max(hs[: i + 1]), max(hs[i:])) - hs[i] for i in range(n)
        )
        expect[uid] = (n, water, sum(hs))
    got = {
        r.user_id: (r.n, r.trapped, r.total_height)
        for r in QUERIES["trap1_rain_water"][0](spark, sf_dir).collect()
    }
    assert got == expect
    for uid, (n, w, th) in got.items():
        assert 0 <= w <= 9 * n - th
    assert any(w > 0 for _, w, _ in got.values())
