"""Independent Python-reference properties for the wave 50 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_ca1_matches_python_life(spark, sf_dir):
    """ca1's three generations == a textbook Python Conway replay on
    the identical seed, and the population actually changes between
    rounds (the rule is doing something)."""
    alive = {
        (x, y)
        for x in range(16)
        for y in range(16)
        if _h(f"g{x}_{y}") % 3 == 0
    }
    gens = {}
    cur = alive
    for rd in (1, 2, 3):
        nb: dict = defaultdict(int)
        for x, y in cur:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx or dy:
                        nb[(x + dx, y + dy)] += 1
        cur = {
            (x, y)
            for x in range(16)
            for y in range(16)
            if nb.get((x, y), 0) == 3
            or ((x, y) in cur and nb.get((x, y), 0) == 2)
        }
        gens[rd] = set(cur)
    rows = QUERIES["ca1_stencil_rounds"][0](spark, sf_dir).collect()
    got: dict = defaultdict(set)
    for r in rows:
        got[r.round].add((r.x, r.y))
    assert dict(got) == gens
    assert gens[1] != gens[2] or gens[2] != gens[3]


def test_ecc1_every_codeword_recovered(spark, sf_dir):
    """Every single-bit corruption is corrected (recovered == True for
    all rows), the syndrome always names the planted flip position, and
    a Python Hamming replay agrees bit for bit."""
    rows = QUERIES["ecc1_hamming_correct"][0](spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.recovered, f"key {r.key} not recovered"
        assert r.syndrome == r.flip_pos
        # python replay
        data = _h(f"dt{r.key}") % 16
        flip = _h(f"fl{r.key}") % 7 + 1
        d = [(data >> k) & 1 for k in range(4)]
        p1 = d[0] ^ d[1] ^ d[3]
        p2 = d[0] ^ d[2] ^ d[3]
        p3 = d[1] ^ d[2] ^ d[3]
        bits = [p1, p2, d[0], p3, d[1], d[2], d[3]]  # positions 1..7
        cw = sum(b << k for k, b in enumerate(bits))
        rec = cw ^ (1 << (flip - 1))
        assert (r.data, r.flip_pos, r.codeword, r.received) == (
            data,
            flip,
            cw,
            rec,
        )
        assert r.decoded == data


def test_crdt1_semilattice_laws_and_convergence(spark, sf_dir):
    """The replica views replay in Python; slot-wise max is
    commutative/associative/idempotent on the actual view vectors; the
    merged counter equals the true per-owner totals and sums to the
    event count; and some view is genuinely stale (gossip < 100%)."""
    evs = _rows(sf_dir, "events")
    true_cnt: dict = defaultdict(int)
    views: dict = {v: defaultdict(int) for v in range(3)}
    for r in evs:
        e = r["event_id"]
        owner = _h(f"rp{e}") % 3
        gpos = _h(f"gs{e}") % 100
        key = (r["event_type"], owner)
        true_cnt[key] += 1
        for v in range(3):
            if owner == v or gpos < 60:
                views[v][key] += 1
    rows = QUERIES["crdt1_gcounter_merge"][0](spark, sf_dir).collect()
    got_views: dict = {v: {} for v in range(3)}
    merged: dict = {}
    for r in rows:
        got_views[r.replica][(r.event_type, r.owner)] = r.slot
        merged[(r.event_type, r.owner)] = r.merged_slot
    for v in range(3):
        assert got_views[v] == dict(views[v])
    # convergence: merged == true counts, total preserved
    assert merged == dict(true_cnt)
    assert sum(merged.values()) == len(evs)
    # semilattice laws on the actual vectors
    def mrg(a, b):
        return {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}

    a, b, c = (dict(views[v]) for v in range(3))
    assert mrg(a, b) == mrg(b, a)
    assert mrg(mrg(a, b), c) == mrg(a, mrg(b, c))
    assert mrg(a, a) == a
    # staleness is real: some replica view undercounts some slot
    assert any(
        got_views[v].get(k, 0) < n
        for k, n in true_cnt.items()
        for v in range(3)
    )
