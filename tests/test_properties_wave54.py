"""Independent Python-reference properties for the wave 54 algorithms."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_topo1_matches_kahn_and_is_topological(spark, sf_dir):
    """topo1 == a Python Kahn replay with the same tiebreak; the order
    is a permutation of the node set; and EVERY edge's src precedes its
    dst — topological validity, the tiebreak-independent certificate."""
    nodes = sorted(
        r["s_suppkey"]
        for r in _rows(sf_dir, "supplier")
        if r["s_suppkey"] // 16 < 3
    )
    nset = set(nodes)
    edges = [
        (u, v)
        for u in nodes
        for v in nodes
        if u // 16 == v // 16
        and v % 4 == u % 4 + 1
        and _h(f"e{u}_{v}") % 3 < 2
    ]
    remaining = set(nodes)
    order = []
    while remaining:
        ready = [
            n
            for n in remaining
            if not any(d == n and s in remaining for s, d in edges)
        ]
        nxt = min(ready)
        order.append(nxt)
        remaining.remove(nxt)
    rows = QUERIES["topo1_kahn_order"][0](spark, sf_dir).collect()
    got = [n for _, n in sorted((r.position, r.node) for r in rows)]
    assert got == order
    assert set(got) == nset and len(got) == len(nset)
    pos = {n: i for i, n in enumerate(got)}
    for s, d in edges:
        assert pos[s] < pos[d], f"edge {s}->{d} violated"


def test_iban1_matches_bigint_mod_and_branches_fire(spark, sf_dir):
    """The digit-fold residue == true Python big-integer arithmetic
    (int(digits) % 97); validity is exactly the complement of the
    tampered slice; both branches are live."""
    keys = sorted(r["c_custkey"] for r in _rows(sf_dir, "customer"))[:40]
    expect = {}
    for k in keys:
        hx = hashlib.md5(f"ac{k}".encode()).hexdigest()[:22]
        body = [int(ch, 16) % 10 for ch in hx]
        rem = int("".join(map(str, body))) % 97
        cd = (1 - rem * 100 % 97 + 97) % 97
        wire = [(x + 1) % 10 for x in body] if k % 9 == 0 else body
        wrem = int("".join(map(str, wire))) % 97
        residue = (wrem * 100 + cd) % 97
        expect[k] = (k % 9 == 0, cd, residue, residue == 1)
    rows = QUERIES["iban1_mod97_check"][0](spark, sf_dir).collect()
    got = {r.key: (r.tampered, r.check_digits, r.residue, r.valid) for r in rows}
    assert got == expect
    valids = [v for _, _, _, v in got.values()]
    assert any(valids) and not all(valids)
    for k, (tampered, _, _, valid) in got.items():
        assert valid == (not tampered)
