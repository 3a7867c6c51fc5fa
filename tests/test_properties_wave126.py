"""Wave-126 properties: lp1's label propagation replayed in pure Python
(independent algorithm reference — two engines can share a bug, a
hashlib replay can't share it with both)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from angelo_bravo_etl_task_spark.queries_wave126 import (
    _ROUNDS,
    lp1_label_propagation,
)


def _mix(k: int, tag: str) -> int:
    return int(hashlib.md5(f"{k}{tag}".encode()).hexdigest()[:4], 16) % 499


def test_lp1_matches_pure_python_replay(spark, sf_dir):
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    keys = [
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .where("o_orderkey < 20000")
        .select("o_orderkey")
        .collect()
    ]
    edges = set()
    for k in keys:
        u, v = _mix(k, "-u"), _mix(k, "-v")
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    labels = {n: n for n in adj}
    for _ in range(_ROUNDS):
        nxt = {}
        for n, ms in adj.items():
            cnt = Counter(labels[m] for m in ms)
            # max count, tie -> min label (the packed-argmax rule)
            nxt[n] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = nxt
    rows = lp1_label_propagation(spark, sf_dir).collect()
    assert len(rows) == len(adj)
    for r in rows:
        assert r["label_3"] == labels[r["node_id"]], (
            r["node_id"], r["label_3"], labels[r["node_id"]])
        assert r["degree"] == len(adj[r["node_id"]])
    # propagation happened: not every node still carries its own id
    assert any(r["label_3"] != r["node_id"] for r in rows)
