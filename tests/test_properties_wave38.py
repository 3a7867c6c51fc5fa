"""Independent Python-reference properties for the wave 38 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def test_lru1_matches_python_replay(spark, sf_dir):
    """lru1's (hits, final cache) == a plain-Python LRU replay of the
    identical per-user first-30 access trace (capacity 4, hit moves to
    front, miss prepends and evicts the tail)."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    expect = {}
    for uid, acc in traces.items():
        acc.sort()
        pages = [p for _, _, p in acc[:30]]
        if len(pages) < 10:
            continue
        cache: list = []
        hits = 0
        for p in pages:
            if p in cache:
                hits += 1
                cache.remove(p)
            else:
                cache = cache[:3]
            cache.insert(0, p)
        expect[uid] = (len(pages), hits, "/".join(cache))
    got = {
        r.user_id: (r.n_accesses, r.hits, r.cache_state)
        for r in QUERIES["lru1_cache_replay"][0](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(h > 0 for _, h, _ in expect.values()), "some user must hit"


def test_cal3_bins_partition_and_gap_arithmetic(spark, sf_dir):
    """cal3's bins partition the customer table exactly, the md5 scorer
    is replayed bit-for-bit in hashlib, and each gap numerator equals
    |sum_pred - 100*pos| recomputed from the raw per-bin tallies."""
    n = defaultdict(int)
    sp = defaultdict(int)
    pos = defaultdict(int)
    total = 0
    for r in _rows(sf_dir, "customer"):
        k = r["c_custkey"]
        pct = int(hashlib.md5(f"p{k}".encode()).hexdigest()[:8], 16) % 100
        out = 1 if (k % 2 == 0) == (k % 3 == 0) else 0
        b = pct // 10
        n[b] += 1
        sp[b] += pct
        pos[b] += out
        total += 1
    rows = QUERIES["cal3_reliability_bins"][0](spark, sf_dir).collect()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert (r.n, r.sum_pred_pct, r.n_pos) == (n[r.bin], sp[r.bin], pos[r.bin])
        assert r.gap_num_x100 == abs(r.sum_pred_pct - 100 * r.n_pos)
        assert r.gap_den_x100 == 100 * r.n
