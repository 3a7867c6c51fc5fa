"""Independent Python-reference properties for the wave 46 algorithms."""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _traces(sf_dir: str) -> dict:
    tr: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        tr[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    for acc in tr.values():
        acc.sort()
    return tr


def test_dgim1_matches_python_and_guarantee(spark, sf_dir):
    """dgim1's bucket state == a Python DGIM replay; the DGIM invariant
    (at most 2 buckets per size) holds; and |est - true| <= true/2
    whenever the window has any 1s (the classic 50% bound)."""
    expect = {}
    for uid, acc in _traces(sf_dir).items():
        bits = [1 if t == "click" else 0 for _, _, t in acc[:30]]
        n = len(bits)
        if n < 10:
            continue
        st: list = []
        for i, b in enumerate(bits, start=1):
            st = [x for x in st if x[0] > i - 16]
            if b:
                st = sorted(st + [(i, 1)])
                while True:
                    sizes = [sz for _, sz in st]
                    viol = [s for s in set(sizes) if sizes.count(s) >= 3]
                    if not viol:
                        break
                    s = min(viol)
                    two = [x for x in st if x[1] == s][:2]
                    st = sorted(
                        [x for x in st if x not in two] + [(two[1][0], 2 * s)]
                    )
        sizes = [sz for _, sz in st]
        assert all(sizes.count(s) <= 2 for s in set(sizes)), "DGIM invariant"
        est_x2 = 0 if not st else 2 * sum(sz for _, sz in st[1:]) + st[0][1]
        true_ones = sum(bits[max(0, n - 16):])
        expect[uid] = (
            n,
            len(st),
            est_x2,
            true_ones,
            "/".join(f"{t}:{sz}" for t, sz in st),
        )
        if true_ones:
            assert abs(est_x2 / 2 - true_ones) <= true_ones / 2 + 1e-9
    got = {
        r.user_id: (r.n, r.n_buckets, r.est_x2, r.true_ones, r.buckets)
        for r in QUERIES["dgim1_window_count_sketch"][0](spark, sf_dir).collect()
    }
    assert got == expect


def test_opt1_matches_python_and_dominates_lru(spark, sf_dir):
    """opt1 == a Python Belady replay, and for EVERY user the
    clairvoyant hit count >= lru1's online hit count (OPT's optimality
    among demand-paging policies, as a row-level fact)."""
    expect = {}
    for uid, acc in _traces(sf_dir).items():
        pages = [p for _, _, p in acc[:30]]
        n = len(pages)
        if n < 10:
            continue
        cache: list = []
        hits = 0
        for i, p in enumerate(pages, start=1):
            if p in cache:
                hits += 1
                continue
            if len(cache) < 4:
                cache = sorted(cache + [p])
                continue
            fut = pages[i:]
            scored = sorted(
                ((fut.index(q) + 1 if q in fut else 1000), q) for q in cache
            )
            victim = scored[-1][1]
            cache = sorted([q for q in cache if q != victim] + [p])
        expect[uid] = (n, hits, "/".join(cache))
    got = {
        r.user_id: (r.n, r.hits, r.cache_state)
        for r in QUERIES["opt1_belady_cache"][0](spark, sf_dir).collect()
    }
    assert got == expect
    lru = {
        r.user_id: r.hits
        for r in QUERIES["lru1_cache_replay"][0](spark, sf_dir).collect()
    }
    for uid, (_, opt_hits, _) in got.items():
        assert opt_hits >= lru[uid], f"OPT must dominate LRU for user {uid}"
    assert any(got[u][1] > lru[u] for u in got), "OPT should beat LRU somewhere"
