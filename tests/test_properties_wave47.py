"""Independent Python-reference properties for the wave 47 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict, deque

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _traces(sf_dir: str) -> dict:
    tr: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        tr[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    for acc in tr.values():
        acc.sort()
    return tr


def test_lfu1_matches_python_and_opt_dominates(spark, sf_dir):
    """lfu1 == a Python LFU replay; opt1's clairvoyant hits >= lfu1's
    for every user; and LFU vs LRU genuinely differ somewhere (the
    policies are not the same function on this data)."""
    expect = {}
    for uid, acc in _traces(sf_dir).items():
        pages = [p for _, _, p in acc[:30]]
        n = len(pages)
        if n < 10:
            continue
        st: list = []  # sorted list of (count, page)
        hits = 0
        for p in pages:
            idx = next((j for j, (_, q) in enumerate(st) if q == p), None)
            if idx is not None:
                hits += 1
                c, q = st.pop(idx)
                st.append((c + 1, q))
            elif len(st) < 4:
                st.append((1, p))
            else:
                st = sorted(st)[1:] + [(1, p)]
            st = sorted(st)
        expect[uid] = (n, hits, "/".join(f"{q}:{c}" for c, q in st))
    got = {
        r.user_id: (r.n, r.hits, r.freq_state)
        for r in QUERIES["lfu1_cache_replay"][0](spark, sf_dir).collect()
    }
    assert got == expect
    opt = {
        r.user_id: r.hits
        for r in QUERIES["opt1_belady_cache"][0](spark, sf_dir).collect()
    }
    lru = {
        r.user_id: r.hits
        for r in QUERIES["lru1_cache_replay"][0](spark, sf_dir).collect()
    }
    for uid, (_, h, _) in got.items():
        assert opt[uid] >= h, f"OPT must dominate LFU for user {uid}"
    assert any(got[u][1] != lru[u] for u in got), "LFU and LRU should differ"


def test_mdq1_matches_python_deque_and_brute_force(spark, sf_dir):
    """mdq1 == a collections.deque replay AND the brute-force
    max-of-last-5 — the algorithm, the oracle, and a third
    implementation all agree."""
    expect = {}
    for uid, acc in _traces(sf_dir).items():
        vals = [
            _h(f"v{e}") % 1000 for _, e, _ in acc[:30]
        ]
        dq: deque = deque()  # (i, v), strictly decreasing v
        for i, v in enumerate(vals, start=1):
            while dq and dq[-1][1] <= v:
                dq.pop()
            while dq and dq[0][0] <= i - 5:
                dq.popleft()
            dq.append((i, v))
            if i >= 5:
                expect[(uid, i)] = dq[0][1]
                assert dq[0][1] == max(vals[i - 5 : i])  # brute force
    got = {
        (r.user_id, r.i): r.win_max
        for r in QUERIES["mdq1_monotonic_deque"][0](spark, sf_dir).collect()
    }
    assert got == expect


def test_bh1_step_up_and_sandwich(spark, sf_dir):
    """bh1 == a Python BH replay; rejection is exactly rank <= k_max
    (step-up: non-monotone stragglers below the cutoff ARE rejected);
    and Bonferroni-rejected ⊆ BH-rejected ⊆ raw-alpha-passing."""
    keys = sorted(r["p_partkey"] for r in _rows(sf_dir, "part"))[:40]
    ps = sorted(
        (
            (_h(f"pv{k}") % 50 if k % 5 == 0 else _h(f"pv{k}") % 10000, k)
            for k in keys
        )
    )
    m = len(ps)
    k_max = max(
        (k for k, (p, _) in enumerate(ps, start=1) if p * 10 * m <= k * 10000),
        default=0,
    )
    expect = {
        key: (p, k, m, k_max, k <= k_max)
        for k, (p, key) in enumerate(ps, start=1)
    }
    rows = QUERIES["bh1_fdr_control"][0](spark, sf_dir).collect()
    got = {r.key: (r.p_x1e4, r.k, r.m, r.k_max, r.rejected) for r in rows}
    assert got == expect
    rejected = {k for k, (*_, r) in got.items() if r}
    bonf = {k for k, (p, *_) in got.items() if p * 10 * m <= 10000}
    raw = {k for k, (p, *_) in got.items() if p * 10 <= 10000}
    assert bonf <= rejected <= raw
    assert rejected, "cutoff should reject something at m=40, alpha=0.1"
