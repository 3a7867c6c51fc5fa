"""Independent Python-reference properties for the wave 52 algorithms."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_kad1_matches_kadane_and_brute_force(spark, sf_dir):
    """kad1 == a Python Kadane replay == the O(n^2) brute-force sweep
    over all non-empty subarrays — algorithm, window oracle, and brute
    force all agree; and some user's best subarray is longer than one
    element (the fold is actually accumulating)."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append(
            (r["ts"], r["event_id"], _h(f"kv{r['event_id']}") % 201 - 100)
        )
    expect = {}
    accumulates = False
    for uid, acc in traces.items():
        acc.sort()
        vals = [v for _, _, v in acc[:30]]
        n = len(vals)
        if n < 10:
            continue
        best = cur = -(10**12)
        for v in vals:
            cur = max(v, cur + v)
            best = max(best, cur)
        brute = max(
            sum(vals[i:j])
            for i in range(n)
            for j in range(i + 1, n + 1)
        )
        assert best == brute
        if best > max(vals):
            accumulates = True
        expect[uid] = (n, best)
    got = {
        r.user_id: (r.n, r.max_subarray)
        for r in QUERIES["kad1_max_subarray"][0](spark, sf_dir).collect()
    }
    assert got == expect
    assert accumulates


def test_lz1_matches_python_and_lz78_invariants(spark, sf_dir):
    """lz1 == a Python LZ78 replay; phrases are unique; every phrase is
    an earlier phrase plus one character (the defining LZ78 structure);
    and concatenating the phrases in order plus the tail reproduces the
    input."""
    docs = sorted(_rows(sf_dir, "documents"), key=lambda r: r["doc_id"])[:20]
    expect = {}
    for r in docs:
        s = r["text"][:40]
        if len(s) < 10:
            continue
        dict_: list = []
        cur = ""
        for ch in s:
            ext = cur + ch
            if ext in dict_:
                cur = ext
            else:
                dict_.append(ext)
                cur = ""
        expect[r["doc_id"]] = (
            len(s),
            len(dict_),
            cur,
            chr(31).join(dict_),
        )
        assert len(dict_) == len(set(dict_))
        known = set(dict_)
        for p in dict_:
            assert len(p) == 1 or p[:-1] in known
        assert "".join(dict_) + cur == s
    got = {
        r.doc_id: (r.n_chars, r.n_phrases, r.tail_phrase, r.dictionary)
        for r in QUERIES["lz1_lz78_dictionary"][0](spark, sf_dir).collect()
    }
    assert got == expect
