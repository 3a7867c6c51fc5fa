"""Independent Python-reference properties for the wave 63 algorithms."""

from __future__ import annotations

from collections import defaultdict
from itertools import product

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

# HMM weights: start 5/5; transitions 0->0:8 0->1:2 1->0:4 1->1:6;
# emissions state0 {0:7, 1:3}, state1 {0:2, 1:8}
_T = {(0, 0): 8, (0, 1): 2, (1, 0): 4, (1, 1): 6}
_E = {0: {0: 7, 1: 3}, 1: {0: 2, 1: 8}}


def test_hmm1_viterbi_equals_brute_force_over_all_paths(spark, sf_dir):
    """Per-lane bests == the max over ALL 64 state paths ending in that
    state (exhaustive certificate); both ends_in_buy branches live."""
    tr: dict = defaultdict(list)
    for r in pq.read_table(f"{sf_dir}/events.parquet").to_pylist():
        tr[r["user_id"]].append(
            (r["ts"], r["event_id"], 1 if r["event_type"] in ("click", "purchase") else 0)
        )
    rows = QUERIES["hmm1_viterbi"][0](spark, sf_dir).collect()
    got = {r.user_id: r for r in rows}
    flags = set()
    for uid, acc in tr.items():
        acc.sort()
        obs = [o for _, _, o in acc[:6]]
        if len(obs) != 6:
            assert uid not in got
            continue
        best = {0: 0, 1: 0}
        for path in product((0, 1), repeat=6):
            score = 5 * _E[path[0]][obs[0]]
            for k in range(1, 6):
                score *= _T[(path[k - 1], path[k])] * _E[path[k]][obs[k]]
            best[path[-1]] = max(best[path[-1]], score)
        r = got[uid]
        assert r.observations == "".join(map(str, obs))
        assert (r.best_end_browse, r.best_end_buy) == (best[0], best[1])
        assert r.viterbi_score == max(best.values())
        assert r.ends_in_buy == (best[1] > best[0])
        flags.add(r.ends_in_buy)
    assert flags == {True, False}, "both decode outcomes should occur"


def test_kmp1_failure_function_definition_and_matcher(spark, sf_dir):
    """Each failure value IS the longest proper prefix==suffix at that
    position; a Python KMP matcher using the emitted failure function
    finds counts consistent with the engines' non-overlapping
    replace() arithmetic."""
    rows = QUERIES["kmp1_failure_function"][0](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"][:60]
        for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    }
    assert rows
    for r in rows:
        s = docs[r.doc_id]
        p = s[3:6]
        assert r.pattern == p
        fail = [int(x) for x in r.failure_fn.split("/")]
        assert len(fail) == len(p)
        for i in range(len(p)):
            prefix = p[: i + 1]
            cands = [
                k
                for k in range(i + 1)
                if prefix.endswith(p[:k]) or k == 0
            ]
            want = max(k for k in range(i + 1) if prefix[-k:] == p[:k] or k == 0)
            assert fail[i] == want
        # KMP matcher with the emitted table (overlapping matches)
        k = 0
        overlap = 0
        for ch in s:
            while k > 0 and p[k] != ch:
                k = fail[k - 1]
            if p[k] == ch:
                k += 1
            if k == len(p):
                overlap += 1
                k = fail[k - 1]
        # replace() counts NON-overlapping occurrences
        non_overlap = 0
        i = 0
        while True:
            j = s.find(p, i)
            if j < 0:
                break
            non_overlap += 1
            i = j + len(p)
        assert r.n_occurrences == non_overlap
        assert overlap >= non_overlap
