"""Independent Python-reference properties for the wave 25-26 algorithms.

Each test recomputes the registered query's result from the raw parquet
with plain Python (hashlib / fractions / float arithmetic in the same
left-fold order) and demands EXACT equality — a verification layer
independent of the DuckDB oracle SQL, so a shared misunderstanding
between the Spark query and its oracle cannot go unnoticed.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _md5_int(s: str, nhex: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def test_hw1_scaled_fold_equals_fraction_holt(spark, sf_dir):
    """hw1's (p4, lhat, bhat) integers == 4^t * (1, l_t, b_t) computed
    with exact Fractions from the textbook Holt recurrence."""
    daily = defaultdict(lambda: defaultdict(int))
    for r in _rows(sf_dir, "events"):
        d = r["ts"].date()
        if d.day <= 16:
            daily[r["event_type"]][d] += 1

    expect = {}
    for et, per_day in daily.items():
        lv = bv = None
        for t, day in enumerate(sorted(per_day), start=1):
            x = Fraction(per_day[day])
            if t == 1:
                lv, bv = x, Fraction(0)
            else:
                l_new = (x + lv + bv) / 2
                bv = (l_new - lv + bv) / 2
                lv = l_new
            p4 = Fraction(4) ** t
            lhat, bhat = lv * p4, bv * p4
            assert lhat.denominator == 1 and bhat.denominator == 1
            expect[(et, day)] = (
                int(p4),
                int(lhat),
                int(bhat),
                int(lhat) + int(bhat),
            )

    got = {
        (r["event_type"], r["day"]): (
            r["p4"],
            r["lhat"],
            r["bhat"],
            r["forecast1_scaled"],
        )
        for r in QUERIES["hw1_holt_linear_trend"][0](spark, sf_dir).collect()
    }
    assert got == expect


def test_regr2_matches_python_theil_sen(spark, sf_dir):
    """regr2's slope/intercept == the Python Theil-Sen replay with the
    identical IEEE divisions and type-1 median picks."""
    daily = defaultdict(int)
    for r in _rows(sf_dir, "events"):
        if r["event_type"] == "click":
            daily[r["ts"].date()] += 1
    ys = [daily[d] for d in sorted(daily)]
    pts = list(enumerate(ys, start=1))
    pairs = [
        (float(yj - yi) / float(xj - xi), xi, xj)
        for i, (xi, yi) in enumerate(pts)
        for xj, yj in pts[i + 1 :]
    ]
    pairs.sort()
    m = len(pairs)
    slope = pairs[(m + 1) // 2 - 1][0]
    res = sorted((float(y) - slope * float(x), x) for x, y in pts)
    intercept = res[(len(pts) + 1) // 2 - 1][0]

    row = QUERIES["regr2_theil_sen"][0](spark, sf_dir).collect()[0]
    assert row["n_days"] == len(pts)
    assert row["n_pairs"] == m
    assert row["slope"] == slope
    assert row["intercept"] == intercept


def test_boot1_matches_python_md5_resample(spark, sf_dir):
    """boot1's point estimate and CI bounds == the hashlib replay of the
    md5-indexed resampling over integer cents."""
    cents = {}
    for r in _rows(sf_dir, "customer"):
        if r["c_custkey"] < 100:
            cents[r["c_custkey"]] = round(r["c_acctbal"] * 100)
    assert len(cents) == 100
    sums = []
    for b in range(40):
        tot = 0
        for j in range(100):
            tot += cents[_md5_int(f"b{b}_{j}", 8) % 100]
        sums.append((tot, b))
    sums.sort()
    row = QUERIES["boot1_bootstrap_ci"][0](spark, sf_dir).collect()[0]
    assert row["point_cents"] == sum(cents.values())
    assert row["lo_cents"] == sums[1][0]
    assert row["hi_cents"] == sums[37][0]


def test_ssj1_equals_bruteforce_jaccard(spark, sf_dir):
    """The prefix filter is LOSSLESS: ssj1's output == the all-pairs
    brute-force Jaccard >= 0.7 over the identical bigram sets."""
    docs = {
        r["doc_id"]: r["text"]
        for r in _rows(sf_dir, "documents")
        if r["doc_id"] % 5 == 0
    }
    corpus = dict(docs)
    for did, text in docs.items():
        if did < 100:
            corpus[did + 1000000] = text.rsplit(" ", 1)[0]

    def bigrams(text: str) -> set[str]:
        w = text.split(" ")
        return {f"{a} {b}" for a, b in zip(w, w[1:])}

    bsets = {d: bigrams(t) for d, t in corpus.items()}
    expect = set()
    ids = sorted(bsets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(bsets[a] & bsets[b])
            uni = len(bsets[a] | bsets[b])
            if 10 * inter >= 7 * uni:
                expect.add((a, b, inter, uni))

    got = {
        (r["doc_a"], r["doc_b"], r["inter"], r["uni"])
        for r in QUERIES["ssj1_prefix_filter_join"][0](spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "planted near-duplicates must produce a non-empty answer"


def test_sp1_matches_python_bellman_ford(spark, sf_dir):
    """sp1's min costs == a dict-based 3-round Bellman-Ford over the
    identical md5-derived weighted graph."""
    best_w = {}
    for r in _rows(sf_dir, "events"):
        eid = str(r["event_id"])
        u = _md5_int("e" + eid, 4) % 5000
        v = _md5_int("v" + eid, 4) % 5000
        w = 1 + _md5_int("w" + eid, 2) % 9
        if u == v:
            continue
        for a, b in ((u, v), (v, u)):
            if (a, b) not in best_w or w < best_w[(a, b)]:
                best_w[(a, b)] = w
    adj = defaultdict(list)
    for (u, v), w in best_w.items():
        adj[u].append((v, w))
    dist = {s: 0 for s in range(0, 5000, 500)}
    for _ in range(3):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in adj[u]:
                if v not in nxt or du + w < nxt[v]:
                    nxt[v] = du + w
        dist = nxt
    got = {
        r["vertex"]: r["min_cost"]
        for r in QUERIES["sp1_weighted_shortest_path"][0](
            spark, sf_dir
        ).collect()
    }
    assert got == dist


def test_mmr1_matches_python_greedy(spark, sf_dir):
    """mmr1's selection sequence == the Python greedy replay with the
    identical left-fold cosine arithmetic."""
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in _rows(sf_dir, "embeddings")
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        import math

        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    qv = vecs[0]
    cand = [
        (vid, cos(qv, vecs[vid]))
        for vid in sorted(vecs)
        if 1 <= vid <= 200
    ]
    cand.sort(key=lambda t: (-t[1], t[0]))
    pool = cand[:8]
    rel = dict(pool)
    selected = [pool[0][0]]
    expect = [(1, pool[0][0], rel[pool[0][0]], None, rel[pool[0][0]])]
    for rnd in range(2, 5):
        best = None
        for vid, rv in pool:
            if vid in selected:
                continue
            ms = max(cos(vecs[vid], vecs[s]) for s in selected)
            score = 0.5 * rv - 0.5 * ms
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, rv, ms, score)
        selected.append(best[1])
        expect.append((rnd, best[1], best[2], best[3], best[4]))

    got = [
        (r["round"], r["vec_id"], r["rel"], r["maxsim"], r["mmr"])
        for r in sorted(
            QUERIES["mmr1_diversified_topk"][0](spark, sf_dir).collect(),
            key=lambda r: r["round"],
        )
    ]
    assert got == expect
