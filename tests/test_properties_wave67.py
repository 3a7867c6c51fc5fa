"""Independent Python-reference properties for wave 67.

stats4: replay the moment algebra from the raw parquet with Python
integers (unbounded — no overflow by construction) and certify the
merge law, the variance identity against statistics.pvariance, and
that merge_ok is true on every row.
cv2: rebuild the dense daily series in pure Python (calendar loop, not
window functions), replay both forecasters, and certify error sums,
MAE, and the integer-decided winner.
"""

from __future__ import annotations

import datetime as dt
import statistics
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_stats4_merge_law_and_variance_identity(spark, sf_dir):
    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_orderkey", "l_quantity"]
    ).to_pylist()
    by_flag = defaultdict(list)
    partial = defaultdict(lambda: [0, 0, 0])  # (flag,bucket) -> n,s1,s2
    for r in tbl:
        q = int(r["l_quantity"])
        assert q == r["l_quantity"], "quantity must be integral for the exact cast"
        by_flag[r["l_returnflag"]].append(q)
        p = partial[(r["l_returnflag"], r["l_orderkey"] % 8)]
        p[0] += 1
        p[1] += q
        p[2] += q * q
    rows = QUERIES["stats4_mergeable_moments"][0](spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} == set(by_flag)
    for r in rows:
        qs = by_flag[r.l_returnflag]
        n, s1, s2 = len(qs), sum(qs), sum(q * q for q in qs)
        # direct moments
        assert (r.n_rows, r.sum_q, r.sum_q2) == (n, s1, s2)
        # merge of the python-side partials gives the same triple
        mn = ms1 = ms2 = 0
        for (flag, _b), (pn, p1, p2) in partial.items():
            if flag == r.l_returnflag:
                mn, ms1, ms2 = mn + pn, ms1 + p1, ms2 + p2
        assert (mn, ms1, ms2) == (n, s1, s2)
        assert r.merge_ok is True
        # variance identity vs the standard library (float tolerance only
        # here — the cross-engine check is exact via the oracle hash)
        pv = statistics.pvariance(qs)
        assert abs(r.var_pop_q - pv) < 1e-9 * max(1.0, pv)
        assert abs(r.std_q * r.std_q - r.var_pop_q) < 1e-12 * max(1.0, pv)


def test_cv2_replays_both_forecasters(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"]).to_pylist()
    daily = Counter((r["event_type"], r["ts"].date()) for r in ev)
    types = sorted({t for t, _ in daily})
    expected = {}
    for t in types:
        days = sorted(d for (tt, d) in daily if tt == t)
        d0, d1 = days[0], days[-1]
        spine = [d0 + dt.timedelta(days=i) for i in range((d1 - d0).days + 1)]
        cnt = [daily.get((t, d), 0) for d in spine]
        sae_n = sae_s = n_eval = 0
        for i in range(7, len(cnt)):
            n_eval += 1
            sae_n += abs(cnt[i] - cnt[i - 1])
            sae_s += abs(cnt[i] - cnt[i - 7])
        winner = (
            "seasonal" if sae_s < sae_n else "naive" if sae_n < sae_s else "tie"
        )
        expected[t] = (n_eval, sae_n, sae_s, winner)
    rows = QUERIES["cv2_rolling_origin"][0](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(expected)
    for r in rows:
        n_eval, sae_n, sae_s, winner = expected[r.event_type]
        assert n_eval > 0, "evaluation window must be non-empty"
        assert (r.n_eval, r.sae_naive, r.sae_seasonal) == (n_eval, sae_n, sae_s)
        assert r.mae_naive == sae_n / n_eval
        assert r.mae_seasonal == sae_s / n_eval
        assert r.winner == winner
