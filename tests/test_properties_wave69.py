"""Independent Python-reference properties for wave 69.

decay1: replay the integer half-life weighting from the raw events with
Python ints (weight = 1024 >> min(age, 10)), certify scores, both rank
orders, and that the decayed score is bounded by 1024 × raw_count.
lbl1: rebuild the feature/label windows in pure Python with datetime
arithmetic, certify every column, that the two windows are disjoint by
construction, and that both label branches actually fire (non-vacuous).
"""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_decay1_integer_decay_replay(spark, sf_dir):
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    ).to_pylist()
    daily = Counter((r["event_type"], r["ts"].date()) for r in ev)
    ref = max(d for _, d in daily)
    score, raw = Counter(), Counter()
    for (t, d), cnt in daily.items():
        age = (ref - d).days
        score[t] += cnt * (1024 >> min(age, 10))
        raw[t] += cnt
    types = sorted(score)
    rank_dec = {
        t: i + 1
        for i, t in enumerate(sorted(types, key=lambda t: (-score[t], t)))
    }
    rank_raw = {
        t: i + 1
        for i, t in enumerate(sorted(types, key=lambda t: (-raw[t], t)))
    }
    rows = QUERIES["decay1_halflife_leaderboard"][0](spark, sf_dir).collect()
    assert [r.event_type for r in rows] == types
    for r in rows:
        assert r.decayed_score == score[r.event_type]
        assert r.raw_count == raw[r.event_type]
        assert r.rank_decayed == rank_dec[r.event_type]
        assert r.rank_raw == rank_raw[r.event_type]
        assert r.rank_shift == r.rank_raw - r.rank_decayed
        # weight bounds: 1 <= per-event weight <= 1024
        assert r.raw_count <= r.decayed_score <= 1024 * r.raw_count


def test_lbl1_windows_disjoint_and_replayed(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pylist()
    custs = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).to_pylist()
    dmax = max(r["o_orderdate"].date() for r in orders)
    cutoff = dmax - dt.timedelta(days=90)
    feats = defaultdict(lambda: [0, Decimal("0.00"), None, False])
    for r in orders:
        d = r["o_orderdate"].date()
        f = feats[r["o_custkey"]]
        if d <= cutoff:
            f[0] += 1
            f[1] += Decimal(str(round(r["o_totalprice"], 2)))
            f[2] = d if f[2] is None else max(f[2], d)
        else:
            f[3] = True
    rows = QUERIES["lbl1_leakage_free_labels"][0](spark, sf_dir).collect()
    assert [r.c_custkey for r in rows] == sorted(c["c_custkey"] for c in custs)
    n_true = n_false = 0
    for r in rows:
        n, tot, last, lbl = feats.get(
            r.c_custkey, (0, Decimal("0.00"), None, False)
        )
        assert r.n_orders_before == n
        assert r.total_before == float(tot)
        if last is None or r.c_custkey not in feats:
            assert r.days_since_last is None
        else:
            assert r.days_since_last == (cutoff - last).days
            assert r.days_since_last >= 0, "features must predate the cutoff"
        assert r.label is lbl
        n_true += lbl
        n_false += not lbl
    assert n_true > 0 and n_false > 0, "both label branches must fire"
