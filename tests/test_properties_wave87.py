"""Independent Python-reference properties for wave 87.

ts5: replay business-day counting against Python's REAL calendar
(datetime.weekday) — the closed form must agree exactly on every
(order, ship) pair, which pins the Monday alignment and the census
formula against an independent implementation.
fx1: replay the publication schedule, rates, and exact conversion;
certify both laws per group and the global reconciliation bound.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import date, timedelta
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _busdays(a: date, b: date) -> int:
    """Weekdays in (a, b] — independent ground truth via weekday()."""
    n = 0
    d = a + timedelta(days=1)
    while d <= b:
        if d.weekday() < 5:
            n += 1
        d += timedelta(days=1)
    return n


def test_ts5_closed_form_matches_real_calendar(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pylist()
    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        ).to_pylist()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for r in li:
        od = orders[r["l_orderkey"]]
        sd = r["l_shipdate"].date()
        if sd < od:
            continue
        m = str(od)[:7]
        agg[m][0] += 1
        agg[m][1] += (sd - od).days
        agg[m][2] += _busdays(od, sd)
    rows = QUERIES["ts5_business_days"][0](spark, sf_dir).collect()
    assert {r.order_month for r in rows} == set(agg)
    for r in rows:
        n, cal, bus = agg[r.order_month]
        assert (r.n_lines, r.sum_caldays, r.sum_busdays) == (n, cal, bus), (
            r.order_month
        )
        assert abs(r.avg_caldays - cal / n) < 1e-12
        assert abs(r.avg_busdays - bus / n) < 1e-12
        assert r.bus_le_cal_ok and bus <= cal
        assert r.weekday_share_ok and 7 * bus + 14 * n >= 5 * cal
    # the comparison is informative: weekends actually removed somewhere
    assert any(agg[m][2] < agg[m][1] for m in agg)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_fx1_replay_rates_and_reconciliation(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pylist()
    nation = {
        r["c_custkey"]: r["c_nationkey"]
        for r in pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pylist()
    }
    groups = defaultdict(lambda: [0, 0, 0, 0])  # n, cents, converted, raw
    rates = {}
    for r in orders:
        nk = nation[r["o_custkey"]]
        d = r["o_orderdate"]
        q = (d.year - 1992) * 4 + ((d.month - 1) // 3)
        pub = 2 * (q // 2)
        rate = 800000 + _h8(f"fx:{nk}:{pub}") % 400000
        cents = int(Decimal(str(round(r["o_totalprice"], 2))) * 100)
        g = groups[(nk, q)]
        g[0] += 1
        g[1] += cents
        g[2] += (cents * rate) // 1000000
        g[3] += cents * rate
        rates[(nk, q)] = (pub, rate)
    rows = QUERIES["fx1_effective_rates"][0](spark, sf_dir).collect()
    assert {(r.nk, r.q) for r in rows} == set(groups)
    for r in rows:
        n, cents, conv, raw = groups[(r.nk, r.q)]
        pub, rate = rates[(r.nk, r.q)]
        assert (r.n_orders, r.sum_cents, r.sum_converted) == (n, cents, conv)
        assert (r.pub_q, r.rate_ppm) == (pub, rate)
        assert r.effective_ok and pub <= r.q and r.q - pub <= 1
        assert r.truncation_ok
        assert 1000000 * conv <= raw < 1000000 * (conv + n)
    # staleness branches: both fresh (gap 0) and stale (gap 1) quarters
    gaps = {r.q - r.pub_q for r in rows}
    assert gaps == {0, 1}
