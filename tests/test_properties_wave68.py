"""Independent Python-reference properties for wave 68.

tk2: replay both top-k phases in pure Python from the raw parquet —
sorted() with the exact (price DESC, key ASC) tiebreak — and certify
that the two-phase result equals the direct one, that the query's rows
are that unique answer, and that every agree flag is true.
w14: re-derive the decile assignment with the textbook ntile allocation
(first n mod 10 tiles get one extra row) and certify sizes, min/max
balances, and both emitted laws per tile.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _top20(rows):
    return sorted(rows, key=lambda r: (-r["o_totalprice"], r["o_orderkey"]))[:20]


def test_tk2_two_phase_equals_direct(spark, sf_dir):
    tbl = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pylist()
    direct = _top20(tbl)
    buckets = defaultdict(list)
    for r in tbl:
        buckets[r["o_orderkey"] % 8].append(r)
    survivors = [r for b in buckets.values() for r in _top20(b)]
    merged = _top20(survivors)
    assert merged == direct, "mergeable top-k law must hold in the replay"
    rows = QUERIES["tk2_mergeable_topk"][0](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, 21))
    for r, exp in zip(rows, direct):
        assert r.o_orderkey == exp["o_orderkey"]
        assert r.o_totalprice == exp["o_totalprice"]
        assert r.agree is True


def test_w14_ntile_allocation_and_boundaries(spark, sf_dir):
    tbl = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_mktsegment", "c_acctbal", "c_custkey"],
    ).to_pylist()
    by_seg = defaultdict(list)
    for r in tbl:
        by_seg[r["c_mktsegment"]].append(r)
    expected = {}
    for seg, rows in by_seg.items():
        rows.sort(key=lambda r: (r["c_acctbal"], r["c_custkey"]))
        n = len(rows)
        base, rem = divmod(n, 10)
        start = 0
        for d in range(1, 11):
            size = base + (1 if d <= rem else 0)
            tile = rows[start : start + size]
            start += size
            if tile:
                bals = [r["c_acctbal"] for r in tile]
                expected[(seg, d)] = (size, min(bals), max(bals))
    out = QUERIES["w14_ntile_deciles"][0](spark, sf_dir).collect()
    assert {(r.c_mktsegment, r.decile) for r in out} == set(expected)
    prev_max = {}
    for r in out:
        size, mn, mx = expected[(r.c_mktsegment, r.decile)]
        assert (r.n_cust, r.min_bal, r.max_bal) == (size, mn, mx)
        assert r.size_ok is True
        assert r.boundary_ok is True
        if r.c_mktsegment in prev_max:
            assert r.min_bal >= prev_max[r.c_mktsegment]
        prev_max[r.c_mktsegment] = r.max_bal
