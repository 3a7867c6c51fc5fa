"""Independent Python-reference properties for wave 80.

u12: replay the per-nation ordered fold in pure Python (exact cents via
Decimal) and certify every row — sequence numbers, running sums,
partition counts — plus that the engine really delivered each partition
sorted (the running sum of an unsorted delivery would diverge).
u13: replay the per-group arrow fold and certify counts/sums/spreads.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _cents(x: float) -> int:
    return int(Decimal(str(round(x, 2))) * 100)


def test_u12_table_arg_fold_replay(spark, sf_dir):
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).to_pylist()
    parts = defaultdict(list)
    for r in cust:
        if r["c_custkey"] % 3 == 0:
            parts[r["c_nationkey"]].append((r["c_custkey"], _cents(r["c_acctbal"])))
    want = {}
    for nk, rows_ in parts.items():
        rows_.sort()
        run = 0
        for i, (ck, cents) in enumerate(rows_, 1):
            run += cents
            want[(nk, ck)] = (i, run, len(rows_))
    rows = QUERIES["u12_udtf_table_arg"][0](spark, sf_dir).collect()
    assert {(r.c_nationkey, r.c_custkey) for r in rows} == set(want)
    for r in rows:
        seq, run, n = want[(r.c_nationkey, r.c_custkey)]
        assert (r.seq, r.running_cents, r.n_part) == (seq, run, n), (
            r.c_nationkey,
            r.c_custkey,
        )
    # partition-order law: within a nation, seq follows custkey order and
    # running_cents is the prefix sum — any unsorted delivery breaks both
    by_nk = defaultdict(list)
    for r in rows:
        by_nk[r.c_nationkey].append(r)
    for nk, rs in by_nk.items():
        rs.sort(key=lambda r: r.c_custkey)
        assert [r.seq for r in rs] == list(range(1, len(rs) + 1))
        acc = 0
        for r, (ck, cents) in zip(rs, parts[nk]):
            acc += cents
            assert r.running_cents == acc


def test_u13_apply_in_arrow_replay(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pylist()
    agg: dict[str, list] = {}
    for r in orders:
        c = _cents(r["o_totalprice"])
        a = agg.setdefault(r["o_orderpriority"], [0, 0, c, c])
        a[0] += 1
        a[1] += c
        a[2] = min(a[2], c)
        a[3] = max(a[3], c)
    rows = QUERIES["u13_apply_in_arrow"][0](spark, sf_dir).collect()
    assert {r.o_orderpriority for r in rows} == set(agg)
    for r in rows:
        n, total, mn, mx = agg[r.o_orderpriority]
        assert (r.n, r.total_cents, r.spread_cents) == (n, total, mx - mn)
