"""Independent Python-reference properties for wave 79.

est2: rebuild all per-key counts in pure Python, replay both plans'
intermediate/final cardinalities, certify costs, the associativity law,
that exactly one plan is chosen, and that the chosen one really is the
argmin (with the filtered-first plan winning on this data).
src10: re-aggregate the lineitem slice from the ORIGINAL parquet and
compare against the ORC round-trip output, certifying format fidelity
independently of DuckDB.
"""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_est2_replay_costs_and_laws(spark, sf_dir):
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pylist()
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pylist()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).to_pylist()
    building = {r["c_custkey"] for r in cust if r["c_mktsegment"] == "BUILDING"}
    lcnt = Counter(r["l_orderkey"] for r in li)
    co_orders = [r for r in orders if r["o_custkey"] in building]
    inter_co = len(co_orders)
    final_a = sum(lcnt.get(r["o_orderkey"], 0) for r in co_orders)
    inter_ol = sum(lcnt.get(r["o_orderkey"], 0) for r in orders)
    final_b = sum(
        lcnt.get(r["o_orderkey"], 0)
        for r in orders
        if r["o_custkey"] in building
    )
    rows = {r.plan: r for r in QUERIES["est2_join_order"][0](spark, sf_dir).collect()}
    assert set(rows) == {"(C*O)*L", "C*(O*L)"}
    a, b = rows["(C*O)*L"], rows["C*(O*L)"]
    assert (a.inter_rows, a.final_rows) == (inter_co, final_a)
    assert (b.inter_rows, b.final_rows) == (inter_ol, final_b)
    assert a.cost == inter_co + final_a and b.cost == inter_ol + final_b
    # associativity: both orders agree on the final cardinality
    assert a.assoc_ok and b.assoc_ok and final_a == final_b
    # exactly one chosen, and it is the argmin
    assert a.is_chosen != b.is_chosen or a.cost == b.cost
    chosen = a if a.is_chosen else b
    assert chosen.cost == min(a.cost, b.cost)
    # the pushdown dividend: the filtered-first plan wins on this data
    assert a.is_chosen and a.cost < b.cost


def test_src10_orc_fidelity_vs_parquet(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
        ],
    ).to_pylist()
    want: dict[tuple, list] = {}
    for r in li:
        if r["l_orderkey"] % 7 != 0:
            continue
        key = (r["l_returnflag"], r["l_linestatus"])
        agg = want.setdefault(key, [0, 0, Decimal("0.00")])
        agg[0] += 1
        agg[1] += int(r["l_quantity"])
        agg[2] += Decimal(str(round(r["l_extendedprice"], 2)))
    rows = QUERIES["src10_orc_roundtrip"][0](spark, sf_dir).collect()
    assert {(r.l_returnflag, r.l_linestatus) for r in rows} == set(want)
    for r in rows:
        n, qty, price = want[(r.l_returnflag, r.l_linestatus)]
        assert (r.n, r.sum_qty) == (n, qty)
        assert abs(r.sum_price - float(price)) < 1e-6
