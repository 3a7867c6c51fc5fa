"""Independent Python-reference properties for wave 71.

apri1: rebuild the support lattice in pure Python (itertools over
per-basket item sets), certify the top-30 selection, every attached
support, and the anti-monotonicity law both as the emitted flag and
re-derived.
an4: replay the equi-width binning and per-cell distinct counts,
certify verdicts, and assert both branches fire.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_apri1_lattice_replay(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    s1, s2, s3 = Counter(), Counter(), Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        s1.update(ps)
        s2.update(combinations(ps, 2))
        s3.update(combinations(ps, 3))
    top = sorted(s3, key=lambda t: (-s3[t], t))[:30]
    rows = QUERIES["apri1_support_lattice"][0](spark, sf_dir).collect()
    assert [(r.part_a, r.part_b, r.part_c) for r in rows] == top
    for r in rows:
        key = (r.part_a, r.part_b, r.part_c)
        assert r.supp_abc == s3[key]
        assert r.supp_ab == s2[(r.part_a, r.part_b)]
        assert r.supp_ac == s2[(r.part_a, r.part_c)]
        assert r.supp_bc == s2[(r.part_b, r.part_c)]
        assert (r.supp_a, r.supp_b, r.supp_c) == (
            s1[r.part_a],
            s1[r.part_b],
            s1[r.part_c],
        )
        min_pair = min(r.supp_ab, r.supp_ac, r.supp_bc)
        min_item = min(r.supp_a, r.supp_b, r.supp_c)
        assert r.supp_abc <= min_pair <= min_item
        assert r.lattice_ok is True


def test_an4_diversity_replay(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).to_pylist()
    mn = min(r["n_chars"] for r in docs)
    mx = max(r["n_chars"] for r in docs)
    cells = defaultdict(lambda: [0, set()])
    for r in docs:
        b = min(3, ((r["n_chars"] - mn) * 4) // (mx - mn + 1))
        cell = cells[(r["lang"], r["source"])]
        cell[0] += 1
        cell[1].add(b)
    # the planted constant-bin cell (see an4's docstring): keeps the
    # 'generalize' branch live at SFs where every real cell diversifies
    for r in docs:
        if r["doc_id"] % 7 == 0:
            cell = cells[("zz", "planted_constant_bin")]
            cell[0] += 1
            cell[1].add(0)
    rows = QUERIES["an4_l_diversity"][0](spark, sf_dir).collect()
    assert {(r.lang, r.source) for r in rows} == set(cells)
    n_div = n_flag = 0
    for r in rows:
        n, bins = cells[(r.lang, r.source)]
        assert r.grp_n == n
        assert r.l_distinct == len(bins)
        assert r.diverse_ok is (len(bins) >= 3)
        assert r.action == ("release" if len(bins) >= 3 else "generalize")
        n_div += r.diverse_ok
        n_flag += not r.diverse_ok
    assert n_div > 0 and n_flag > 0, "both verdict branches must fire"
