"""Independent Python-reference properties for the wave 64 structures."""

from __future__ import annotations

import hashlib
import math

from angelo_bravo_etl_task_spark.queries import QUERIES


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_fen1_tree_cells_and_queries_match_python(spark, sf_dir):
    """The query results == Python prefix sums; and a Python Fenwick
    build produces cells where cell[i] covers exactly the 2^r values
    its low-bit span defines — the structural invariant behind the
    emitted answers."""
    xs = [_h(f"fw{v}") % 100 for v in range(1, 17)]
    # python fenwick
    tree = [0] * 17
    for i, x in enumerate(xs, start=1):
        idx = i
        while idx <= 16:
            tree[idx] += x
            idx += idx & (-idx)
    # structural invariant: cell covers (i - lowbit, i]
    for i in range(1, 17):
        lb = i & (-i)
        assert tree[i] == sum(xs[i - lb : i])

    def q(i):
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    rows = QUERIES["fen1_fenwick_tree"][0](spark, sf_dir).collect()
    got = {r.query_idx: r.prefix_sum for r in rows}
    for i in range(1, 17):
        assert got[i] == sum(xs[:i]) == q(i)


def test_pas1_binomial_row_certificates(spark, sf_dir):
    """Every coefficient == math.comb(30, k); the row sums to 2^30;
    symmetry and unimodality hold."""
    rows = sorted(
        QUERIES["pas1_binomial_row"][0](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert len(rows) == 31
    cs = [r.binom_30_k for r in rows]
    for k, c in enumerate(cs):
        assert c == math.comb(30, k)
    assert rows[0].row_sum == 2**30 == sum(cs)
    assert cs == cs[::-1]  # symmetry
    assert all(cs[k] <= cs[k + 1] for k in range(15))  # rises to the middle
