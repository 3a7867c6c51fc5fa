"""Independent Python-reference properties for wave 84.

rbo1: rebuild both rankers in pure Python (exact Decimal revenue,
integer quantity), replay the per-depth overlaps and the exact rational
RBO numerator with unbounded ints, certify both laws and that the final
running_rbo equals the textbook float computation to within an ulp.
x10: replay the quantization in Python floats (same expression order)
and certify the scale, the per-vector max error, and the one-step law.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

_L = 2520
_DEN = _L * 1023


def test_rbo1_exact_rational_replay(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_quantity"],
    ).to_pylist()
    rev, qty = defaultdict(lambda: Decimal("0.00")), Counter()
    for r in li:
        rev[r["l_partkey"]] += Decimal(str(round(r["l_extendedprice"], 2)))
        qty[r["l_partkey"]] += int(r["l_quantity"])
    ra = sorted(rev, key=lambda p: (-rev[p], p))[:10]
    rb = sorted(qty, key=lambda p: (-qty[p], p))[:10]
    pos_a = {p: i + 1 for i, p in enumerate(ra)}
    pos_b = {p: i + 1 for i, p in enumerate(rb)}
    rows = sorted(
        QUERIES["rbo1_rank_biased_overlap"][0](spark, sf_dir).collect(),
        key=lambda r: r.d,
    )
    assert [r.d for r in rows] == list(range(1, 11))
    running = 0
    prev_overlap = 0
    for r in rows:
        overlap = sum(
            1
            for p in pos_a
            if p in pos_b and pos_a[p] <= r.d and pos_b[p] <= r.d
        )
        contrib = overlap * (_L // r.d) * (1 << (10 - r.d))
        running += contrib
        assert r.overlap_d == overlap, r.d
        assert r.contrib_num == contrib
        assert r.running_num == running
        assert r.bounded_ok and overlap <= r.d
        assert r.mono_ok and overlap >= prev_overlap
        assert abs(r.running_rbo - running / _DEN) < 1e-15
        prev_overlap = overlap
    # cross-check the exact rational against the textbook float form
    textbook = 0.5 * sum(
        (0.5 ** (d - 1))
        * (
            sum(
                1
                for p in pos_a
                if p in pos_b and pos_a[p] <= d and pos_b[p] <= d
            )
            / d
        )
        for d in range(1, 11)
    ) / (1 - 0.5**10)
    assert math.isclose(rows[-1].running_rbo, textbook, rel_tol=1e-12)
    assert 0.0 <= rows[-1].running_rbo <= 1.0


def test_x10_quantization_error_law(spark, sf_dir):
    vecs = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pylist()
    want = {}
    for r in vecs:
        if r["vec_id"] >= 100:
            continue
        e = [float(x) for x in r["embedding"]]
        scale = 0.0
        for x in e:
            scale = abs(x) if abs(x) > scale else scale
        if scale <= 0:
            continue
        err = 0.0
        for x in e:
            v = abs(x - (math.floor(x * 127 / scale) * scale) / 127)
            err = v if v > err else err
        want[r["vec_id"]] = (len(e), scale, err)
    rows = QUERIES["x10_quantization_error"][0](spark, sf_dir).collect()
    assert {r.vec_id for r in rows} == set(want)
    for r in rows:
        dim, scale, err = want[r.vec_id]
        assert r.dim == dim
        assert r.scale == scale  # bit-identical max fold
        assert r.max_abs_err == err  # bit-identical expression order
        assert r.err_bound == scale / 127
        assert r.within_bound_ok and r.max_abs_err <= r.err_bound
    # the law is non-vacuous: errors are strictly positive somewhere
    assert any(r.max_abs_err > 0 for r in rows)
