"""Independent Python-reference properties for wave 98.

kmv2: replay the sketch set-algebra from the parquet AND prove the
theorem the query's docstring stands on — that below theta =
min(theta_A, theta_B) the two bottom-64 sketches are COMPLETE, so the
sub-universe counts the query computes relationally are exactly what a
sketch-only consumer (holding just 2x64 hashes) would compute.
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _h(prefix: str, key: int) -> int:
    return int(
        hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:8], 16
    )


def _replay(sf_dir):
    keys = [
        r["o_orderkey"]
        for r in pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
        ).to_pylist()
    ]
    u = [
        (k, _h("a:", k) % 100 < 60, _h("b:", k) % 100 < 50, _h("kmv2:", k))
        for k in keys
    ]
    u = [(k, ma, mb, h) for k, ma, mb, h in u if ma or mb]
    sketch_a = sorted(h for _, ma, _, h in u if ma)[:64]
    sketch_b = sorted(h for _, _, mb, h in u if mb)[:64]
    theta = min(sketch_a[63], sketch_b[63])
    n_below_union = sum(1 for *_, h in u if h < theta)
    n_below_inter = sum(1 for _, ma, mb, h in u if ma and mb and h < theta)
    return u, sketch_a, sketch_b, theta, n_below_union, n_below_inter


def test_kmv2_replay(spark, sf_dir):
    u, _, _, theta, bu, bi = _replay(sf_dir)
    fn, _ = QUERIES["kmv2_sketch_set_algebra"]
    r = fn(spark, sf_dir).collect()[0]
    assert r.k == 64 and r.theta == theta
    assert r.n_a_exact == sum(1 for _, ma, _, _ in u if ma)
    assert r.n_b_exact == sum(1 for _, _, mb, _ in u if mb)
    assert r.n_union_exact == len(u)
    assert r.n_inter_exact == sum(1 for _, ma, mb, _ in u if ma and mb)
    assert (r.n_below_union, r.n_below_inter) == (bu, bi)
    assert r.est_union == bu * 4294967296 / theta
    assert r.est_inter == bi * 4294967296 / theta
    assert r.union_est_ok and r.inter_est_ok
    # non-vacuity: the sub-universe genuinely contains intersection mass
    assert 0 < bi < bu


def test_kmv2_sketch_completeness_theorem(spark, sf_dir):
    """The portability theorem: a consumer holding ONLY the two
    64-element sketches reaches the same sub-universe counts the query
    computed from the full data — i.e. below theta the sketches are
    complete (no element of A or B with h < theta is missing from its
    own sketch), and intersection membership below theta is decidable
    from sketch membership alone."""
    u, sa, sb, theta, bu, bi = _replay(sf_dir)
    set_a, set_b = set(sa), set(sb)
    # completeness: every below-theta hash of A is in A's sketch (ditto B)
    for _, ma, mb, h in u:
        if h < theta:
            if ma:
                assert h in set_a
            if mb:
                assert h in set_b
    # sketch-only computation reproduces the counts (hash collisions
    # between DISTINCT keys would break the union count; assert absence
    # so a future data regen that introduces one fails loudly here
    # rather than silently skewing the released numbers)
    below = [(k, ma, mb, h) for k, ma, mb, h in u if h < theta]
    assert len({h for *_, h in below}) == len(below)
    sketch_union_below = {h for h in set_a | set_b if h < theta}
    sketch_inter_below = {h for h in set_a & set_b if h < theta}
    assert len(sketch_union_below) == bu
    assert len(sketch_inter_below) == bi


def test_kmv2_plan_bottom_k(spark, sf_dir):
    """The k-th minimums must plan as TakeOrderedAndProject (partial
    per-partition bottom-k, merged at k) — a global Sort before the
    limit would be the non-scalable shape."""
    from angelo_bravo_etl_task_spark.plans.audit import physical_plan

    fn, _ = QUERIES["kmv2_sketch_set_algebra"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "HashAggregate" in plan
