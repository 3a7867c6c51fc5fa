"""Wave-130 properties: entity-resolution pipeline invariants and the
threshold-curve monotonicity theorems."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import _t
from angelo_bravo_etl_task_spark.queries_wave130 import (
    _PRC_KS,
    _PRC_SLICE,
    _PRC_THETAS,
    prc1_dedup_threshold_curve,
    px10_entity_resolution,
)


def test_px10_cluster_accounting(spark, sf_dir):
    rows = {r["cluster_size"]: r for r in px10_entity_resolution(spark, sf_dir).collect()}
    c = _t(spark, sf_dir, "customer")
    n = c.count()
    n_a = c.where(F.col("c_custkey") % 97 == 0).count()
    n_b = c.where(F.col("c_custkey") % 89 == 0).count()
    n_both = c.where(
        (F.col("c_custkey") % 97 == 0) & (F.col("c_custkey") % 89 == 0)
    ).count()
    # every record lands in exactly one cluster
    assert sum(r["n_records"] for r in rows.values()) == n + n_a + n_b
    # construction: a customer with one clone forms a pair; with both
    # clones, a triple (transitive merge); everyone else is a singleton
    assert rows[3]["n_clusters"] == n_both if 3 in rows else n_both == 0
    assert rows[2]["n_clusters"] == (n_a - n_both) + (n_b - n_both)
    assert rows[1]["n_clusters"] == n - n_a - n_b + n_both
    # sizes never exceed the planted triple
    assert set(rows) <= {1, 2, 3}


def test_prc1_monotone_in_threshold_and_corruption(spark, sf_dir):
    rows = {
        (r["pair_class"], r["theta_pct"]): r
        for r in prc1_dedup_threshold_curve(spark, sf_dir).collect()
    }
    classes = [f"corrupt_k{k}" for k in _PRC_KS] + ["decoy"]
    assert {c for c, _ in rows} == set(classes)
    n_docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _PRC_SLICE)
        .count()
    )
    for cls in classes:
        # flagging can only shrink as the threshold rises (theorem)
        flagged = [rows[(cls, t)]["n_flagged"] for t in _PRC_THETAS]
        assert flagged == sorted(flagged, reverse=True), (cls, flagged)
        # every pair swept at every threshold
        n_pairs = {rows[(cls, t)]["n_pairs"] for t in _PRC_THETAS}
        assert len(n_pairs) == 1
        assert n_pairs.pop() <= n_docs
    # nested replacement sets: corruption k=2 replaces a superset of
    # k=4's positions, which supersets k=8's — so per-pair Jaccard is
    # ordered and flag counts must be too (theorem, per threshold)
    for t in _PRC_THETAS:
        f8 = rows[("corrupt_k8", t)]["n_flagged"]
        f4 = rows[("corrupt_k4", t)]["n_flagged"]
        f2 = rows[("corrupt_k2", t)]["n_flagged"]
        assert f8 >= f4 >= f2, (t, f8, f4, f2)
    # the curve must separate light corruption from heavy at SOME
    # threshold — otherwise the calibration study says nothing
    assert any(
        rows[("corrupt_k8", t)]["n_flagged"] > rows[("corrupt_k2", t)]["n_flagged"]
        for t in _PRC_THETAS
    )
