"""Independent Python-reference properties for wave 94.

salt1: replay both aggregation routes with exact Decimal, certify both
totals, the two-phase equality law, and that salting genuinely sharded
(multiple salts per key at every SF).
rng1: replay the coin and the chi-square numerator with unbounded
ints; certify every deviation, both bounds, and that the audit is
falsifiable (a synthetic skewed assignment violates the bucket bound).
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_salt1_two_phase_equality(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
    ).to_pylist()
    direct = defaultdict(lambda: [0, Decimal("0.00")])
    partial = defaultdict(lambda: [0, Decimal("0.00")])
    for r in li:
        p = Decimal(str(round(r["l_extendedprice"], 2)))
        d = direct[r["l_returnflag"]]
        d[0] += 1
        d[1] += p
        s = partial[(r["l_returnflag"], r["l_orderkey"] % 16)]
        s[0] += 1
        s[1] += p
    merged = defaultdict(lambda: [0, Decimal("0.00"), 0])
    for (flag, _), (n, tot) in partial.items():
        m = merged[flag]
        m[0] += n
        m[1] += tot
        m[2] += 1
    rows = QUERIES["salt1_two_phase_agg"][0](spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} == set(direct)
    for r in rows:
        dn, dtot = direct[r.l_returnflag]
        mn, mtot, nsalts = merged[r.l_returnflag]
        assert (r.n_direct, r.n_merged, r.n_salts) == (dn, mn, nsalts)
        assert abs(r.sum_direct - float(dtot)) < 1e-6
        assert abs(r.sum_merged - float(mtot)) < 1e-6
        assert r.two_phase_equal_ok and dn == mn and dtot == mtot
        assert r.salt_bound_ok and nsalts <= 16
        # salting genuinely sharded the hot key
        assert nsalts >= 2


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_rng1_replay_and_falsifiability(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).to_pylist()
    buckets = Counter(_h8(f"rng:{r['doc_id']}") % 16 for r in docs)
    n = len(docs)
    chi2 = sum((16 * buckets[b] - n) ** 2 for b in buckets)
    rows = QUERIES["rng1_md5_uniformity"][0](spark, sf_dir).collect()
    assert {r.bucket for r in rows} == set(buckets)
    for r in rows:
        assert (r.o, r.n) == (buckets[r.bucket], n)
        assert r.dev_num == 16 * r.o - n
        assert r.bucket_dev_ok and abs(r.dev_num) <= n
        assert r.chi2_num == chi2
        assert r.chi2_bound_ok and chi2 <= 2 * n * n
    assert sum(r.o for r in rows) == n
    # falsifiability: a catastrophically skewed assignment fails the law
    skew = Counter({0: n})
    bad = max(abs(16 * skew[b] - n) for b in range(16))
    assert bad > n, "the bucket bound must reject all-in-one-bucket"
