"""Independent Python-reference properties for wave 97.

an5: replay the exact-integer EMD t-closeness audit straight from the
parquet — bins, corpus prefix counts, per-cell prefix counts, the
|N*C_i - n*G_i| numerators — and certify the two planted cells behave
as designed: the global mirror at EMD exactly 0 ('release'), the
constant-bin plant well above t ('suppress').

mv3: replay BOTH routes of the join-IVM identity in pure Python and
assert (a) bit-equality route-to-route and against Spark, (b) every one
of the four delta terms — especially the dA JOIN dB cross term whose
omission is the classic IVM bug — is non-empty at the test SF.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _an5_replay(sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).to_pylist()
    mn = min(r["n_chars"] for r in docs)
    mx = max(r["n_chars"] for r in docs)
    binned = [
        (r["lang"], r["source"],
         min(3, ((r["n_chars"] - mn) * 4) // (mx - mn + 1)))
        for r in docs
    ]
    cells = list(binned)
    cells += [
        ("zz", "planted_constant_bin", 0)
        for r in docs if r["doc_id"] % 7 == 0
    ]
    cells += [("zz", "planted_global_mirror", b) for _, _, b in binned]
    n_all = len(binned)
    g = [sum(1 for _, _, b in binned if b <= i) for i in range(3)]
    per = defaultdict(lambda: [0, 0, 0, 0])  # n, c0, c1, c2
    for lang, source, b in cells:
        row = per[(lang, source)]
        row[0] += 1
        for i in range(3):
            if b <= i:
                row[i + 1] += 1
    out = {}
    for (lang, source), (n, c0, c1, c2) in per.items():
        num = sum(
            abs(n_all * c - n * gi) for c, gi in zip((c0, c1, c2), g)
        )
        den = 3 * n * n_all
        out[(lang, source)] = (
            n, num, den, num * 5 <= den,
            "release" if num * 5 <= den else "suppress",
        )
    return out


def test_an5_replay_and_plants(spark, sf_dir):
    exp = _an5_replay(sf_dir)
    fn, _ = QUERIES["an5_t_closeness"]
    rows = fn(spark, sf_dir).collect()
    got = {
        (r.lang, r.source): (
            r.grp_n, r.emd_num, r.emd_den, r.close_ok, r.action
        )
        for r in rows
    }
    assert got == exp
    # the mirror cell replays the corpus distribution: EMD exactly 0
    mirror = got[("zz", "planted_global_mirror")]
    assert mirror[1] == 0 and mirror[3] and mirror[4] == "release"
    # the constant-bin plant concentrates all mass on bin 0: far from t
    plant = got[("zz", "planted_constant_bin")]
    assert not plant[3] and plant[4] == "suppress"
    assert plant[1] * 5 > plant[2]
    # both actions fire among the released cells at every SF
    assert {a for *_, a in got.values()} == {"release", "suppress"}


def _mv3_replay(sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).to_pylist()
    lines = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).to_pylist()
    omap = {}
    for r in orders:
        omap[r["o_orderkey"]] = (
            r["o_orderpriority"], r["o_orderkey"] % 10 == 7
        )
    full = defaultdict(lambda: [0, 0])
    terms = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n,cents,b,da,db,dd
    for r in lines:
        prio, o_delta = omap[r["l_orderkey"]]
        cents = int(Decimal(str(round(r["l_extendedprice"], 2))) * 100)
        l_delta = (r["l_orderkey"] + r["l_linenumber"]) % 13 == 5
        full[prio][0] += 1
        full[prio][1] += cents
        t = terms[prio]
        t[0] += 1
        t[1] += cents
        idx = 2 + (1 if o_delta and not l_delta else
                   2 if not o_delta and l_delta else
                   3 if o_delta and l_delta else 0)
        t[idx] += 1
    return full, terms


def test_mv3_replay_and_terms(spark, sf_dir):
    full, terms = _mv3_replay(sf_dir)
    fn, _ = QUERIES["mv3_incremental_join"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == len(full)
    for r in rows:
        n_full, cents_full = full[r.o_orderpriority]
        n, cents, b, da, db, dd = terms[r.o_orderpriority]
        assert (r.n_full, r.cents_full) == (n_full, cents_full)
        assert (r.n_incr, r.cents_incr) == (n, cents)
        assert (r.n_base, r.n_da_b0, r.n_a0_db, r.n_dadb) == (b, da, db, dd)
        assert r.incremental_ok
        # the identity is exact: term counts partition the full join
        assert b + da + db + dd == n_full
        # no term is vacuous — the dAxdB cross term in particular
        assert min(b, da, db, dd) > 0, r


def test_mv3_plan_no_nested_loops(spark, sf_dir):
    """All five joins (full route + four term joins) must be equi-joins —
    a nested loop anywhere means a slice predicate swallowed the join
    key. The two-route reconciliation stays dimension-sized."""
    from angelo_bravo_etl_task_spark.plans.audit import physical_plan

    fn, _ = QUERIES["mv3_incremental_join"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan
