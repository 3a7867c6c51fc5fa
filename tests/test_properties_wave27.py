"""Independent Python-reference properties for the wave 27-31 algorithms —
plain-Python replays from the raw parquet, exact equality, no DuckDB.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_mrk1_matches_hashlib_merkle(spark, sf_dir):
    """mrk1's source and corpus roots == the hashlib two-level rollup."""
    by_source = defaultdict(list)
    for r in _rows(sf_dir, "documents"):
        by_source[r["source"]].append(_md5_hex(r["text"]))
    expect = {}
    roots = []
    for src, leaves in by_source.items():
        root = _md5_hex("".join(sorted(leaves)))
        expect[f"source:{src}"] = (len(leaves), root)
        roots.append(root)
    expect["corpus"] = (
        sum(n for n, _ in expect.values()),
        _md5_hex("".join(sorted(roots))),
    )
    got = {
        r["scope"]: (r["n_leaves"], r["root_md5"])
        for r in QUERIES["mrk1_merkle_fingerprint"][0](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_perm1_matches_hashlib_relabeling(spark, sf_dir):
    """perm1's observed effect and more-extreme count == the hashlib
    replay of the 20 md5 relabelings over exact cents."""
    sample = {}
    for r in _rows(sf_dir, "customer"):
        if r["c_custkey"] < 500:
            cents = round(r["c_acctbal"] * 100)
            if r["c_custkey"] % 2 == 0:
                cents += 500
            sample[r["c_custkey"]] = cents

    def diff(assign):
        st = sc = nt = nc = 0
        for k, cents in sample.items():
            if assign(k) == 0:
                st += cents
                nt += 1
            else:
                sc += cents
                nc += 1
        return st * nc - sc * nt, nt * nc

    obs_num, obs_den = diff(lambda k: k % 2)
    n_extreme = 0
    for salt in range(1, 21):
        d_num, d_den = diff(
            lambda k: int(_md5_hex(f"{salt}_{k}")[:8], 16) % 2
        )
        if abs(d_num) * obs_den >= abs(obs_num) * d_den:
            n_extreme += 1

    row = QUERIES["perm1_permutation_test"][0](spark, sf_dir).collect()[0]
    assert row["n"] == len(sample)
    assert row["obs_num"] == obs_num
    assert row["obs_den"] == obs_den
    assert row["n_more_extreme"] == n_extreme


def test_cal2_matches_python_networkdays(spark, sf_dir):
    """cal2's business-day counts == the weekday-set replay over epoch
    days (1970-01-01 = Thursday, weekend = day % 7 in {2, 3})."""
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    first_ship = {}
    for r in _rows(sf_dir, "lineitem"):
        d = r["l_shipdate"].date()
        k = r["l_orderkey"]
        if k not in first_ship or d < first_ship[k]:
            first_ship[k] = d
    expect = {}
    for r in _rows(sf_dir, "orders"):
        k = r["o_orderkey"]
        if k % 10 != 0 or k not in first_ship:
            continue
        e0 = (r["o_orderdate"].date() - epoch).days
        e1 = (first_ship[k] - epoch).days
        bd = sum(
            1 for d in range(e0 + 1, e1 + 1) if d % 7 not in (2, 3)
        )
        expect[k] = (e1 - e0, bd)
    got = {
        r["o_orderkey"]: (r["calendar_days"], r["business_days"])
        for r in QUERIES["cal2_business_days"][0](spark, sf_dir).collect()
    }
    assert got == expect


def test_geo6_matches_python_shoelace(spark, sf_dir):
    """geo6's 2A and centroid numerators == the Python shoelace fold
    over the identical md5-placed pentagon rings."""
    tmpl = [(2, 0), (1, 2), (-1, 2), (-2, 0), (0, -3)]
    expect = {}
    for r in _rows(sf_dir, "supplier"):
        sid = r["s_suppkey"]
        if sid >= 100:
            continue
        sc = 1 + int(_md5_hex(f"s{sid}")[:2], 16) % 5
        cx = int(_md5_hex(f"x{sid}")[:4], 16) % 1000
        cy = int(_md5_hex(f"y{sid}")[:4], 16) % 1000
        ring = [(cx + dx * sc, cy + dy * sc) for dx, dy in tmpl]
        a2 = cx3 = cy3 = 0
        for i in range(5):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % 5]
            cross = x0 * y1 - x1 * y0
            a2 += cross
            cx3 += (x0 + x1) * cross
            cy3 += (y0 + y1) * cross
        expect[sid] = (a2, cx3, cy3, 3 * a2)
    got = {
        r["poly_id"]: (
            r["area2"],
            r["centroid_x_num"],
            r["centroid_y_num"],
            r["centroid_den"],
        )
        for r in QUERIES["geo6_shoelace_measures"][0](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
    # every pentagon has positive doubled area (CCW simple ring)
    assert all(v[0] > 0 for v in expect.values())


def test_hier1_matches_python_prefix_rollup(spark, sf_dir):
    """hier1's subtree totals == the dict-based ancestor-prefix rollup
    in exact cents."""
    nations = {r["n_nationkey"]: r["n_regionkey"]
               for r in _rows(sf_dir, "nation")}
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in _rows(sf_dir, "customer")}
    agg = defaultdict(lambda: [0, 0])
    for r in _rows(sf_dir, "orders"):
        ck = r["o_custkey"]
        if ck not in cust:
            continue
        nk = cust[ck]
        rk = nations[nk]
        cents = round(r["o_totalprice"] * 100)
        p = f"R{rk}"
        for suffix in ("", f"/N{nk}", f"/N{nk}/C{ck}"):
            if suffix:
                p = f"R{rk}{suffix}"
            agg[p][0] += 1
            agg[p][1] += cents
    expect = {
        path: (path.count("/") + 1, n, cents)
        for path, (n, cents) in agg.items()
    }
    got = {
        r["path"]: (r["depth"], r["n_orders"], r["revenue_cents"])
        for r in QUERIES["hier1_subtree_rollup"][0](spark, sf_dir).collect()
    }
    assert got == expect


def test_bot1_planted_users_flagged(spark, sf_dir):
    """bot1: the five planted exact-hourly users are flagged as bots,
    and at least one organic user is not — both branches live."""
    rows = QUERIES["bot1_cadence_regularity"][0](spark, sf_dir).collect()
    flags = {r["user_id"]: r["is_bot"] for r in rows}
    for k in range(900001, 900006):
        assert flags[k] is True, f"planted user {k} not flagged"
    assert any(not v for u, v in flags.items() if u < 900000), (
        "no organic user passed the human branch"
    )
