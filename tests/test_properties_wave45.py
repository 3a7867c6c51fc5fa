"""Independent Python-reference properties for the wave 45 algorithms."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_res1_matches_python_algorithm_r(spark, sf_dir):
    """res1's reservoirs == a Python Algorithm-R replay with identical
    md5 indices; reservoirs hold exactly min(k, n) items and every item
    came from that user's trace; at least one user replaced something."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append((r["ts"], r["event_id"]))
    expect = {}
    replaced_somewhere = False
    for uid, acc in traces.items():
        acc.sort()
        eids = [str(e) for _, e in acc[:30]]
        n = len(eids)
        if n < 10:
            continue
        res: list = []
        for i, eid in enumerate(eids, start=1):
            if i <= 5:
                res.append(eid)
            else:
                j = _h(f"j{eid}") % i
                if j < 5:
                    res[j] = eid
                    replaced_somewhere = True
        expect[uid] = (n, "/".join(res))
        assert len(res) == min(5, n)
        assert set(res) <= set(eids)
    got = {
        r.user_id: (r.n, r.reservoir)
        for r in QUERIES["res1_reservoir_sample"][0](spark, sf_dir).collect()
    }
    assert got == expect
    assert replaced_somewhere


def test_kt1_matches_python_pair_count(spark, sf_dir):
    """kt1's pair classification == brute-force Python; the identity
    C + D + Tx + Ty + Txy == n(n-1)/2 holds; tau_b == the float formula
    on the exact counts."""
    bal = {
        r["c_custkey"]: round(float(r["c_acctbal"]) * 100)
        for r in _rows(sf_dir, "customer")
        if r["c_custkey"] % 7 == 0
    }
    tot: dict = defaultdict(int)
    for r in _rows(sf_dir, "orders"):
        if r["o_custkey"] in bal:
            tot[r["o_custkey"]] += round(float(r["o_totalprice"]) * 100)
    pts = [(bal[k], tot[k]) for k in sorted(tot)]
    C = D = Tx = Ty = Txy = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx == 0 and dy == 0:
                Txy += 1
            elif dx == 0:
                Tx += 1
            elif dy == 0:
                Ty += 1
            elif dx * dy > 0:
                C += 1
            else:
                D += 1
    [row] = QUERIES["kt1_kendall_tau"][0](spark, sf_dir).collect()
    assert (
        row.n,
        row.concordant,
        row.discordant,
        row.ties_x,
        row.ties_y,
        row.ties_xy,
    ) == (len(pts), C, D, Tx, Ty, Txy)
    n = len(pts)
    assert C + D + Tx + Ty + Txy == n * (n - 1) // 2
    den = math.sqrt(float(C + D + Tx + Txy) * float(C + D + Ty + Txy))
    assert row.tau_b == (C - D) / den
    assert -1.0 <= row.tau_b <= 1.0


def test_brier1_murphy_identity(spark, sf_dir):
    """The emitted per-bin terms assemble the exact GENERALIZED Murphy
    decomposition: Brier = REL - RES + UNC + within-bin forecast
    variance - 2 x within-bin forecast-outcome covariance, verified
    with Fractions — and each bin's terms replay in hashlib."""
    f_o = []
    for r in _rows(sf_dir, "customer"):
        k = r["c_custkey"]
        f_o.append(
            (
                _h(f"p{k}") % 100,
                1 if (k % 2 == 0) == (k % 3 == 0) else 0,
            )
        )
    bins: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for f, o in f_o:
        b = bins[f // 10]
        b[0] += 1
        b[1] += f
        b[2] += o
        b[3] += f * f
        b[4] += f * o
        b[5] += (f - 100 * o) ** 2
    rows = QUERIES["brier1_murphy_terms"][0](spark, sf_dir).collect()
    got = {
        r.bin: (
            r.n,
            r.sum_f,
            r.sum_o,
            r.sum_f2,
            r.sum_fo,
            r.brier_num_x1e4,
            r.rel_num_x1e4,
        )
        for r in rows
    }
    for b, (n, sf_, so, sf2, sfo, bn, _rn) in got.items():
        e = bins[b]
        assert (n, sf_, so, sf2, sfo, bn) == tuple(e)
        assert _rn == (sf_ - 100 * so) ** 2
    N = sum(n for n, *_ in got.values())
    brier = Fraction(sum(bn for *_, bn, _rn in got.values()), 10000 * N)
    rel = sum(
        Fraction(rn, n) for (n, *_, rn) in got.values()
    ) / Fraction(10000 * N)
    obar = Fraction(sum(so for _, _, so, *_ in got.values()), N)
    res = sum(
        n * (Fraction(so, n) - obar) ** 2
        for (n, _, so, *_) in got.values()
    ) / N
    unc = obar * (1 - obar)
    # forecasts live in percent units: f/100 — scale moments by 1e4
    wbv = sum(
        Fraction(sf2, 10000) - Fraction(sf_ * sf_, 10000 * n)
        for (n, sf_, _, sf2, *_) in got.values()
    ) / N
    wbc = sum(
        Fraction(sfo, 100) - Fraction(sf_ * so, 100 * n)
        for (n, sf_, so, _, sfo, *_) in got.values()
    ) / N
    assert brier == rel - res + unc + wbv - 2 * wbc
