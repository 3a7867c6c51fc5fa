"""Independent Python-reference properties for the wave 55 algorithms."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def test_pq1_matches_python_and_seeds_self_assign(spark, sf_dir):
    """pq1 == a Python PQ replay over the identical floor-quantized
    vectors; the four seed vectors self-assign (code m/m/m... is their
    own index per subspace) with ZERO reconstruction error; and
    compression is lossy for most non-seeds (recon_err > 0)."""
    vecs = {
        r["vec_id"]: [math.floor(e * 1000) for e in r["embedding"]]
        for r in _rows(sf_dir, "embeddings")
    }
    cb = [vecs[i] for i in range(4)]
    expect = {}
    for vid, qv in vecs.items():
        codes = []
        err = 0
        for m in range(4):
            best = min(
                (
                    (
                        sum(
                            (qv[m * 16 + i] - cb[c][m * 16 + i]) ** 2
                            for i in range(16)
                        ),
                        c,
                    )
                    for c in range(4)
                ),
            )
            codes.append(best[1])
            err += best[0]
        expect[vid] = ("/".join(map(str, codes)), err)
    got = {
        r.vec_id: (r.code, r.recon_err)
        for r in QUERIES["pq1_product_quantization"][0](spark, sf_dir).collect()
    }
    assert got == expect
    for s in range(4):
        assert got[s] == (f"{s}/{s}/{s}/{s}", 0)
    assert sum(1 for _, e in got.values() if e > 0) > len(got) // 2


def test_zo2_bijections_and_locality_gap(spark, sf_dir):
    """Both indexes are bijections onto 0..255; EVERY consecutive
    Hilbert step is Manhattan distance exactly 1; Z-order's walk is
    strictly longer with jumps; and the Hilbert values match the
    classic xy2d replay."""
    rows = QUERIES["zo2_hilbert_locality"][0](spark, sf_dir).collect()
    assert len(rows) == 256
    hs = {r.hilbert_d for r in rows}
    zs = {r.z_d for r in rows}
    assert hs == set(range(256)) and zs == set(range(256))

    def xy2d(x, y):
        d = 0
        for s in (8, 4, 2, 1):
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = 15 - x, 15 - y
                x, y = y, x
        return d

    for r in rows:
        assert r.hilbert_d == xy2d(r.x, r.y)
    by_h = {r.hilbert_d: (r.x, r.y) for r in rows}
    by_z = {r.z_d: (r.x, r.y) for r in rows}

    def walk(m):
        return [
            abs(m[i + 1][0] - m[i][0]) + abs(m[i + 1][1] - m[i][1])
            for i in range(255)
        ]

    hw = walk(by_h)
    zw = walk(by_z)
    assert all(step == 1 for step in hw), "Hilbert steps are all unit"
    assert sum(zw) > sum(hw), "Z-order walks farther"
    assert max(zw) > 1, "Z-order jumps"


def test_trn1_is_a_valid_round_robin_design(spark, sf_dir):
    """All 28 unordered pairs appear exactly once across the 7 rounds,
    and every team plays exactly once per round."""
    rows = QUERIES["trn1_round_robin"][0](spark, sf_dir).collect()
    assert len(rows) == 28
    teams = sorted(
        r["s_suppkey"] for r in _rows(sf_dir, "supplier")
    )[:8]
    pairs = Counter(
        tuple(sorted((r.home, r.away))) for r in rows
    )
    from itertools import combinations

    assert pairs == Counter(combinations(teams, 2))
    for rd in range(1, 8):
        played = [
            t
            for r in rows
            if r.round == rd
            for t in (r.home, r.away)
        ]
        assert sorted(played) == teams
