"""Independent Python-reference properties for the wave 65 kernels."""

from __future__ import annotations

import hashlib

from angelo_bravo_etl_task_spark.queries import QUERIES

_FIBS = [1, 2]
while _FIBS[-1] < 10**6:
    _FIBS.append(_FIBS[-1] + _FIBS[-2])


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_zeck1_unique_nonconsecutive_and_reconstructs(spark, sf_dir):
    """Greedy replay matches; every decomposition reconstructs its n;
    no two CONSECUTIVE Fibonacci numbers appear (Zeckendorf's
    condition); terms are distinct."""
    rows = QUERIES["zeck1_zeckendorf"][0](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        n0 = _h(f"zk{r.key}") % 999999 + 1
        assert r.n0 == n0
        rem, parts = n0, []
        while rem > 0:
            best = max(f for f in _FIBS if f <= rem)
            parts.append(best)
            rem -= best
        assert r.n_terms == len(parts)
        assert r.fib_terms == "/".join(map(str, sorted(parts)))
        assert r.reconstructed == n0 and r.reconstructs
        idxs = sorted(_FIBS.index(p) for p in parts)
        assert len(idxs) == len(set(idxs)), "terms distinct"
        for a, b in zip(idxs, idxs[1:]):
            assert b - a >= 2, "no two consecutive Fibonacci terms"


def test_gray1_unit_flips_and_bijection(spark, sf_dir):
    """Every successive pair differs in exactly one bit; the code is a
    bijection onto 0..63; and it matches the classic reflect-and-prefix
    construction."""
    rows = sorted(
        QUERIES["gray1_reflected_code"][0](spark, sf_dir).collect(),
        key=lambda r: r.i,
    )
    assert len(rows) == 64
    assert {r.gray for r in rows} == set(range(64))
    assert rows[0].flip_bits is None
    assert all(r.flip_bits == 1 for r in rows[1:])
    # reflect-and-prefix construction
    code = [0]
    while len(code) < 64:
        code = code + [c | len(code) for c in reversed(code)]
    assert [r.gray for r in rows] == code
    assert all(r.gray == r.i ^ (r.i >> 1) for r in rows)
