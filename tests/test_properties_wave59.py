"""Independent Python-reference properties for the wave 59 kernels."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_modpow1_matches_pow(spark, sf_dir):
    """Every row equals Python's three-argument pow on the identical
    md5 operands."""
    rows = QUERIES["modpow1_square_multiply"][0](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        a = _h(f"ba{r.key}") % 99999 + 2
        b = _h(f"ex{r.key}") % 1000 + 1
        assert (r.a, r.b, r.m) == (a, b, 999983)
        assert r.a_pow_b_mod_m == pow(a, b, 999983)


def test_sieve1_matches_trial_division_and_classics(spark, sf_dir):
    """The prime set == trial division in Python; 46 primes below 200;
    2 is the only even prime; twin gaps exist; gaps sum telescopes."""
    def is_prime(n):
        return n >= 2 and all(n % d for d in range(2, int(n**0.5) + 1))

    expect = [n for n in range(2, 201) if is_prime(n)]
    rows = sorted(
        QUERIES["sieve1_relational_primes"][0](spark, sf_dir).collect(),
        key=lambda r: r.prime,
    )
    assert [r.prime for r in rows] == expect
    assert len(rows) == 46
    assert [r.idx for r in rows] == list(range(1, 47))
    assert rows[0].gap is None
    assert all(r.prime % 2 == 1 for r in rows[1:])
    gaps = [r.gap for r in rows[1:]]
    assert 2 in gaps
    assert sum(gaps) == expect[-1] - expect[0]


def test_gcd1_matches_math_gcd_and_maximality(spark, sf_dir):
    """gcd == math.gcd; the divides-both certificate holds; nothing
    larger divides both; and lcm*gcd == x*y."""
    rows = QUERIES["gcd1_euclid"][0](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        x = _h(f"g1{r.key}") % 1000000 + 1
        y = _h(f"g2{r.key}") % 1000000 + 1
        g = math.gcd(x, y)
        assert (r.x, r.y, r.gcd) == (x, y, g)
        assert r.divides_both
        assert r.lcm == x * y // g
        assert r.lcm * r.gcd == x * y
        for cand in range(g + 1, min(g + 50, min(x, y) + 1)):
            assert not (x % cand == 0 and y % cand == 0)
