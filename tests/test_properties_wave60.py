"""Independent Python-reference properties for the wave 60 kernels."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_cyc1_matches_python_rho(spark, sf_dir):
    """cyc1 == a Python trajectory replay; tail + cycle <= 65 (the
    space has 64 points); cycle lengths are >= 1; and iterating
    f cycle_len times from the cycle entry returns to it."""
    rows = QUERIES["cyc1_rho_cycle"][0](spark, sf_dir).collect()
    assert len(rows) == 15

    def f(x):
        return _h(f"fn{x}") % 64

    for r in rows:
        x0 = _h(f"st{r.key}") % 64
        assert r.x0 == x0
        seen = {x0: 0}
        x = x0
        i = 0
        while True:
            x = f(x)
            i += 1
            if x in seen:
                tail, cyc = seen[x], i - seen[x]
                break
            seen[x] = i
        assert (r.tail_len, r.cycle_len) == (tail, cyc)
        assert r.cycle_len >= 1
        assert r.tail_len + r.cycle_len <= 65
        # entry point really cycles with that period
        entry = x0
        for _ in range(tail):
            entry = f(entry)
        y = entry
        for _ in range(cyc):
            y = f(y)
        assert y == entry


def test_perm2_partitions_the_domain(spark, sf_dir):
    """perm2 == a Python cycle-decomposition replay of the identical
    rank permutation; lengths sum to 30 (partition identity)."""
    vals = sorted(range(30), key=lambda v: (hashlib.md5(f"pm{v}".encode()).hexdigest(), v))
    img = [0] * 30
    for rank, v in enumerate(vals):
        img[v] = rank
    visited = set()
    lens = []
    for s in range(30):
        if s in visited:
            continue
        c = s
        ln = 0
        while True:
            visited.add(c)
            ln += 1
            c = img[c]
            if c == s:
                break
        lens.append(ln)
    [row] = QUERIES["perm2_cycle_decomposition"][0](spark, sf_dir).collect()
    assert row.n_cycles == len(lens)
    assert row.cycle_lengths == "/".join(map(str, sorted(lens)))
    assert row.total == 30


def test_collatz1_matches_python_and_the_27_checkpoint(spark, sf_dir):
    """collatz1 == a Python replay; every trajectory reached 1 under
    the cap; and the same fold arithmetic reproduces the celebrated
    27 -> peak 9232 in 111 steps."""
    rows = QUERIES["collatz1_trajectories"][0](spark, sf_dir).collect()
    assert len(rows) == 20

    def traj(n):
        steps, peak = 0, n
        while n > 1:
            n = n // 2 if n % 2 == 0 else 3 * n + 1
            peak = max(peak, n)
            steps += 1
        return steps, peak

    for r in rows:
        n0 = _h(f"cz{r.key}") % 9999 + 2
        s, p = traj(n0)
        assert (r.n0, r.trajectory_len, r.peak) == (n0, s, p)
        assert r.reached_one
    assert traj(27) == (111, 9232)
