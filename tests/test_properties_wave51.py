"""Independent Python-reference properties for the wave 51 algorithms."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str, k: int = 8) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:k], 16)


def test_io1_totals_equal_order_walk_and_scan_wins(spark, sf_dir):
    """Each policy's total == the seek-distance walk along its emitted
    service order (from head position 100), and SCAN beats-or-ties
    FCFS on this workload."""
    rows = QUERIES["io1_elevator_schedule"][0](spark, sf_dir).collect()
    assert len(rows) == 20

    def walk(order_attr):
        head = 100
        tot = 0
        for r in sorted(rows, key=lambda r: getattr(r, order_attr)):
            tot += abs(r.pos - head)
            head = r.pos
        return tot

    assert all(r.fcfs_total == walk("fcfs_order") for r in rows)
    assert all(r.scan_total == walk("scan_order") for r in rows)
    assert rows[0].scan_total <= rows[0].fcfs_total
    # replay the positions themselves
    keys = sorted(r.key for r in rows)
    assert all(
        r.pos == _h(f"cy{r.key}") % 200 for r in rows
    )
    assert keys == sorted(
        k
        for k in sorted(
            x["o_orderkey"] for x in _rows(sf_dir, "orders")
        )[:20]
    )


def test_nm1_isqrt_certificates_and_math_isqrt(spark, sf_dir):
    """Every row's certificate columns are TRUE, and the value equals
    math.isqrt of the identical md5 input."""
    rows = QUERIES["nm1_integer_sqrt"][0](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        x = _h(f"nx{r.key}", 12) % 10**12 + 1
        assert r.x == x
        assert r.isqrt == math.isqrt(x)
        assert r.lower_ok and r.upper_ok
        assert 1 <= r.iters <= 60


def test_pid1_matches_python_controller_and_tracks(spark, sf_dir):
    """pid1's trajectory == a Python P+I replay with truncating
    division, and the controller tracks: the mean |error| over the
    last 10 steps is smaller than over the first 10."""
    from collections import Counter

    hours = Counter()
    for r in _rows(sf_dir, "events"):
        hours[r["ts"].replace(minute=0, second=0, microsecond=0)] += 1
    demands = [hours[h] for h in sorted(hours)][:48]
    cap, integral = 100, 0
    expect = []
    for t, d in enumerate(demands, start=1):
        err = d - cap
        integral += err
        upd = 50 * err + 10 * integral
        cap += int(upd / 100) if upd >= 0 else -((-upd) // 100)
        expect.append((t, d, cap, err, integral))
    rows = QUERIES["pid1_autoscaler_replay"][0](spark, sf_dir).collect()
    got = sorted(
        (r.t, r.demand, r.capacity, r.error, r.integral) for r in rows
    )
    assert got == expect
    errs = [abs(e) for _, _, _, e, _ in expect]
    assert sum(errs[-10:]) / 10 < sum(errs[:10]) / 10, "controller tracks"
