"""Independent Python-reference properties for the wave 56 algorithms."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

_B32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def test_ulid1_sortable_and_replays(spark, sf_dir):
    """Sorting by the ULID string never decreases the millisecond
    timestamp (the property the format exists for); the encoding
    replays bit-for-bit; and the alphabet excludes ambiguous I/L/O/U."""
    assert not set("ILOU") & set(_B32)
    evs = sorted(_rows(sf_dir, "events"), key=lambda r: r["event_id"])[:100]
    expect = {}
    for r in evs:
        ms = int(r["ts"].timestamp() * 1_000_000) // 1000
        hx = hashlib.md5(f"ul{r['event_id']}".encode()).hexdigest()
        tpart = "".join(
            _B32[(ms >> (45 - 5 * i)) & 31] for i in range(10)
        )
        rpart = "".join(
            _B32[int(hx[2 * i : 2 * i + 2], 16) % 32] for i in range(16)
        )
        expect[r["event_id"]] = (ms, tpart + rpart)
    rows = QUERIES["ulid1_sortable_ids"][0](spark, sf_dir).collect()
    got = {r.event_id: (r.ms, r.ulid) for r in rows}
    assert got == expect
    by_ulid = sorted(got.values(), key=lambda t: t[1])
    for (m1, _), (m2, _) in zip(by_ulid, by_ulid[1:]):
        assert m1 <= m2, "lexicographic order must be chronological"
    assert all(len(u) == 26 for _, u in got.values())


def test_mcpi1_counts_replay_and_estimate_lands(spark, sf_dir):
    """The in-circle count replays exactly in hashlib, and the rational
    estimate 4*in/n is within 2% of pi — the md5-uniformity audit."""
    inside = 0
    n = 0
    for r in _rows(sf_dir, "events"):
        e = r["event_id"]
        x = int(hashlib.md5(f"px{e}".encode()).hexdigest()[:8], 16) % 10**6
        y = int(hashlib.md5(f"py{e}".encode()).hexdigest()[:8], 16) % 10**6
        n += 1
        if x * x + y * y <= 10**12:
            inside += 1
    [row] = QUERIES["mcpi1_monte_carlo_pi"][0](spark, sf_dir).collect()
    assert (row.n_points, row.in_circle) == (n, inside)
    assert (row.pi_num, row.pi_den) == (4 * inside, n)
    est = 4 * inside / n
    # binomial sampling: sigma = 4*sqrt(p(1-p)/n) ~ 1.64/sqrt(n); allow 3 sigma
    assert abs(est - math.pi) < 5 / math.sqrt(n)
