"""Independent Python-reference properties for the wave 32-33 algorithms."""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def test_dtw1_matches_python_dp(spark, sf_dir):
    """dtw1's cost == the textbook banded DP replayed in Python over the
    identical day-spine-completed series."""
    base = dt.date(2023, 12, 31)
    a = [0] * 31
    b = [0] * 31
    for r in _rows(sf_dir, "events"):
        i = (r["ts"].date() - base).days
        if 1 <= i <= 30:
            if r["event_type"] == "click":
                a[i] += 1
            elif r["event_type"] == "view":
                b[i] += 1
    INF = 10**15
    D = [[INF] * 31 for _ in range(31)]
    D[0][0] = 0
    for i in range(1, 31):
        for j in range(1, 31):
            if abs(i - j) > 3:
                continue
            D[i][j] = abs(a[i] - b[j]) + min(
                D[i - 1][j], D[i - 1][j - 1], D[i][j - 1]
            )
    row = QUERIES["dtw1_dynamic_time_warping"][0](spark, sf_dir).collect()[0]
    assert row["dtw_cost"] == D[30][30]
    assert row["dtw_cost"] < INF


def test_app1_seats_sum_to_house_size(spark, sf_dir):
    """app1: final seats sum to exactly 100 and every segment gets at
    least its floor share (largest-remainder invariants)."""
    rows = QUERIES["app1_largest_remainder"][0](spark, sf_dir).collect()
    assert sum(r["final_seats"] for r in rows) == 100
    assert all(
        r["final_seats"] in (r["base_seats"], r["base_seats"] + 1)
        for r in rows
    )
    # extras go to the LARGEST remainders: every awarded remainder >=
    # every unawarded one
    awarded = [r["remainder"] for r in rows if r["extra"] == 1]
    skipped = [r["remainder"] for r in rows if r["extra"] == 0]
    if awarded and skipped:
        assert min(awarded) >= max(skipped)


def test_shap1_axioms(spark, sf_dir):
    """shap1: efficiency holds on every row, and the interaction credit
    splits equally between the two interacting features (symmetry)."""
    rows = QUERIES["shap1_exact_shapley"][0](spark, sf_dir).collect()
    assert rows, "empty shapley output"
    for r in rows:
        assert r["efficiency_ok"] is True
        assert r["phi_a6"] + r["phi_b6"] + r["phi_c6"] == 6 * r["f_full"]
        # closed form: phi_a = a*(10 + 5b/2), phi_b = b*(20 + 5a/2),
        # phi_c = 3c (at 6x scale)
        assert r["phi_a6"] == r["a"] * (60 + 15 * r["b"])
        assert r["phi_b6"] == r["b"] * (120 + 15 * r["a"])
        assert r["phi_c6"] == 18 * r["c"]


def test_rdv1_no_churn_between_surviving_shards(spark, sf_dir):
    """rdv1: adding shard 5 only moves keys TO the new shard — every
    moved cell has shard6 == 5 (the minimal-migration property), and the
    moved fraction is plausibly ~1/6."""
    rows = QUERIES["rdv1_rendezvous_hashing"][0](spark, sf_dir).collect()
    total = sum(r["n_keys"] for r in rows)
    moved = sum(r["n_keys"] for r in rows if r["moved"])
    for r in rows:
        if r["moved"]:
            assert r["shard6"] == 5, f"churn between old shards: {r}"
    assert 0 < moved < total
    assert abs(moved / total - 1 / 6) < 0.1


def test_twa1_matches_python_integral(spark, sf_dir):
    """twa1's numerator and span == the Python piecewise-constant
    integral over exact cents and microseconds."""
    from decimal import Decimal

    per_user = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        us = int(r["ts"].timestamp() * 1_000_000) if isinstance(
            r["ts"], dt.datetime
        ) else r["ts"]
        # pyarrow to_pylist gives datetime; recompute microseconds exactly
        t = r["ts"]
        us = (
            int(
                (t - dt.datetime(1970, 1, 1)).total_seconds()
            ) * 1_000_000
            + t.microsecond
        )
        cents = (Decimal(repr(r["value"])).quantize(Decimal("0.000001"))
                 * 100)
        per_user[r["user_id"]].append((us, cents))
    expect = {}
    for uid, pts in per_user.items():
        pts.sort(key=lambda p: (p[0], p[1]))
        segs = [
            (pts[i][1], pts[i + 1][0] - pts[i][0])
            for i in range(len(pts) - 1)
        ]
        if len(segs) < 3:
            continue
        expect[uid] = (
            len(segs),
            sum(d for _, d in segs),
            sum(c * d for c, d in segs),
        )
    got = {
        r["user_id"]: (r["n_segments"], r["span_us"], r["twa_num"])
        for r in QUERIES["twa1_time_weighted_avg"][0](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(expect)
    for uid in expect:
        en, es, enum_ = expect[uid]
        gn, gs, gnum = got[uid]
        assert (gn, gs) == (en, es), uid
        assert Decimal(gnum) == enum_, uid


def test_px5_self_retrieval_at_rank_one(spark, sf_dir):
    """px5: the query chunk retrieves ITSELF at rank 1 — the end-to-end
    sanity invariant of the retrieval pipeline. The self-cosine is the
    normalized self-dot: mathematically 1, but the double fold
    sum(x_i^2)/sqrt(sum)^2 rounds, so it may sit 1 ULP below 1.0
    (observed at sf0.1: 0.9999999999999999). Cross-engine the value is
    still bit-identical (same fold both sides — the oracle-parity
    check); this invariant only needs rank-1 identity plus cosine at
    the top of the unit interval."""
    rows = sorted(
        QUERIES["px5_retrieval_pipeline"][0](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert rows, "empty retrieval result"
    top = rows[0]
    assert top["chunk_idx"] == 0
    assert abs(top["cosine"] - 1.0) < 1e-12
    assert all(r["cosine"] <= top["cosine"] for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
