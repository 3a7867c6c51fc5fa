"""Independent Python-reference properties for wave 86.

enc2: replay delta+zigzag+ladder in pure Python per (file, column),
certify max zigzag, widths, size estimates, both width laws, and the
bracketing story (the sort key packs under 8 bits; the shuffled key
needs more than the sort key everywhere it matters).
hist3: replay the decimal-exact binning, certify every cell and its
marginals, and conservation in all three directions.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

_LADDER = [(16, 4), (256, 8), (65536, 16), (16777216, 24), (4294967296, 32)]


def _bits(max_z: int) -> int:
    for cap, b in _LADDER:
        if max_z < cap:
            return b
    return 64


def test_enc2_replay_and_width_laws(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber", "l_shipdate"],
    ).to_pylist()
    per_file = defaultdict(list)
    for r in li:
        per_file[r["l_orderkey"] // 4096].append(
            (r["l_orderkey"], r["l_linenumber"], r["l_shipdate"], r["l_partkey"])
        )
    want = {}
    for fid, recs in per_file.items():
        recs.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
        for cname, idx in (("orderkey", 0), ("partkey", 3)):
            max_z, prev = 0, None
            for rec in recs:
                v = rec[idx]
                if prev is None:
                    z = 0
                else:
                    d = v - prev
                    z = 2 * d if d >= 0 else -2 * d - 1
                max_z = max(max_z, z)
                prev = v
            b = _bits(max_z)
            n = len(recs)
            want[(fid, cname)] = (n, max_z, b, (n * b + 7) // 8 + 8)
    rows = QUERIES["enc2_delta_zigzag"][0](spark, sf_dir).collect()
    assert {(r.file_id, r.col_name) for r in rows} == set(want)
    for r in rows:
        n, max_z, b, est = want[(r.file_id, r.col_name)]
        assert (r.n, r.max_z, r.bits, r.est_bytes) == (n, max_z, b, est)
        assert r.plain_bytes == 8 * n
        assert abs(r.ratio - est / (8 * n)) < 1e-15
        assert r.fits_ok and (b == 64 or max_z < (1 << b))
        assert r.minimal_ok
        if b > 4:
            prev_b = {8: 16, 16: 256, 24: 65536, 32: 16777216, 64: 4294967296}
            assert max_z >= prev_b[b], "width must be minimal"
    # the bracketing story: sort-key deltas pack into <= 8 bits, and the
    # shuffled partkey never packs tighter than the sort key
    by = {(r.file_id, r.col_name): r for r in rows}
    for fid in per_file:
        ok, pk = by[(fid, "orderkey")], by[(fid, "partkey")]
        assert ok.bits <= 8, "clustered key must pack tightly"
        assert pk.bits >= ok.bits
    assert any(by[(f, "partkey")].bits > by[(f, "orderkey")].bits
               for f in per_file), "contrast must actually appear"


def test_hist3_replay_and_conservation(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    ).to_pylist()
    cells = defaultdict(int)
    for r in li:
        qb = int(r["l_quantity"]) // 10
        db = int(Decimal(str(round(r["l_discount"], 2))) * 100) // 2
        cells[(qb, db)] += 1
    grand = sum(cells.values())
    rowm = defaultdict(int)
    colm = defaultdict(int)
    for (qb, db), n in cells.items():
        rowm[qb] += n
        colm[db] += n
    rows = QUERIES["hist3_2d_histogram"][0](spark, sf_dir).collect()
    assert {(r.qb, r.db) for r in rows} == set(cells)
    for r in rows:
        assert r.n == cells[(r.qb, r.db)]
        assert r.row_total == rowm[r.qb]
        assert r.col_total == colm[r.db]
        assert r.grand == grand
        assert r.marginals_ok
        assert abs(r.cell_frac - r.n / grand) < 1e-15
    assert sum(r.n for r in rows) == grand
