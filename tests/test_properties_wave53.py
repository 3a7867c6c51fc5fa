"""Independent Python-reference properties for the wave 53 algorithm."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_mrk2_proofs_verify_and_tampering_fails(spark, sf_dir):
    """mrk2 == a Python binary-Merkle replay (root, every probe path);
    all proofs verify; a tampered sibling makes verification fail; and
    an adversarial leaf NOT in the corpus fails against the real root."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    leaves = sorted(
        _md5(r["text"]) for r in docs if r["doc_id"] % 17 == 0
    )
    n = len(leaves)
    arr = list(leaves)
    levels = [list(arr)]
    for _ in range(12):
        nxt = []
        for j in range(0, (len(arr) + 1) // 2):
            left = arr[2 * j]
            if 2 * j + 1 < len(arr):
                nxt.append(_md5(left + arr[2 * j + 1]))
            else:
                nxt.append(left)
        arr = nxt
        levels.append(list(arr))
    root = arr[0]

    def path_for(idx1: int):
        path = []
        idx = idx1
        for lvl in range(12):
            cur = levels[lvl]
            if idx % 2 == 1:
                sib = cur[idx] if idx < len(cur) else ""
                path.append((sib, True))
            else:
                path.append((cur[idx - 2], False))
            idx = (idx + 1) // 2
        return path

    def verify(leaf, path):
        h = leaf
        for sib, hl in path:
            if sib == "":
                continue
            h = _md5(h + sib) if hl else _md5(sib + h)
        return h

    rows = QUERIES["mrk2_inclusion_proof"][0](spark, sf_dir).collect()
    probe_idxs = sorted({1, 2, n})
    assert sorted(r.probe_idx for r in rows) == probe_idxs
    for r in rows:
        assert r.root == root
        assert r.leaf == leaves[r.probe_idx - 1]
        expect_path = path_for(r.probe_idx)
        assert r.proof_path == "/".join(
            f"{s}:{'L' if hl else 'R'}" for s, hl in expect_path
        )
        assert r.verified
        assert verify(r.leaf, expect_path) == root
        # tampering: flip one non-empty sibling -> verification fails
        tampered = [
            ((_md5("x") if s else s), hl) for s, hl in expect_path
        ]
        assert verify(r.leaf, tampered) != root
        # a leaf outside the corpus fails against the honest path
        assert verify(_md5("not-in-corpus"), expect_path) != root
