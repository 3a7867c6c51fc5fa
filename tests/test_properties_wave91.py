"""Independent Python-reference properties for wave 91.

d10: replay the whole machine in pure Python — shingles, 16 md5
min-hashes, 4×4 banding, candidate generation, brute-force Jaccard
≥ 0.5 ground truth over the slice — and certify: the truth set (the
prefix-filter truth must equal brute force), every detected flag, the
exact-dup theorem, the recall arithmetic, and that banding actually
PRUNES (candidate pairs ≪ all pairs — the reason LSH exists).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

SEEDS, BAND_ROWS = 16, 4


def _norm_tokens(text: str) -> list[str]:
    t = "".join(
        ch if (ch.isalpha() or ch.isnumeric() or ch.isspace()) else " "
        for ch in text.lower()
    )
    t = re.sub(r"\s+", " ", t).strip()
    return [x for x in t.split(" ") if x]


def _shingles(text: str) -> set[str]:
    toks = _norm_tokens(text)
    out = set()
    for i in range(max(len(toks) - 3, 0) + 1):
        s = " ".join(toks[i : i + 3])
        if s:
            out.add(s)
    return out


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_d10_full_replay(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    sh = {
        r["doc_id"]: _shingles(r["text"])
        for r in docs
        if r["doc_id"] % 3 == 0
    }
    sh = {k: v for k, v in sh.items() if v}
    ids = sorted(sh)
    # brute-force truth (independent of the prefix-filter truth)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if inter * 2 >= union:
                truth[(a, b)] = (inter, union)
    # signatures and candidates
    sigs = {}
    for d, grams in sh.items():
        mh = [
            min(_h60(f"{i}:{g}") for g in grams) for i in range(SEEDS)
        ]
        sigs[d] = [
            tuple(mh[band * BAND_ROWS : (band + 1) * BAND_ROWS])
            for band in range(SEEDS // BAND_ROWS)
        ]
    buckets = defaultdict(set)
    for d, bands in sigs.items():
        for band, bsig in enumerate(bands):
            buckets[(band, bsig)].add(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cand.add((a, b))
    rows = QUERIES["d10_minhash_recall"][0](spark, sf_dir).collect()
    assert {(r.id_a, r.id_b) for r in rows} == set(truth), (
        "prefix-filter truth must equal brute force"
    )
    n_det = 0
    for r in rows:
        inter, union = truth[(r.id_a, r.id_b)]
        assert (r.inter_n, r.union_n) == (inter, union)
        assert abs(r.jaccard - inter / union) < 1e-15
        assert r.detected == ((r.id_a, r.id_b) in cand)
        assert r.exact_dup_detected_ok
        if inter == union:
            assert r.detected, "exact dup must always be detected"
        n_det += r.detected
    for r in rows:
        assert r.n_truth == len(truth)
        assert r.n_detected == n_det
        assert abs(r.recall - n_det / len(truth)) < 1e-15
    # LSH must PRUNE: candidates far below all pairs
    all_pairs = len(ids) * (len(ids) - 1) // 2
    assert len(cand) * 10 < all_pairs, (len(cand), all_pairs)
