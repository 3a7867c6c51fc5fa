"""Independent Python-reference properties for wave 75.

vb2: rebuild term frequencies in pure Python, replay the coverage curve,
certify exactness at every k, coverage monotonicity across rows, the
average-bound law, and that the last k's coverage approaches 1 as the
vocab nears the full term count.
pk2: replay bucketing, certify per-bucket stats, the snugness law, the
pad_frac < 1/2 bound it implies (outside the capped bucket), and that
bucketing strictly beats pad-to-max on total padded tokens.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _ws_tokens(text: str, lower: bool = False) -> list[str]:
    if lower:
        text = text.lower()
    return [t for t in text.strip().split() if t]


def test_vb2_replay_and_curve_laws(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pylist()
    freq = Counter()
    for r in docs:
        freq.update(_ws_tokens(r["text"], lower=True))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    cum = []
    run = 0
    for _, f in ranked:
        run += f
        cum.append(run)
    rows = sorted(
        QUERIES["vb2_oov_coverage"][0](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    want_ks = [2**e for e in range(11) if 2**e <= len(ranked)]
    assert [r.k for r in rows] == want_ks
    prev_cov = 0.0
    for r in rows:
        assert r.total_tokens == total
        assert r.freq_k == ranked[r.k - 1][1]
        assert r.covered_tokens == cum[r.k - 1]
        assert abs(r.coverage - cum[r.k - 1] / total) < 1e-15
        assert r.avg_bound_ok and r.freq_k * r.k <= r.covered_tokens
        assert r.coverage >= prev_cov  # monotone in k
        prev_cov = r.coverage
    assert 0 < rows[0].coverage <= rows[-1].coverage <= 1.0


def test_pk2_replay_and_packing_laws(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    buckets = defaultdict(list)
    for r in docs:
        n = len(_ws_tokens(r["text"]))
        if n == 0:
            continue
        for b in (8, 16, 32, 64, 128, 256, 512):
            if n <= b or b == 512:
                buckets[b].append(n)
                break
    rows = QUERIES["pk2_length_buckets"][0](spark, sf_dir).collect()
    assert {r.bucket for r in rows} == set(buckets)
    total_padded = 0
    total_docs = 0
    for r in rows:
        lens = buckets[r.bucket]
        kept = sum(min(n, 512) for n in lens)
        assert (r.n_docs, r.min_len, r.max_len, r.kept_tokens) == (
            len(lens),
            min(lens),
            max(lens),
            kept,
        ), r.bucket
        assert r.padded_tokens == len(lens) * r.bucket
        assert abs(r.pad_frac - (1 - kept / r.padded_tokens)) < 1e-15
        assert r.snug_ok
        # snugness bounds waste below 1/2 outside the capped bucket
        if r.bucket not in (512,):
            assert r.pad_frac < 0.5, r.bucket
        total_padded += r.padded_tokens
        total_docs += r.n_docs
    # bucketing strictly beats pad-to-max whenever lengths vary
    pad_to_max = total_docs * 512
    if len(rows) > 1:
        assert total_padded < pad_to_max
