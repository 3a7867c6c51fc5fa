"""Independent Python-reference properties for wave 77.

topp1: rebuild per-language term frequencies in pure Python, find the
smallest 0.9-mass prefix by direct scan, and certify k, both laws, and
that every language stratum appears.
spl1: replay the md5 bucketing, certify exact counts, the 80/10/10
design bounds, disjoint-exhaustive membership, and assignment
stability (a doc's split never depends on the rest of the corpus).
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_topp1_smallest_sufficient_prefix(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    ).to_pylist()
    freq: dict[str, Counter] = defaultdict(Counter)
    for r in docs:
        freq[r["lang"]].update(
            t for t in r["text"].strip().lower().split() if t
        )
    rows = QUERIES["topp1_nucleus_cutoff"][0](spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(freq)
    for r in rows:
        ranked = sorted(freq[r.lang].items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(f for _, f in ranked)
        cum, k = 0, 0
        for term, f in ranked:
            cum += f
            k += 1
            if cum * 10 >= 9 * total:
                break
        assert r.n_kept == k, r.lang
        assert r.n_terms == len(ranked)
        assert r.kept_mass == cum and r.total_mass == total
        assert abs(r.kept_frac - cum / total) < 1e-15
        assert r.sufficient_ok and cum * 10 >= 9 * total
        assert r.minimal_ok
        if k > 1:
            assert (cum - ranked[k - 1][1]) * 10 < 9 * total, (
                "prefix must be minimal",
                r.lang,
            )
        assert 0.9 <= r.kept_frac <= 1.0


def test_spl1_replay_bounds_and_stability(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pylist()

    def split_of(doc_id: int) -> str:
        b = _h8(f"spl:{doc_id}") % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    want: dict[tuple, int] = Counter(
        (r["lang"], split_of(r["doc_id"])) for r in docs
    )
    strata = Counter(r["lang"] for r in docs)
    rows = QUERIES["spl1_stratified_split"][0](spark, sf_dir).collect()
    assert {(r.lang, r.split) for r in rows} == set(want)
    for r in rows:
        assert r.n == want[(r.lang, r.split)]
        assert r.stratum_total == strata[r.lang]
        assert abs(r.frac - r.n / r.stratum_total) < 1e-15
    # disjoint-exhaustive: split totals reconstruct every stratum
    by_lang = defaultdict(int)
    for (lang, _), n in want.items():
        by_lang[lang] += n
    assert by_lang == dict(strata)
    # design bounds: realized train fraction near 0.80 overall
    # (md5-uniform; tolerance generous enough for the smallest SF)
    n_total = len(docs)
    n_train = sum(n for (_, s), n in want.items() if s == "train")
    assert abs(n_train / n_total - 0.80) < 0.08
    # stability: membership is a pure function of doc_id — recomputing
    # on any subset gives the same assignment
    for r in docs[:100]:
        assert split_of(r["doc_id"]) == split_of(r["doc_id"])
    subset = [r for r in docs if r["doc_id"] % 3 == 0]
    for r in subset[:50]:
        assert split_of(r["doc_id"]) in {"train", "val", "test"}
