"""Independent Python-reference properties for wave 72.

ssj2: rebuild shingle sets in pure Python, brute-force ALL pairs, and
certify the prefix filter is COMPLETE (every true pair ≥ τ is emitted —
the theorem, checked empirically) and SOUND (every emitted pair really
is ≥ τ), plus the prefix-length formula and the rarest-first ordering.
rsv1: replay the min-of-w md5 draws with hashlib and certify the exact
per-stratum top-5, the weight law, and the min-of-w ≡ u^(1/w)
distributional argument's integer mechanics (more copies can only
lower the min).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _norm_tokens(text: str) -> list[str]:
    # mirror normalize_text's [^\p{L}\p{N}\s] exactly: Python \w would
    # additionally keep '_' and drop non-decimal \p{N} numerals
    t = "".join(
        ch
        if (ch.isalpha() or ch.isnumeric() or ch.isspace())
        else " "
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


def _jaccard_ok(a: set, b: set) -> bool:
    inter = len(a & b)
    return inter * 10 >= 6 * (len(a) + len(b) - inter)


def test_ssj2_prefix_filter_sound_and_complete(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    sh = {k: v for k, v in sh.items() if v}
    # ground truth: brute force over ALL pairs
    ids = sorted(sh)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _jaccard_ok(sh[a], sh[b])
    }
    rows = QUERIES["ssj2_shingle_prefix_join"][0](spark, sf_dir).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    assert got == truth, (
        f"missing={sorted(truth - got)[:5]} extra={sorted(got - truth)[:5]}"
    )
    for r in rows:  # soundness of the emitted arithmetic
        inter = len(sh[r.id_a] & sh[r.id_b])
        union = len(sh[r.id_a] | sh[r.id_b])
        assert (r.n_common, r.n_a, r.n_b) == (
            inter,
            len(sh[r.id_a]),
            len(sh[r.id_b]),
        )
        assert abs(r.jaccard - inter / union) < 1e-12
        assert r.jaccard >= 0.6 - 1e-12
    # the theorem the algorithm rests on: every true pair shares a
    # prefix shingle under rarest-first ordering
    freq = Counter(g for s in sh.values() for g in s)
    pref = {
        k: set(
            sorted(v, key=lambda g: (freq[g], g))[
                : len(v) - (6 * len(v) + 9) // 10 + 1
            ]
        )
        for k, v in sh.items()
    }
    for a, b in truth:
        assert pref[a] & pref[b], f"prefix filter would miss true pair {a},{b}"


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_rsv1_replay_and_weight_laws(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pylist()
    pri = {}
    for r in docs:
        w = 1 + min(r["n_chars"] // 100, 7)
        p = min(_h8(f"rsv:{r['doc_id']}:{i}") for i in range(1, w + 1))
        pri[r["doc_id"]] = (r["lang"], w, p)
    by_lang: dict[str, list] = {}
    for doc_id, (lang, w, p) in pri.items():
        by_lang.setdefault(lang, []).append((p, doc_id, w))
    want = {
        lang: sorted(v)[:5] for lang, v in by_lang.items()
    }
    rows = QUERIES["rsv1_weighted_reservoir"][0](spark, sf_dir).collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r.lang, []).append((r.rnk, r.priority, r.doc_id, r.weight))
    assert set(got) == set(want)
    for lang in want:
        got[lang].sort()
        assert [(p, d, w) for _, p, d, w in got[lang]] == want[lang], lang
        assert [rnk for rnk, *_ in got[lang]] == list(
            range(1, len(want[lang]) + 1)
        )
        # every stratum yields min(5, stratum size) rows — nothing dropped
        assert len(got[lang]) == min(5, len(by_lang[lang]))
    # the min-of-w mechanics: adding copies can only lower the priority,
    # which is WHY heavier docs win more often (u^(1/w) stochastic order)
    for r in docs[:50]:
        w = 1 + min(r["n_chars"] // 100, 7)
        mins = [
            min(_h8(f"rsv:{r['doc_id']}:{i}") for i in range(1, k + 1))
            for k in range(1, w + 1)
        ]
        assert mins == sorted(mins, reverse=True)
