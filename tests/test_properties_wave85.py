"""Independent Python-reference properties for wave 85.

ld1: replay the stopword argmax prediction and the confusion counts in
pure Python, certify the exact-rational metrics (single divisions), the
NULL-where-undefined convention, macro-F1, and that the evaluation is
non-degenerate (the heuristic beats chance but is not perfect — errors
exist, so fp/fn branches fire).
krip1: replay the noise-coder and the coincidence algebra with
unbounded ints, certify A/B/N, the D_o/D_e reductions, the closed-form
alpha, its agreement with the textbook two-step formula, the range
laws, and that noise really lowered alpha below 1.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

STOP = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "with", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "del", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "von", "den", "ein", "mit", "ist", "im"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "也"),
}


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _predict(text: str) -> str | None:
    ws = [t for t in text.strip().lower().split() if t]
    best = max(
        ((sum(1 for t in ws if t in set(v)), k) for k, v in STOP.items()),
    )
    return best[1] if best[0] > 0 else None


def test_ld1_replay_metrics(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pylist()
    tp, fp, fn = Counter(), Counter(), Counter()
    classes = sorted({r["lang"] for r in docs})
    for r in docs:
        p = _predict(r["text"])
        t = r["lang"]
        if p == t:
            tp[t] += 1
        else:
            fn[t] += 1
            if p is not None:
                fp[p] += 1
    f1s = {
        c: (2 * tp[c]) / (2 * tp[c] + fp[c] + fn[c])
        if 2 * tp[c] + fp[c] + fn[c] > 0
        else None
        for c in classes
    }
    macro = sum(v or 0.0 for _, v in sorted(f1s.items())) / len(classes)
    rows = QUERIES["ld1_langid_confusion"][0](spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(classes)
    for r in rows:
        c = r.lang
        assert (r.tp, r.fp, r.fn) == (tp[c], fp[c], fn[c]), c
        if tp[c] + fp[c] > 0:
            assert abs(r.precision_ - tp[c] / (tp[c] + fp[c])) < 1e-15
        else:
            assert r.precision_ is None
        if tp[c] + fn[c] > 0:
            assert abs(r.recall_ - tp[c] / (tp[c] + fn[c])) < 1e-15
        assert (r.f1 is None) == (f1s[c] is None)
        if f1s[c] is not None:
            assert abs(r.f1 - f1s[c]) < 1e-15
        assert abs(r.macro_f1 - macro) < 1e-12
    # non-degenerate evaluation: better than chance, but errors exist
    assert sum(tp.values()) * 5 > len(docs)  # beats the 1/5 baseline
    assert sum(fn.values()) > 0, "a perfect heuristic makes the eval vacuous"


def test_krip1_replay_alpha(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pylist()
    langs = ["de", "en", "es", "fr", "zh"]
    pairs = []
    for r in docs:
        c1 = r["lang"]
        if _h8(f"k:{r['doc_id']}") % 10 == 0:
            c2 = langs[(langs.index(c1) + 1) % 5]
        else:
            c2 = c1
        pairs.append((c1, c2))
    n = len(pairs)
    big_n = 2 * n
    a = 2 * sum(1 for c1, c2 in pairs if c1 == c2)
    marg = Counter()
    for c1, c2 in pairs:
        marg[c1] += 1
        marg[c2] += 1
    b = sum(v * (v - 1) for v in marg.values())
    de_num = big_n * (big_n - 1) - b
    do_num = (big_n - a) * (big_n - 1)
    alpha = (de_num - do_num) / de_num
    # textbook two-step: 1 - Do/De
    d_o = (big_n - a) / big_n
    d_e = de_num / (big_n * (big_n - 1))
    assert abs(alpha - (1 - d_o / d_e)) < 1e-12
    rows = QUERIES["krip1_krippendorff_alpha"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_units, r.n_slots, r.agreements, r.marginal_pairs) == (
        n,
        big_n,
        a,
        b,
    )
    assert abs(r.d_observed - d_o) < 1e-15
    assert abs(r.d_expected - d_e) < 1e-15
    assert abs(r.alpha - alpha) < 1e-15
    assert r.alpha_le_one_ok and r.alpha_ge_neg1_ok
    assert -1.0 <= r.alpha < 1.0, "noise must pull alpha strictly below 1"
    assert r.alpha > 0.5, "90% agreement should still be reliably positive"
