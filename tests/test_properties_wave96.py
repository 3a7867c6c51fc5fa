"""Independent Python-reference properties for wave 96.

ppl1: replay the whole perplexity-band pipeline in pure Python straight
from the parquet — tokenize, plant the doc_id % 97 truncation, charge the
md5 bigram surprisal, truncating-integer means, corpus-mean threshold,
band labels, per-label aggregates — and assert bit-equality with the
Spark result, that every one of the three bands genuinely fired, and
that the plan is the advertised hash-aggregate over a broadcast scalar.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _replay(sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    per_doc = []
    for r in docs:
        # ADVICE r7: Python's \s is Unicode-aware while Spark's Java
        # regex \s and DuckDB's RE2 \s are ASCII-only — a document with
        # NBSP/U+2028 would tokenize differently in the replay even
        # though the two engines agree. flags=re.ASCII mirrors engine
        # semantics. lower() stays FULL Unicode: Spark's UTF8String
        # lowercase and DuckDB's utf8proc LOWER are both Unicode-aware,
        # so an ASCII-restricted lower would diverge the other way on
        # accented text. No .strip(): Python's is Unicode-aware, Spark's
        # F.trim is space-only, and the `if t` filter already drops the
        # empties ASCII edge-whitespace produces — unicode edge
        # whitespace stays attached to its token in ALL THREE, matching.
        text = (r["text"] or "").lower()
        toks = [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]
        if r["doc_id"] % 97 == 0:
            toks = toks[:1]
        nb = max(len(toks) - 1, 0)
        if nb == 0:
            per_doc.append((0, None))
            continue
        tot = 0
        for p, c in zip(toks, toks[1:]):
            h = int(
                hashlib.md5((p + "\x01" + c).encode()).hexdigest()[:6], 16
            )
            tot += 1 + h % 8192
        per_doc.append((nb, tot // nb))
    vals = [m for nb, m in per_doc if nb >= 1]
    g = sum(vals) // len(vals)
    agg = {}
    for nb, m in per_doc:
        lab = (
            "short"
            if nb == 0
            else ("predictable" if m < g else "surprising")
        )
        n, s, mn, mx = agg.get(lab, (0, 0, None, None))
        if m is None:
            agg[lab] = (n + 1, s, mn, mx)
        else:
            agg[lab] = (
                n + 1,
                s + m,
                m if mn is None else min(mn, m),
                m if mx is None else max(mx, m),
            )
    return g, {
        lab: (n, s, -1 if mn is None else mn, -1 if mx is None else mx)
        for lab, (n, s, mn, mx) in agg.items()
    }


def test_ppl1_replay_and_branches(spark, sf_dir):
    g, exp = _replay(sf_dir)
    fn, _ = QUERIES["ppl1_perplexity_band_filter"]
    rows = fn(spark, sf_dir).collect()
    got = {
        r.label: (
            r.n_docs,
            r.sum_mean_centinats,
            r.min_mean_centinats,
            r.max_mean_centinats,
        )
        for r in rows
    }
    assert got == exp
    assert all(r.threshold_centinats == g for r in rows)
    # every band fires at every SF: 'short' is PLANTED (doc_id % 97), the
    # other two split at the data-derived corpus mean (pigeonhole)
    assert set(got) == {"short", "predictable", "surprising"}
    # the planted short band carries no surprisal mass by construction
    assert got["short"][1] == 0 and got["short"][2] == -1
    # band boundary law: every predictable mean < g <= every surprising
    assert got["predictable"][3] < g <= got["surprising"][2]


def test_ppl1_plan_shape(spark, sf_dir):
    """The docstring's 100 TB claims, asserted: hash aggregation (map-side
    combinable) for the label rollup, a broadcast for the 1-row threshold
    (never a shuffle of the scored frame against it), and a column-pruned
    documents scan (doc_id, text only)."""
    from angelo_bravo_etl_task_spark.plans.audit import physical_plan

    fn, _ = QUERIES["ppl1_perplexity_band_filter"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "HashAggregate" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row scalar only
    scan_lines = [
        ln for ln in plan.splitlines() if "documents.parquet" in ln
    ]
    assert scan_lines, plan
    assert all(
        "lang" not in ln and "source" not in ln for ln in scan_lines
    ), scan_lines
