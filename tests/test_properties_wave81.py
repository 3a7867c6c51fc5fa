"""Independent Python-reference properties for wave 81.

pk3: replay the greedy first-fit fold in pure Python per source,
certify every (seq, offset) assignment, the no-straddle contract, the
truncation rule, and sequence-utilization sanity (every non-final
sequence is too full to take the next doc — the greedy invariant).
mix2: replay the integer epoch plan and both ceiling laws; certify the
plan allocates the full 2x budget across sources up to rounding.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

BUDGET = 256


def _ws(text: str, lower: bool = False) -> list[str]:
    if lower:
        text = text.lower()
    return [t for t in text.strip().split() if t]


def test_pk3_replay_and_greedy_invariant(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append((r["doc_id"], len(_ws(r["text"]))))
    want = {}
    for src, lst in by_src.items():
        lst.sort()
        fill, seq = 0, 1
        for doc_id, n in lst:
            kept = min(n, BUDGET)
            if fill + kept > BUDGET:
                seq, off, fill = seq + 1, 0, kept
            else:
                off, fill = fill, fill + kept
            want[(src, doc_id)] = (n, kept, seq, off)
    rows = QUERIES["pk3_no_straddle_packing"][0](spark, sf_dir).collect()
    assert {(r.source, r.doc_id) for r in rows} == set(want)
    for r in rows:
        n, kept, seq, off = want[(r.source, r.doc_id)]
        assert (r.n_tokens, r.kept, r.seq_id, r.seq_offset) == (
            n,
            kept,
            seq,
            off,
        ), (r.source, r.doc_id)
        assert r.no_straddle_ok and r.seq_offset + r.kept <= BUDGET
    # greedy invariant: within a source, a new sequence opens ONLY
    # because the previous one could not fit the doc
    by_src_rows = defaultdict(list)
    for r in rows:
        by_src_rows[r.source].append(r)
    opened = 0
    for src, rs in by_src_rows.items():
        rs.sort(key=lambda r: r.doc_id)
        for prev, cur in zip(rs, rs[1:]):
            if cur.seq_id != prev.seq_id:
                assert cur.seq_id == prev.seq_id + 1
                assert prev.seq_offset + prev.kept + cur.kept > BUDGET
                opened += 1
    assert opened > 0, "packing must actually wrap at test SFs"


def test_mix2_replay_and_budget_allocation(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pylist()
    tokens, vocab = defaultdict(int), defaultdict(set)
    for r in docs:
        ws = _ws(r["text"], lower=True)
        tokens[r["source"]] += len(ws)
        vocab[r["source"]].update(ws)
    corpus = sum(tokens.values())
    sum_w = sum(len(v) for v in vocab.values())
    rows = QUERIES["mix2_epoch_plan"][0](spark, sf_dir).collect()
    assert {r.source for r in rows} == set(tokens)
    total_target = 0
    for r in rows:
        w = len(vocab[r.source])
        target = (2 * corpus * w) // sum_w
        epochs = (target + tokens[r.source] - 1) // tokens[r.source]
        assert (r.tokens, r.w) == (tokens[r.source], w)
        assert (r.target_tokens, r.epochs) == (target, epochs)
        assert r.planned_tokens == epochs * tokens[r.source]
        assert r.ceil_ok and r.planned_tokens >= target
        assert r.tight_ok and r.planned_tokens - target < tokens[r.source]
        total_target += target
    # apportionment: targets fill the 2x budget up to per-source rounding
    assert 2 * corpus - len(rows) < total_target <= 2 * corpus
    # the plan is non-trivial: at least one source repeats (epochs >= 2)
    assert any(r.epochs >= 2 for r in rows)
