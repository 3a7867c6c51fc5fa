"""Independent Python-reference properties for wave 70.

bm25_1: rebuild postings/doclen/stats in pure Python, replay the exact
integer BM25 formula with unbounded ints, certify the top-10 against
the query, and verify both defining behaviors hold in the replayed
scorer: tf saturation (score concave in tf) and length penalty (same
tf, longer doc => no higher term score).
il1: replay the slot-merge interleave with plain lists and certify
positions, sources, first-occurrence dedup, and order preservation.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _bm25_parts(sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    postings = defaultdict(Counter)  # term -> doc -> tf
    dl = {}
    for r in docs:
        toks = [t for t in r["text"].strip().lower().split() if t]
        dl[r["doc_id"]] = len(toks)
        for t in toks:
            postings[t][r["doc_id"]] += 1
    n = len(dl)
    big_l = sum(dl.values())
    return postings, dl, n, big_l


def _term_score(tf, d_len, df, n, big_l):
    idf = min((n * 1000) // df, 100000)
    tf = min(tf, 100000)  # in-code overflow bound, mirrored in both engines
    return (idf * 22 * tf * big_l) // (
        10 * big_l * tf + 3 * big_l + 9 * n * d_len
    )


def test_bm25_replay_and_axioms(spark, sf_dir):
    postings, dl, n, big_l = _bm25_parts(sf_dir)
    by_df = sorted(postings, key=lambda t: (-len(postings[t]), t))
    qterms = by_df[7:13]  # df-rank 8..13
    scores, hits = Counter(), Counter()
    for t in qterms:
        df = len(postings[t])
        for doc, tf in postings[t].items():
            scores[doc] += _term_score(tf, dl[doc], df, n, big_l)
            hits[doc] += 1
    top = sorted(scores, key=lambda d: (-scores[d], d))[:10]
    rows = QUERIES["bm25_1_ranked_retrieval"][0](spark, sf_dir).collect()
    assert [r.doc_id for r in rows] == top
    for r in rows:
        assert r.score == scores[r.doc_id]
        assert r.n_terms_hit == hits[r.doc_id]
        assert r.dl == dl[r.doc_id]
    # axiom 1 — tf saturation: marginal gain of tf is non-increasing
    df0, d_len = len(postings[qterms[0]]), 100
    gains = [
        _term_score(tf + 1, d_len, df0, n, big_l)
        - _term_score(tf, d_len, df0, n, big_l)
        for tf in range(1, 20)
    ]
    assert all(g2 <= g1 + 1 for g1, g2 in zip(gains, gains[1:]))  # +1: DIV
    assert _term_score(20, d_len, df0, n, big_l) < 20 * _term_score(
        1, d_len, df0, n, big_l
    ), "saturation: 20 occurrences must score below 20x one occurrence"
    # axiom 2 — length normalization: longer doc, same tf, no higher score
    for tf in (1, 3, 9):
        s = [_term_score(tf, L, df0, n, big_l) for L in (50, 100, 400, 1600)]
        assert s == sorted(s, reverse=True)


def test_bm25_products_bounded_at_corpus_scale(spark, sf_dir):
    """The score arithmetic must survive ANY input tf at corpus-scale
    (n, L) — the caps and the 128-bit widening are in-code, not
    assumptions. int64 is NOT enough: even with tf capped at 1e5 the
    numerator 1e5·22·1e5·L passes 2^63 once L > 4.2e7 tokens, so the
    production expression runs in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB). Run the exact Spark-side expression over adversarial tf up
    to 1e12 on a simulated 4e10-token corpus and assert it matches the
    unbounded-int Python replica (an overflow would raise under ANSI or
    silently diverge otherwise), plus cap saturation."""
    from pyspark.sql import functions as F

    n, big_l, df, d_len = 10**6, 4 * 10**10, 3, 100  # ~sf100 corpus scale
    tfs = [1, 7, 99999, 100000, 100001, 10**9, 10**12]
    sdf = spark.createDataFrame(
        [(t,) for t in tfs], "tf bigint"
    ).select(
        "tf",
        F.expr(
            f"(LEAST(({n}L * 1000) DIV {df}, 100000)"
            f" * CAST(22 AS DECIMAL(38,0)) * LEAST(tf, 100000) * {big_l}L)"
            f" DIV (CAST(10 AS DECIMAL(38,0)) * {big_l}L"
            f" * LEAST(tf, 100000) + 3 * {big_l}L"
            f" + 9 * {n}L * {d_len})"
        ).alias("score"),
    )
    got = {r.tf: int(r.score) for r in sdf.collect()}
    import duckdb

    duck = {
        t: duckdb.sql(
            f"SELECT (LEAST(({n} * 1000) // {df}, 100000)"
            f" * CAST(22 AS HUGEINT) * LEAST({t}, 100000) * {big_l})"
            f" // (CAST(10 AS HUGEINT) * {big_l} * LEAST({t}, 100000)"
            f" + 3 * {big_l} + 9 * {n} * {d_len})"
        ).fetchone()[0]
        for t in tfs
    }
    for t in tfs:
        want = _term_score(t, d_len, df, n, big_l)
        assert got[t] == want == duck[t], (t, got[t], duck[t], want)
        assert 0 <= got[t] <= 100000 * 3, "score within idf·(k1+1)/k1 bound"
    # cap saturation: tf beyond the cap scores identically to the cap
    assert got[100001] == got[100000] == got[10**12]
    # decimal128 headroom for the largest capped numerator
    assert 100000 * 22 * 100000 * big_l < 10**38


def test_il1_interleave_replay(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_quantity"],
    ).to_pylist()
    from decimal import Decimal

    rev, qty = defaultdict(lambda: Decimal("0.00")), Counter()
    for r in li:
        rev[r["l_partkey"]] += Decimal(str(round(r["l_extendedprice"], 2)))
        qty[r["l_partkey"]] += int(r["l_quantity"])
    rank_a = sorted(rev, key=lambda p: (-rev[p], p))[:12]
    rank_b = sorted(qty, key=lambda p: (-qty[p], p))[:12]
    slot = {}
    src = {}
    for i, p in enumerate(rank_a, 1):
        slot[p], src[p] = 2 * i - 1, "A"
    for i, p in enumerate(rank_b, 1):
        if 2 * i < slot.get(p, 10**9):
            slot[p], src[p] = 2 * i, "B"
    order = sorted(slot, key=lambda p: slot[p])
    rows = QUERIES["il1_slot_interleave"][0](spark, sf_dir).collect()
    assert [r.l_partkey for r in rows] == order
    pos_a = [r.rank_in_a for r in rows if r.src == "A"]
    pos_b = [r.rank_in_b for r in rows if r.src == "B"]
    assert pos_a == sorted(pos_a) and pos_b == sorted(pos_b)
    for r in rows:
        assert r.position == order.index(r.l_partkey) + 1
        assert r.src == src[r.l_partkey]
        assert r.slot == slot[r.l_partkey]
        assert r.order_ok is True
        if r.src == "A":
            assert r.rank_in_a == rank_a.index(r.l_partkey) + 1
        else:
            assert r.rank_in_b == rank_b.index(r.l_partkey) + 1
        in_a = r.l_partkey in rank_a
        assert (r.rank_in_a is not None) == in_a
    # every top-12 item from both rankers survives the dedup exactly once
    assert set(order) == set(rank_a) | set(rank_b)
    assert len(order) == len(set(order))
