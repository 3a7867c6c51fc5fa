"""Independent Python-reference properties for wave 92.

px6: replay the whole RAG dataflow in pure Python — chunking,
content-addressed md5 embeddings, IVF assignment, probe routing,
bucket top-3 — and certify every retrieved row, the self-first
theorem, determinism of the embedding (identical text embeds
identically), and that retrieval returns non-self neighbors too (the
pipeline is a retrieval system, not an identity lookup).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES

CHUNK, DIMS = 32, 8


def _ws(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _embed(ctext: str) -> list[float]:
    return [(_h8(f"e{k}:{ctext}") % 1000) / 1000.0 for k in range(DIMS)]


def _d2(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def test_px6_full_replay(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    emb = {}
    for r in docs:
        ws = _ws(r["text"])
        if not ws:
            continue
        n_chunks = -(-len(ws) // CHUNK)
        for i in range(n_chunks):
            ctext = " ".join(ws[i * CHUNK : (i + 1) * CHUNK])
            emb[(r["doc_id"], i)] = _embed(ctext)
    cents = {
        d: v for (d, i), v in emb.items() if d % 50 == 0 and i == 0
    }
    assign = {
        key: min(cents, key=lambda c: (_d2(v, cents[c]), c))
        for key, v in emb.items()
    }
    buckets = defaultdict(list)
    for key, c in assign.items():
        buckets[c].append(key)
    want = {}
    for q in (1, 2, 3, 4, 5):
        qkey = (q, 0)
        if qkey not in emb:
            continue
        qv = emb[qkey]
        members = buckets[assign[qkey]]
        ranked = sorted(
            members, key=lambda k: (_d2(qv, emb[k]), k[0], k[1])
        )[:3]
        for rnk, k in enumerate(ranked, 1):
            want[(q, rnk)] = (k[0], k[1], _d2(qv, emb[k]))
    rows = QUERIES["px6_rag_pipeline"][0](spark, sf_dir).collect()
    assert {(r.qdoc, r.rnk) for r in rows} == set(want)
    for r in rows:
        doc, idx, dist = want[(r.qdoc, r.rnk)]
        assert (r.doc_id, r.chunk_idx) == (doc, idx), (r.qdoc, r.rnk)
        assert r.dist2 == dist  # bit-identical fold
        assert r.self_first_ok
        if r.rnk == 1:
            # THE theorem: the query's own chunk leads at distance zero
            assert (r.doc_id, r.chunk_idx, r.dist2) == (r.qdoc, 0, 0.0)
    # the pipeline retrieves genuine NEIGHBORS beyond self
    assert any(r.rnk > 1 and r.doc_id != r.qdoc for r in rows)
    # content addressing: identical text embeds identically
    assert _embed("a b c") == _embed("a b c")
    assert _embed("a b c") != _embed("a b d")
