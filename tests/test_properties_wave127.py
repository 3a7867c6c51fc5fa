"""Wave-127 properties: px8's packing laws over the cleaned corpus and
its composition consistency with sd2."""

from __future__ import annotations

from angelo_bravo_etl_task_spark.queries_wave124 import sd2_substring_rewrite
from angelo_bravo_etl_task_spark.queries_wave127 import (
    _PX8_BUDGET,
    px8_clean_pack_pipeline,
)


def test_px8_packing_and_composition_laws(spark, sf_dir):
    rows = px8_clean_pack_pipeline(spark, sf_dir).collect()
    assert rows
    sd2 = {r["doc_id"]: r for r in sd2_substring_rewrite(spark, sf_dir).collect()}
    # composition: px8's cleaned counts ARE sd2's kept counts; empty
    # rewrites (non-canonical %61 boilerplate docs) are dropped
    for r in rows:
        assert r["n_clean"] == sd2[r["doc_id"]]["kept_tokens"], r
        assert r["n_clean"] > 0
        assert 0 <= r["seq_offset"] < _PX8_BUDGET
    packed_ids = {r["doc_id"] for r in rows}
    for doc_id, s in sd2.items():
        if s["kept_tokens"] == 0:
            assert doc_id not in packed_ids
        else:
            assert doc_id in packed_ids
    assert 0 in packed_ids  # the canonical boilerplate keeper survives
    # packing: per source in doc_id order, each doc starts at the running
    # total of earlier cleaned docs (pk1's boundary-spanning rule)
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        total = 0
        for r in rs:
            assert r["seq_id"] == total // _PX8_BUDGET, (src, r)
            assert r["seq_offset"] == total % _PX8_BUDGET, (src, r)
            total += r["n_clean"]
        seqs = sorted({r["seq_id"] for r in rs})
        assert seqs == list(range(seqs[-1] + 1)), f"gap in seq ids for {src}"
