"""Independent Python-reference properties for wave 83.

dlq1/e14: replay the corruption plan and the repair in pure Python from
the source table; certify the three-way accounting, conservation, that
every class is non-empty, that the recovered total equals the TRUE
total over non-dead docs (the repair restored originals), and that the
batch and streaming paths agree row-for-row.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _want(sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pylist()
    n_good = n_rep = n_dead = recovered = 0
    for r in docs:
        if r["doc_id"] % 23 == 0:
            n_dead += 1
        elif r["doc_id"] % 29 == 0:
            n_rep += 1
            recovered += r["n_chars"]
        else:
            n_good += 1
            recovered += r["n_chars"]
    return len(docs), n_good, n_rep, n_dead, recovered


def test_dlq1_accounting_and_repair_truth(spark, sf_dir):
    n, g, rp, dd, rec = _want(sf_dir)
    rows = QUERIES["dlq1_dead_letter_repair"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_lines, r.n_good, r.n_repaired, r.n_dead) == (n, g, rp, dd)
    assert r.conserve_ok and r.n_good + r.n_repaired + r.n_dead == r.n_lines
    # the repair law: recovered == TRUE total over non-dead docs
    assert r.recovered_chars == rec
    # all three routes are exercised at every SF
    assert r.n_good > 0 and r.n_repaired > 0 and r.n_dead > 0


def test_e14_stream_agrees_with_batch(spark, sf_dir):
    n, g, rp, dd, rec = _want(sf_dir)
    rows = QUERIES["e14_stream_dlq"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    s = rows[0]
    assert (s.n_lines, s.n_good, s.n_repaired, s.n_dead) == (n, g, rp, dd)
    assert s.recovered_chars == rec and s.conserve_ok
    # live path == backfill path, the agreement the shared oracle pins
    b = QUERIES["dlq1_dead_letter_repair"][0](spark, sf_dir).collect()[0]
    assert (
        (s.n_lines, s.n_good, s.n_repaired, s.n_dead, s.recovered_chars)
        == (b.n_lines, b.n_good, b.n_repaired, b.n_dead, b.recovered_chars)
    )
