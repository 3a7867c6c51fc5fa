"""Independent Python-reference properties for the wave 62 capstone."""

from __future__ import annotations

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _python_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit1_four_implementations_agree(spark, sf_dir):
    """The hand-built Spark DP, Spark's builtin, DuckDB's builtin (via
    the oracle parity test), and this Python DP all agree; metric
    axioms spot-checked (identity, symmetry on a reversed pair check,
    and |len difference| lower bound)."""
    words = sorted(
        {
            w
            for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
            for w in r["text"].strip().split()
            if 3 <= len(w) <= 12
        }
    )[:31]
    expect = {}
    for i in range(0, len(words) - 1, 2):
        w1, w2 = words[i], words[i + 1]
        expect[(w1, w2)] = _python_lev(w1, w2)
    rows = QUERIES["edit1_certified_levenshtein"][0](spark, sf_dir).collect()
    got = {(r.w1, r.w2): (r.dp_distance, r.builtin_distance, r.implementations_agree) for r in rows}
    assert set(got) == set(expect)
    for pair, (dp, bi, ok) in got.items():
        assert ok, f"hand DP disagreed with builtin on {pair}"
        assert dp == bi == expect[pair]
        w1, w2 = pair
        assert dp >= abs(len(w1) - len(w2))
        assert dp <= max(len(w1), len(w2))
        assert _python_lev(w2, w1) == dp  # symmetry
        assert _python_lev(w1, w1) == 0  # identity
