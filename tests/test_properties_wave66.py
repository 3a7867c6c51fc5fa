"""Independent Python-reference properties for the wave 66 classics."""

from __future__ import annotations

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_coin1_dp_optimal_and_divergence_set_exact(spark, sf_dir):
    """The DP column is the true optimum (checked by Python DP AND an
    exhaustive search); the greedy column replays; and the divergence
    flag is true on exactly the amounts where greedy loses — which is
    a NON-EMPTY set on {1,3,4} (amount 6 included)."""
    coins = (1, 3, 4)
    INF = 10**9
    dp = [0] + [INF] * 30
    for a in range(1, 31):
        dp[a] = 1 + min(dp[a - c] for c in coins if a >= c)
    rows = sorted(
        QUERIES["coin1_change_dp_vs_greedy"][0](spark, sf_dir).collect(),
        key=lambda r: r.amount,
    )
    assert len(rows) == 30
    diverged = set()
    for r in rows:
        a = r.amount
        g = a // 4 + (a % 4) // 3 + ((a % 4) % 3)
        assert r.dp_coins == dp[a]
        assert r.greedy_coins == g
        assert r.greedy_suboptimal == (g > dp[a])
        if r.greedy_suboptimal:
            diverged.add(a)
    assert 6 in diverged, "the textbook counterexample must fire"
    assert diverged, "non-canonical system must diverge somewhere"
    # exhaustive certificate for small amounts
    from itertools import product

    for a in range(1, 13):
        best = min(
            (x + y + z)
            for x, y, z in product(range(13), repeat=3)
            if x * 1 + y * 3 + z * 4 == a
        )
        assert dp[a] == best


def test_lps1_is_palindromic_and_maximal(spark, sf_dir):
    """The reported string is a palindrome of the reported length,
    occurs in the prefix, and brute force over all substrings finds
    nothing longer."""
    docs = {
        r["doc_id"]: r["text"][:40].lower()
        for r in sorted(
            pq.read_table(f"{sf_dir}/documents.parquet").to_pylist(),
            key=lambda r: r["doc_id"],
        )[:15]
    }
    rows = QUERIES["lps1_longest_palindrome"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        s = docs[r.doc_id]
        p = r.palindrome
        assert len(p) == r.pal_len
        assert p == p[::-1], f"not a palindrome: {p!r}"
        assert p in s
        brute = max(
            (
                len(s[i:j])
                for i in range(len(s))
                for j in range(i + 1, len(s) + 1)
                if s[i:j] == s[i:j][::-1]
            ),
        )
        assert r.pal_len == brute, f"doc {r.doc_id}: {r.pal_len} vs {brute}"
