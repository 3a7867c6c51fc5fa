"""Independent Python-reference properties for wave 73.

prn1: replay the file assignment + manifest + pruning verdicts in pure
Python and certify the safety law (no file with matches is ever
skipped), that all three verdict branches actually fire (kept, skipped,
false-positive), and that the compaction file (-1) is the bimodal one.
enc1: replay run counting under the declared layout sort and certify
run counts, distinct counts, and that both advisor verdicts fire in
both directions across the four columns.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_prn1_replay_and_safety_law(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pylist()
    d0 = min(r["o_orderdate"] for r in orders).date()
    files = defaultdict(list)
    for r in orders:
        day = (r["o_orderdate"].date() - d0).days
        special = _h8(f"prn:{r['o_orderkey']}") % 19 == 0 and (
            day < 150 or day > 500
        )
        files[-1 if special else day // 60].append(day)
    want = {}
    for fid, days in files.items():
        n_match = sum(1 for d in days if 200 <= d <= 400)
        kept = min(days) <= 400 and max(days) >= 200
        want[fid] = (len(days), min(days), max(days), n_match, kept)
    rows = QUERIES["prn1_manifest_pruning"][0](spark, sf_dir).collect()
    assert {r.file_id for r in rows} == set(want)
    for r in rows:
        n, mn, mx, m, kept = want[r.file_id]
        assert (r.n_rows, r.min_day, r.max_day, r.n_match, r.kept) == (
            n,
            mn,
            mx,
            m,
            kept,
        ), r.file_id
        # THE law: stats-based skipping never loses data
        assert r.no_false_prune and (r.n_match == 0 or r.kept)
        assert r.kept_but_empty == (r.kept and r.n_match == 0)
    # all three branches fire
    assert any(r.kept and r.n_match > 0 for r in rows)
    assert any(not r.kept for r in rows)
    fps = [r for r in rows if r.kept_but_empty]
    assert fps and all(r.file_id == -1 for r in fps), (
        "the compaction file is the (only) false positive"
    )
    # and the compaction file is genuinely bimodal around the predicate
    assert want[-1][1] < 150 and want[-1][2] > 500


def test_enc1_replay_and_advisor_branches(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_returnflag",
            "l_linestatus",
            "l_partkey",
        ],
    ).to_pylist()
    cols = {
        "returnflag": lambda r: r["l_returnflag"],
        "linestatus": lambda r: r["l_linestatus"],
        "partkey": lambda r: str(r["l_partkey"]),
        "shipmonth": lambda r: str(r["l_shipdate"].date())[:7],
    }
    stats = {}
    for cname, get in cols.items():
        per_file = defaultdict(list)
        for r in li:
            per_file[r["l_orderkey"] // 4096].append(
                (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"], get(r))
            )
        runs, n, seen = 0, 0, set()
        for recs in per_file.values():
            recs.sort()
            prev = object()
            for _, _, _, v in recs:
                n += 1
                seen.add(v)
                if v != prev:
                    runs += 1
                prev = v
        stats[cname] = (n, len(seen), runs)
    rows = QUERIES["enc1_encoding_stats"][0](spark, sf_dir).collect()
    assert {r.col_name for r in rows} == set(cols)
    for r in rows:
        n, nd, runs = stats[r.col_name]
        assert (r.n_values, r.n_distinct, r.n_runs) == (n, nd, runs), r.col_name
        assert abs(r.avg_run_len - n / runs) < 1e-12
        assert r.dict_friendly == (nd * 100 <= n)
        assert r.rle_friendly == (runs * 4 <= n)
    # advisor branches fire in both directions
    assert any(r.dict_friendly for r in rows)
    assert any(not r.dict_friendly for r in rows)
    assert any(r.rle_friendly for r in rows)
    assert any(not r.rle_friendly for r in rows)
