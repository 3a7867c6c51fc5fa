"""Independent Python-reference properties for the wave 58 algorithms."""

from __future__ import annotations

import base64
import hashlib

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_f24_round_trips_and_python_encodings(spark, sf_dir):
    """Every round-trip flag is TRUE, and both encodings equal Python's
    base64/hex of the identical UTF-8 prefixes."""
    docs = sorted(_rows(sf_dir, "documents"), key=lambda r: r["doc_id"])[:25]
    rows = QUERIES["f24_binary_encodings"][0](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    by_id = {r["doc_id"]: r["text"] for r in docs}
    for r in rows:
        t = by_id[r.doc_id]
        assert r.b64_ok and r.hex_ok
        assert r.b64 == base64.b64encode(t[:24].encode()).decode()
        assert r.hx == t[:12].encode().hex()
        assert r.b64_roundtrip == t[:24]
        assert r.hex_roundtrip == t[:12]


def test_vs1_semver_rank_matches_tuple_sort_and_diverges(spark, sf_dir):
    """The semver rank == Python tuple sort of the identical parsed
    versions; the lexicographic rank diverges somewhere (the trap the
    query exists to pin)."""
    keys = sorted(r["p_partkey"] for r in _rows(sf_dir, "part"))[:30]
    vers = {}
    for k in keys:
        ver = (
            _h(f"ma{k}") % 12,
            _h(f"mi{k}") % 25,
            _h(f"pa{k}") % 10,
        )
        vers[k] = ver
    by_sem = sorted(keys, key=lambda k: (*vers[k], k))
    by_lex = sorted(
        keys, key=lambda k: (f"v{vers[k][0]}.{vers[k][1]}.{vers[k][2]}", k)
    )
    sem_rank = {k: i + 1 for i, k in enumerate(by_sem)}
    lex_rank = {k: i + 1 for i, k in enumerate(by_lex)}
    rows = QUERIES["vs1_version_ordering"][0](spark, sf_dir).collect()
    got = {r.key: (r.major, r.minor, r.patch, r.semver_rank, r.lex_rank) for r in rows}
    for k, (ma, mi, pa, sr, lr) in got.items():
        assert (ma, mi, pa) == vers[k]
        assert sr == sem_rank[k]
        assert lr == lex_rank[k]
    assert any(sr != lr for _, _, _, sr, lr in got.values()), (
        "string order must diverge from numeric order"
    )
