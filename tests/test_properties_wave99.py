"""Independent Python-reference properties for wave 99.

f25: the oracle can only certify plaintext-derived LAWS (DuckDB has no
AES); this test goes further — it re-encrypts every plaintext with the
`cryptography` library's AES-128-ECB + PKCS7 and compares Spark's actual
ciphertext BYTE-EXACTLY (a known-answer certificate against an
independent implementation), then replays the released group frame in
pure Python.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from angelo_bravo_etl_task_spark.queries import QUERIES

_KEY = b"0123456789abcdef"


def _pts(sf_dir):
    rows = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).to_pylist()
    return [
        f"{r['c_name']}|{r['c_mktsegment']}#{r['c_custkey']}" for r in rows
    ]


def _aes_ecb(pt: bytes) -> bytes:
    from cryptography.hazmat.primitives import padding
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    padder = padding.PKCS7(128).padder()
    padded = padder.update(pt) + padder.finalize()
    enc = Cipher(algorithms.AES(_KEY), modes.ECB()).encryptor()
    return enc.update(padded) + enc.finalize()


def test_f25_known_answer_ciphertext(spark, sf_dir):
    """Spark's aes_encrypt output must equal an independent AES-128-ECB
    + PKCS7 implementation byte for byte, for every row."""
    pytest.importorskip("cryptography")
    from pyspark.sql import functions as F

    from angelo_bravo_etl_task_spark.queries import _t

    c = _t(spark, sf_dir, "customer").select(
        F.concat(
            F.col("c_name"),
            F.lit("|"),
            F.col("c_mktsegment"),
            F.lit("#"),
            F.col("c_custkey").cast("string"),
        ).alias("pt")
    )
    got = {
        r.pt: bytes(r.ct)
        for r in c.select(
            "pt",
            F.aes_encrypt(
                F.col("pt").cast("binary"),
                F.lit(_KEY.decode()).cast("binary"),
                F.lit("ECB"),
            ).alias("ct"),
        ).collect()
    }
    pts = _pts(sf_dir)
    assert set(got) == set(pts)
    for pt in pts:
        assert got[pt] == _aes_ecb(pt.encode()), pt


def test_f25_group_frame_replay(spark, sf_dir):
    """Replay the released per-length-group frame in pure Python from
    the parquet plaintext alone (the padding law predicts the groups)."""
    pts = _pts(sf_dir)
    exp = {}
    for pt in pts:
        b = len(pt.encode())
        ct = (b // 16 + 1) * 16
        g = exp.setdefault(ct, [0, set(), None, None])
        g[0] += 1
        g[1].add(pt)
        g[2] = b if g[2] is None else min(g[2], b)
        g[3] = b if g[3] is None else max(g[3], b)
    fn, _ = QUERIES["f25_aes_pii_vault"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == len(exp)
    for r in rows:
        n, dpt, mn, mx = exp[r.ct_bytes]
        assert r.n_rows == n
        assert r.n_distinct_pt == r.n_distinct_ct == len(dpt)
        assert (r.min_pt_bytes, r.max_pt_bytes) == (mn, mx)
        assert r.pad_law_ok and r.roundtrip_fails == 0
    # non-vacuity: the padding law is exercised across >1 block count
    assert len(rows) >= 2
