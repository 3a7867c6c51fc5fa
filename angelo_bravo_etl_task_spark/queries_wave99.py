r"""Round-7 wave 99: column-level AES encryption — the reversible
counterpart of tx8's PII redaction.

A curation pipeline that must RETAIN re-identification capability (GDPR
right-of-access, billing reconciliation, audit trails) cannot redact —
it encrypts the PII column at rest and keeps the key in a vault. Spark 4
ships this as built-in Column functions (``aes_encrypt``/``aes_decrypt``),
so the stage stays JVM-side and codegen-friendly — no Python UDF in the
hot path. DuckDB has no AES, so the oracle certifies the ciphertext via
plaintext-derived LAWS instead of recomputing it: the PKCS7 padding law
(ct_bytes = (pt_bytes DIV 16 + 1) * 16 for every row — a broken cipher,
wrong mode, or mis-padding shifts whole groups), the ECB determinism
theorem (distinct ciphertexts == distinct plaintexts — what makes the
vault join-compatible for pseudonymous analytics, and precisely the
leak that forbids ECB for low-entropy columns; the docstring carries
both sides), and a zero round-trip-failure count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

# Demo key only — a real deployment injects the key per-session from a
# credential provider / KMS, never a source literal.
_KEY = "0123456789abcdef"

_F25_SQL = """
WITH pt AS (
  SELECT c_name || '|' || c_mktsegment || '#' || CAST(c_custkey AS VARCHAR)
           AS pt,
         octet_length(CAST(c_name || '|' || c_mktsegment || '#'
                           || CAST(c_custkey AS VARCHAR) AS BLOB))
           AS pt_bytes
  FROM customer
), predicted AS (
  SELECT pt, pt_bytes,
         CAST((pt_bytes // 16 + 1) * 16 AS BIGINT) AS ct_bytes
  FROM pt
)
SELECT ct_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT pt) AS BIGINT) AS n_distinct_pt,
       CAST(COUNT(DISTINCT pt) AS BIGINT) AS n_distinct_ct,
       CAST(MIN(pt_bytes) AS BIGINT) AS min_pt_bytes,
       CAST(MAX(pt_bytes) AS BIGINT) AS max_pt_bytes,
       ((MIN(pt_bytes) // 16 + 1) * 16 = ct_bytes
        AND (MAX(pt_bytes) // 16 + 1) * 16 = ct_bytes) AS pad_law_ok,
       CAST(0 AS BIGINT) AS roundtrip_fails
FROM predicted
GROUP BY ct_bytes
ORDER BY ct_bytes
"""


@_register("f25_aes_pii_vault", _F25_SQL)
def f25_aes_pii_vault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level AES-128-ECB encryption of a composite PII column
    (c_name|c_mktsegment#c_custkey) with three certified laws, all measured on the REAL
    ciphertext Spark produced and compared against an oracle that only
    ever sees plaintext:

    - PKCS7 padding law: every ciphertext is exactly (pt_bytes DIV 16
      + 1) * 16 bytes — the oracle predicts each row's group from the
      plaintext byte length, so a wrong mode, key-size error, or
      mis-padding moves rows between groups and breaks the frame hash.
    - ECB determinism: COUNT(DISTINCT ct) == COUNT(DISTINCT pt). This is
      what makes the vault column usable as a JOIN KEY for pseudonymous
      analytics (equal plaintexts encrypt equal), and simultaneously the
      classic ECB leak — equality patterns survive encryption — which is
      why this mode is only for high-entropy columns like the name|segment#key
      composite here; low-entropy columns take GCM (random IV, non-
      deterministic, join-incompatible).
    - Round trip: aes_decrypt(aes_encrypt(pt)) == pt for every row,
      released as a zero failure count.

    100 TB shape: encrypt/decrypt are JVM Column expressions inside
    whole-stage codegen (~one AES block per 16 bytes, hardware AES-NI) —
    the stage adds no shuffle and no Python; the release is one
    map-side-combinable aggregate over the 3-4 length groups. The demo
    key is a literal; production injects it from a KMS per session."""
    c = _t(spark, sf_dir, "customer").select(
        F.concat(
            F.col("c_name"),
            F.lit("|"),
            F.col("c_mktsegment"),
            F.lit("#"),
            F.col("c_custkey").cast("string"),
        ).alias("pt")
    )
    key = F.lit(_KEY).cast("binary")
    enc = c.select(
        "pt",
        F.length(F.col("pt").cast("binary")).cast("long").alias("pt_bytes"),
        F.aes_encrypt(
            F.col("pt").cast("binary"), key, F.lit("ECB")
        ).alias("ct"),
    )
    scored = enc.select(
        "pt",
        "pt_bytes",
        F.length("ct").cast("long").alias("ct_bytes"),
        F.base64("ct").alias("ct_b64"),
        (
            F.aes_decrypt(F.col("ct"), key, F.lit("ECB")).cast("string")
            != F.col("pt")
        )
        .cast("long")
        .alias("rt_fail"),
    )
    return (
        scored.groupBy("ct_bytes")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("pt").cast("long").alias("n_distinct_pt"),
            F.countDistinct("ct_b64").cast("long").alias("n_distinct_ct"),
            F.min("pt_bytes").cast("long").alias("min_pt_bytes"),
            F.max("pt_bytes").cast("long").alias("max_pt_bytes"),
            (
                (F.expr("(MIN(pt_bytes) DIV 16 + 1) * 16")
                 == F.col("ct_bytes"))
                & (F.expr("(MAX(pt_bytes) DIV 16 + 1) * 16")
                   == F.col("ct_bytes"))
            ).alias("pad_law_ok"),
            F.sum("rt_fail").cast("long").alias("roundtrip_fails"),
        )
        .orderBy("ct_bytes")
    )
