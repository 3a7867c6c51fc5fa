"""Round-3 wave 53: Merkle inclusion proofs.

- mrk2: a BINARY Merkle tree over sorted document leaf hashes (mrk1
  pinned flat sorted-concat fingerprints; mrk2 builds the pairing
  tree), extracts each probe leaf's sibling PATH, and re-verifies the
  proof inside the same query — recomputing the root from (leaf, path)
  alone, the log-size certificate light clients actually check. The
  `verified` column must be TRUE on every row; the property layer
  additionally tampers with a path in Python and watches verification
  fail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_MRK2_SQL = """
WITH RECURSIVE leaves AS (
  SELECT list_sort(list(md5(text))) AS ls
  FROM documents WHERE doc_id % 17 = 0
), probes AS (
  SELECT DISTINCT p AS probe_idx
  FROM leaves, unnest([1, 2, len(leaves.ls)]) AS u(p)
), rounds AS (
  SELECT CAST(0 AS BIGINT) AS r, ls AS arr FROM leaves
  UNION ALL
  SELECT r + 1,
         list_transform(range(0, (len(arr) + 1) // 2), j ->
           CASE WHEN 2 * j + 2 <= len(arr)
                THEN md5(arr[2 * j + 1] || arr[2 * j + 2])
                ELSE arr[2 * j + 1] END)
  FROM rounds WHERE r < 12
), root AS (
  SELECT arr[1] AS root FROM rounds WHERE r = 12
), paths AS (
  SELECT p.probe_idx, CAST(0 AS BIGINT) AS r,
         CAST(p.probe_idx AS BIGINT) AS idx,
         l.ls AS arr,
         l.ls[CAST(p.probe_idx AS INTEGER)] AS leaf,
         CAST([] AS STRUCT(sib VARCHAR, hl BOOLEAN)[]) AS path
  FROM probes p, leaves l
  UNION ALL
  SELECT probe_idx, r + 1,
         (idx + 1) // 2,
         list_transform(range(0, (len(arr) + 1) // 2), j ->
           CASE WHEN 2 * j + 2 <= len(arr)
                THEN md5(arr[2 * j + 1] || arr[2 * j + 2])
                ELSE arr[2 * j + 1] END),
         leaf,
         list_append(path,
           {'sib': CASE
              WHEN idx % 2 = 1 AND idx + 1 <= len(arr)
                THEN arr[CAST(idx + 1 AS INTEGER)]
              WHEN idx % 2 = 0 THEN arr[CAST(idx - 1 AS INTEGER)]
              ELSE '' END,
            'hl': idx % 2 = 1})
  FROM paths WHERE r < 12
), final_paths AS (
  SELECT probe_idx, leaf, path FROM paths WHERE r = 12
), verify AS (
  SELECT probe_idx, leaf, path, CAST(0 AS BIGINT) AS k, leaf AS h
  FROM final_paths
  UNION ALL
  SELECT probe_idx, leaf, path, k + 1,
         CASE WHEN path[CAST(k + 1 AS INTEGER)].sib = '' THEN h
              WHEN path[CAST(k + 1 AS INTEGER)].hl
                THEN md5(h || path[CAST(k + 1 AS INTEGER)].sib)
              ELSE md5(path[CAST(k + 1 AS INTEGER)].sib || h) END
  FROM verify WHERE k < len(path)
), vfinal AS (
  SELECT probe_idx, leaf, path, h,
         ROW_NUMBER() OVER (PARTITION BY probe_idx ORDER BY k DESC) AS rn
  FROM verify
)
SELECT CAST(v.probe_idx AS BIGINT) AS probe_idx,
       v.leaf, rt.root,
       coalesce(array_to_string(list_transform(v.path, e ->
         e.sib || ':' || CASE WHEN e.hl THEN 'L' ELSE 'R' END), '/'), '')
         AS proof_path,
       v.h = rt.root AS verified
FROM vfinal v CROSS JOIN root rt
WHERE v.rn = 1
"""


@_register("mrk2_inclusion_proof", _MRK2_SQL)
def mrk2_inclusion_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary Merkle tree with INCLUSION PROOFS over the sorted leaf
    hashes of the doc_id % 17 slice: 12 pairing rounds (odd tails
    promote unhashed — idempotent once the tree collapses, so the
    fixed bound covers any SF), then for probe leaves {first, second,
    last} the sibling path is extracted round by round (sibling hash +
    which side our hash sits on) and the proof is VERIFIED inside the
    query by folding md5 back up from the leaf — `verified` must be
    TRUE everywhere, and the path is log(n) hashes, the certificate a
    light client checks without the corpus. mrk1 pinned the flat
    manifest fingerprint; mrk2 is the membership side of the same
    content-addressing story (is THIS document in THAT corpus
    version?). Spark runs three folds over one packed row; the oracle
    replays each as a recursive CTE."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 17 == 0)
    leaves = d.agg(
        F.array_sort(
            F.collect_list(F.md5(F.col("text").cast("binary")))
        ).alias("ls")
    )

    def pair(arr):
        half = ((F.size(arr) + 1) - (F.size(arr) + 1) % 2) / 2
        return F.transform(
            F.sequence(F.lit(0), half.cast("bigint") - 1),
            lambda j: F.when(
                F.try_element_at(arr, (2 * j + 2).cast("int")).isNull(),
                F.element_at(arr, (2 * j + 1).cast("int")),
            ).otherwise(
                F.md5(
                    F.concat(
                        F.element_at(arr, (2 * j + 1).cast("int")),
                        F.element_at(arr, (2 * j + 2).cast("int")),
                    ).cast("binary")
                )
            ),
        )

    rooted = leaves.select(
        "ls",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(12)),
            F.col("ls"),
            lambda arr, _r: pair(arr),
        )[0].alias("root"),
    )
    probes = rooted.select(
        "ls",
        "root",
        F.explode(
            F.array_distinct(
                F.array(F.lit(1).cast("bigint"), F.lit(2).cast("bigint"), F.size("ls").cast("bigint"))
            )
        ).alias("probe_idx"),
    ).withColumn("leaf", F.element_at("ls", F.col("probe_idx").cast("int")))
    acc0 = F.expr(
        "named_struct('idx', CAST(0 AS BIGINT),"
        " 'arr', CAST(array() AS ARRAY<STRING>),"
        " 'path', CAST(array() AS ARRAY<STRUCT<sib: STRING, hl: BOOLEAN>>))"
    )

    def path_step(acc, r):
        idx = F.when(r == 1, F.col("probe_idx")).otherwise(acc["idx"])
        arr = F.when(r == 1, F.col("ls")).otherwise(acc["arr"])
        odd = idx % 2 == 1
        sib = F.when(
            odd & ((idx + 1) <= F.size(arr)),
            F.element_at(arr, (idx + 1).cast("int")),
        ).otherwise(
            F.when(~odd, F.element_at(arr, (idx - 1).cast("int"))).otherwise(
                F.lit("")
            )
        )
        return F.struct(
            (((idx + 1) - (idx + 1) % 2) / 2).cast("bigint").alias("idx"),
            pair(arr).alias("arr"),
            F.concat(
                acc["path"],
                F.array(F.struct(sib.alias("sib"), odd.alias("hl"))),
            ).alias("path"),
        )

    pathed = probes.select(
        "probe_idx",
        "leaf",
        "root",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(12)), acc0, path_step
        )["path"].alias("path"),
    )

    def verify_step(h, e):
        return F.when(e["sib"] == "", h).otherwise(
            F.when(
                e["hl"], F.md5(F.concat(h, e["sib"]).cast("binary"))
            ).otherwise(F.md5(F.concat(e["sib"], h).cast("binary")))
        )

    return pathed.select(
        "probe_idx",
        "leaf",
        "root",
        F.array_join(
            F.transform(
                "path",
                lambda e: F.concat(
                    e["sib"],
                    F.lit(":"),
                    F.when(e["hl"], F.lit("L")).otherwise(F.lit("R")),
                ),
            ),
            "/",
        ).alias("proof_path"),
        (
            F.aggregate("path", F.col("leaf"), verify_step) == F.col("root")
        ).alias("verified"),
    )
