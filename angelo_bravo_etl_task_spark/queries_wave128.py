r"""Round-11 wave 128: construction-guaranteed SimHash recall (d14) and
the composed lakehouse-maintenance flagship (px9).

- d14 retires the registry's last evidence gap around d4 (VERDICT r10
  item 2): d4's natural pair set stays hash-function-internal (rows-only
  by design, precision certified by d11), but RECALL on planted exact
  clones is a theorem — identical text produces the identical shingle
  multiset, hence the identical 64-bit SimHash fingerprint, hence
  Hamming distance 0 <= 3 and guaranteed quadrant-block candidacy. The
  x12 principle applied to the SimHash family: the oracle derives the
  expected rows from the construction, so a regenerated dataset cannot
  red it without a real engine regression.
- px9 composes the lakehouse verbs the registry certified separately —
  merge1 (merge-on-read upsert), dv1 (deletion vectors), cp1
  (compaction), tt1 (manifest time travel), gc1 (orphan retention) —
  into the one nightly loop every production table runs, against ONE
  manifest state with real files on disk (VERDICT r10 item 4).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t
from .operators.localframe import local_rows_df

# ==========================================================================
# d14: planted-clone SimHash recall — TRUE by construction, not measurement
# ==========================================================================

# Clone ids live at doc_id + 5_000_000, far above the natural doc_id
# space (max 4999 at sf0.1; a runtime guard re-checks before planting).
# The filter id_b = id_a + OFFSET admits ONLY planted (source, clone)
# pairs: natural pairs have both ids < OFFSET, clone-vs-other-doc pairs
# have the wrong difference, clone-vs-clone pairs differ by < 100.
_D14_OFFSET = 5_000_000

_D14_SQL = f"""
SELECT doc_id,
       CAST(doc_id + {_D14_OFFSET} AS BIGINT) AS clone_id,
       CAST(0 AS INTEGER) AS hamming
FROM documents WHERE doc_id < 100
"""


@_register("d14_simhash_recall", _D14_SQL)
def d14_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction-guaranteed SimHash recall law (VERDICT r10 item 2,
    the x12 pattern applied to d4's family): plant an exact text clone
    of the first 100 documents at doc_id + 5_000_000, run the SAME
    quadrant-blocked detector d4 runs over the augmented corpus, and
    release the (source, clone, hamming) rows the detector found. The
    guarantee is a theorem, not a measurement: identical text yields the
    identical shingle-hash array (xxhash64 is a function), hence the
    identical 64-bit fingerprint, hence Hamming 0 — and equal
    fingerprints agree on ALL four 16-bit quadrants, so the pigeonhole
    blocking cannot miss the pair. The oracle therefore knows the full
    expected set (every planted pair, hamming 0) without touching hash
    internals; a lost quadrant, broken fingerprint, or dropped candidate
    reds the driver hash by row-count. d4's NATURAL pair set remains
    rows-only by design (see d11's impossibility note); this certifies
    the half of its contract that is law-shaped.

    100 TB shape: identical to d4's — signature map, (quadrant, bits)
    equi-join, never all-pairs; the 100 planted clones are noise on the
    corpus side. Reference parity: extends the dedup surface
    (SURVEY.md §2.4); no reference analogue (Angelo_ETL_Task.py is
    row-wise ETL only)."""
    from .operators.dedup import simhash_near_dups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # bounded 1-row agg: guard the clone-offset invariant before planting
    # (the sdd1 pattern, ADVICE r9)
    _max_id = docs.agg(F.max("doc_id")).first()[0]
    if _max_id is None or _max_id >= _D14_OFFSET:
        raise RuntimeError(
            f"d14 clone offset {_D14_OFFSET} collides with real doc_id "
            f"space (max={_max_id}); raise the offset on BOTH engine and "
            f"oracle"
        )
    clones = docs.where(F.col("doc_id") < 100).select(
        (F.col("doc_id") + F.lit(_D14_OFFSET)).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(clones)
    pairs = simhash_near_dups(corpus, "text", "doc_id", max_hamming=3)
    return pairs.where(
        F.col("id_b") == F.col("id_a") + F.lit(_D14_OFFSET)
    ).select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").cast("bigint").alias("clone_id"),
        F.col("hamming").cast("int").alias("hamming"),
    )


# ==========================================================================
# px9: the nightly lakehouse-maintenance loop against one manifest state
# ==========================================================================

# The oracle replays the logical end-state of each commit in pure SQL
# (merge1's replay style): v1 is the full base; v2 applies the
# merge-on-read upsert (reprice every 7th key +5.00, insert negated 11th
# keys); v3 deletes every 13th live key (plain `% 13 = 0` — sign-of-
# dividend % agrees between Spark and DuckDB on the zero test, including
# the negative inserted keys); v4 is the compaction rewrite, which must
# be content-identical to v3. File counts are deterministic from the
# construction: v1 lists 4 base files; v2 adds 2 append files + 1 DV;
# v3 adds the delete DV; v4 lists only the 2 compacted files. Vacuum
# after expiring v1..v3 removes the 8 no-longer-referenced files and
# keeps the 2 compacted ones.
_PX9_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM orders
), appended AS (
  SELECT k, price_c + 500 AS price_c FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT -(k + 1) AS k, price_c FROM base WHERE k % 11 = 0
), live2 AS (
  SELECT k, price_c FROM base WHERE k % 7 <> 0
  UNION ALL SELECT k, price_c FROM appended
), live3 AS (
  SELECT k, price_c FROM live2 WHERE k % 13 <> 0
), v AS (
  SELECT 'v1' AS stage, COUNT(*) AS n, SUM(price_c) AS s, 4 AS f FROM base
  UNION ALL SELECT 'v2', COUNT(*), SUM(price_c), 7 FROM live2
  UNION ALL SELECT 'v3', COUNT(*), SUM(price_c), 8 FROM live3
  UNION ALL SELECT 'v4', COUNT(*), SUM(price_c), 2 FROM live3
  UNION ALL SELECT 'v4_post_vacuum', COUNT(*), SUM(price_c), 2 FROM live3
)
SELECT stage,
       CAST(n AS BIGINT) AS n_rows,
       CAST(s AS BIGINT) AS sum_c,
       CAST(f AS BIGINT) AS n_files,
       CAST(8 AS BIGINT) AS files_deleted,
       CAST(2 AS BIGINT) AS files_kept,
       TRUE AS never_deleted_live
FROM v
"""


@_register("px9_table_maintenance", _PX9_SQL)
def px9_table_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed nightly table-maintenance loop (VERDICT r10 item 4):
    upsert -> delete -> compact -> time-travel read -> vacuum, against
    ONE manifest state with real parquet files, uniting the verbs the
    registry certified separately (merge1, dv1, cp1, tt1, gc1).

    Commit history (all through versioned JSON manifests in one table
    directory, every read resolving data files + deletion vectors from
    its pinned manifest):

    - v1: base laid out as 4 files (file_id = o_orderkey % 4, positions
      assigned per file) — tt1/dv1's physical layout.
    - v2 (MERGE, merge-on-read): every 7th key is repriced +5.00 — the
      OLD row's (file_id, pos) is marked in deletion vector DV1 and the
      new image appended; negated 11th keys (the mg1 -(k+1) rule) are
      inserted. Appends land in 2 new files (file_id = 4 + pmod(k, 2)).
      Base files are NOT rewritten — the point of merge-on-read.
    - v3 (DELETE): every 13th live key's position is marked in DV2 —
      including rows that live in the v2 APPEND files (an update image
      or insert can be deleted later; positions come from reading the
      files back, so marks can never drift from the stored layout).
    - v4 (compaction): the v3 live set is rewritten into 2 compacted
      files and the manifest drops both DVs — cp1's rewrite folding
      dv1's marks in.
    - Time travel: each of v1..v4 is read through its own manifest from
      the same directory (tt1's law: v4's rewrite must not disturb v1's
      snapshot); v3 and v4 must agree exactly (compaction is
      content-preserving).
    - Vacuum (gc1): manifests v1..v3 are expired (retention keeps the
      latest), the janitor lists the directory, keeps every file some
      LIVE manifest references, and deletes the 8 orphans (4 base + 2
      append + 2 DVs). The gc1 safety law — never delete a file a live
      manifest references — is computed from the actual delete set and
      released as `never_deleted_live`; the post-vacuum re-read of v4
      proves the table still serves.

    Released per stage: live row count, live price mass, and the
    manifest's file count (for v4_post_vacuum: files actually remaining
    on disk), plus the vacuum accounting. The oracle replays the logical
    end-state in pure SQL — a reader that resurrects a deleted row,
    loses an update image, breaks a snapshot, or deletes a referenced
    file reds the hash.

    100 TB shape: the MERGE costs one shuffle on the key; DV writes are
    O(|touched positions|) metadata; only compaction rewrites data (its
    own purpose); snapshot reads cost manifest lookup + listed files
    (never a directory-listing race); vacuum is a metadata anti-join of
    the listing against live manifests. Positions are assigned with
    per-file (4-way / 2-way partitioned) row_number windows — never a
    global sort. The five 1-row `.collect()`s are per-version aggregate
    read-backs (the tt1/S7 pattern), not data paths."""
    from .operators.windows import with_row_number

    o = _t(spark, sf_dir, "orders")
    price_c = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    base = with_row_number(
        o.select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderkey") % 4).cast("bigint").alias("file_id"),
            price_c.alias("price_c"),
        ),
        ["file_id"],
        [F.col("k").asc()],
        "pos",
    ).select(
        "file_id", F.col("pos").cast("bigint").alias("pos"), "k", "price_c"
    )
    # Optimization r12 (guide §2.6): every version's per-file outputs are
    # written by ONE partitioned job instead of one sequential driver job
    # per file (r11 had checkpoint + 4 filtered writes for the base alone;
    # the wall-clock of this query is almost pure driver-side job latency).
    # With a single consumer per frame the r11 eager checkpoints are dead
    # weight and are dropped.

    root = tempfile.mkdtemp(prefix="sg_px9_")
    try:
        def _write(df: DataFrame, name: str) -> str:
            # coalesce, not repartition: the single output file needs no
            # round-robin exchange (and no sort-before-repartition)
            df.coalesce(1).write.parquet(os.path.join(root, name))
            return name

        def _write_files(df: DataFrame, names: dict[int, str]) -> None:
            """One job writes every per-file output of a version: split by
            file_id via a partitioned write into a staging dir, then rename
            each partition dir up to its manifest file name, so the on-disk
            layout the manifests/vacuum see (and the released orphan
            accounting) is identical to the per-file form. file_id stays a
            data column (the partition column is a duplicate)."""
            tmp = os.path.join(root, "_stage")
            (
                df.withColumn("fidp", F.col("file_id"))
                .write.partitionBy("fidp")
                .parquet(tmp)
            )
            for fid, name in names.items():
                src = os.path.join(tmp, f"fidp={fid}")
                if os.path.isdir(src):
                    os.rename(src, os.path.join(root, name))
                else:
                    # a residue class can be empty at tiny SFs — fall back
                    # to a per-file write so the directory always exists
                    _write(df.where(F.col("file_id") == fid), name)
            shutil.rmtree(tmp, ignore_errors=True)

        def _manifest(version: int, data: list[str], dv: list[str]) -> None:
            path = os.path.join(root, f"_manifest-v{version}.json")
            with open(path, "w") as fh:
                json.dump({"version": version, "data_files": data,
                           "dv_files": dv}, fh)

        def _read_asof(version: int) -> tuple[DataFrame, int]:
            with open(
                os.path.join(root, f"_manifest-v{version}.json")
            ) as fh:
                m = json.load(fh)
            data = spark.read.parquet(
                *[os.path.join(root, f) for f in m["data_files"]]
            )
            for dvf in m["dv_files"]:
                marks = spark.read.parquet(os.path.join(root, dvf))
                data = data.join(
                    F.broadcast(marks), ["file_id", "pos"], "left_anti"
                )
            return data, len(m["data_files"]) + len(m["dv_files"])

        # ---- v1: initial commit, 4 base files (ONE write job) ----------
        _write_files(base, {fid: f"F{fid}" for fid in range(4)})
        _manifest(1, [f"F{i}" for i in range(4)], [])

        # ---- v2: MERGE upsert, merge-on-read ---------------------------
        # positions come from READING THE FILES BACK, so DV marks can
        # never drift from the stored layout
        stored = spark.read.parquet(
            *[os.path.join(root, f"F{i}") for i in range(4)]
        )
        dv1 = stored.where(F.col("k") % 7 == 0).select("file_id", "pos")
        _write(dv1, "DV1")
        upd = stored.where(F.col("k") % 7 == 0).select(
            "k", (F.col("price_c") + 500).cast("bigint").alias("price_c")
        )
        ins = stored.where(F.col("k") % 11 == 0).select(
            (-(F.col("k") + 1)).alias("k"), "price_c"
        )
        app = with_row_number(
            upd.unionByName(ins).select(
                (F.lit(4) + F.pmod(F.col("k"), F.lit(2)))
                .cast("bigint")
                .alias("file_id"),
                "k",
                "price_c",
            ),
            ["file_id"],
            [F.col("k").asc()],
            "pos",
        ).select(
            "file_id", F.col("pos").cast("bigint").alias("pos"),
            "k", "price_c",
        )
        _write_files(app, {4: "F4", 5: "F5"})
        _manifest(2, [f"F{i}" for i in range(6)], ["DV1"])

        # ---- v3: DELETE every 13th live key ----------------------------
        live2, _ = _read_asof(2)
        dv2 = live2.where(F.col("k") % 13 == 0).select("file_id", "pos")
        _write(dv2, "DV2")
        _manifest(3, [f"F{i}" for i in range(6)], ["DV1", "DV2"])

        # ---- v4: compaction folds the DVs in ---------------------------
        live3, _ = _read_asof(3)
        compacted = with_row_number(
            live3.select(
                (F.lit(6) + F.pmod(F.col("k"), F.lit(2)))
                .cast("bigint")
                .alias("file_id"),
                "k",
                "price_c",
            ),
            ["file_id"],
            [F.col("k").asc()],
            "pos",
        ).select(
            "file_id", F.col("pos").cast("bigint").alias("pos"),
            "k", "price_c",
        )
        _write_files(compacted, {6: "C6", 7: "C7"})
        _manifest(4, ["C6", "C7"], [])

        # ---- time-travel reads of every version ------------------------
        # ONE job for all four snapshot aggregates (optimization r11,
        # guide §2.6/§5): the four 1-row read-backs were four sequential
        # collect() jobs; a union of the per-version aggregates computes
        # the same numbers in a single action. n_files stays
        # manifest-side metadata.
        file_counts: dict[str, int] = {}
        per_version = []
        for v in (1, 2, 3, 4):
            df, n_files = _read_asof(v)
            file_counts[f"v{v}"] = n_files
            per_version.append(
                df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price_c").alias("s"),
                ).select(F.lit(f"v{v}").alias("stage"), "n", "s")
            )
        from functools import reduce as _reduce

        snap = {
            r["stage"]: r
            for r in _reduce(
                lambda a, b: a.unionByName(b), per_version
            ).collect()
        }
        out: list[tuple[str, int, int, int]] = [
            (f"v{v}", int(snap[f"v{v}"]["n"]), int(snap[f"v{v}"]["s"]),
             file_counts[f"v{v}"])
            for v in (1, 2, 3, 4)
        ]

        # ---- expire v1..v3, vacuum orphans (gc1) -----------------------
        for v in (1, 2, 3):
            os.remove(os.path.join(root, f"_manifest-v{v}.json"))
        with open(os.path.join(root, "_manifest-v4.json")) as fh:
            m4 = json.load(fh)
        referenced = set(m4["data_files"]) | set(m4["dv_files"])
        on_disk = {
            d for d in os.listdir(root) if not d.startswith("_manifest")
        }
        orphans = on_disk - referenced
        # the gc1 safety law, computed from the ACTUAL delete set
        never_deleted_live = not (orphans & referenced)
        for name in sorted(orphans):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        remaining = {
            d for d in os.listdir(root) if not d.startswith("_manifest")
        }

        # ---- post-vacuum: the pinned snapshot must still serve ---------
        df, _ = _read_asof(4)
        agg = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("price_c").alias("s")
        ).collect()[0]
        out.append(
            ("v4_post_vacuum", int(agg["n"]), int(agg["s"]), len(remaining))
        )

        rows = [
            (stage, n, s, f, len(orphans), len(remaining),
             never_deleted_live)
            for stage, n, s, f in out
        ]
        return local_rows_df(spark, 
            rows,
            "stage string, n_rows bigint, sum_c bigint, n_files bigint, "
            "files_deleted bigint, files_kept bigint, "
            "never_deleted_live boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
