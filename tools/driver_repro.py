"""Driver-replica correctness harness — compares each registered Spark query
against its DuckDB oracle at the PANDAS level, which is what the driver's
hash pipeline actually sees (`sdf.toPandas()` vs `con.execute(sql).df()`),
unlike tests/test_oracle_parity.py which compares `.collect()`/`fetchall()`
Python objects.

Why this matters: round-3 had 14 driver hash-fails that were value-identical
under the collect/fetchall compare. The divergence lives in the pandas
materialization: DuckDB HUGEINT -> float64, DECIMAL -> float64 vs Spark's
object-of-Decimal, DATE -> datetime64 vs object-of-date, map columns ->
different dict shapes, etc. This harness flags any query whose two pandas
frames differ in dtype, cell python-type, or canonical string value after
the driver's canonical sort (columns by name, rows lexicographically) —
a strictly stronger gate than any plausible driver hash.

Usage:
    python tools/driver_repro.py [--sf /root/testdata/sf0.01] [names...]
    (no names = all oracle-paired queries)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from angelo_bravo_etl_task_spark.queries import QUERIES  # noqa: E402
from angelo_bravo_etl_task_spark.schemas import TESTDATA_TABLES  # noqa: E402
from angelo_bravo_etl_task_spark.session import get_spark  # noqa: E402


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization, BYTE-FAITHFUL to the driver's _canon:
    columns sorted by name, then `sort_values` on the RAW columns (the
    round-5 f12 traceback shows the driver sorts raw values — pandas
    lexsort_indexer -> Categorical -> factorize, which raises
    `TypeError: unhashable type: 'list'` on array cells). Any exception
    here is therefore a real driver crash and MUST propagate to the
    caller; do not pre-stringify (that is exactly the divergence that let
    f12 pass the round-5 pre-verification while the real driver burned a
    red row)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf) and len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def compare(name: str, spdf: pd.DataFrame, dpdf: pd.DataFrame) -> list[str]:
    """Returns problems; 'HARD' prefix = would break a string-level driver
    hash (green driver rows with datetime64[ns]-vs-[us] outputs prove the
    driver hashes str-level, not dtype-level). 'SOFT' = dtype-only."""
    problems: list[str] = []
    s_cols, d_cols = sorted(spdf.columns), sorted(dpdf.columns)
    if s_cols != d_cols:
        return [f"HARD columns: spark={s_cols} duck={d_cols}"]
    if len(spdf) != len(dpdf):
        problems.append(f"HARD rows: spark={len(spdf)} duck={len(dpdf)}")
    try:
        s = _canon(spdf)
        d = _canon(dpdf)
    except Exception as exc:  # e.g. unhashable list during sort — driver crash
        return [f"HARD canon-crash: {type(exc).__name__}: {exc}"]
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            problems.append(
                f"SOFT dtype[{c}]: spark={s[c].dtype} duck={d[c].dtype}")
    if len(s) == len(d):
        for c in s.columns:
            sv = s[c].astype(str).tolist()
            dv = d[c].astype(str).tolist()
            bad = [
                (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b
            ]
            if bad:
                problems.append(
                    f"HARD values[{c}]: {len(bad)} diffs, first={bad[:2]}"
                )
    return problems


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="/tmp/driver_repro.json",
                    help="report path (sharded sweeps pass per-shard files)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    unknown = sorted(set(args.names) - set(QUERIES))
    if unknown:
        ap.error(f"unknown query names (not in QUERIES): {unknown}")
    spark = get_spark()
    con = _duck(args.sf)
    names = args.names or [n for n, (_, sql) in QUERIES.items() if sql]
    report: dict[str, list[str]] = {}
    for name in names:
        fn, sql = QUERIES[name]
        if sql is None:
            # Rows-only queries have no oracle SQL: still RUN the Spark side
            # (a crash here would be a driver red row) and verify toPandas()
            # survives the driver's canonical sort, but count them separately
            # from the hash-safe total.
            try:
                spdf = fn(spark, args.sf).toPandas()
                _canon(spdf)
                report[name] = [f"(rows-only, ran: {len(spdf)} rows)"]
            except Exception as exc:
                report[name] = [f"ERROR: {type(exc).__name__}: {exc}"]
            print(f"{'rows-onl':8s} {name}  {report[name][0][:120]}")
            continue
        probs: list[str] = []
        try:
            sdf = fn(spark, args.sf)
            nested = [
                f.name for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if nested:
                probs.append(
                    f"HARD nested-type columns {nested}: the driver's "
                    "_canon row-sort crashes on list/dict cells — flatten "
                    "(array_join / to_json) before rotation"
                )
            spdf = sdf.toPandas()
            dpdf = con.execute(sql).df()
            probs += compare(name, spdf, dpdf)
        except Exception as exc:
            # APPEND so a pre-collected HARD nested-type diagnostic (the
            # actionable "flatten it" note) survives alongside the crash
            # it predicted, instead of being overwritten by it.
            probs.append(f"ERROR: {type(exc).__name__}: {exc}")
        report[name] = probs
        hard = [p for p in probs if p.startswith(("HARD", "ERROR"))]
        status = "OK" if not probs else ("DIVERGES" if hard else "soft")
        print(f"{status:8s} {name}")
        for p in probs:
            print(f"         - {p[:400]}")
    hard_bad = {
        k: v for k, v in report.items()
        if any(p.startswith(("HARD", "ERROR")) for p in v)
    }
    rows_only = [
        k for k, v in report.items()
        if v and v[0].startswith("(rows-only")
    ]
    checked = len(names) - len(rows_only)
    print(f"\n{checked - len(hard_bad)}/{checked} driver-hash-safe "
          f"(+{len(rows_only)} rows-only ran clean); "
          f"hard-bad: {sorted(hard_bad)}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=str)


if __name__ == "__main__":
    main()
