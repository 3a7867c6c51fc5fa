"""Independent Python-reference properties for wave 95.

src10: replay the XML round-trip's released aggregate straight from the
parquet in pure Python (no Spark, no DuckDB) — row count, key sum,
tricky-string length sum, the ordered md5, and exact integer cents —
and additionally certify that the fixture on disk really is escaped XML
(every metacharacter of the tricky payload appears ONLY in entity form
inside the row elements), so the writer-escape/reader-unescape path the
query advertises is what actually happened.
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
from decimal import Decimal

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _expected(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority",
                 "o_totalprice"],
    ).to_pylist()
    rows = [
        (
            r["o_orderkey"],
            f"{r['o_orderpriority']} <&\"'> {r['o_custkey']}",
            Decimal(str(round(r["o_totalprice"], 2))),
        )
        for r in t
        if r["o_orderkey"] % 20 == 0
    ]
    rows.sort()
    joined = "|".join(tricky for _, tricky, _ in rows)
    return {
        "n_rows": len(rows),
        "sum_keys": sum(k for k, _, _ in rows),
        "sum_tricky_chars": sum(len(s) for _, s, _ in rows),
        "tricky_md5": hashlib.md5(joined.encode()).hexdigest(),
        "sum_price_cents": sum(int(p * 100) for _, _, p in rows),
    }


def test_src10_xml_roundtrip_replay(spark, sf_dir):
    fn, _ = QUERIES["src10_xml_source"]
    row = fn(spark, sf_dir).collect()[0]
    exp = _expected(sf_dir)
    assert row.n_rows == exp["n_rows"] > 0
    assert row.sum_keys == exp["sum_keys"]
    assert row.sum_tricky_chars == exp["sum_tricky_chars"]
    assert row.tricky_md5 == exp["tricky_md5"]
    assert row.sum_price_cents == exp["sum_price_cents"]


def test_src10_fixture_is_escaped_xml(spark, sf_dir):
    """The on-disk fixture must contain the tricky payload ONLY in
    escaped form: raw '<' / '&' never appear inside element text (every
    '<' on disk opens a tag, every '&' starts an entity)."""
    fn, _ = QUERIES["src10_xml_source"]
    fn(spark, sf_dir).collect()  # materialize the fixture
    sink = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "src10_xml_" + os.path.basename(sf_dir.rstrip("/")),
    )
    parts = [p for p in glob.glob(os.path.join(sink, "part-*"))
             if not p.endswith(".crc")]
    assert parts, f"no XML part files under {sink}"
    saw_entity = False
    for p in parts:
        text = open(p, encoding="utf-8").read()
        saw_entity = saw_entity or ("&amp;" in text and "&lt;" in text)
        # every & on disk must start an XML entity — a bare & would be
        # the unescaped tricky payload leaking through the writer
        assert not re.search(r"&(?!amp;|lt;|gt;|quot;|apos;|#)", text), p
        # every < must open/close a tag (letter, /, ?, or !)
        assert not re.search(r"<(?![A-Za-z/?!])", text), p
    assert saw_entity, "tricky payload's metacharacters never hit the files"


def test_sql7_execute_immediate_replay(spark, sf_dir):
    """Pure-Python replay of sql7's data-derived cutoff and aggregate:
    cutoff = max(orderkey) DIV 2, then per-priority count and exact
    integer cents below it — certifying both the INTO capture and the
    USING binding carried the right value."""
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).to_pylist()
    cut = max(r["o_orderkey"] for r in t) // 2
    exp = {}
    for r in t:
        if r["o_orderkey"] > cut:
            continue
        n, cents = exp.get(r["o_orderpriority"], (0, 0))
        exp[r["o_orderpriority"]] = (
            n + 1,
            cents + int(Decimal(str(round(r["o_totalprice"], 2))) * 100),
        )
    fn, _ = QUERIES["sql7_execute_immediate"]
    rows = fn(spark, sf_dir).collect()
    assert rows and all(r.cutoff_used == cut for r in rows)
    got = {r.o_orderpriority: (r.n_orders, r.sum_cents) for r in rows}
    assert got == exp
    # the filter genuinely bit: some orders lie above the cutoff
    assert sum(n for n, _ in exp.values()) < len(t)


def test_ps1_pandas_api_replay_and_plan(spark, sf_dir):
    """Replay ps1 in pure Python AND certify the docstring's plan claim:
    pandas-on-Spark compiled to a distributed hash aggregate over a
    column-pruned scan — not a driver-side pandas computation."""
    from angelo_bravo_etl_task_spark.plans.audit import physical_plan

    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).to_pylist()
    exp = {}
    for r in t:
        n, keys, cents = exp.get(r["o_orderpriority"], (0, 0, 0))
        exp[r["o_orderpriority"]] = (
            n + 1,
            keys + r["o_orderkey"],
            cents + round(r["o_totalprice"] * 100),
        )
    fn, _ = QUERIES["ps1_pandas_api"]
    sdf = fn(spark, sf_dir)
    got = {
        r.o_orderpriority: (r.n, r.sum_keys, r.sum_cents)
        for r in sdf.collect()
    }
    assert got == exp
    plan = physical_plan(sdf)
    assert "HashAggregate" in plan, plan
    assert "Scan parquet" in plan or "FileScan parquet" in plan, plan
