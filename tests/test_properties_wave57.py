"""Independent Python-reference properties for the wave 57 algorithm."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_w13_matches_python_sessionization(spark, sf_dir):
    """The engine's batch session_window == a plain-Python gap-30min
    sessionizer (bounds, sizes, session counts); sessions per user are
    disjoint and ordered; and event counts conserve."""
    tr: dict = defaultdict(list)
    rows_in = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    for r in rows_in:
        tr[r["user_id"]].append(r["ts"])
    gap = timedelta(minutes=30)
    expect = set()
    for uid, tss in tr.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for t in tss[1:]:
            if t - prev > gap:
                expect.add((uid, start, prev + gap, n))
                start = t
                n = 0
            n += 1
            prev = t
        expect.add((uid, start, prev + gap, n))
    rows = QUERIES["w13_batch_session_window"][0](spark, sf_dir).collect()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in rows
    }
    assert got == expect
    assert sum(r.n_events for r in rows) == len(rows_in)
    by_user: dict = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (_s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            # next session's first event is > gap after the previous
            # session's last event (= e1 - gap), i.e. strictly after e1
            assert s2 > e1
