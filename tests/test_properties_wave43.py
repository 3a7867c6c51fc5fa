"""Independent Python-reference properties for the wave 43 algorithms."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _rows(sf_dir: str, table: str) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()


def test_e12_all_three_row_classes_present(spark, sf_dir):
    """The full-outer stream join emits matched pairs, NULL-purchase
    clicks, and NULL-click purchases — all three classes must be live,
    and the matched class must equal the batch interval join."""
    rows = QUERIES["e12_stream_stream_full_outer"][0](spark, sf_dir).collect()
    matched = [r for r in rows if r.click_ts and r.purchase_ts]
    only_c = [r for r in rows if r.click_ts and not r.purchase_ts]
    only_p = [r for r in rows if r.purchase_ts and not r.click_ts]
    assert matched and only_c and only_p
    assert len(matched) + len(only_c) + len(only_p) == len(rows)
    # batch replay of the matched class
    clicks = defaultdict(list)
    purchases = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        if r["event_type"] == "click":
            clicks[r["user_id"]].append(r["ts"])
        elif r["event_type"] == "purchase":
            purchases[r["user_id"]].append((r["ts"], r["value"]))
    expect_matched = Counter()
    for u, cts in clicks.items():
        for ct in cts:
            for pt, _v in purchases.get(u, []):
                if ct <= pt <= ct + __import__("datetime").timedelta(minutes=30):
                    expect_matched[(u, ct, pt)] += 1
    got_matched = Counter((r.user_id, r.click_ts, r.purchase_ts) for r in matched)
    assert got_matched == expect_matched
    # every NULL-padded purchase is genuinely unmatched
    matched_p = {(r.user_id, r.purchase_ts) for r in matched}
    for r in only_p:
        assert (r.user_id, r.purchase_ts) not in matched_p


def test_mgs1_matches_python_and_guarantee(spark, sf_dir):
    """mgs1's counter tables == a Python Misra-Gries replay; the
    estimate error is bounded by n/k; and any page with true frequency
    > n/3 survives in the table."""
    traces: dict = defaultdict(list)
    for r in _rows(sf_dir, "events"):
        traces[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    expect = {}
    for uid, acc in traces.items():
        acc.sort()
        pages = [p for _, _, p in acc[:30]]
        n = len(pages)
        if n < 10:
            continue
        st: dict = {}
        for p in pages:
            if p in st:
                st[p] += 1
            elif len(st) < 3:
                st[p] = 1
            else:
                st = {q: c - 1 for q, c in st.items() if c > 1}
        expect[uid] = (
            n,
            "/".join(f"{p}:{c}" for p, c in sorted(st.items())),
        )
        true = Counter(pages)
        for p, c in true.items():
            est = st.get(p, 0)
            assert true[p] - est <= n / 3 + 1e-9
            if c > n / 3:
                assert p in st, "heavy page must survive"
    got = {
        r.user_id: (r.n, r.counters)
        for r in QUERIES["mgs1_misra_gries"][0](spark, sf_dir).collect()
    }
    assert got == expect
