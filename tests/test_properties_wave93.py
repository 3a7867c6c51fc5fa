"""Independent Python-reference properties for wave 93.

sc1: replay both policies' waits; certify the totals, the SJF theorem
(verified against a full optimality check: SJF beats EVERY adjacent
transposition), and makespan invariance.
lb1: replay the LPT fold; certify per-worker loads, conservation, both
bounds, and that LPT actually balances (makespan strictly below the
one-worker trivial schedule).
"""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def _jobs(sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).to_pylist()
    monthly = Counter(str(r["o_orderdate"].date())[:7] for r in orders)
    return monthly


def _total_wait(durs):
    run, tot = 0, 0
    for d in durs:
        tot += run
        run += d
    return tot


def test_sc1_replay_and_optimality(spark, sf_dir):
    monthly = _jobs(sf_dir)
    fifo = [monthly[m] for m in sorted(monthly)]
    sjf = sorted(
        monthly.values()
    )  # ties by month don't change the wait total
    w_fifo, w_sjf = _total_wait(fifo), _total_wait(sjf)
    rows = {r.policy: r for r in QUERIES["sc1_sjf_vs_fifo"][0](spark, sf_dir).collect()}
    assert set(rows) == {"fifo", "sjf"}
    for p, w in (("fifo", w_fifo), ("sjf", w_sjf)):
        r = rows[p]
        assert r.total_wait == w
        assert r.n_jobs == len(fifo)
        assert r.makespan == sum(fifo)
        assert abs(r.avg_wait - w / len(fifo)) < 1e-12
        assert r.sjf_le_fifo_ok and w_sjf <= w_fifo
        assert r.makespan_invariant_ok
    # full optimality spot-check: no adjacent transposition of the SJF
    # order improves total wait (the exchange argument, verified)
    for i in range(len(sjf) - 1):
        swapped = sjf[:i] + [sjf[i + 1], sjf[i]] + sjf[i + 2 :]
        assert _total_wait(swapped) >= w_sjf


def test_lb1_replay_and_bounds(spark, sf_dir):
    monthly = _jobs(sf_dir)
    durs = sorted(
        monthly.items(), key=lambda kv: (-kv[1], kv[0])
    )
    loads = [0, 0, 0, 0]
    for _, d in durs:
        k = loads.index(min(loads))  # FIRST least-loaded
        loads[k] += d
    total = sum(monthly.values())
    max_job = max(monthly.values())
    rows = QUERIES["lb1_lpt_balance"][0](spark, sf_dir).collect()
    assert {r.worker for r in rows} == {0, 1, 2, 3}
    mk = max(loads)
    for r in rows:
        assert r.load_ == loads[r.worker], r.worker
        assert (r.total_work, r.max_job, r.n_jobs) == (
            total,
            max_job,
            len(durs),
        )
        assert r.makespan == mk
        assert r.is_bottleneck == (loads[r.worker] == mk)
        assert r.conservation_ok and sum(loads) == total
        lb = max(-(-total // 4), max_job)
        assert r.lower_bound_ok and mk >= lb
        assert r.upper_bound_ok and mk <= -(-total // 4) + max_job
    # LPT genuinely balances: far below the one-worker schedule
    assert mk * 2 < total
