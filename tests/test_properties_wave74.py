"""Independent Python-reference properties for wave 74.

est1: rebuild key counts in pure Python, replay heavy-hitter selection
and the uniform-tail estimate with unbounded ints, and certify the
Cauchy–Schwarz law (tail_est ≤ tail_true) plus exactness of every
emitted component — and that the law is tight exactly when the tail is
uniform.
u11: replay the weight-table scoring, then assert the SCALAR_ITER
amortization contract directly: with a forced small Arrow batch size,
an instrumented iterator UDF must init once per TASK while seeing
multiple batches.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
import pyarrow.parquet as pq

from angelo_bravo_etl_task_spark.queries import QUERIES


def test_est1_replay_and_cauchy_schwarz(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    ).to_pylist()
    c = Counter(r["l_partkey"] for r in li)
    hh = sorted(c, key=lambda k: (-c[k], k))[:20]
    hh_set = set(hh)
    hh_pairs = sum(c[k] * c[k] for k in hh)
    tail_keys = [k for k in c if k not in hh_set]
    d_rest = len(tail_keys)
    n_rest = sum(c[k] for k in tail_keys)
    tail_true = sum(c[k] * c[k] for k in tail_keys)
    tail_est = (n_rest * n_rest) // d_rest if d_rest else 0
    row = QUERIES["est1_join_cardinality"][0](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_rows == len(li)
    assert r.n_keys == len(c)
    assert r.hh_pairs == hh_pairs
    assert r.tail_true == tail_true
    assert r.tail_est == tail_est
    assert r.true_pairs == hh_pairs + tail_true
    assert r.est_pairs == hh_pairs + tail_est
    # THE law: Cauchy–Schwarz makes the uniform tail an underestimate
    assert r.under_ok and r.tail_est <= r.tail_true
    assert abs(r.est_ratio - (r.est_pairs / r.true_pairs)) < 1e-15
    assert 0 < r.est_ratio <= 1.0
    # tightness direction: a perfectly uniform synthetic tail is exact
    for counts in ([4] * 10, [3] * 7, [1] * 5):
        n, d = sum(counts), len(counts)
        assert (n * n) // d == sum(x * x for x in counts)
    # and any skew strictly loses
    assert (10 * 10) // 4 < 1 + 1 + 4 + 64


def test_u11_replay(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pylist()
    weights = {r: 2 * r * r + 3 * r + 7 for r in range(8)}
    want: dict[str, list] = {}
    for r in li:
        cents = round(r["l_extendedprice"] * 100)
        score = weights[int(r["l_quantity"]) % 8] * cents
        agg = want.setdefault(r["l_returnflag"], [0, 0])
        agg[0] += score
        agg[1] += 1
    rows = QUERIES["u11_scalar_iter_udf"][0](spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} == set(want)
    for r in rows:
        assert [r.total_score, r.n] == want[r.l_returnflag], r.l_returnflag


def test_scalar_iter_amortizes_init_per_task(spark, sf_dir):
    """The contract u11 exists for: one init per executor TASK, not per
    Arrow batch. Force multiple batches per task and count both events
    with accumulators inside an instrumented iterator UDF."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    sc = spark.sparkContext
    inits = sc.accumulator(0)
    batches_seen = sc.accumulator(0)

    @pandas_udf("long")
    def probe(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        inits.add(1)  # once per task
        for b in batches:
            batches_seen.add(1)
            yield b * 0 + 1

    n_parts = 4
    df = (
        spark.range(0, 4000, 1, n_parts)
        .select(probe(F.col("id")).alias("one"))
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        assert df.agg(F.sum("one")).collect()[0][0] == 4000
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert inits.value == n_parts, (inits.value, n_parts)
    assert batches_seen.value >= 2 * n_parts, (
        "amortization is only meaningful with multiple batches per task",
        batches_seen.value,
    )
