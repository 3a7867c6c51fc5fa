"""Property-based tests (SURVEY.md §5) for the string/path operators:
truncation, path parsing, depth — hypothesis generates the adversarial
cases (unicode, delimiters inside segments, boundary lengths)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.operators.strings import (
    dot_path_depth,
    last_segment,
    materialized_path,
    path_codes,
    strip_after_last,
    truncate_varchar,
)

# one shared slow-resource (SparkSession) → bound example counts
PROP_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

code = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Nd")), min_size=1, max_size=8
)


def _one_row(spark, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} STRING" for k in cols)
    )
    return df


@given(value=st.text(min_size=0, max_size=120), n=st.integers(1, 60))
@settings(**PROP_SETTINGS)
def test_truncation_is_bounded_prefix(spark, value, n):
    df = _one_row(spark, v=value).select(truncate_varchar("v", n).alias("t"))
    out = df.collect()[0]["t"]
    assert len(out) <= n
    assert value.startswith(out)
    if len(value) <= n:
        assert out == value


@given(codes=st.lists(code, min_size=1, max_size=8))
@settings(**PROP_SETTINGS)
def test_depth_equals_segment_count(spark, codes):
    path = ".".join(codes)
    df = _one_row(spark, p=path).select(dot_path_depth("p", base=3).alias("d"))
    assert df.collect()[0]["d"] == len(codes) + 2


@given(codes=st.lists(code, min_size=1, max_size=6), leaf=code)
@settings(**PROP_SETTINGS)
def test_path_reassembly(spark, codes, leaf):
    """C_PATH + '\\' + last_segment reassembles C_FULLNAME (reference
    C_PATH :239 semantics)."""
    path_to_root = ".".join(codes)
    df = _one_row(spark, p=path_to_root, leaf=leaf).select(
        materialized_path(
            path_codes(F.col("p"), F.col("leaf")),
            F.transform(
                path_codes(F.col("p"), F.col("leaf")), lambda c: F.lit("nm")
            ),
        ).alias("full")
    )
    full = df.collect()[0]["full"]
    df2 = _one_row(spark, f=full).select(
        strip_after_last("f", "\\").alias("parent"),
        last_segment("f", "\\").alias("leaf_seg"),
    )
    r = df2.collect()[0]
    assert r["parent"] + "\\" + r["leaf_seg"] == full
    # depth of materialized path = segments + 2 root segments
    assert full.count("\\") == (len(codes) + 1) + 2


# --------------------------------------------------------------------------
# Round-3 operator properties: quantile definition, partial-agg merge algebra


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=25),
    q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
@settings(**PROP_SETTINGS)
def test_exact_quantile_matches_sorted_list_definition(spark, vals, q):
    """The two-pass windowed implementation must equal the naive sorted-
    list definition: smallest v with |{x <= v}| >= ceil(q*n)."""
    import math

    from angelo_bravo_etl_task_spark.operators.agg import exact_quantiles

    df = spark.createDataFrame([(0, float(v)) for v in vals], "g INT, v DOUBLE")
    got = {
        r["q"]: r["quantile_value"]
        for r in exact_quantiles(df, "v", ["g"], [q]).collect()
    }
    s = sorted(vals)
    want = float(s[math.ceil(q * len(s)) - 1])
    assert got[q] == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=1,
        max_size=25,
    )
)
@settings(**PROP_SETTINGS)
def test_partial_aggregate_merge_identity(spark, rows):
    """The algebra behind mv1's incremental refresh: merging the partial
    aggregate states of ANY disjoint split (counts add, exact decimal sums
    add) equals the full aggregate. Holds because decimal addition is
    associative/commutative; double sums would not satisfy this bit-for-bit."""
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k INT, v INT, i INT"
    )

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
        )

    full = {r["k"]: (r["n"], r["s"]) for r in agg(df).collect()}
    a, b = agg(df.where(F.col("i") % 2 == 0)), agg(df.where(F.col("i") % 2 == 1))
    zn = F.lit(0).cast("long")
    zs = F.lit(0).cast("decimal(18,2)")
    merged = (
        a.alias("a")
        .join(b.alias("b"), "k", "full")
        .select(
            "k",
            (F.coalesce(F.col("a.n"), zn) + F.coalesce(F.col("b.n"), zn)).alias("n"),
            (F.coalesce(F.col("a.s"), zs) + F.coalesce(F.col("b.s"), zs)).alias("s"),
        )
    )
    got = {r["k"]: (r["n"], r["s"]) for r in merged.collect()}
    assert got == full


# ---------------------------------------------------------------------------
# round-3 operators: Morton interleave, exact outlier predicate, global ids
# ---------------------------------------------------------------------------


def _morton_py(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF)),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
@settings(**PROP_SETTINGS)
def test_zorder_value_matches_reference_interleave(spark, pairs):
    """The Column-expression Morton code equals the bit-by-bit reference
    implementation for arbitrary 16-bit pairs — i.e. it is a true
    interleave (hence bijective, hence content-preserving as a sort key)."""
    from angelo_bravo_etl_task_spark.queries_scale import zorder_value

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_value(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_py(a, b), (a, b, z)


@given(
    vals=st.lists(st.integers(0, 50_000), min_size=4, max_size=40),
)
@settings(**PROP_SETTINGS)
def test_exact_outlier_predicate_matches_float_zscore(spark, vals):
    """an1's integer predicate (v*n - s)^2 > 9*n*q - (3s)^2 agrees with the
    float z^2 > 9 definition away from the boundary (where float is
    untrustworthy — the exact form is the point)."""
    import math

    n = len(vals)
    s = sum(vals)
    q = sum(v * v for v in vals)
    mu = s / n
    var = q / n - mu * mu
    for v in vals:
        exact = (v * n - s) ** 2 > 9 * n * q - (3 * s) ** 2
        if var <= 0:
            assert not exact  # zero variance -> nothing is an outlier
            continue
        z2 = (v - mu) ** 2 / var
        if abs(z2 - 9.0) > 1e-6:  # outside the float-uncertainty band
            assert exact == (z2 > 9.0), (v, n, s, q, z2, exact)


@given(
    keys=st.lists(st.integers(0, 500_000), min_size=1, max_size=60, unique=True),
)
@settings(**PROP_SETTINGS)
def test_ord1_bucketed_ids_equal_naive_global_rownumber(spark, keys):
    """The bucketed global-row-number decomposition yields EXACTLY the ids
    of the naive single-partition ROW_NUMBER() OVER (ORDER BY key), for
    arbitrary unique key sets (including keys straddling bucket borders)."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame([(k,) for k in keys], "o_orderkey long")
    b = df.withColumn("bucket", F.expr("o_orderkey DIV 1000"))
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    wb = Window.partitionBy("bucket").orderBy("o_orderkey")
    got = {
        (r.o_orderkey, r.row_id)
        for r in b.join(F.broadcast(offsets), "bucket")
        .select(
            "o_orderkey",
            (F.col("offset") + F.row_number().over(wb)).alias("row_id"),
        )
        .collect()
    }
    expected = {(k, i + 1) for i, k in enumerate(sorted(keys))}
    assert got == expected


@given(
    n_tokens=st.integers(1, 300),
)
@settings(**PROP_SETTINGS)
def test_ck1_chunk_grid_covers_every_token_once_per_window(spark, n_tokens):
    """Chunking invariants for any document length: chunk starts form the
    stride grid, every token is covered by at least one chunk, full
    neighbor chunks overlap by exactly C - S tokens, and no chunk exceeds
    C tokens."""
    from angelo_bravo_etl_task_spark.queries_llm import _CK1_C, _CK1_S

    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from pyspark.sql import functions as F

    from angelo_bravo_etl_task_spark.operators.text import tokens

    toks = df.select("doc_id", tokens(F.col("text")).alias("w"))
    chunks = (
        toks.select(
            F.posexplode(
                F.sequence(F.lit(1), F.size("w"), F.lit(_CK1_S))
            ).alias("chunk_idx", "s"),
            F.col("w"),
        )
        .select("chunk_idx", "s", F.slice("w", F.col("s"), F.lit(_CK1_C)).alias("chunk"))
        .collect()
    )
    starts = [r.s for r in chunks]
    assert starts == list(range(1, n_tokens + 1, _CK1_S))
    covered = set()
    for r in chunks:
        assert 1 <= len(r.chunk) <= _CK1_C
        covered.update(range(r.s, r.s + len(r.chunk)))
    assert covered == set(range(1, n_tokens + 1))
    full = [r for r in chunks if len(r.chunk) == _CK1_C]
    for a, b in zip(full, full[1:]):
        if b.s - a.s == _CK1_S:
            overlap = set(range(a.s, a.s + _CK1_C)) & set(range(b.s, b.s + _CK1_C))
            assert len(overlap) == _CK1_C - _CK1_S


@given(
    day_offsets=st.sets(st.integers(0, 40), min_size=1, max_size=25),
)
@settings(**PROP_SETTINGS)
def test_seq1_islands_match_naive_streaks(spark, day_offsets):
    """The ordinal-minus-rownumber island trick equals a naive python
    streak scan for arbitrary day sets."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = dt.date(2024, 1, 1)
    days = sorted(base + dt.timedelta(days=o) for o in day_offsets)
    df = spark.createDataFrame([(1, d) for d in days], "user_id long, d date")
    w = Window.partitionBy("user_id").orderBy("d")
    got = {
        (r.streak_start, r.streak_end, r.streak_days)
        for r in df.withColumn(
            "island",
            F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).cast("bigint")
            - F.row_number().over(w),
        )
        .groupBy("user_id", "island")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .collect()
    }
    expected = set()
    run = [days[0]]
    for prev, cur in zip(days, days[1:]):
        if (cur - prev).days == 1:
            run.append(cur)
        else:
            expected.add((run[0], run[-1], len(run)))
            run = [cur]
    expected.add((run[0], run[-1], len(run)))
    assert got == expected


@given(
    lefts=st.lists(st.integers(0, 5000), min_size=1, max_size=15),
    rights=st.lists(st.integers(0, 5000), min_size=0, max_size=15),
    tol=st.integers(1, 1000),
)
@settings(**PROP_SETTINGS)
def test_asof_tolerance_matches_naive(spark, lefts, rights, tol):
    """asof_join backward with tolerance == per-row 'latest right <= t
    within tol' on a numeric time axis, including the no-match NULLs."""
    from angelo_bravo_etl_task_spark.operators.joins import asof_join

    l = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(lefts)], "k long, t long, lid long"
    )
    r = spark.createDataFrame([(1, t) for t in rights], "k long, t long")
    out = asof_join(
        l, r, on="k", left_time="t", right_time="t",
        direction="backward", tolerance_seconds=tol, right_time_as="mt",
    ).collect()
    got = {(row.lid, row.mt) for row in out}
    expected = set()
    for i, t in enumerate(lefts):
        cands = [x for x in rights if x <= t and t - x <= tol]
        expected.add((i, max(cands) if cands else None))
    assert got == expected


@given(
    lefts=st.lists(
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 50)),
        min_size=1,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(0, 50),
            st.integers(-5, 5),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**PROP_SETTINGS)
def test_asof_all_directions_match_pandas_merge_asof(
    spark, lefts, rights, direction
):
    """asof_join vs pandas merge_asof (by=key) as ground truth, all three
    directions. Right times are unique per key so the matched VALUE is
    well-defined; pandas resolves nearest ties backward, which is the
    documented tie rule asof_join implements."""
    import pandas as pd

    from angelo_bravo_etl_task_spark.operators import joins as J

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        "k STRING, t INT, lid INT",
    )
    rdf = spark.createDataFrame(rights, "k STRING, t INT, v INT")
    got = {
        r["lid"]: r["v"]
        for r in J.asof_join(
            ldf, rdf, on="k", left_time="t", right_time="t",
            direction=direction,
        ).collect()
    }

    lp = (
        pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lefts)],
            columns=["k", "t", "lid"],
        )
        .astype({"k": "string", "t": "int64", "lid": "int64"})
        .sort_values("t", kind="stable")
    )
    rp = (
        pd.DataFrame(rights, columns=["k", "t", "v"])
        .astype({"k": "string", "t": "int64", "v": "int64"})
        .sort_values("t", kind="stable")
    )
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
    want = {
        int(row.lid): (None if pd.isna(row.v) else int(row.v))
        for row in merged.itertuples()
    }
    assert got == want


@given(
    a=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 120)),
        min_size=1,
        max_size=10,
    ),
    b=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 120)),
        min_size=0,
        max_size=10,
    ),
)
@settings(**PROP_SETTINGS)
def test_grid_binned_interval_overlap_equals_naive(spark, a, b):
    """j8's grid decomposition on arbitrary half-open intervals — lengths
    chosen to span 1-3 grid cells (cell=100) and to land exactly on cell
    and interval boundaries, the off-by-one territory: cell assignment
    uses (e-1) DIV c (end exclusive), overlap is s < e' AND s' < e
    (touching intervals do NOT overlap)."""
    from pyspark.sql import functions as F

    cell = 100
    adf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(a)], "ida INT, s INT, e INT"
    )
    bdf = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(b)],
        "idb INT, xs INT, xe INT",
    )

    def cells(df, s, e):
        return df.withColumn(
            "cell",
            F.explode(
                F.sequence(
                    F.expr(f"{s} DIV {cell}"), F.expr(f"({e} - 1) DIV {cell}")
                )
            ),
        )

    got = sorted(
        map(
            tuple,
            cells(adf, "s", "e")
            .join(cells(bdf, "xs", "xe"), "cell")
            .where((F.col("s") < F.col("xe")) & (F.col("xs") < F.col("e")))
            .select("ida", "idb")
            .distinct()
            .collect(),
        )
    )
    want = sorted(
        (i, j)
        for i, (s, ln) in enumerate(a)
        for j, (xs, xln) in enumerate(b)
        if s < xs + xln and xs < s + ln
    )
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 100)),  # (value, weight)
        min_size=1,
        max_size=25,
    )
)
@settings(**PROP_SETTINGS)
def test_weighted_median_equals_brute_force(spark, rows):
    """qt3's cumulative-weight rule vs the definition: smallest value v
    with sum(weight | value <= v) * 2 >= total weight."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame(rows, "v INT, wt INT")
    agg = df.groupBy("v").agg(F.sum("wt").alias("wt"))
    cum = agg.select(
        "v",
        F.sum("wt")
        .over(W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cw"),
        F.sum("wt").over(W.partitionBy()).alias("tw"),
    )
    got = (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .agg(F.min("v").alias("m"))
        .collect()[0]["m"]
    )
    total = sum(w for _, w in rows)
    want = min(
        v
        for v, _ in rows
        if 2 * sum(w2 for v2, w2 in rows if v2 <= v) >= total
    )
    assert got == want


@given(
    times=st.lists(st.integers(0, 20000), min_size=1, max_size=30),
    gap=st.integers(100, 2000),
    cap=st.integers(2000, 8000),
)
@settings(**PROP_SETTINGS)
def test_capped_session_fold_equals_python_reference(spark, times, gap, cap):
    """seq2's fold vs a straight-line Python implementation of the same
    rules (new session when idle gap exceeded OR session duration cap
    exceeded), on one key with arbitrary duplicate timestamps."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(times)], "k INT, t LONG, eid INT"
    )
    series = df.groupBy("k").agg(
        F.sort_array(F.collect_list(F.struct("t", "eid"))).alias("s")
    )

    def merge(acc, v):
        new_sess = (
            (acc["last"] < 0)
            | ((v["t"] - acc["last"]) > gap)
            | ((v["t"] - acc["start"]) > cap)
        )
        idx = (acc["idx"] + F.when(new_sess, 1).otherwise(0)).cast("int")
        start = F.when(new_sess, v["t"]).otherwise(acc["start"])
        return F.struct(
            v["t"].alias("last"),
            start.alias("start"),
            idx.alias("idx"),
            F.concat(
                acc["out"], F.array(F.struct(v["t"].alias("t"), idx.alias("idx")))
            ).alias("out"),
        )

    init = F.expr(
        "named_struct('last', CAST(-1 AS BIGINT), 'start', CAST(-1 AS BIGINT),"
        " 'idx', CAST(0 AS INT),"
        " 'out', CAST(array() AS ARRAY<STRUCT<t: BIGINT, idx: INT>>))"
    )
    folded = series.select(
        F.aggregate("s", init, merge, lambda acc: acc["out"]).alias("out")
    )
    got = [
        (p["t"], p["idx"])
        for p in folded.collect()[0]["out"]
    ]

    want, last, start, idx = [], None, None, 0
    for t in sorted(times):
        if last is None or t - last > gap or t - start > cap:
            idx += 1
            start = t
        want.append((t, idx))
        last = t
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=2, max_size=6),
        min_size=1,
        max_size=15,
    )
)
@settings(**PROP_SETTINGS)
def test_bpe_pair_counts_match_python_reference(spark, words):
    """bpe1's vocab-weighted adjacent-pair scan vs a straight-line Python
    count over the same word list (multiplicities included)."""
    import collections

    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    wf = df.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        "freq",
        F.posexplode(F.sequence(F.lit(1), F.length("w") - 1)).alias("pos", "i"),
        F.col("w"),
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "freq")
    got = {
        r["pair"]: r["n"]
        for r in pairs.groupBy("pair").agg(F.sum("freq").alias("n")).collect()
    }
    want: collections.Counter = collections.Counter()
    for w in words:
        for i in range(len(w) - 1):
            want[w[i : i + 2]] += 1
    assert got == dict(want)


@given(
    deltas=st.lists(st.integers(-800, 800), min_size=1, max_size=25),
    cap=st.integers(100, 2000),
)
@settings(**PROP_SETTINGS)
def test_clamped_balance_fold_equals_python_reference(spark, deltas, cap):
    """tb1's recurrence bal = max(0, min(cap, prev + delta)) vs a
    straight-line reference, arbitrary deltas and cap, start = cap."""
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(deltas)], "i LONG, delta LONG"
    )
    series = df.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("i", "delta"))).alias("s")
    )

    def merge(acc, v):
        bal = F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.lit(cap).cast("bigint"), acc["bal"] + v["delta"]),
        )
        return F.struct(bal.alias("bal"), F.concat(acc["out"], F.array(bal)).alias("out"))

    init = F.expr(
        f"named_struct('bal', CAST({cap} AS BIGINT),"
        " 'out', CAST(array() AS ARRAY<BIGINT>))"
    )
    got = series.select(
        F.aggregate("s", init, merge, lambda a: a["out"]).alias("out")
    ).collect()[0]["out"]
    want, bal = [], cap
    for d in deltas:
        bal = max(0, min(cap, bal + d))
        want.append(bal)
    assert got == want


@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 300)),
        min_size=1,
        max_size=20,
    )
)
@settings(**PROP_SETTINGS)
def test_interval_union_fold_equals_python_sweep(spark, ivs):
    """iu1's gap-accumulating fold vs a reference sweep-line merge over
    arbitrary (possibly nested/duplicate) intervals on one key."""
    rows = [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "eid LONG, s LONG, e LONG")
    series = df.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("s", "eid", "e"))).alias("iv")
    )

    def merge(acc, v):
        gap = F.when(v["s"] > acc["cur_end"], v["s"] - acc["cur_end"]).otherwise(
            F.lit(0).cast("bigint")
        )
        return F.struct(
            F.greatest(acc["cur_end"], v["e"]).alias("cur_end"),
            (acc["closed"] + gap).alias("closed"),
            F.least(acc["first_s"], v["s"]).alias("first_s"),
        )

    init = F.expr(
        "named_struct('cur_end', iv[0].e, 'closed', CAST(0 AS BIGINT),"
        " 'first_s', iv[0].s)"
    )
    rest = F.slice("iv", 2, F.greatest(F.size("iv") - 1, F.lit(0)))
    st_ = series.select(F.aggregate(rest, init, merge).alias("st")).collect()[0]["st"]
    got = st_["cur_end"] - st_["first_s"] - st_["closed"]

    merged, want = [], 0
    for s, e in sorted((s, s + ln) for s, ln in ivs):
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    want = sum(e - s for s, e in merged)
    assert got == want


# ---------------------------------------------------------------------------
# wave 10-12 algorithmic properties: skyline, BFS, KMV, portable HLL
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=40,
    )
)
@settings(**PROP_SETTINGS)
def test_skyline_window_matches_brute_force_pareto(spark, pts):
    """sky1's sorted running-min formulation == the O(n^2) dominance
    definition: p survives iff no q has q.x <= p.x and q.y <= p.y with
    one strict."""
    from pyspark.sql.window import Window as W

    distinct = sorted(set(pts))
    df = spark.createDataFrame(distinct, "x BIGINT, y BIGINT")
    w = W.orderBy("x", "y").rowsBetween(W.unboundedPreceding, -1)
    flagged = df.select("x", "y", F.min("y").over(w).alias("best_prev"))
    got = {
        (r["x"], r["y"])
        for r in flagged.where(
            F.col("best_prev").isNull() | (F.col("y") < F.col("best_prev"))
        ).collect()
    }
    expect = {
        p
        for p in distinct
        if not any(
            q != p and q[0] <= p[0] and q[1] <= p[1] for q in distinct
        )
    }
    assert got == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=40,
    )
)
@settings(**PROP_SETTINGS)
def test_bfs_rounds_match_python_reference(spark, edges):
    """gr1's statically-unrolled frontier expansion == textbook BFS
    min-hops bounded at 3, on arbitrary small undirected graphs."""
    edges = [(u, v) for u, v in edges if u != v]
    seeds = [0, 5, 10]
    # python reference
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in (1, 2, 3):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.add(v)
        frontier = nxt
    # spark: same rounds as gr1 (distinct per level, min over union)
    if edges:
        e = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
        und = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    else:
        und = spark.createDataFrame([], "u BIGINT, v BIGINT")
    levels = [
        spark.createDataFrame(
            [(s, 0) for s in seeds], "vertex BIGINT, hop BIGINT"
        )
    ]
    frontier_df = levels[0]
    for _ in range(3):
        nxt_df = (
            frontier_df.join(und, frontier_df["vertex"] == und["u"])
            .select(F.col("v").alias("vertex"), (F.col("hop") + 1).alias("hop"))
            .distinct()
        )
        levels.append(nxt_df)
        frontier_df = nxt_df
    allv = levels[0]
    for lv in levels[1:]:
        allv = allv.unionAll(lv)
    got = {
        r["vertex"]: r["mh"]
        for r in allv.groupBy("vertex")
        .agg(F.min("hop").alias("mh"))
        .collect()
    }
    assert got == dist


@given(n=st.integers(80, 400))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_estimate_matches_python_reference(spark, n):
    """kmv1's in-engine estimate == a hashlib.md5 reference computing the
    same (k-1)*2^32/h_(k) definition, bit for bit (deterministic hash,
    exact-int division)."""
    import hashlib

    k = 64
    keys = [f"key-{i}" for i in range(n)]
    hashes = sorted(
        (int(hashlib.md5(s.encode()).hexdigest()[:8], 16), s) for s in keys
    )
    kth = hashes[k - 1][0]
    expect = (k - 1) * 4294967296 / kth

    df = spark.createDataFrame([(s,) for s in keys], "k STRING")
    hashed = df.select(
        F.conv(F.substring(F.md5("k"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
        "k",
    )
    from pyspark.sql.window import Window as W

    ranked = hashed.select(
        "h", F.row_number().over(W.orderBy("h", "k")).alias("rn")
    )
    got = ranked.where(F.col("rn") == k).select(
        (F.lit(k - 1).cast("bigint") * F.lit(4294967296).cast("bigint") / F.col("h")).alias("est")
    ).collect()[0]["est"]
    assert got == expect


@given(n=st.integers(50, 300))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_portable_hll_matches_python_reference(spark, n):
    """hll1's register pipeline == a pure-Python HLL over the same md5
    hashes — EXACT float equality, because every 2^-M term is dyadic and
    the harmonic sum stays under 53 mantissa bits (the property the
    query's docstring claims; this test is that claim, executed)."""
    import hashlib

    keys = [f"u-{i}" for i in range(n)]
    regs = {}
    for s in keys:
        h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        bucket, rem = h // 67108864, h % 67108864
        rho = 27 if rem == 0 else 27 - len(bin(rem)[2:])
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s_val = sum(1.0 / (1 << m) for m in regs.values()) + (64 - len(regs))
    expect = 0.709 * 4096 / s_val

    df = spark.createDataFrame([(s,) for s in keys], "k STRING")
    hashed = df.select(
        F.conv(F.substring(F.md5("k"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    rem = F.col("h") % 67108864
    rho = F.when(rem == 0, F.lit(27)).otherwise(
        27 - F.length(F.expr("LTRIM('0', bin(h % 67108864))"))
    )
    reg_df = (
        hashed.select(F.expr("h DIV 67108864").alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("m"))
    )
    row = reg_df.agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum(
            1.0
            / F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"
            )
        ).alias("s_hit"),
    ).collect()[0]
    got = 0.709 * 4096 / (row["s_hit"] + (64 - row["n_hit"]))
    assert got == expect


# ---------------------------------------------------------------------------
# wave 16-24 algorithmic properties: ANOVA, CUPED, Kaplan-Meier, PCA —
# exact-equality references independent of the DuckDB oracle
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=6,
        max_size=40,
    )
)
@settings(**PROP_SETTINGS)
def test_anova_identities_match_python_reference(spark, rows):
    """anova1's SSB/SSW identities + fixed-order fold == a pure-Python
    replay of the same arithmetic — EXACT float equality (same ops, same
    order)."""
    groups = {g for g, _ in rows}
    if len(groups) < 2:
        rows = rows + [(0, 1), (1, 2)]
    # python reference with the identical label-sorted fold order
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    n = 0
    s = 0
    svv = 0
    for g, v in rows:
        agg[g][0] += 1
        agg[g][1] += v
        n += 1
        s += v
        svv += v * v
    fold = 0.0
    for g in sorted(agg):
        n_g, s_g = agg[g]
        fold = fold + (float(s_g) * float(s_g) / float(n_g))
    ssb_ref = fold - float(s) * float(s) / float(n)
    ssw_ref = float(svv) - fold

    df = spark.createDataFrame(
        [(str(g), v) for g, v in rows], "g STRING, vc BIGINT"
    )
    per_g = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("vc").alias("s_g")
    )
    tot = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("svv"),
    )
    folded = per_g.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(g, s_g, n_g))),"
            " r -> CAST(r.s_g AS DOUBLE) * CAST(r.s_g AS DOUBLE)"
            " / CAST(r.n_g AS DOUBLE)), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        ).alias("fold")
    )
    row = tot.crossJoin(folded).collect()[0]
    ssb = row["fold"] - float(row["s"]) * float(row["s"]) / float(row["n"])
    ssw = float(row["svv"]) - row["fold"]
    assert ssb == ssb_ref and ssw == ssw_ref


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1), st.integers(-500, 500), st.integers(-500, 500)
        ),
        min_size=6,
        max_size=40,
    )
)
@settings(**PROP_SETTINGS)
def test_cuped_adjustment_matches_python_reference(spark, rows):
    """ab2's CUPED readout == the same exact-integer cross-products and
    IEEE steps replayed in Python — exact equality (or both undefined
    when var(x)=0 / an arm is empty)."""
    arms = {a for a, _, _ in rows}
    if len(arms) < 2:
        rows = rows + [(0, 1, 2), (1, 3, 4)]
    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxy = sum(x * y for _, x, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    den = n * sxx - sx * sx
    import math

    stats = {}
    for a in (0, 1):
        sel = [(x, y) for aa, x, y in rows if aa == a]
        stats[a] = (len(sel), sum(x for x, _ in sel), sum(y for _, y in sel))
    if den == 0 or stats[0][0] == 0 or stats[1][0] == 0:
        return  # degenerate; the query's testdata never is
    theta_ref = float(n * sxy - sx * sy) / float(den)
    raw_ref = float(stats[1][2]) / stats[1][0] - float(stats[0][2]) / stats[0][0]
    xd_ref = float(stats[1][1]) / stats[1][0] - float(stats[0][1]) / stats[0][0]
    adj_ref = raw_ref - theta_ref * xd_ref

    df = spark.createDataFrame(rows, "arm BIGINT, x BIGINT, y BIGINT")
    pooled = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]
    theta = float(
        pooled["n"] * pooled["sxy"] - pooled["sx"] * pooled["sy"]
    ) / float(pooled["n"] * pooled["sxx"] - pooled["sx"] * pooled["sx"])
    arms_df = {
        r["arm"]: r
        for r in df.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("na"),
            F.sum("x").alias("sxa"),
            F.sum("y").alias("sya"),
        )
        .collect()
    }
    raw = float(arms_df[1]["sya"]) / arms_df[1]["na"] - float(
        arms_df[0]["sya"]
    ) / arms_df[0]["na"]
    xd = float(arms_df[1]["sxa"]) / arms_df[1]["na"] - float(
        arms_df[0]["sxa"]
    ) / arms_df[0]["na"]
    assert theta == theta_ref
    assert raw - theta * xd == adj_ref or math.isclose(
        raw - theta * xd, adj_ref, rel_tol=0, abs_tol=0
    )


@given(
    subjects=st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=3,
        max_size=40,
    )
)
@settings(**PROP_SETTINGS)
def test_kaplan_meier_fold_matches_python_reference(spark, subjects):
    """sv1's running-product fold == the textbook KM recurrence replayed
    in Python with identical IEEE steps — exact float equality per
    event time."""
    if not any(ev for _, ev in subjects):
        subjects = subjects + [(1, True)]
    # python reference
    from collections import Counter

    total = len(subjects)
    by_dur = Counter(d for d, _ in subjects)
    deaths = Counter(d for d, ev in subjects if ev)
    s_run = 1.0
    expect = {}
    consumed = 0
    for t in sorted(by_dur):
        n_risk = total - consumed
        consumed += by_dur[t]
        d = deaths.get(t, 0)
        if d > 0:
            s_run = s_run * (float(n_risk - d) / n_risk)
            expect[t] = (n_risk, d, s_run)

    df = spark.createDataFrame(
        [(d, 1 if ev else 0) for d, ev in subjects], "dur BIGINT, ev BIGINT"
    )
    cells = df.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c"), F.sum("ev").alias("d")
    )
    from pyspark.sql.window import Window as W

    w_before = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    risk = cells.select(
        "dur",
        "d",
        (
            F.lit(total) - F.coalesce(F.sum("c").over(w_before), F.lit(0))
        ).alias("n_risk"),
    ).where(F.col("d") > 0)
    seq = risk.agg(
        F.array_sort(F.collect_list(F.struct("dur", "d", "n_risk"))).alias("ev")
    )
    folded = seq.select(
        F.expr(
            "aggregate(ev,"
            " named_struct('s', CAST(1.0 AS DOUBLE),"
            "  'out', CAST(array() AS ARRAY<STRUCT<dur: BIGINT, d: BIGINT,"
            "   n_risk: BIGINT, s: DOUBLE>>)),"
            " (acc, x) -> named_struct("
            "   's', acc.s * (CAST(x.n_risk - x.d AS DOUBLE) / x.n_risk),"
            "   'out', concat(acc.out, array(named_struct("
            "     'dur', x.dur, 'd', x.d, 'n_risk', x.n_risk,"
            "     's', acc.s * (CAST(x.n_risk - x.d AS DOUBLE)"
            "          / x.n_risk))))),"
            " acc -> acc.out) AS curve"
        )
    )
    got = {
        p["dur"]: (p["n_risk"], p["d"], p["s"])
        for p in folded.select(F.explode("curve").alias("p"))
        .select("p.*")
        .collect()
    }
    assert got == expect


@given(seed=st.integers(0, 10_000))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pca_power_iteration_matches_integer_reference(spark, seed):
    """pca1's two integer power-iteration rounds == a pure-Python replay
    of the identical Q7/centering/renormalization arithmetic — exact
    integer equality of the released direction (deterministic synthetic
    vectors keyed by the hypothesis seed)."""
    import hashlib

    dim, nvec = 8, 30

    def elem(v, p):
        h = int(
            hashlib.md5(f"{seed}-{v}-{p}".encode()).hexdigest()[:6], 16
        )
        return (h % 2048 - 1024) / 2048.0  # [-0.5, 0.5)

    vecs = [[elem(v, p) for p in range(dim)] for v in range(nvec)]
    # python reference (identical arithmetic)
    import math

    q = [[math.floor(e * 128.0) for e in row] for row in vecs]
    n = nvec
    sums = [sum(q[v][p] for v in range(nvec)) for p in range(dim)]
    c = [[q[v][p] * n - sums[p] for p in range(dim)] for v in range(nvec)]
    cov = [
        [
            sum(c[v][i] * c[v][j] for v in range(nvec))
            for j in range(dim)
        ]
        for i in range(dim)
    ]

    def py_norm(vv):
        d = max(abs(x) for x in vv) // 10000 + 1
        return [(-1 if x < 0 else 1) * (abs(x) // d) for x in vv]

    v1 = py_norm([sum(cov[i]) for i in range(dim)])
    v2 = py_norm(
        [sum(cov[i][j] * v1[j] for j in range(dim)) for i in range(dim)]
    )
    expect = {p: v2[p] for p in range(dim)}

    rows = [
        (v, p, float(vecs[v][p])) for v in range(nvec) for p in range(dim)
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, pos BIGINT, e DOUBLE")
    qdf = df.select(
        "vec_id",
        "pos",
        F.floor(F.col("e") * F.lit(128.0)).cast("bigint").alias("qv"),
    )
    sums_df = qdf.groupBy("pos").agg(F.sum("qv").alias("s"))
    centered = qdf.join(sums_df, "pos").select(
        "vec_id", "pos", (F.col("qv") * nvec - F.col("s")).alias("c")
    )
    a = centered.select(
        F.col("vec_id").alias("k"), F.col("pos").alias("i"),
        F.col("c").alias("ca"),
    )
    b = centered.select(
        F.col("vec_id").alias("k"), F.col("pos").alias("j"),
        F.col("c").alias("cb"),
    )
    cov_df = (
        a.join(b, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("cij"))
    )

    def norm(v_df):
        d = v_df.agg((F.expr("MAX(ABS(v)) DIV 10000") + 1).alias("d"))
        return v_df.crossJoin(d).select(
            "pos",
            (
                F.when(F.col("v") < 0, -1).otherwise(1)
                * F.expr("ABS(v) DIV d")
            ).alias("v"),
        )

    v1_df = norm(
        cov_df.groupBy(F.col("i").alias("pos")).agg(F.sum("cij").alias("v"))
    )
    v2_df = norm(
        cov_df.join(v1_df.withColumnRenamed("pos", "j"), "j")
        .groupBy(F.col("i").alias("pos"))
        .agg(F.sum(F.col("cij") * F.col("v")).alias("v"))
    )
    got = {r["pos"]: r["v"] for r in v2_df.collect()}
    assert got == expect
