"""Wave-118 properties: merge1's MERGE accounting identities and skew2's
AQE skew-split engagement.

merge1's oracle certifies the end-state values; these tests certify the
MERGE bookkeeping LAWS on the engine side — conservation (every base row
is either live or DV-marked; every delta row lands exactly once) — which
no single hash row spells out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from angelo_bravo_etl_task_spark.queries import QUERIES
from angelo_bravo_etl_task_spark.queries_wave118 import (
    merge1_merge_into_dv,
    skew2_aqe_split,
)


def test_merge1_conservation_laws(spark, sf_dir):
    out = merge1_merge_into_dv(spark, sf_dir).collect()
    by_file = {r["file_id"]: r for r in out}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    keys = orders.select("o_orderkey")
    n_del = keys.where(F.col("o_orderkey") % 13 == 0).count()
    n_upd = keys.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0)
    ).count()
    n_ins = keys.where(F.col("o_orderkey") % 11 == 0).count()

    # file 4 holds exactly the appended update images + inserts
    f4 = by_file[4]
    assert f4["updated_rows"] == n_upd
    assert f4["inserted_rows"] == n_ins
    assert f4["live_rows"] == n_upd + n_ins
    assert f4["dv_marked"] == 0  # appends are never DV-marked

    # base files: every matched U/D marks exactly one position; live =
    # total - marked (conservation: no row both live and marked, none lost)
    base_live = sum(by_file[f]["live_rows"] for f in range(4))
    base_marked = sum(by_file[f]["dv_marked"] for f in range(4))
    assert base_marked == n_del + n_upd
    assert base_live == n - n_del - n_upd

    # global post-merge cardinality = base - deletes + inserts (updates
    # are cardinality-neutral: one mark + one append)
    assert base_live + f4["live_rows"] == n - n_del + n_ins


def test_skew2_split_and_result_parity(spark, sf_dir):
    """skew2 asserts skew=true internally; here additionally verify the
    AQE-split result matches a plain non-adaptive run of the same join —
    the split must be value-neutral."""
    out = {
        (r["status"], r["n_rows"], r["qty_sum_c"])
        for r in skew2_aqe_split(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fact = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0).cast("bigint"))
        .otherwise(F.col("l_orderkey"))
        .alias("sk"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("qty_c"),
    )
    dim = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
    )
    plain = {
        tuple(r)
        for r in fact.join(dim, fact["sk"] == dim["k"])
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty_c").cast("bigint").alias("qty_sum_c"),
        )
        .collect()
    }
    assert out == plain


def test_wave118_registered_with_oracles():
    for name in ("merge1_merge_into_dv", "skew2_aqe_split"):
        fn, sql = QUERIES[name]
        assert callable(fn) and isinstance(sql, str)
