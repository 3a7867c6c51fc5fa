"""Microbench: per-pair cosine scoring strategies for brute_force_topk.

Compares, on the real sf0.1 embeddings (50 queries x corpus, the x-family
shape):
  A) HOF fold        — current dot(): aggregate(zip_with(...)) per pair
  B) unrolled sum    — ((0.0 + x1*y1) + x2*y2) + ... via element_at,
                       codegen-able straight-line Java, same left-assoc
                       IEEE order as the fold
  C) arrow UDF       — numpy loop accumulation in the same order

Also asserts A == B == C bitwise on the full joined frame.

Usage: python tools/microbench_dot.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from angelo_bravo_etl_task_spark.operators.partitioning import spread  # noqa: E402
from angelo_bravo_etl_task_spark.operators.similarity import dot, norm  # noqa: E402
from angelo_bravo_etl_task_spark.session import get_spark  # noqa: E402

DIM = 64


def dot_unrolled(a, b, dim):
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(
            b, i
        ).cast("double")
    return acc


def arrow_dot():
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(qv: pd.Series, cv: pd.Series) -> pd.Series:
        q = np.vstack(qv.to_numpy()).astype(np.float64)
        c = np.vstack(cv.to_numpy()).astype(np.float64)
        acc = np.zeros(len(q), dtype=np.float64)
        for i in range(q.shape[1]):
            acc = acc + q[:, i] * c[:, i]
        return pd.Series(acc)

    return _dot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark(app_name="microdot", adaptive=False, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    c = spread(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv"))
    )
    joined = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).localCheckpoint(eager=True)
    n = joined.count()
    print(f"pairs: {n}")

    exprs = {
        "A_fold": dot(F.col("_qv"), F.col("_cv")),
        "B_unrolled": dot_unrolled(F.col("_qv"), F.col("_cv"), DIM),
        "C_arrow": arrow_dot()(F.col("_qv"), F.col("_cv")),
    }
    for name, e in exprs.items():
        df = joined.select(e.alias("d"))
        df.count()  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {(time.perf_counter() - t0) / 3:.3f}s per noop pass")

    # bitwise equality over ALL pairs
    chk = joined.select(
        *[e.alias(k) for k, e in exprs.items()]
    ).select(
        F.sum(
            F.when(
                (F.col("A_fold") != F.col("B_unrolled"))
                | (F.col("A_fold") != F.col("C_arrow")),
                1,
            ).otherwise(0)
        ).alias("mismatches")
    )
    print("mismatches:", chk.first()["mismatches"])
    spark.stop()


if __name__ == "__main__":
    main()
