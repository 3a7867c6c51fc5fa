from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "o_orderkey",
        "o_orderstatus",
        "n_lines",
        "total_qty",
        "order_class",
    }


def test_contract_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # every oracle-less query is one of the documented hash-specific ops
    assert set(qs) - set(oracles) == {"d3_minhash_lsh", "d4_simhash", "x2_lsh_topk"}
