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
    from angelo_bravo_etl_task_spark.queries import QUERIES

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # the adapter exposes exactly the registry: every registered query, and
    # an oracle for every query registered with one (None = documented
    # hash-specific / approximate op that gets the weaker rows-only check)
    assert set(qs) == set(QUERIES)
    assert set(qs) - set(oracles) == {
        name for name, (_, sql) in QUERIES.items() if sql is None
    }


def test_check_first_queries_lead_the_registry():
    """The driver's correctness sweep covers a bounded prefix of queries();
    names still needing a driver-green row must come first."""
    from angelo_bravo_etl_task_spark.queries import _CHECK_FIRST

    names = list(entrymod.queries())
    expected_head = [n for n in _CHECK_FIRST if n in set(names)]
    assert names[: len(expected_head)] == expected_head


def test_check_first_names_all_registered():
    """_ordered_names() silently drops _CHECK_FIRST entries that are not
    in QUERIES — a typo would silently push a query out of the driver's
    sweep window. Every queued name must resolve, with no duplicates."""
    from angelo_bravo_etl_task_spark.queries import _CHECK_FIRST, QUERIES

    missing = [n for n in _CHECK_FIRST if n not in QUERIES]
    assert missing == [], f"unregistered names in _CHECK_FIRST: {missing}"
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST)), "duplicate names"
