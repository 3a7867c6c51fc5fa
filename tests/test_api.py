from __future__ import annotations

from angelo_bravo_etl_task_spark.api import Engine


def test_engine_sql_and_tables(spark, sf_dir):
    eng = Engine(spark).register_dir(sf_dir)
    assert "lineitem" in eng.tables() and "embeddings" in eng.tables()
    df = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag"
    )
    rows = {r["l_returnflag"]: r["cnt"] for r in df.collect()}
    assert sum(rows.values()) == eng.table("lineitem").count()
    assert "HashAggregate" in eng.explain(df)


def test_engine_runs_registered_ops_by_name(spark, sf_dir):
    eng = Engine(spark)
    names = eng.ops()
    assert len(names) >= 200 and "q1_pricing_summary" in names
    df = eng.run("q1_pricing_summary", sf_dir)
    assert df.count() > 0
    try:
        eng.run("nope_not_a_query", sf_dir)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
