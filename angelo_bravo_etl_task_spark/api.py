"""User-facing engine facade.

The reference is a script; this engine is a library + a session-scoped
facade: register the data directory once, then run DataFrame ops or plain
SQL against named tables (Spark SQL's full surface — the oracle queries in
``queries.py`` are the compatibility corpus).

    eng = Engine.local(sf_dir="/root/testdata/sf0.1")
    eng.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").show()
    eng.table("orders").where(...)           # DataFrame API
    eng.explain(df)                          # physical plan text
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .plans.audit import physical_plan
from .schemas import TESTDATA_SCHEMAS
from .session import get_spark
from .sources.readers import load_table


class Engine:
    """A SparkSession plus a registered table catalog."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    # -- construction -----------------------------------------------------
    @classmethod
    def local(
        cls,
        sf_dir: str | None = None,
        app_name: str = "angelo-bravo-etl-task-spark",
        **session_kwargs,
    ) -> "Engine":
        eng = cls(get_spark(app_name=app_name, **session_kwargs))
        if sf_dir:
            eng.register_dir(sf_dir)
        return eng

    # -- catalog ----------------------------------------------------------
    def register_dir(self, sf_dir: str) -> "Engine":
        """Register every known parquet table under ``sf_dir`` as a SQL view."""
        for name in TESTDATA_SCHEMAS:
            if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
                self.register(name, load_table(self.spark, sf_dir, name))
        return self

    def register(self, name: str, df: DataFrame) -> "Engine":
        self._tables[name] = df
        df.createOrReplaceTempView(name)
        return self

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def tables(self) -> list[str]:
        return sorted(self._tables)

    # -- execution --------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def explain(self, df: DataFrame) -> str:
        return physical_plan(df)

    # -- registered operator corpus ---------------------------------------
    def ops(self) -> list[str]:
        """Names of every registered query/operator (the SURVEY §2 corpus)."""
        from .queries import all_queries

        return list(all_queries())

    def run(self, name: str, sf_dir: str) -> DataFrame:
        """Run a registered query by name against a data directory."""
        from .queries import QUERIES

        if name not in QUERIES:
            raise KeyError(
                f"unknown query {name!r}; see Engine.ops() for the corpus"
            )
        return QUERIES[name][0](self.spark, sf_dir)
