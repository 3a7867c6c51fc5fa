"""angelo_bravo_etl_task_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL (Aebravo/Angelo-Bravo-ETL-Task, a pandas/psycopg2 LOINC→i2b2
pipeline), re-expressed Spark-first:

- ``session``    — SparkSession factory (AQE, Arrow, tuned shuffle partitions)
- ``schemas``    — explicit StructType schemas (inputs, i2b2 output, testdata)
- ``sources``    — readers (csv/parquet/jdbc, driver-side HTTP+zip staging) and
                   writers (csv/parquet/jdbc)
- ``operators``  — the relational operator library (joins, dedup, agg, windows,
                   set ops, filters, projections, text/similarity/multimodal)
- ``functions``  — scalar Column helpers (xml generation, datetime, strings)
- ``pipelines``  — the flagship LOINC→i2b2 pipeline composed from operators
- ``streaming``  — Structured Streaming variants (windowed aggs, watermarks,
                   stateful dedup)

Everything is declarative DataFrame/SQL — Catalyst picks the physical plan.
No RDD code, no driver-side row loops; Python UDFs only where built-ins
genuinely cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"
