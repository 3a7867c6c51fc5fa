"""Explicit schemas — the single source of truth.

The reference infers input dtypes from whole-file CSV scans
(``Angelo_ETL_Task.py:26``, ``low_memory=False``) and declares the output
schema only as Postgres DDL (``Angelo_ETL_Task.py:298-325``). Here every
schema is an explicit ``StructType``: readers never infer, writers validate.

Three groups:
- LOINC-shaped inputs the flagship pipeline consumes (reference §1.4 columns);
- the 25-column i2b2 ontology output (reference DDL), with its varchar limits
  and NOT NULL set as data, so the constraint filter / truncation operators
  are driven from one place;
- the driver's TPC-H-ish testdata tables (/root/testdata, TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# LOINC-shaped inputs (only the columns the pipeline reads; Catalyst prunes
# the rest at scan time if a wider file is supplied).
# Reference: Loinc.csv consumed at Angelo_ETL_Task.py:144, columns per §1.4.
LOINC_SCHEMA = StructType(
    [
        StructField("LOINC_NUM", StringType(), nullable=False),
        StructField("COMPONENT", StringType(), nullable=True),
        StructField("PROPERTY", StringType(), nullable=True),
        StructField("TIME_ASPCT", StringType(), nullable=True),
        StructField("SYSTEM", StringType(), nullable=True),
        StructField("SCALE_TYP", StringType(), nullable=True),
        StructField("METHOD_TYP", StringType(), nullable=True),
        StructField("STATUS", StringType(), nullable=False),
    ]
)

# Reference: MultiAxialHierarchy.csv consumed at Angelo_ETL_Task.py:145.
HIERARCHY_SCHEMA = StructType(
    [
        StructField("PATH_TO_ROOT", StringType(), nullable=False),
        StructField("SEQUENCE", IntegerType(), nullable=False),
        StructField("IMMEDIATE_PARENT", StringType(), nullable=True),
        StructField("CODE", StringType(), nullable=False),
        StructField("CODE_TEXT", StringType(), nullable=False),
    ]
)

# --------------------------------------------------------------------------
# i2b2 output table (reference DDL Angelo_ETL_Task.py:298-325).
# (name, spark type, nullable, varchar_limit or None) — limits drive the
# truncation operator (reference :261-272), NOT NULL drives the constraint
# filter (reference :245-258).
I2B2_COLUMNS: list[tuple[str, object, bool, int | None]] = [
    ("C_HLEVEL", IntegerType(), False, None),
    ("C_FULLNAME", StringType(), False, 700),
    ("C_NAME", StringType(), False, 2000),
    ("C_SYNONYM_CD", StringType(), False, 1),
    ("C_VISUALATTRIBUTES", StringType(), False, 3),
    ("C_TOTALNUM", IntegerType(), True, None),
    ("C_BASECODE", StringType(), True, 50),
    ("C_METADATAXML", StringType(), True, None),
    ("C_FACTTABLECOLUMN", StringType(), False, 50),
    ("C_TABLENAME", StringType(), False, 50),
    ("C_COLUMNNAME", StringType(), False, 50),
    ("C_COLUMNDATATYPE", StringType(), False, 50),
    ("C_OPERATOR", StringType(), False, 10),
    ("C_DIMCODE", StringType(), False, 700),
    ("C_COMMENT", StringType(), True, None),
    ("C_TOOLTIP", StringType(), True, 900),
    ("M_APPLIED_PATH", StringType(), False, 700),
    ("UPDATE_DATE", TimestampType(), False, None),
    ("DOWNLOAD_DATE", TimestampType(), True, None),
    ("IMPORT_DATE", TimestampType(), True, None),
    ("SOURCESYSTEM_CD", StringType(), True, 50),
    ("VALUETYPE_CD", StringType(), True, 50),
    ("M_EXCLUSION_CD", StringType(), True, 25),
    ("C_PATH", StringType(), True, 700),
    ("C_SYMBOL", StringType(), True, 50),
]

I2B2_SCHEMA = StructType(
    [StructField(name, dtype, nullable) for name, dtype, nullable, _ in I2B2_COLUMNS]
)

#: Columns the reference's constraint filter checks (Angelo_ETL_Task.py:245-258).
#: Note this is the DDL NOT NULL set minus none — 13 columns checked there.
I2B2_NOT_NULL_COLUMNS = [name for name, _, nullable, _ in I2B2_COLUMNS if not nullable]

#: name → varchar limit for the truncation pass (Angelo_ETL_Task.py:261-272).
I2B2_VARCHAR_LIMITS = {
    name: limit for name, _, _, limit in I2B2_COLUMNS if limit is not None
}

def i2b2_jdbc_column_types(text_type: str = "STRING") -> str:
    """JDBC column-type clause reproducing the reference DDL types
    (Angelo_ETL_Task.py:298-325). The clause must use SPARK SQL types
    (Spark parses it before handing types to the dialect): VARCHAR(n)
    passes through to the database; the default STRING maps to the JDBC
    dialect's unbounded text type — TEXT on PostgreSQL, the reference's
    sink and intent for its two TEXT columns. ``text_type`` overrides that
    mapping for dialects where the unbounded type misbehaves (Derby's CLOB
    rejects Spark's setNull(VARCHAR) — use ``VARCHAR(32672)``, Derby's
    max)."""
    return ", ".join(
        f"{name} "
        + (
            "INT"
            if isinstance(dtype, IntegerType)
            else (text_type if limit is None else f"VARCHAR({limit})")
            if isinstance(dtype, StringType)
            else "TIMESTAMP"
        )
        for name, dtype, _, limit in I2B2_COLUMNS
    )


#: JDBC column-type clause reproducing the reference DDL types.
I2B2_JDBC_COLUMN_TYPES = i2b2_jdbc_column_types()


def i2b2_create_table_sql(
    table: str = "I2B2",
    text_type: str = "TEXT",
    nullable_string_type: str | None = None,
) -> str:
    """The reference's CREATE TABLE statement (Angelo_ETL_Task.py:298-325)
    — including the NOT NULL constraints, which Spark's JDBC
    ``createTableColumnTypes`` path cannot express. ``text_type`` adapts
    the two unbounded columns to the sink dialect (TEXT on PostgreSQL —
    the reference's sink). ``nullable_string_type``, when set, overrides
    the type of every NULLABLE string column: Spark's Derby dialect types
    null string parameters as CLOB, and Derby refuses a CLOB parameter
    against a VARCHAR column — so Derby sinks need ``CLOB`` here (widths
    are enforced client-side by the truncation operator regardless)."""

    def _sql_type(dtype, nullable, limit) -> str:
        if isinstance(dtype, IntegerType):
            return "INT"
        if not isinstance(dtype, StringType):
            return "TIMESTAMP"
        if nullable and nullable_string_type is not None:
            return nullable_string_type
        return text_type if limit is None else f"VARCHAR({limit})"

    cols = ",\n".join(
        f"  {name} {_sql_type(dtype, nullable, limit)}"
        + (" NOT NULL" if not nullable else "")
        for name, dtype, nullable, limit in I2B2_COLUMNS
    )
    return f"CREATE TABLE {table} (\n{cols}\n)"

# --------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md; verified against the sf0.001 parquet).
TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = list(TESTDATA_SCHEMAS)
