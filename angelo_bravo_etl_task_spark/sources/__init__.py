from .readers import load_table, load_testdata, read_csv, read_parquet

__all__ = ["load_table", "load_testdata", "read_csv", "read_parquet"]
