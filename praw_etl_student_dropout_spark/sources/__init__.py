from .readers import load_tables, read_csv, read_jdbc, read_parquet, rows_to_df
from .writers import (
    csv_snapshot,
    idempotent_append,
    write_jdbc_append,
    write_parquet,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "rows_to_df",
    "csv_snapshot",
    "idempotent_append",
    "write_jdbc_append",
    "write_parquet",
]
