"""Sources & sinks (SURVEY §2a)."""

from ecommerce_dataengineering_project_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_json_lines,
)
from ecommerce_dataengineering_project_spark.sources.writers import (
    create_or_append_table,
    write_partitioned_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_json_lines",
    "create_or_append_table",
    "write_partitioned_parquet",
]
