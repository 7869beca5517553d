"""Sources & sinks (SURVEY.md §2.1, S1-S10)."""

from scraping_jobsdb_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_csv_table,
    write_csv_export,
    write_idempotent_append,
    write_partitioned,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_csv_table",
    "write_csv_export",
    "write_idempotent_append",
    "write_partitioned",
]
