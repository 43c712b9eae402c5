"""Sinks & writers (SURVEY.md §2.2)."""

from streaming_data_spark.sinks.writers import (
    append_jdbc,
    gated_write,
    incremental_load,
    write_csv,
    write_if_absent,
    write_partitioned,
)

__all__ = [
    "write_if_absent",
    "incremental_load",
    "append_jdbc",
    "write_csv",
    "write_partitioned",
    "gated_write",
]
