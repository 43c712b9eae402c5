"""Plan inspection & scale assertions (SURVEY.md §4).

The engine's optimizer IS Catalyst — nothing here rewrites plans.
What this module does is make the scale-critical plan properties
CHECKABLE: tests assert that filters reach the parquet scan, that
dimension joins broadcast, that scans prune columns, and that the
hot path stays inside whole-stage codegen. A plan regression (e.g.
an operator change that silently breaks pushdown) fails CI instead
of surfacing as a 100 TB incident.
"""

from streaming_data_spark.plans.checks import (
    broadcast_hint_count,
    explain_str,
    global_window_count,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "broadcast_hint_count",
    "has_broadcast_join",
    "has_whole_stage_codegen",
    "shuffle_count",
    "global_window_count",
]
