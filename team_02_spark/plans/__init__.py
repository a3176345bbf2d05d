from team_02_spark.plans.inspect import (
    explain_str,
    forced_broadcast_hint_count,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    uses_python_udf,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "forced_broadcast_hint_count",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "uses_python_udf",
    "wholestage_codegen_spans",
]
