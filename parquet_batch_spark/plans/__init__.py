from parquet_batch_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    has_partial_aggregate,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_partial_aggregate",
    "pushed_filters",
    "read_schema_columns",
]
