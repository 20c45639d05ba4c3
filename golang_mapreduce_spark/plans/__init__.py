from golang_mapreduce_spark.plans.checks import (
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema",
]
