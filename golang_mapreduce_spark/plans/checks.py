"""Physical-plan introspection helpers — the ".explain and iterate"
feedback loop as code, so plan properties (pushdown, pruning, broadcast)
are asserted in tests instead of eyeballed.

The reference has no optimizer at all (SURVEY.md §4.1: whole files are
always shipped to the UDF, no pruning, no pushdown); these checks prove
the rebuild actually gets the Catalyst behaviors the design relies on.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan string (pre-execution; AQE final plan may differ)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') text — unlike toString(), scan attributes
    (PushedFilters, ReadSchema) are NOT truncated here."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def read_schema(df: DataFrame) -> list[str]:
    """Column sets read by each FileScan (column pruning evidence)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists per FileScan (predicate pushdown evidence)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)
