"""Vector math over ``array<float>`` embedding columns — pure JVM-side
higher-order functions (no Python UDF in the hot path).

``F.aggregate`` folds left-to-right, so the floating-point summation order
is deterministic; similarity values are rounded (default 6 dp) before any
ranking/threshold so the DuckDB oracle — whose own fold order may differ by
at most ~1e-14 — lands on identical rounded values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column, digits: int = 6) -> Column:
    """Rounded cosine similarity of two double-array columns."""
    return F.round(dot(a, b) / (l2_norm(a) * l2_norm(b)), digits)


def as_double_array(col: Column | str) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")
