"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator (SURVEY.md §2) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL per query (omitted only for genuinely
non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from golang_mapreduce_spark import mapreduce
from golang_mapreduce_spark.operators import (
    advanced,
    dedup,
    mr_parity,
    multimodal,
    relational,
    similarity,
    skew,
    textstats,
    windows,
)
from golang_mapreduce_spark.streaming import jobs as streaming_jobs

_MODULES = [
    mr_parity,
    relational,
    windows,
    streaming_jobs,
    mapreduce,
    dedup,
    similarity,
    textstats,
    multimodal,
    advanced,
    skew,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return mr_parity.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
