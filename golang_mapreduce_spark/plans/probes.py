"""Scheduler probes — Spark analogs of the reference's non-data test apps
(jobcount/mtiming/rtiming, 6.5840/src/mrapps/{jobcount,mtiming,rtiming}.go),
which measure duplicate task execution and map/reduce parallelism rather
than computing anything over the data (SURVEY.md §2.3 Q5-Q7: excluded
from queries() by design).

Here the same observables come from Spark's own instrumentation:
accumulators count task-body executions (jobcount), and partition counts
bound available parallelism (mtiming/rtiming's "≥2 concurrent workers").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def count_task_executions(df: DataFrame) -> tuple[int, int]:
    """Run df's plan once, counting task-body executions with an
    accumulator — the analog of jobcount's marker files
    (jobcount.go:22-46).  Returns (executions, partitions); with no
    failures/speculation they are equal (at-least-once in the reference
    vs effectively-exactly-once per partition here)."""
    sc = df.sparkSession.sparkContext
    acc = sc.accumulator(0)
    rdd = df.rdd

    def count_partition(it):
        acc.add(1)
        yield sum(1 for _ in it)

    rdd.mapPartitions(count_partition).collect()
    return acc.value, rdd.getNumPartitions()


def parallelism_floor(df: DataFrame) -> int:
    """Lower bound on concurrent task slots for df's stage 0 — the
    analog of mtiming/rtiming's concurrent-worker assertion
    (test-mr.sh:146-196)."""
    sc = df.sparkSession.sparkContext
    return min(df.rdd.getNumPartitions(), sc.defaultParallelism)
