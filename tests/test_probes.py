from __future__ import annotations

from golang_mapreduce_spark.plans.probes import count_task_executions, parallelism_floor
from golang_mapreduce_spark.sources.fixtures import load_table


def test_task_executions_match_partitions(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").repartition(6)
    executions, partitions = count_task_executions(df)
    assert partitions == 6
    assert executions == partitions  # no duplicate execution locally


def test_parallelism_at_least_two(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").repartition(4)
    assert parallelism_floor(df) >= 2
