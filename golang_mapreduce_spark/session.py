"""SparkSession factory with scale-oriented defaults.

The reference hard-codes its execution envelope (NReduce=10,
6.5840/src/main/mrcoordinator.go:23; one whole file per map task,
6.5840/src/mr/coordinator.go:337-339).  Here partitioning is dynamic:
AQE re-plans shuffle partition counts / skew splits at runtime, parquet
scans split on maxPartitionBytes, and all sizing knobs are config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for local[N] testing but expressed as ratios/absolutes
#: that transfer to a multi-executor cluster: AQE owns runtime partition
#: counts, so shuffle.partitions is only an upper seed; 128 MB scan splits
#: match HDFS/S3 block sizing at any scale.
DEFAULT_CONF = {
    # Adaptive execution: runtime coalescing, skew-join splitting, and
    # dynamic join-strategy switching — the scale levers the reference
    # lacks entirely (static 10-bucket reduce, no skew handling).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic session semantics for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet is INT64 TIMESTAMP(NANOS); read as raw nanos (see
    # sources/fixtures.load_table, which truncates to micros exactly).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for every pandas UDF / mapInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scan-side: pushdown + pruning must reach the parquet reader.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    # Speculative re-execution of stragglers — the Spark-native form of
    # the reference's 10 s straggler timer (coordinator.go:194-231).
    "spark.speculation": "false",  # off in local mode; enable on clusters
}


def get_session(
    app_name: str = "golang-mapreduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    cluster master is configured externally; on a real cluster leave it to
    spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else (cpus or 32)
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
