"""Write-path layout operators: partitioned datasets, bucketed tables,
and small-file compaction.

The reference's layout story is "one S3 object per map task, names carry
the structure" (mr-X-Y, coordinator.go:77-91).  At 100 TB the layout IS
the query plan: a date-partitioned, key-bucketed parquet dataset gives
partition pruning (scan only matching directories) and shuffle-free
joins (tests/test_bucketing.py) before a single operator runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write: one directory per partition
    value; readers prune directories from predicates on the partition
    columns (PartitionFilters in the scan, no data files opened)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    out_path: str | None = None,
) -> None:
    """Small-file compaction: rewrite a parquet dataset into
    ``target_files`` files.  Uses coalesce (narrow, no shuffle) — the
    maintenance job every object-store table needs once streaming or
    fine-grained writes fragment it.  At scale, run per partition and
    size target_files = partition_bytes / 128 MB.  Note: coalesce can
    only DECREASE the file count — asking for more files than input
    partitions is a silent cap (use repartition to split)."""
    df = spark.read.parquet(path)
    df.coalesce(target_files).write.mode("overwrite").parquet(out_path or f"{path}__compacted")


def partition_file_counts(spark: SparkSession, path: str) -> DataFrame:
    """Files per partition directory — the observability query behind
    compaction decisions."""
    df = spark.read.parquet(path)
    return (
        df.select(F.input_file_name().alias("file"))
        .distinct()
        .select(F.regexp_extract("file", r"^(.*)/[^/]+$", 1).alias("dir"))
        .groupBy("dir")
        .agg(F.count("*").alias("n_files"))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a dataset as globally-shuffled, deterministic training
    shards: rows are ordered by the md5 hash of their id (a reproducible
    "random" permutation — same order on any cluster, any partitioning,
    any engine), range-partitioned into ``num_shards`` shard files, each
    sorted by the hash so shard contents AND intra-shard order are a
    pure function of the data.  This is the epoch-order materialization
    step of a training pipeline: downstream loaders read shards
    sequentially and still see hash-shuffled data.

    Scale: one range-partitioned exchange (Spark samples the hash range)
    + a sort within each shard; ``max_records_per_file`` caps file size
    for object-store-friendly chunks without changing order (files
    within a shard stay lexically ordered by part number).
    """
    from golang_mapreduce_spark.functions.hashing import hash32

    keyed = df.withColumn("__shuffle_key", hash32(F.col(id_col).cast("string")))
    out = (
        keyed.repartitionByRange(num_shards, "__shuffle_key")
        .sortWithinPartitions("__shuffle_key")
        .drop("__shuffle_key")
    )
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
