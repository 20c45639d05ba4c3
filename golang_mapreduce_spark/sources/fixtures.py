"""Fixture-table sources.

The reference's only source is "every object in one S3 bucket, one whole
file per map task" (listAllFromS3, 6.5840/src/mr/worker.go:301-317, wired
at coordinator.go:330-339) with contents read fully into worker memory
(worker.go:326-345).  The Spark-native equivalents:

* columnar parquet scans with predicate pushdown + column pruning +
  block-level splitting (``spark.read.parquet``) — used for all fixture
  tables here;
* whole-file text corpora via ``spark.read.format("text")
  .option("wholetext", True)`` + ``input_file_name()`` for exact
  (filename, contents) parity — see :func:`read_whole_text_corpus`.

Both work identically against ``s3a://`` paths on a real cluster; the
reference's S3-as-shuffle-transport has no analog because Spark's shuffle
is internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.session import ensure_session_invariants

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy; pushdown/pruning apply at the scan.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS), which Spark's
    parquet reader rejects outright; read it as raw nanos
    (``legacy.parquet.nanosAsLong``) and truncate to microsecond
    timestamps with integer division (double division would lose
    precision above 2^53 ns).  DuckDB truncates NANOS→micros the same
    way, so oracle comparisons stay exact.
    """
    # timestamp rendering/truncation must agree with the DuckDB oracle's
    # naive-UTC timestamps regardless of the caller's session (the
    # external driver builds its own, possibly non-UTC, session)
    ensure_session_invariants(spark, events=(name == "events"))
    if name == "events":
        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def read_whole_text_corpus(spark: SparkSession, path_glob: str) -> DataFrame:
    """(filename, contents) records — exact analog of the reference's map
    input contract (one whole file per record, worker.go:127-134).

    Scale note: ``wholetext`` keeps one file per row, so a 100 TB corpus
    must be many files (as the reference also required); Spark still
    parallelizes one file per task.  For splittable corpora prefer the
    ``documents`` parquet layout.
    """
    return (
        spark.read.format("text")
        .option("wholetext", True)
        .load(path_glob)
        .select(
            F.input_file_name().alias("filename"),
            F.col("value").alias("contents"),
        )
    )
