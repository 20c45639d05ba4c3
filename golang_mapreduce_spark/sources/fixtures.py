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
from pyspark.sql.types import LongType

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to the session-TZ timestamp type.

    ``events.ts`` has shipped in two physical layouts across fixture
    generations: INT64 TIMESTAMP(NANOS) (read as raw nanos via
    ``legacy.parquet.nanosAsLong`` and truncated to micros with integer
    division — double division would lose precision above 2^53 ns) and
    plain TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ, cast to the
    session-TZ timestamp type so downstream window/interval arithmetic is
    identical either way).  The branch keys off the scan schema, so both
    generations produce the same logical column; DuckDB reads the same
    file with the same micros values, so oracle comparisons stay exact.
    """
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy; pushdown/pruning apply at the scan.

    ``events`` gets its ``ts`` column normalized across fixture physical
    layouts — see :func:`normalize_events_ts`.
    """
    # timestamp rendering/truncation must agree with the DuckDB oracle's
    # naive-UTC timestamps regardless of the caller's session (the
    # external driver builds its own, possibly non-UTC, session)
    ensure_session_invariants(spark, events=(name == "events"))
    if name == "events":
        return normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
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
