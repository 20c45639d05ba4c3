"""Structured Streaming layer — incremental versions of the window
operators.

The reference has no streaming at all (one M→R round per job, SURVEY.md
§2.4); Spark supplies incremental execution, state stores, and exactly-once
sinks.  The jobs here read the events fixture as a *file stream* so the
exact same aggregation logic runs incrementally; watermarks bound state.

Design at scale: the file source is a stand-in for Kafka — swap
``readStream.parquet`` for ``readStream.format("kafka")`` and everything
downstream is unchanged.  Watermark = max tolerated lateness; state store
size is (open windows × keys); ``availableNow`` drains a backlog with
bounded batches.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from golang_mapreduce_spark.operators.relational import _dec

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (ts: nanos → micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )


def hourly_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental tumbling-window aggregation with a late-data watermark.
    In append mode only windows older than the watermark emit (exactly
    the late-data semantics the reference cannot express)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("wstart"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr(f"CAST(SUM({_dec('value')}) AS DOUBLE)").alias("sum_value"),
        )
    )


def run_stream_to_batch(result: DataFrame, spark: SparkSession) -> DataFrame:
    """Drain a streaming aggregation with trigger(availableNow) into an
    in-memory table and return it as a batch DataFrame.  ``complete``
    output mode emits every window regardless of watermark position, so a
    fully-drained stream equals the batch query over the same files."""
    name = "s_" + uuid.uuid4().hex[:12]
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gmrs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- driver-contract queries -------------------------------------------

def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling_hourly query executed through Structured Streaming
    end-to-end (file stream → stateful window agg → memory sink); its
    drained output must equal the batch oracle."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_batch(hourly_counts_stream(events), spark)


def stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom arbitrary-state sessionization (applyInPandasWithState)
    drained over the events fixture.  Emits every session closed by a
    gap within the drained data; sessions still open at stream end stay
    in state (append-mode semantics), so this is a rows-only check —
    cross-batch correctness is asserted in
    tests/test_stateful_streaming.py against the batch oracle."""
    import uuid

    from golang_mapreduce_spark.streaming.stateful import sessionize_with_state

    events = read_events_stream(spark, sf_dir)
    name = "sess_" + uuid.uuid4().hex[:12]
    q = (
        sessionize_with_state(events)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gmrs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# oracle identical to the batch tumbling query: a drained complete-mode
# stream over the same files must produce the same table.
from golang_mapreduce_spark.operators.windows import TUMBLING_SQL  # noqa: E402

QUERIES = {
    "streaming_tumbling_hourly": streaming_tumbling_hourly,
    "stateful_sessionize": stateful_sessionize,
}
ORACLES = {"streaming_tumbling_hourly": TUMBLING_SQL}
