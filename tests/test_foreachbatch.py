"""foreachBatch sink: the escape hatch for exactly-once delivery into
systems without a native streaming sink.  Pattern under test: complete-
mode aggregation + idempotent overwrite per micro-batch (replays of a
batch converge to the same target state); the final target must equal
the batch aggregation."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from golang_mapreduce_spark.sources.fixtures import load_table
from golang_mapreduce_spark.streaming.jobs import EVENTS_SCHEMA


def test_foreachbatch_idempotent_overwrite(spark, sf_dir):
    target = tempfile.mkdtemp(prefix="gmrs_febs_") + "/agg"
    seen_batches: list[int] = []

    def upsert(batch_df, batch_id: int):
        # idempotent: complete-mode batch carries the full aggregate, so
        # a replayed batch_id rewrites the same state
        seen_batches.append(batch_id)
        batch_df.write.mode("overwrite").parquet(target)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gmrs_ckpt_"))
        .queryName("febs_" + uuid.uuid4().hex[:8])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert seen_batches, "foreachBatch never invoked"
    got = {(r["event_type"], r["n"]) for r in spark.read.parquet(target).collect()}
    expected = {
        (r["event_type"], r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected
