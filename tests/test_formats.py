"""Source-format breadth: the reference reads exactly one format (whole
text files); Spark reads CSV/JSON/parquet with the same downstream
plans.  Round-trip the events table through each format and re-run the
same aggregation."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from golang_mapreduce_spark.sources.fixtures import load_table


def _agg(df):
    return {
        (r["event_type"], r["n"])
        for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }


def test_csv_json_parquet_roundtrip_same_results(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    expected = _agg(events)

    base = tempfile.mkdtemp(prefix="gmrs_fmt_")
    events.write.mode("overwrite").option("header", True).csv(f"{base}/csv")
    events.write.mode("overwrite").json(f"{base}/json")
    events.write.mode("overwrite").parquet(f"{base}/parquet")

    csv_df = spark.read.option("header", True).schema(events.schema).csv(f"{base}/csv")
    json_df = spark.read.schema(events.schema).json(f"{base}/json")
    pq_df = spark.read.parquet(f"{base}/parquet")

    assert _agg(csv_df) == expected
    assert _agg(json_df) == expected
    assert _agg(pq_df) == expected
