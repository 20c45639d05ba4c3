"""Streaming ingest triage: the stateless per-row MinHash signature
must equal the batch explode+groupBy form value-for-value, and the
drained stream-static triage must equal the batch triage verdicts."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rowwise_signature_equals_batch_signatures(spark, sf_dir):
    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.operators.dedup import (
        NUM_HASHES,
        _shingles,
        _signatures_from,
        rowwise_hashes,
        rowwise_signature,
    )
    from golang_mapreduce_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    batch = {
        r["doc_id"]: tuple(r["sig"])
        for r in _signatures_from(docs)
        .select(
            "doc_id",
            F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig"),
        )
        .collect()
    }
    rowwise = {
        r["doc_id"]: tuple(r["sig"]) if r["sig"] is not None else None
        for r in docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", _shingles(3).alias("sh"))
        .select("doc_id", rowwise_hashes("sh").alias("hs"))
        .select("doc_id", rowwise_signature("hs").alias("sig"))
        .collect()
    }
    assert batch == rowwise
    assert len(batch) > 0


def test_streaming_triage_equals_batch_triage(spark, sf_dir):
    from golang_mapreduce_spark.operators.dedup import dedup_incremental_triage
    from golang_mapreduce_spark.streaming.jobs import streaming_incremental_triage

    batch = {
        r["doc_id"]: (r["verdict"], r["match_doc_id"])
        for r in dedup_incremental_triage(spark, sf_dir).collect()
    }
    streamed = {
        r["doc_id"]: (r["verdict"], r["match_doc_id"])
        for r in streaming_incremental_triage(spark, sf_dir).collect()
    }
    assert batch == streamed
    assert len(batch) > 0
    spark.catalog.clearCache()
