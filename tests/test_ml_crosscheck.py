"""Cross-validate the hand-rolled MinHash/LSH dedup against Spark ML's
MinHashLSH (pyspark.ml.feature): different hash families, same Jaccard
signal — pairs our implementation scores as near-duplicates must also
surface in ML's approxSimilarityJoin at the matching distance threshold."""

from __future__ import annotations

import pytest

from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import functions as F

from golang_mapreduce_spark.functions.text import ws_words
from golang_mapreduce_spark.operators.dedup import (
    MINHASH_EST_THRESHOLD,
    _shingles,
    dedup_minhash_pairs,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def test_minhash_pairs_agree_with_spark_ml(spark, sf_dir):
    ours = dedup_minhash_pairs(spark, sf_dir)
    strong = {
        (r["doc_a"], r["doc_b"])
        for r in ours.where(F.col("est_jaccard") >= 0.5).collect()
    }
    if not strong:
        pytest.skip("fixture has no strong near-dup pairs at this SF")

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", _shingles(3).alias("sh"))
    )
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True)
    model = cv.fit(docs)
    vecs = model.transform(docs).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=16, seed=7)
    lsh_model = lsh.fit(vecs)
    # jaccard distance 0.5 == jaccard similarity 0.5
    ml_pairs = {
        (min(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]),
         max(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]))
        for r in lsh_model.approxSimilarityJoin(vecs, vecs, 0.5).collect()
        if r["datasetA"]["doc_id"] != r["datasetB"]["doc_id"]
    }
    found = strong & ml_pairs
    assert len(found) >= len(strong) * 0.8, (
        f"only {len(found)}/{len(strong)} strong pairs confirmed by ML LSH"
    )
