"""knn_numpy_batched's per-batch local top-k cut (the 100 TB shuffle fix;
VERDICT r2 'What's wrong' #1) must not change results: the cut keeps
TOP_K+KNN_BATCH_SLACK candidates per query per Arrow batch, and the
global top-k over those equals the exhaustive / JVM-fold answers
row-for-row.
"""

from __future__ import annotations

import math

from golang_mapreduce_spark.operators.similarity import (
    KNN_BATCH_SLACK,
    N_QUERIES,
    TOP_K,
    knn_batched_scored,
    knn_bruteforce,
    knn_numpy_batched,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_local_topk_equals_bruteforce(spark, sf_dir):
    got = _rows(knn_numpy_batched(spark, sf_dir))
    want = _rows(knn_bruteforce(spark, sf_dir))
    assert got == want


def test_local_topk_equals_exhaustive(spark, sf_dir):
    got = _rows(knn_numpy_batched(spark, sf_dir))
    want = _rows(knn_numpy_batched(spark, sf_dir, exhaustive=True))
    assert got == want


def test_emission_bounded_by_batches(spark, sf_dir):
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    scored = knn_batched_scored(spark, sf_dir)
    n_parts = scored.rdd.getNumPartitions()
    # Arrow batches are at most maxRecordsPerBatch rows (default 10000)
    per_batch = int(
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    max_batches = n_parts * math.ceil(n_vecs / n_parts / per_batch)
    bound = max_batches * N_QUERIES * (TOP_K + KNN_BATCH_SLACK)
    emitted = scored.count()
    assert emitted <= bound
    # and the cut actually cut: strictly fewer rows than the exhaustive
    # N x Q emission (minus self-pairs)
    exhaustive = N_QUERIES * (n_vecs - 1)
    assert emitted < exhaustive
