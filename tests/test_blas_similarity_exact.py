"""Exactness pins for the round-4 BLAS similarity paths: each BLAS
candidate-emit + JVM-final-rank operator must equal a straightforward
JVM reference implementation (the pre-rewrite plan shape) bit-for-bit —
on the real fixtures AND on adversarial synthetic inputs (exact
duplicate vectors, centroid-identical vectors) where tie handling does
the deciding.  Complements tests/test_knn_batched.py, which pins the
same argument for the KNN path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_mapreduce_spark.operators.similarity import (
    NEARDUP_COS,
    PQ_SUBDIM,
    PQ_SUBSPACES,
    _centroids,
    _cluster_pair_scores,
    _cos,
    _emb,
    _ivf_assign,
    _l2sq,
    _pq_codes_from,
    _sub,
)


def _jvm_assign(emb, cent, n_probe=1):
    """Reference implementation: the pre-rewrite pure-JVM assignment
    (broadcast join + rounded-cosine window rank)."""
    aw = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        emb.join(cent)
        .select("vec_id", "emb", F.col("cid"), _cos("emb", "c_emb").alias("csim"))
        .withColumn("arn", F.row_number().over(aw))
        .where(F.col("arn") <= n_probe)
        .select("vec_id", F.col("cid").alias("cluster"))
    )


def _jvm_pq_codes(emb, cent):
    """Reference implementation: the pre-rewrite pure-JVM PQ encoding."""
    per_code = emb.join(cent).select(
        "vec_id",
        "cid",
        *[
            F.expr(_l2sq(_sub("emb", s), _sub("c_emb", s))).alias(f"d{s}")
            for s in range(PQ_SUBSPACES)
        ],
    )
    aggs = [
        F.expr(f"min_by(cid, struct(d{s}, cid))").alias(f"code{s}")
        for s in range(PQ_SUBSPACES)
    ]
    return per_code.groupBy("vec_id").agg(*aggs)


def _with_adversarial_rows(spark, emb):
    """Fixture embeddings + rows engineered to stress tie-breaking:
    exact duplicates of existing vectors (equal sims must cut by id) and
    exact copies of centroid rows (distance exactly 0 in every ranking)."""
    base = emb.collect()
    step = max(1, len(base) // 4)
    extra = [
        (10_000 + i, list(base[i * step]["emb"]), base[i * step]["label"])
        for i in range(4)
    ]
    dup = spark.createDataFrame(extra, emb.schema)
    return emb.unionByName(dup)


@pytest.fixture(scope="module")
def adversarial_emb(spark, sf_dir):
    return _with_adversarial_rows(spark, _emb(spark, sf_dir)).cache()


@pytest.mark.parametrize("n_probe", [1, 2])
def test_blas_assign_equals_jvm_reference(spark, sf_dir, adversarial_emb, n_probe):
    emb = adversarial_emb
    cent = _centroids(emb)
    got = sorted(
        (r["vec_id"], r["cluster"])
        for r in _ivf_assign(emb, cent, n_probe=n_probe)
        .select("vec_id", "cluster")
        .collect()
    )
    want = sorted(
        (r["vec_id"], r["cluster"])
        for r in _jvm_assign(emb, cent, n_probe=n_probe).collect()
    )
    assert got == want


def test_blas_pq_codes_equal_jvm_reference(spark, sf_dir, adversarial_emb):
    emb = adversarial_emb
    cent = _centroids(emb)
    key = lambda r: r["vec_id"]  # noqa: E731
    got = sorted((tuple(r) for r in _pq_codes_from(emb, cent).collect()))
    want = sorted((tuple(r) for r in _jvm_pq_codes(emb, cent).collect()))
    assert got == want


def test_cluster_pair_scores_equal_jvm_reference(spark, sf_dir, adversarial_emb):
    """The per-cluster gram-matrix pairs (rounded JVM-side) must equal
    the old self-join + fold form, including on duplicate vectors whose
    cosine is exactly 1."""
    emb = adversarial_emb
    assign = _ivf_assign(emb, _centroids(emb)).cache()
    got = sorted(
        (r["cluster"], r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in _cluster_pair_scores(assign)
        .select(
            "cluster", "vec_a", "vec_b",
            F.round(F.col("cos_raw"), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= NEARDUP_COS)
        .collect()
    )
    a = assign.select(
        "cluster", F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a")
    )
    b = assign.select(
        "cluster", F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b")
    )
    want = sorted(
        (r["cluster"], r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("cluster", "vec_a", "vec_b", _cos("emb_a", "emb_b").alias("cos_sim"))
        .where(F.col("cos_sim") >= NEARDUP_COS)
        .collect()
    )
    assert got
    assert got == want
    assign.unpersist()
