"""Production IVF path: KMeans|| (pyspark.ml) learns the coarse
centroids, then the exact same probe/search shape as ann_ivf_topk runs
against them.  Learned centroids beat the deterministic data-row
centroids on recall; this test asserts the full ML-clustering → IVF
pipeline works and recalls at least as well as a random assignment
would.  Test-only: KMeans convergence isn't bit-stable across
environments, so it stays out of the driver's oracle contract."""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _cos,
    _emb,
    knn_bruteforce,
)

N_CLUSTERS = 10
N_PROBE = 3


def test_kmeans_ivf_pipeline_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    vecs = emb.select("vec_id", "emb", array_to_vector("emb").alias("features"))
    km = KMeans(k=N_CLUSTERS, seed=42, featuresCol="features", predictionCol="cluster")
    model = km.fit(vecs)
    assign = model.transform(vecs).select("vec_id", "emb", "cluster")

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cluster", "c_emb"],
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cluster"))
    probes = (
        q.join(F.broadcast(centers))
        .select("query_id", "q_emb", "cluster", _cos("q_emb", "c_emb").alias("csim"))
        .withColumn("prn", F.row_number().over(pw))
        .where(F.col("prn") <= N_PROBE)
        .select("query_id", "q_emb", "cluster")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    approx = (
        probes.join(assign, "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), _cos("q_emb", "emb").alias("sim"))
        .select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= TOP_K)
        .collect()
    )
    exact = knn_bruteforce(spark, sf_dir).collect()

    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets: dict[int, set] = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    assert set(approx_sets) == set(exact_sets)
    recalls = [
        len(exact_sets[qid] & approx_sets[qid]) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # probing 3/10 learned clusters must far exceed the 30% random floor
    assert mean_recall >= 0.4, f"mean recall {mean_recall}"
