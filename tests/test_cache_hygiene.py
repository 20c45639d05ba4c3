"""Iterative operators must not leak executor storage: each label-
propagation round drops the previous round's cache and truncates lineage
every 3 rounds (VERDICT r1 #5 — unbounded persist growth at 100×)."""

from __future__ import annotations

from golang_mapreduce_spark.operators import dedup


def test_neardup_clusters_bounded_persist(spark, sf_dir):
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    out = dedup.neardup_clusters(spark, sf_dir)
    assert out.count() > 0
    after = jsc.getPersistentRDDs().size()
    # edges + minhash signature subtree + final round's labels — NOT one
    # entry per propagation round (the leak this test pins down)
    assert after - before <= 6, f"persisted RDDs grew by {after - before}"
