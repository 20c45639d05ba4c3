"""Structural invariants for the round-8 operators (oracle parity is
covered by the parameterized tests/test_oracle_parity.py sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.corpus import seq_len_bucket_histogram
from golang_mapreduce_spark.operators.dedup import (
    REVIEW_PER_DECILE,
    pair_review_sample,
)
from golang_mapreduce_spark.operators.pipeline import (
    pipeline_drop_attribution,
    training_data_run,
)
from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    binary_quant_topk,
)
from golang_mapreduce_spark.sources.fixtures import load_table

STAGES = {
    "quality", "exact_dup", "near_dup", "eval_slice",
    "contaminated", "mixture", "temperature", "kept",
}


def test_funnel_partitions_the_corpus(spark, sf_dir):
    """Every document lands in exactly one stage, and the 'kept' mass is
    exactly the flagship run's survivor set — attribution and pipeline
    can never disagree."""
    fun = pipeline_drop_attribution(spark, sf_dir).collect()
    assert {r["stage"] for r in fun} <= STAGES
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in fun) == n_total
    n_kept = sum(r["n_docs"] for r in fun if r["stage"] == "kept")
    n_run = (
        training_data_run(spark, sf_dir).select("doc_id").distinct().count()
    )
    assert n_kept == n_run
    spark.catalog.clearCache()


def test_seq_len_buckets_are_powers_of_two(spark, sf_dir):
    rows = seq_len_bucket_histogram(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        b = r["bucket_toks"]
        assert b <= 1 or (b & (b - 1)) == 0, f"bucket {b} not a power of 2"
        assert r["n_padding"] >= 0
        assert 0.0 <= r["pad_frac"] < 1.0


def test_pair_review_stratification(spark, sf_dir):
    rows = pair_review_sample(spark, sf_dir).collect()
    per_decile: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["decile"] <= 9
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        # the sample row sits in the decile it claims
        assert min(int(r["est_jaccard"] * 10), 9) == r["decile"]
        per_decile.setdefault(r["decile"], []).append(r["sample_rank"])
    for dec, ranks in per_decile.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= REVIEW_PER_DECILE
    spark.catalog.clearCache()


def test_binary_quant_shape_and_two_stage_consistency(spark, sf_dir):
    rows = binary_quant_topk(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES * TOP_K
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
    spark.catalog.clearCache()


def test_quant_tier_recall_bounds(spark, sf_dir):
    from golang_mapreduce_spark.operators.similarity import quant_tier_recall

    rows = {r["tier"]: r for r in quant_tier_recall(spark, sf_dir).collect()}
    assert set(rows) == {"ivf", "int8", "pq_adc", "binary"}
    for r in rows.values():
        assert r["n_returned"] == N_QUERIES * TOP_K
        assert 0 <= r["n_hits"] <= r["n_returned"]
        assert 0.0 <= r["recall_at_k"] <= 1.0
    spark.catalog.clearCache()


def test_dup_graph_degrees_account_for_every_doc_and_edge(spark, sf_dir):
    from golang_mapreduce_spark.operators.dedup import (
        dedup_minhash_pairs,
        dup_graph_degree_stats,
    )

    hist = dup_graph_degree_stats(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in hist) == n_docs
    # handshake lemma: sum(degree * count) == 2 * |pairs|
    n_pairs = dedup_minhash_pairs(spark, sf_dir).count()
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * n_pairs
    spark.catalog.clearCache()


def test_binary_quant_exact_copy_ranks_first(spark, sf_dir):
    """A vector bit-identical to the query has Hamming 0 and cosine 1.0:
    it must survive the candidate stage and take rank 1."""
    emb = load_table(spark, sf_dir, "embeddings")
    import tempfile

    d = tempfile.mkdtemp(prefix="gmrs_binq_")
    clone = emb.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    emb.unionByName(clone).write.mode("overwrite").parquet(
        f"{d}/embeddings.parquet"
    )
    rows = binary_quant_topk(spark, d).collect()
    top1 = [r for r in rows if r["query_id"] == 0 and r["rank"] == 1][0]
    assert top1["neighbor_id"] == 1_000_000
    assert top1["hamming"] == 0 and top1["sim"] == 1.0
    spark.catalog.clearCache()
