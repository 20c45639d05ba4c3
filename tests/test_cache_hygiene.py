"""Cache-lifecycle hygiene.

1. Iterative operators must not leak executor storage: each label-
   propagation round drops the previous round's cache and truncates
   lineage every 3 rounds (VERDICT r1 #5 — unbounded persist growth at
   100×).
2. REGISTRY-WIDE handle accounting (VERDICT r14 #4): every operator
   that persists a subtree its lazy result re-reads must expose the
   handles via ``with_shared_caches`` so eager callers can release
   exactly what it registered.  The round-15 sweep
   (tools/cache_accounting_sweep.py) measured every batch registry
   query (the 15 streaming_ jobs drive their own lifecycles and are
   skipped): of the 250 swept ops, 206 register nothing (round 16
   moved tfidf_top_terms, doc_perplexity, doc_perplexity_bigram and
   perplexity_tail_split into the handle census; round 17 added
   image_phash_pairs), the 41
   HANDLE_OPS below account for every persist, and the three
   SELF_MANAGED graph ops release
   their own caches and keep only localCheckpoint blocks (which the
   catalog cannot release by design — the ContextCleaner reclaims
   them when the result is dropped)."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry_mod
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
    spark.catalog.clearCache()


#: Every registry operator that exposes cache handles — the round-15
#: accounting sweep's full census.  A new persist site must either join
#: this list (and pass the equality below) or SELF_MANAGED (and justify
#: itself); test_every_persisting_op_is_accounted enforces that at the
#: source level.
HANDLE_OPS = [
    "ann_ivf_adaptive",
    "ann_rank_quality",
    "ann_recall_at_k",
    "brand_basket_lift",
    "clean_corpus",
    "clean_corpus_decontaminated",
    "containment_bottomk_pairs",
    "cross_source_dup_matrix",
    "dedup_incremental_triage",
    "dedup_keep_best",
    "dedup_minhash_pairs",
    # r16: perplexity ops persist their (doc_id, token/pair, cnt)
    # aggregate (tokenize once — the dsir docb pattern); the tail split
    # propagates doc_perplexity's handle
    "doc_perplexity",
    "doc_perplexity_bigram",
    "perplexity_tail_split",
    "dsir_importance_weights",
    "dsir_topk_selection",
    "dup_graph_degree_stats",
    "image_phash_clusters",
    # r17: the pHash signature relation (3 longs/image) is persisted
    # across the pair builder's four branches (band self-join + both
    # Hamming verify sides) — the Python decode pass runs once
    "image_phash_pairs",
    "incremental_triage_materialized",
    "ivf_int8_topk",
    "ivf_mass_recall_curve",
    "ivf_probe_recall_curve",
    "lsh_threshold_sweep",
    "minhash_calibration",
    "neardup_clusters",
    "neardup_method_agreement",
    "neardup_weighted_sample",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pruned",
    "pair_review_sample",
    "pipeline_drop_attribution",
    "pq_residual_topk",
    "quality_by_dup_class",
    "quant_tier_recall",
    "simhash_neardup_pairs",
    "split_leakage_audit",
    # r16: tfidf derives df from the persisted tf relation (corpus
    # tokenized once instead of twice; the DISTINCT exchange is gone)
    "tfidf_top_terms",
    "training_data_run",
    "training_data_run_semantic",
]

#: Ops that manage their own caches: they release the composed handle
#: caches eagerly (release_shared_caches after an eager
#: localCheckpoint) and keep only checkpoint RDD blocks, which
#: DataFrame.unpersist cannot touch — so they expose NO handles.
SELF_MANAGED = {
    "neardup_pagerank",
    "graph_triangle_counts",
    "graph_kcore_membership",
}


def _persistent_ids(jsc) -> set[int]:
    return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}


def test_cache_handles_account_for_every_persist_registry_wide(spark, sf_dir):
    """For every handle-bearing op: the SET of persistent-RDD ids grown
    by a collect equals one per exposed handle, and releasing via the
    handles removes exactly those ids.  Set-difference, not size
    deltas: the ContextCleaner GCs stale checkpoint RDDs from earlier
    tests at arbitrary times, which made size-based accounting flaky
    (two spurious mismatches in the round-15 sweep were exactly this).
    """
    queries = entry_mod.queries()
    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    for name in HANDLE_OPS:
        before = _persistent_ids(jsc)
        df = queries[name](spark, sf_dir)
        df.collect()
        handles = df._gmrs_shared_caches
        assert handles, name
        new = _persistent_ids(jsc) - before
        assert len(new) == len(handles), (name, sorted(new), len(handles))
        for h in handles:
            h.unpersist(blocking=True)
        leftover = _persistent_ids(jsc) & new
        assert not leftover, (name, sorted(leftover))
    spark.catalog.clearCache()


def test_self_managed_graph_ops_expose_no_handles(spark, sf_dir):
    queries = entry_mod.queries()
    for name in sorted(SELF_MANAGED):
        df = queries[name](spark, sf_dir)
        df.collect()
        assert getattr(df, "_gmrs_shared_caches", ()) == (), name
    spark.catalog.clearCache()


def test_every_persisting_op_is_accounted():
    """Source-level completeness backstop: any registry operator whose
    own body calls .persist( or .localCheckpoint( must be in HANDLE_OPS
    or SELF_MANAGED — a future persist cannot silently skip the
    accounting above.  (Ops that COMPOSE persisting helpers don't match
    here; the runtime equality test is their gate.)"""
    queries = entry_mod.queries()
    for name, fn in queries.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if ".persist(" in src or ".localCheckpoint(" in src:
            assert name in HANDLE_OPS or name in SELF_MANAGED or name.startswith(
                "streaming_"
            ), f"{name} persists but is not accounted"
