"""Plan-quality gates for the round-15 subtree-reuse wave 2
(VERDICT r14 #2/#6) and the shared probe-walk factor (#3).

Budgets were measured at sf0.1 with caches populated; the tiny test SF
can only plan fewer scans.  ``plan.count("ReadSchema: ")`` includes the
scan lines inside an InMemoryRelation's STORED plan display (not
re-executed), so budgets are upper bounds on the display count, with
the real regression catcher being the drop from the round-14 audit
numbers (DSIR 10 scans → 2, brand_basket_lift 10 scans / 3 SMJ →
2 / 1 inherent, ann_recall_at_k 8 / 2 → 1 / 0, pq_residual_topk
8 scans / 3 live MapInPandas → one live encode pass over the cached
residual relation)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.corpus import (
    dsir_importance_weights,
    dsir_topk_selection,
)
from golang_mapreduce_spark.operators.similarity import (
    ann_recall_at_k,
    pq_residual_topk,
)
from golang_mapreduce_spark.operators.tpch_extra import brand_basket_lift
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def _populated_plan(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    caches = df._gmrs_shared_caches
    assert caches, fn.__name__
    for c in caches:
        c.count()
    return formatted_plan(df)


def test_dsir_single_tokenization_pass(spark, sf_dir):
    """Both DSIR ops derive docb/tcnt/scnt/ttot/stot from ONE persisted
    (doc_id, b, cnt) aggregate: the corpus text is tokenized once
    (measured 10 scans → 2 at sf0.1; the second ReadSchema line is the
    cached relation's stored display), the bucket stats re-group the
    cache, and no join sorts anything."""
    for fn in (dsir_importance_weights, dsir_topk_selection):
        spark.catalog.clearCache()
        try:
            plan = _populated_plan(spark, fn, sf_dir)
            assert "InMemoryTableScan" in plan, (fn.__name__, plan)
            assert plan.count("ReadSchema: ") <= 2, (fn.__name__, plan)
            assert count_nodes(plan, "SortMergeJoin") == 0, (fn.__name__, plan)
            assert count_nodes(plan, "CartesianProduct") == 0, (fn.__name__, plan)
        finally:
            spark.catalog.clearCache()


def test_brand_basket_lift_persisted_baskets_broadcast_counts(spark, sf_dir):
    """The DISTINCT basket relation is persisted for its four consumers
    (measured 10 scans → 2 at sf0.1) and the |brands|-row per-brand
    count joins broadcast — the ONLY join allowed to merge-sort is the
    okey self-join that generates candidate pairs (inherent; AQE may
    broadcast even that at tiny SF, hence <= 1 not == 1)."""
    spark.catalog.clearCache()
    try:
        plan = _populated_plan(spark, brand_basket_lift, sf_dir)
        assert "InMemoryTableScan" in plan, plan
        assert plan.count("ReadSchema: ") <= 2, plan
        assert count_nodes(plan, "SortMergeJoin") <= 1, plan
        assert count_nodes(plan, "BroadcastHashJoin") >= 2, plan
        assert count_nodes(plan, "CartesianProduct") == 0, plan
    finally:
        spark.catalog.clearCache()


def test_ann_recall_at_k_single_scan_no_smj(spark, sf_dir):
    """The exact top-k side is persisted (it previously executed the
    whole brute-force scan twice — once for hits, once for the
    denominator) and the shared emb projection collapses the exact AND
    approximate subtrees to ONE embeddings read (measured 8 scans /
    2 SMJs → 1 / 0 at sf0.1); both recall joins broadcast their
    bounded sides."""
    spark.catalog.clearCache()
    try:
        df = ann_recall_at_k(spark, sf_dir)
        assert len(df._gmrs_shared_caches) == 2  # shared_emb + exact
        for c in df._gmrs_shared_caches:
            c.count()
        plan = formatted_plan(df)
        assert "InMemoryTableScan" in plan, plan
        assert plan.count("ReadSchema: ") <= 1, plan
        assert count_nodes(plan, "SortMergeJoin") == 0, plan
        assert count_nodes(plan, "CartesianProduct") == 0, plan
    finally:
        spark.catalog.clearCache()


def test_pq_residual_topk_persists_residual_relation(spark, sf_dir):
    """VERDICT r14 #6: the residual relation feeds three consumers
    (codebook collect, encode pass, LUT side) and previously re-ran
    the BLAS assignment pass for each; it is now persisted, so the
    plan reads the cache from BOTH remaining consumers and the only
    LIVE MapInPandas is the encode pass (the other MapInPandas node
    ids sit inside the InMemoryRelation's stored display).  Nothing
    merge-sorts."""
    spark.catalog.clearCache()
    try:
        plan = _populated_plan(spark, pq_residual_topk, sf_dir)
        assert count_nodes(plan, "InMemoryTableScan") >= 2, plan
        assert plan.count("ReadSchema: ") <= 5, plan
        assert count_nodes(plan, "SortMergeJoin") == 0, plan
        assert count_nodes(plan, "CartesianProduct") == 0, plan
    finally:
        spark.catalog.clearCache()
