"""Plan-quality gates for the round-14 IVF broadcast retrofit
(VERDICT r13 #1): the probe relation — queries × n_probe rows, bounded
by the query batch, never the collection — must BROADCAST into the
probed-cluster join in every member of the IVF family, so the big
assigned-collection side streams through a BroadcastHashJoin instead
of the SortMergeJoin AQE picked pre-retrofit (2 SMJs survived the AQE
final plan in ann_ivf_topk at sf0.1; at 100× that sorts the entire
assigned collection per query batch).  ivf_ce_retrieval proved the
broadcast form (similarity.py:3269, pinned in
tests/test_plan_quality_round13.py); these pins lock the retrofit."""

from __future__ import annotations

from golang_mapreduce_spark.operators.similarity import (
    ann_ivf_adaptive,
    ann_ivf_topk,
    ivf_int8_topk,
)
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def test_ann_ivf_topk_broadcasts_probes_no_smj(spark, sf_dir):
    """Zero SortMergeJoins: the only equi-joins are probes⋈assign
    (probes broadcast) — the collection side is never sorted.  The
    query×centroid probe scoring is a BroadcastNestedLoopJoin over
    queries × ~sqrt(N) rows, bounded by construction."""
    plan = formatted_plan(ann_ivf_topk(spark, sf_dir))
    assert count_nodes(plan, "SortMergeJoin") == 0, plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan
    assert count_nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert count_nodes(plan, "MapInPandas") == 1, plan


def test_ann_ivf_adaptive_broadcasts_probes_no_smj(spark, sf_dir):
    """Same pin for the mass-adaptive variant: its probe walk adds
    broadcast joins for sizes/total but must introduce no SMJ."""
    plan = formatted_plan(ann_ivf_adaptive(spark, sf_dir))
    assert count_nodes(plan, "SortMergeJoin") == 0, plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan
    assert count_nodes(plan, "BroadcastHashJoin") >= 1, plan


def test_ivf_probe_recall_curve_no_smj(spark, sf_dir):
    """The round-14 probe-budget tuning table: truth (queries × k),
    the walk, the C-row size census, and the C-row hit histogram are
    all broadcast, and the ints-only assignment relation is persisted
    for its two consumers — NO join in the plan sorts anything and the
    BLAS assignment pass executes once (both consumers read the
    InMemoryRelation once the cache is populated)."""
    from golang_mapreduce_spark.operators.similarity import (
        ivf_probe_recall_curve,
    )

    spark.catalog.clearCache()
    try:
        df = ivf_probe_recall_curve(spark, sf_dir)
        for c in df._gmrs_shared_caches:  # populate emb + assign caches
            c.count()
        plan = formatted_plan(df)
        assert count_nodes(plan, "SortMergeJoin") == 0, plan
        assert count_nodes(plan, "CartesianProduct") == 0, plan
        assert count_nodes(plan, "BroadcastHashJoin") >= 3, plan
        assert "InMemoryTableScan" in plan, plan
        # the persisted emb projection collapses the four emb subtrees
        # (truth, walk, centroids, assignment input) to ONE parquet read
        assert plan.count("ReadSchema: ") <= 1, plan
    finally:
        spark.catalog.clearCache()


def test_lsh_threshold_sweep_grid_is_broadcast(spark, sf_dir):
    """The 16-row threshold grid must broadcast into the theta join
    against the bounded calibration pair relation (BNLJ over a
    broadcast build side — constant 16× fan-out, never a shuffle of
    the pairs for the grid), and the sweep adds no sort-merge work
    beyond what the certified calibration subtree already plans."""
    from golang_mapreduce_spark.operators.dedup import lsh_threshold_sweep

    spark.catalog.clearCache()
    try:
        plan = formatted_plan(lsh_threshold_sweep(spark, sf_dir))
        assert count_nodes(plan, "BroadcastNestedLoopJoin") >= 1, plan
        assert count_nodes(plan, "CartesianProduct") == 0, plan
        # calibration's inherited shape only — the sweep itself joins
        # nothing merge-sorted (1 SMJ at sf0.1 comes from the certified
        # est⋈exact pair join inside minhash_calibration)
        assert count_nodes(plan, "SortMergeJoin") <= 1, plan
    finally:
        spark.catalog.clearCache()


def test_second_wave_persists_share_subtrees(spark, sf_dir):
    """Round-14 second wave of the subtree-reuse discipline:
    ann_ivf_adaptive persists its assignment relation (three consumers
    — size census, mass target, probed search — one BLAS pass instead
    of three: 8 scans → 4 at sf0.1); ivf_int8_topk persists the coded
    relation (two consumers — its own docstring's 'the codes ARE what
    you persist' made literal: 8 scans → 6);
    pipeline_drop_attribution persists its quality-score and
    exact-dup-keeper marker relations (two consumers each: 12 scans →
    9).  Each op exposes the caches via _gmrs_shared_caches and every
    populated plan must show the in-memory substitution."""
    from golang_mapreduce_spark.operators.pipeline import (
        pipeline_drop_attribution,
    )
    from golang_mapreduce_spark.operators.similarity import (
        ann_ivf_adaptive,
        ivf_int8_topk,
    )

    # scan budgets measured at sf0.1 (tiny test SF can only be lower)
    budgets = {
        ann_ivf_adaptive: 4,
        ivf_int8_topk: 6,
        pipeline_drop_attribution: 9,
    }
    spark.catalog.clearCache()
    try:
        for fn, budget in budgets.items():
            df = fn(spark, sf_dir)
            caches = df._gmrs_shared_caches
            assert caches, fn.__name__
            for c in caches:
                c.count()  # populate
            plan = formatted_plan(df)
            assert "InMemoryTableScan" in plan, (fn.__name__, plan)
            scans = plan.count("ReadSchema: ")
            assert scans <= budget, (fn.__name__, scans, plan)
            spark.catalog.clearCache()
    finally:
        spark.catalog.clearCache()


def test_recall_audits_share_one_emb_scan(spark, sf_dir):
    """VERDICT r13 #4: ann_rank_quality / quant_tier_recall used to
    re-derive the (vec_id, emb, label) projection per tier — 17
    parquet scans, ReusedExchange 0 at sf0.1.  Each op now persists
    the shared projection once and the cache manager substitutes the
    InMemoryRelation into all five tier subtrees: measured 17 scans →
    1 and wall 13.4 s → 4.2 s at sf0.1, oracle parity unchanged.  The
    plan must show the in-memory substitution and at most ONE parquet
    read of embeddings; cache is cleared after so no other test's
    plan pins see the cached relation."""
    from golang_mapreduce_spark.operators.similarity import (
        ann_rank_quality,
        quant_tier_recall,
    )

    spark.catalog.clearCache()  # attribute cache effects to THIS op
    try:
        for fn in (quant_tier_recall, ann_rank_quality):
            df = fn(spark, sf_dir)
            df._gmrs_shared_caches[0].count()  # populate the cache
            plan = formatted_plan(df)
            assert "InMemoryTableScan" in plan, plan
            scans = plan.count("ReadSchema: ")
            assert scans <= 1, f"{fn.__name__}: {scans} parquet scans\n{plan}"
            spark.catalog.clearCache()
    finally:
        spark.catalog.clearCache()


def test_ivf_int8_topk_single_residual_smj(spark, sf_dir):
    """The int8 composition keeps AT MOST one SortMergeJoin —
    assign⋈coded on vec_id (N⋈N; at 100 TB cluster and codes are
    written side by side at ingest so it is co-partitioned, never a
    sort of the serving path; at the tiny test SF AQE broadcasts even
    this join, hence <= 1 not == 1 — it is 1 at sf0.1).  The probes
    join and the query-code join are both broadcast; pre-retrofit the
    probes join was a second SMJ that sorted the whole coded
    collection."""
    plan = formatted_plan(ivf_int8_topk(spark, sf_dir))
    assert count_nodes(plan, "SortMergeJoin") <= 1, plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan
    assert count_nodes(plan, "BroadcastHashJoin") >= 2, plan
