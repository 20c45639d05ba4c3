"""Plan-quality gates for the round-13 composed retrieval operator —
the physical properties its 100 TB docstring claims, locked as
assertions (tests/test_plan_quality.py style)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.dedup import (
    training_shard_balance_audit,
)
from golang_mapreduce_spark.operators.similarity import ivf_ce_retrieval
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def test_ivf_ce_retrieval_broadcasts_probes_no_smj(spark, sf_dir):
    """The probe relation (queries × n_probe rows, bounded by the query
    batch) is BROADCAST into the assigned-collection join, so the big
    side streams through a BroadcastHashJoin with no shuffle/sort of
    its own — the one deliberate improvement over composing
    ann_ivf_topk verbatim, whose probes⋈assign join plans as a
    SortMergeJoin pre-AQE.  Centroids stay broadcast (the ~sqrt(N)
    bound), the assignment pass is the single Arrow-batched BLAS
    MapInPandas, and the rerank stage adds only windows — never
    another join or scan of the collection."""
    plan = formatted_plan(ivf_ce_retrieval(spark, sf_dir))
    assert count_nodes(plan, "SortMergeJoin") == 0, plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan
    assert count_nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert count_nodes(plan, "MapInPandas") == 1, plan
    # probe prn + bi_rank + ce_rank (+ the assignment candidate rank)
    assert count_nodes(plan, "Window") == 4, plan
    # embeddings scans never load the label column
    for read in plan.split("ReadSchema: ")[1:]:
        head = read.split("\n")[0]
        assert "label" not in head, head


def test_shard_balance_audit_single_scan_no_joins(spark, sf_dir):
    """ONE (doc_id, text) scan — lang/source/n_chars never load — and
    zero joins of any kind: the keeper mark is a text_hash window over
    the doc rows and BOTH grand totals are unpartitioned-window sums
    over the 8-row shard rollup (never an agg + cross join back
    against the source — the user_activity_power_law defect this round
    fixed).  Exactly three exchanges: the text_hash window partition,
    the shard aggregation, and the singleton total window — every
    shuffled row carries a 32-char hash + two ints, never text."""
    plan = formatted_plan(training_shard_balance_audit(spark, sf_dir))
    reads = [r.split("\n")[0] for r in plan.split("ReadSchema: ")[1:]]
    assert len(reads) == 1, plan
    assert "doc_id" in reads[0] and "text" in reads[0], plan
    assert "lang" not in reads[0] and "source" not in reads[0], plan
    for node in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    ):
        assert count_nodes(plan, node) == 0, plan
    assert count_nodes(plan, "Exchange") == 3, plan
    assert count_nodes(plan, "Window") == 2, plan
