"""Plan-quality gates for the round-12 operators — the physical
properties their 100 TB docstrings claim, locked as assertions
(tests/test_plan_quality.py style)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.dedup import shard_dup_manifest
from golang_mapreduce_spark.operators.similarity import (
    crossencoder_rerank_audit,
)
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def _read_schemas(plan: str) -> list[str]:
    return [r.split("\n")[0] for r in plan.split("ReadSchema: ")[1:]]


def test_shard_manifest_single_scan_no_joins(spark, sf_dir):
    """ONE (doc_id, text) scan — lang/source/n_chars never load — and
    zero joins of any kind: the group totals come from a text_hash
    window over the cell relation, not a self-join (which would
    re-scan the corpus).  Exactly three exchanges: the (hash, shard)
    aggregation, the window's text_hash repartition, and the
    {MANIFEST_SHARDS}-row rollup — every one carries hash + counters,
    never text."""
    plan = formatted_plan(shard_dup_manifest(spark, sf_dir))
    reads = _read_schemas(plan)
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
    assert count_nodes(plan, "Window") == 1, plan


def test_rerank_audit_broadcasts_queries_one_exchange(spark, sf_dir):
    """The collection is scanned once against a BROADCAST query batch
    (the knn_bruteforce shape — non-equi, so BroadcastNestedLoopJoin,
    never a shuffled join or cartesian of the collection), and the
    entire post-pool pipeline — bi_rank window, ce_rank window, final
    per-query aggregate — shares ONE query_id exchange: the expensive
    pair scorer runs inside the same partitioning the pool was ranked
    in."""
    plan = formatted_plan(crossencoder_rerank_audit(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 2, plan  # collection scan + broadcast query scan
    for r in reads:
        assert "vec_id" in r and "embedding" in r and "label" not in r, plan
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 1, plan
    assert count_nodes(plan, "BroadcastExchange") == 1, plan
    for node in ("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"):
        assert count_nodes(plan, node) == 0, plan
    assert count_nodes(plan, "Exchange") == 1, plan
    assert count_nodes(plan, "Window") == 2, plan
