"""Plan-quality gates for the round-10 operators — the physical
properties their 100 TB docstrings claim, locked as assertions
(tests/test_plan_quality.py style)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.analytics import (
    decayed_event_counts,
    item_cooccurrence_similarity,
)
from golang_mapreduce_spark.operators.relational import benford_price_audit
from golang_mapreduce_spark.operators.sampling import source_level_split
from golang_mapreduce_spark.operators.similarity import (
    embedding_clip_calibration,
)
from golang_mapreduce_spark.operators.textstats import (
    bpe_merge_candidates,
    js_divergence_sources,
    zipf_slope_by_lang,
)
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def _read_schemas(plan: str) -> list[str]:
    return [r.split("\n")[0] for r in plan.split("ReadSchema: ")[1:]]


def test_bpe_merge_reads_text_only_and_takes_ordered(spark, sf_dir):
    """One text-only scan; the top-k compiles to TakeOrderedAndProject
    (per-partition heaps), never a global sort of the pair relation."""
    plan = formatted_plan(bpe_merge_candidates(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1 and "text" in reads[0], plan
    assert "doc_id" not in reads[0] and "source" not in reads[0], plan
    assert "TakeOrderedAndProject" in plan, plan


def test_zipf_reads_lang_and_text_only(spark, sf_dir):
    plan = formatted_plan(zipf_slope_by_lang(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads and all(
        "lang" in r and "text" in r and "doc_id" not in r for r in reads
    ), plan


def test_jsd_scans_prune_and_pair_skeleton_is_broadcast(spark, sf_dir):
    """Token scans read only (source, text); the |sources|² pair
    skeleton joins via broadcast (no cartesian product node)."""
    plan = formatted_plan(js_divergence_sources(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads and all("source" in r and "doc_id" not in r for r in reads), plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan


def test_decayed_counts_prune_and_broadcast_anchor(spark, sf_dir):
    """The main events scan reads only (ts, event_type, value), the
    anchor aggregate re-scans ts alone, and the 1-row anchor arrives by
    broadcast — no scan ever reads props or user_id."""
    plan = formatted_plan(decayed_event_counts(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 2, plan
    assert all("props" not in r and "user_id" not in r for r in reads), plan
    assert any("event_type" in r and "value" in r for r in reads), plan
    assert any(r == "struct<ts:timestamp_ntz>" for r in reads), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_item_cooc_prunes_and_pushes_click_filter(spark, sf_dir):
    """The events scan reads only the four needed columns and the
    event_type = 'click' predicate reaches the parquet scan."""
    plan = formatted_plan(item_cooccurrence_similarity(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads and all("value" not in r for r in reads), plan
    assert "PushedFilters:" in plan and "click" in plan.split(
        "PushedFilters:"
    )[1].split("\n")[0], plan


def test_source_split_scans_prune_to_split_inputs(spark, sf_dir):
    """Every scan reads at most (source, n_chars) — the 1-row total
    divisor re-scans source alone; text and doc_id never load."""
    plan = formatted_plan(source_level_split(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads, plan
    for r in reads:
        assert "source" in r and "text" not in r and "doc_id" not in r, plan


def test_benford_scans_prune_to_one_price_column_each(spark, sf_dir):
    """Each fact scan reads exactly its single monetary column and the
    x > 0 guard is pushed down."""
    plan = formatted_plan(benford_price_audit(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 2, plan
    for r in reads:
        assert ("o_totalprice" in r) ^ ("l_extendedprice" in r), plan
        assert r.count(":") <= 2, f"scan reads more than one column: {r}"
    assert "PushedFilters:" in plan, plan


def test_clip_calibration_reads_embedding_only(spark, sf_dir):
    """Column pruning must drop vec_id and label — the CDF needs only
    the embedding column."""
    plan = formatted_plan(embedding_clip_calibration(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads and all(
        "embedding" in r and "label" not in r and "vec_id" not in r
        for r in reads
    ), plan
