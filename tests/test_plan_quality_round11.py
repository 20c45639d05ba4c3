"""Plan-quality gates for the round-11 operators — the physical
properties their 100 TB docstrings claim, locked as assertions
(tests/test_plan_quality.py style)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.analytics import (
    bot_activity_heuristic,
    cohort_ltv_curves,
    customer_order_trend,
)
from golang_mapreduce_spark.operators.corpus import (
    chunk_dup_spectrum,
    context_length_sensitivity,
    rag_chunk_manifest,
)
from golang_mapreduce_spark.operators.sampling import kfold_assignment_audit
from golang_mapreduce_spark.operators.textstats import (
    hapax_richness_by_source,
    mutual_information_lang_source,
    script_mix_audit,
    source_keyness_logodds,
)
from golang_mapreduce_spark.operators.tpch_extra import supplier_hhi_by_nation
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def _read_schemas(plan: str) -> list[str]:
    return [r.split("\n")[0] for r in plan.split("ReadSchema: ")[1:]]


def test_hapax_reads_source_and_text_only(spark, sf_dir):
    """One (source, text) scan — doc_id/lang/n_chars never load; no
    joins, no windows (two keyed partial-agg'd exchanges only)."""
    plan = formatted_plan(hapax_richness_by_source(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1 and "source" in reads[0] and "text" in reads[0], plan
    assert "doc_id" not in reads[0] and "n_chars" not in reads[0], plan
    assert count_nodes(plan, "SortMergeJoin") == 0, plan
    assert count_nodes(plan, "BroadcastHashJoin") == 0, plan


def test_mutual_info_reads_labels_only(spark, sf_dir):
    """The contingency table needs (lang, source) alone — the text
    column must never reach the scan; the windows run over the
    post-aggregation cell relation, not the corpus."""
    plan = formatted_plan(mutual_information_lang_source(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1, plan
    assert "lang" in reads[0] and "source" in reads[0], plan
    assert "text" not in reads[0] and "doc_id" not in reads[0], plan


def test_customer_trend_prunes_and_never_joins(spark, sf_dir):
    """One (o_custkey, o_orderdate) scan; the OLS is two stacked
    aggregations — zero joins of any kind."""
    plan = formatted_plan(customer_order_trend(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1, plan
    assert "o_custkey" in reads[0] and "o_orderdate" in reads[0], plan
    assert "o_totalprice" not in reads[0], plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert count_nodes(plan, node) == 0, plan


def test_cohort_ltv_scans_prune_to_three_columns(spark, sf_dir):
    """Every orders scan reads at most (o_custkey, o_totalprice,
    o_orderdate) — status/priority columns never load."""
    plan = formatted_plan(cohort_ltv_curves(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads, plan
    for r in reads:
        assert "o_orderstatus" not in r and "o_orderpriority" not in r, plan
        assert "o_orderkey" not in r, plan


def test_supplier_hhi_prunes_lineitem_and_broadcasts_dims(spark, sf_dir):
    """The lineitem scan reads only (l_suppkey, l_extendedprice,
    l_discount); supplier and nation arrive by broadcast."""
    plan = formatted_plan(supplier_hhi_by_nation(spark, sf_dir))
    reads = _read_schemas(plan)
    li = [r for r in reads if "l_suppkey" in r]
    assert li and all(
        "l_quantity" not in r and "l_partkey" not in r for r in li
    ), plan
    assert count_nodes(plan, "BroadcastHashJoin") >= 2, plan
    assert count_nodes(plan, "SortMergeJoin") == 0, plan


def test_kfold_audit_reads_labels_never_text(spark, sf_dir):
    """One (doc_id, lang, source) scan — the fold comes from the id
    hash, so text never loads; the share window runs over the
    k x |langs| x |sources| cell grid."""
    plan = formatted_plan(kfold_assignment_audit(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1, plan
    assert "doc_id" in reads[0] and "lang" in reads[0], plan
    assert "text" not in reads[0] and "n_chars" not in reads[0], plan


def test_chunk_dup_spectrum_keyed_aggs_only(spark, sf_dir):
    """Manifest + two keyed aggregations — still one (doc_id, text)
    scan, no joins; the only Sort/single-partition work is the window
    total over the tens-of-rows spectrum relation."""
    plan = formatted_plan(chunk_dup_spectrum(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1 and "text" in reads[0], plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert count_nodes(plan, node) == 0, plan


def test_script_mix_reads_lang_and_text_only(spark, sf_dir):
    """One (lang, text) scan; regex counting is per-row JVM work and
    the rollup is a single keyed aggregation — no joins, no windows."""
    plan = formatted_plan(script_mix_audit(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1 and "lang" in reads[0] and "text" in reads[0], plan
    assert "doc_id" not in reads[0] and "source" not in reads[0], plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert count_nodes(plan, node) == 0, plan


def test_bot_heuristic_prunes_and_single_user_shuffle(spark, sf_dir):
    """One events scan reading only (user_id, event_id, ts) — props and
    value never load; exactly one Exchange key family (user_id) feeds
    both the lag window and the aggregate."""
    plan = formatted_plan(bot_activity_heuristic(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1, plan
    assert "user_id" in reads[0] and "ts" in reads[0], plan
    assert "props" not in reads[0] and "value" not in reads[0], plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert count_nodes(plan, node) == 0, plan


def test_keyness_broadcasts_totals_and_takes_rank(spark, sf_dir):
    """The per-source totals and the 1-row grand total arrive by
    broadcast (never a shuffled join against the vocab relation), and
    no cartesian product sneaks in via the scalar cross join."""
    plan = formatted_plan(source_keyness_logodds(spark, sf_dir))
    assert count_nodes(plan, "CartesianProduct") == 0, plan
    assert count_nodes(plan, "BroadcastExchange") >= 2, plan
    reads = _read_schemas(plan)
    assert reads and all("doc_id" not in r and "lang" not in r for r in reads), plan


def test_context_length_closed_form_never_materializes_chunks(spark, sf_dir):
    """One text-only scan, a |lengths|-row explode, one keyed rollup —
    no joins and no per-chunk relation (the closed-form claim)."""
    plan = formatted_plan(context_length_sensitivity(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1 and "text" in reads[0], plan
    assert "doc_id" not in reads[0] and "source" not in reads[0], plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert count_nodes(plan, node) == 0, plan


def test_rag_chunk_manifest_is_shuffle_free(spark, sf_dir):
    """The manifest is narrow per-row work: one (doc_id, text) scan and
    ZERO exchanges — it inherits the scan's partitioning end-to-end
    (the no-shuffle claim in the docstring, pinned)."""
    plan = formatted_plan(rag_chunk_manifest(spark, sf_dir))
    reads = _read_schemas(plan)
    assert len(reads) == 1 and "doc_id" in reads[0] and "text" in reads[0], plan
    assert count_nodes(plan, "Exchange") == 0, plan
    assert count_nodes(plan, "Sort") == 0, plan
