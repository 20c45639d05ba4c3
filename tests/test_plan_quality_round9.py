"""Plan-quality gates for the round-9 operators — the physical
properties their 100 TB docstrings claim, locked as assertions
(tests/test_plan_quality.py style)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.analytics import session_funnel_paths
from golang_mapreduce_spark.operators.corpus import token_budget_pack_plan
from golang_mapreduce_spark.operators.pipeline import quality_ablation_matrix
from golang_mapreduce_spark.operators.relational import fuzzy_key_join_customers
from golang_mapreduce_spark.operators.textstats import (
    char_coverage_audit,
    cms_heavy_hitters,
    hll_distinct_by_source,
)
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def _read_schemas(plan: str) -> list[str]:
    return [r.split("\n")[0] for r in plan.split("ReadSchema: ")[1:]]


def test_pack_plan_single_scan_single_exchange(spark, sf_dir):
    """One text scan, ONE exchange: the window partitions on source and
    the (source, shard) rollup reuses that partitioning (subset rule) —
    a second shuffle here would be the anti-plan the docstring rules
    out."""
    plan = formatted_plan(token_budget_pack_plan(spark, sf_dir))
    assert len(_read_schemas(plan)) == 1, plan
    assert count_nodes(plan, "Exchange") == 1, plan


def test_ablation_scans_prune_to_flag_inputs(spark, sf_dir):
    """Every scan reads only (n_chars, text) — the flag inputs — and the
    cube shows up as one Expand over a single-scan subtree per branch."""
    plan = formatted_plan(quality_ablation_matrix(spark, sf_dir))
    reads = _read_schemas(plan)
    assert reads and all(
        "n_chars" in r and "text" in r and "doc_id" not in r for r in reads
    ), plan
    assert "Expand" in plan, plan


def test_char_coverage_reads_only_lang_and_text(spark, sf_dir):
    plan = formatted_plan(char_coverage_audit(spark, sf_dir))
    assert set(_read_schemas(plan)) == {"struct<text:string,lang:string>"} or set(
        _read_schemas(plan)
    ) == {"struct<lang:string,text:string>"}, plan


def test_funnel_paths_topk_is_take_ordered(spark, sf_dir):
    """The final top-k must be TakeOrderedAndProject (per-partition
    heaps), never a global sort of the path relation; the sessionize
    window and the per-session aggregate share the user_id exchange."""
    plan = formatted_plan(session_funnel_paths(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert count_nodes(plan, "Exchange") <= 2, plan


def test_fuzzy_join_pushes_key_cutoff_to_scan(spark, sf_dir):
    """The FUZZY_KEY_LIM predicate must reach the parquet scan as a
    pushed filter — variant explosion over unfiltered keys would read
    the whole dimension for nothing."""
    plan = formatted_plan(fuzzy_key_join_customers(spark, sf_dir))
    assert "PushedFilters" in plan, plan
    pushed = [
        seg.split("\n")[0]
        for seg in plan.split("PushedFilters: ")[1:]
    ]
    assert any("c_custkey" in p and "LessThan" in p for p in pushed), pushed


def test_sketches_read_only_their_columns(spark, sf_dir):
    """Both sketch builders prune to exactly what they hash."""
    cms = formatted_plan(cms_heavy_hitters(spark, sf_dir))
    assert set(_read_schemas(cms)) == {"struct<text:string>"}, cms
    hll = formatted_plan(hll_distinct_by_source(spark, sf_dir))
    for r in _read_schemas(hll):
        fields = r.removeprefix("struct<").removesuffix(">")
        cols = set(fields.split(",")) if fields else set()
        # empty-schema scans (count-only branches) are maximal pruning
        assert cols <= {"text:string", "source:string"}, hll
