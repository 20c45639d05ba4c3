"""Plan-quality gates for the round-8 operators — the physical
properties their 100 TB docstrings claim, locked as assertions
(tests/test_plan_quality.py style)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.dedup import neardup_pagerank
from golang_mapreduce_spark.operators.incremental import snapshot_diff
from golang_mapreduce_spark.operators.relational import dq_constraint_audit
from golang_mapreduce_spark.operators.sampling import weighted_reservoir_sample
from golang_mapreduce_spark.operators.similarity import kmeans_refine_centroids
from golang_mapreduce_spark.operators.textstats import pmi_bigrams
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_plan_quality import count_nodes


def test_weighted_reservoir_no_shuffle_no_global_sort(spark, sf_dir):
    """A-Res top-K must be TakeOrderedAndProject (per-partition heaps,
    K-row driver merge) with ZERO exchanges — a global range sort here
    would be the classic reservoir anti-plan — and the text column must
    never be read."""
    plan = formatted_plan(weighted_reservoir_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert count_nodes(plan, "Exchange") == 0, plan
    # EVERY scan's schema must exclude text, not just the first one's
    # (ADVICE r8: a future second scan would otherwise dodge the gate)
    reads = [r.split("\n")[0] for r in plan.split("ReadSchema: ")[1:]]
    assert reads and all("text" not in r for r in reads), plan


def test_snapshot_diff_prunes_and_single_outer_join(spark, sf_dir):
    """Both snapshot scans must prune to the key + compared columns
    (never the unused o_orderdate/o_orderpriority), reconciled by ONE
    sort-merge full-outer join."""
    plan = formatted_plan(snapshot_diff(spark, sf_dir))
    assert count_nodes(plan, "SortMergeJoin") == 1, plan
    assert "FullOuter" in plan, plan
    assert "o_orderdate" not in plan, plan
    assert "o_orderpriority" not in plan, plan


def test_dq_audit_scans_only_audited_columns(spark, sf_dir):
    """The fused single-table passes must prune to exactly the audited
    columns — a constraint audit that reads the whole row is the scan
    the docstring promises NOT to pay."""
    plan = formatted_plan(dq_constraint_audit(spark, sf_dir))
    reads = plan.split("ReadSchema: ")[1:]
    schemas = {r.split("\n")[0] for r in reads}
    assert "struct<l_quantity:double,l_discount:double>" in schemas, schemas
    assert "struct<c_acctbal:double>" in schemas, schemas
    # never any column the constraints don't audit
    for col in ("l_extendedprice", "c_name", "o_orderpriority"):
        assert col not in plan, col


def test_pmi_reads_only_text(spark, sf_dir):
    plan = formatted_plan(pmi_bigrams(spark, sf_dir))
    reads = plan.split("ReadSchema: ")[1:]
    assert {r.split("\n")[0] for r in reads} == {"struct<text:string>"}, plan


def test_kmeans_broadcasts_centroids_no_merge_join(spark, sf_dir):
    plan = formatted_plan(kmeans_refine_centroids(spark, sf_dir))
    assert count_nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert count_nodes(plan, "SortMergeJoin") == 0, plan


def test_pagerank_edge_list_is_reused_not_recomputed(spark, sf_dir):
    """The ids-only edge relation must feed every iteration from the
    eagerly-checkpointed relation (ADVICE r8: a lazy persist leaked a
    session-long CacheManager entry): the signature/banding subtree
    must appear ZERO times in the final plan — it ran exactly once, in
    the checkpoint job — and no CacheManager entry may remain."""
    spark.catalog.clearCache()  # attribute any leftover to THIS operator
    df = neardup_pagerank(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert plan.count("posexplode") == 0, plan
    # the leak regression itself: no lazily-registered cache survives
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "neardup_pagerank left a CacheManager entry behind"
    )
