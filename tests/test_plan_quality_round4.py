"""Plan-quality assertions for the round-4 operator batch — the
".explain and iterate" loop as code, per tests/test_plan_quality.py.
Each test pins the property that makes the operator survive scale:
column pruning on the scan, shuffle counts, broadcast placement."""

from __future__ import annotations

from golang_mapreduce_spark.operators.corpus import source_token_concentration
from golang_mapreduce_spark.operators.multimodal import blob_exact_dedup
from golang_mapreduce_spark.operators.sampling import balance_langs_sample
from golang_mapreduce_spark.operators.textstats import (
    doc_length_histogram,
    quality_linear_score,
    sentence_stats,
    subword_sample_stats,
)
from golang_mapreduce_spark.plans.checks import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    read_schema,
)
from tests.test_plan_quality import count_nodes


def test_quality_linear_score_prunes_and_never_shuffles(spark, sf_dir):
    """The hashed-feature scorer is a pure projection: zero exchanges,
    and the scan reads only the columns the score needs."""
    df = quality_linear_score(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_nodes(plan, "Exchange") == 0, plan
    schemas = read_schema(df)
    assert schemas and all(
        set(s.split(",")[0] for s in [sch]) for sch in schemas
    )
    joined = ",".join(schemas)
    assert "text" in joined and "n_chars" not in joined and "source" not in joined


def test_sentence_stats_single_stage(spark, sf_dir):
    df = sentence_stats(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_nodes(plan, "Exchange") == 0, plan
    joined = ",".join(read_schema(df))
    assert "n_chars" not in joined and "source" not in joined


def test_subword_sample_stats_single_stage(spark, sf_dir):
    df = subword_sample_stats(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_nodes(plan, "Exchange") == 0, plan


def test_blob_dedup_partial_aggregation(spark, sf_dir):
    """Two HashAggregates around one Exchange — map-side combine on the
    digest, so the shuffle carries one row per distinct blob per map
    partition, never the blob bytes."""
    df = blob_exact_dedup(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_nodes(plan, "HashAggregate") >= 2, plan
    assert count_nodes(plan, "Exchange") == 1, plan


def test_balance_langs_rate_side_broadcasts(spark, sf_dir):
    """The per-lang rate table reaches the scan side as a broadcast —
    the sample itself must stay a map-side filter with no shuffle of
    document rows."""
    df = balance_langs_sample(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = executed_plan(df)
    # exchanges exist only under the tiny aggregate subtrees feeding the
    # broadcast; the probe side (documents scan -> filter) must not
    # re-partition, i.e. no Exchange between the parquet scan of the
    # full documents table and the join.  Cheap proxy: the join itself
    # is a BroadcastHashJoin, never SortMergeJoin.
    assert "SortMergeJoin" not in plan, plan


def test_doc_length_histogram_prunes_text(spark, sf_dir):
    """The histogram needs lang + n_chars only — text (the wide column)
    must be pruned from the scan."""
    df = doc_length_histogram(spark, sf_dir)
    joined = ",".join(read_schema(df))
    assert "n_chars" in joined and "text" not in joined


def test_source_concentration_single_wide_aggregate(spark, sf_dir):
    """One exchange for the per-source aggregate; the ranking windows
    run over the aggregate-small relation (single-partition exchange is
    acceptable there), and text is read only for token counting."""
    df = source_token_concentration(spark, sf_dir)
    plan = executed_plan(df)
    assert count_nodes(plan, "SortMergeJoin") == 0, plan
