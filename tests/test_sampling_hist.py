"""Histogram-threshold budget selection (VERDICT r5 #6) and topic
budgets: the mega-domain fallback must equal the window form exactly,
and its expensive window must be partitioned by (source, bucket) — the
memory-bounding property that is its reason to exist."""

from __future__ import annotations

from golang_mapreduce_spark.operators.sampling import (
    source_budget_select,
    source_budget_select_hist,
    topic_balanced_select,
)


def _rows(df):
    return sorted(
        (r["source"], r["doc_id"], r["quality_score"], r["n_toks"], r["cum_toks"])
        for r in df.collect()
    )


def test_hist_form_equals_window_form(spark, sf_dir):
    assert _rows(source_budget_select(spark, sf_dir)) == _rows(
        source_budget_select_hist(spark, sf_dir)
    )


def test_hist_form_window_partitioned_by_bucket(spark, sf_dir):
    """The per-doc running-sum window must partition by (source, qb) —
    each sort is one quality bucket of one source (~1/N_QBUCKETS of the
    stratum), never the whole stratum."""
    plan = (
        source_budget_select_hist(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # the doc-level running-sum window orders by (quality_score, doc_id);
    # its partition clause must carry the bucket column alongside source
    windows = re.findall(r"windowspecdefinition\((.*?)\)", plan)
    doc_windows = [w for w in windows if "quality_score" in w]
    assert doc_windows, plan[:2000]
    assert all(w.startswith("source") and "qb" in w for w in doc_windows)


def test_topic_budget_no_cluster_exceeds_budget(spark, sf_dir):
    from golang_mapreduce_spark.operators.sampling import TOPIC_TOKEN_BUDGET

    rows = topic_balanced_select(spark, sf_dir).collect()
    assert rows
    per_cluster: dict[int, int] = {}
    for r in rows:
        per_cluster[r["cluster"]] = max(
            per_cluster.get(r["cluster"], 0), r["cum_toks"]
        )
    assert all(v <= TOPIC_TOKEN_BUDGET for v in per_cluster.values())
    # budgets bind on the fixtures: at least one cluster near its cap
    assert max(per_cluster.values()) > TOPIC_TOKEN_BUDGET // 2


def test_topic_select_no_cartesian_no_global_sort(spark, sf_dir):
    plan = (
        topic_balanced_select(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the ranking window partitions by cluster (no empty partitionBy =
    # no single-partition global sort)
    assert "windowspecdefinition(cluster" in plan
