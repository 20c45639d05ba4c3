"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator (SURVEY.md §2) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL per query (omitted only for genuinely
non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from golang_mapreduce_spark import mapreduce
from golang_mapreduce_spark.operators import (
    advanced,
    analytics,
    corpus,
    dedup,
    incremental,
    mr_parity,
    multimodal,
    pii,
    pipeline,
    relational,
    sampling,
    similarity,
    skew,
    temporal,
    textstats,
    tpch_extra,
    windows,
)
from golang_mapreduce_spark.streaming import jobs as streaming_jobs

_MODULES = [
    mr_parity,
    relational,
    tpch_extra,
    temporal,
    pipeline,
    sampling,
    analytics,
    windows,
    streaming_jobs,
    mapreduce,
    dedup,
    similarity,
    textstats,
    pii,
    multimodal,
    advanced,
    skew,
    corpus,
    incremental,
]

#: The external driver records correctness for the FIRST 50 registered
#: queries only, so _ROUND6_WINDOW IS the round's driver window: exactly the
#: first 50 names below get a CORRECTNESS row; EVERYTHING after entry 50
#: is unchecked by the driver this round and is covered instead by the
#: mandatory local type-sensitive parity suite
#: (tests/test_oracle_parity.py, parameterized over all oracle-backed
#: queries — keep it green in CI; it is the compensating gate).
#:
#: Round-6 window (VERDICT r5 #1/#2 set the rotation): (a) the
#: operators NEW this round — the semantic-tier flagship, topic-balanced
#: selection, the mega-domain histogram budget form (VERDICT r5 #3/#4/
#: #6); (b) queries whose CODE PATH changed this round: the two approx
#: sketches rewritten to the banded-oracle contract (VERDICT r5 #2 —
#: their first-ever hash-matchable rows), semantic_dedup_keep (ranking
#: refactored into the shared _semantic_ranked the flagship drop-set
#: also uses), training_data_run (tail factored into _mixture_temp_pack
#: shared with the semantic variant); (c) the r3-stale queries that are
#: also r1-cohort, which double-count toward the >=15 r1-cohort floor —
#: r2-stale ∩ r1-cohort is EMPTY, so the floor can only be met from
#: r3-stale and fresher cohorts; (d) r1-cohort refreshes to reach the
#: floor (15 r1-cohort entries); (e) 18 of the 33 r2-stale queries.
#: Rotation-math necessity (new code outranks stale-but-checked — the
#: ten mid-round operators claimed their slots): 15 r2-stale defer to
#: round 7, each with a fresher family member IN this window — the
#: advanced-module cohort (pivot_segment_revenue, window_order_gaps,
#: stats_summary, tfidf_top_terms, percentile_prices,
#: nested_customer_profile; module mates approx_* re-checked now),
#: label_centroids + nearest_centroid_confusion (centroid family —
#: ivf_cluster_stats exercises it), quality_calibrated (quality_scores
#: in window), ngram_jaccard_pruned (ngram_jaccard_pairs in window),
#: json_events_typed (json_events r5-fresh), range_clicks_before_error
#: (temporal family; asof_purchase_click r5-fresh),
#: q17_small_quantity_revenue + q20_promo_suppliers (q19/q14 family
#: mates fresher), ntile_customer_quartiles (window family;
#: window_range_7day_spend in window).  All fifteen stay
#: parity-covered in CI.
_ROUND6_WINDOW = [
    # (a) new this round
    "training_data_run_semantic",
    "topic_balanced_select",
    "source_budget_select_hist",
    "dup_ngram_fraction",
    "ngram_containment_pairs",
    "semantic_drop_by_source",
    "ivf_cluster_stats",
    "streaming_incremental_triage",
    "perplexity_tail_split",
    "neardup_weighted_sample",
    "emb_cos_threshold_curve",
    "quality_drift_by_batch",
    "streaming_quality_monitor",
    # (b) code path changed this round
    "approx_distinct_users",     # banded contract — first hash-matched row
    "approx_percentile_prices",  # banded contract — first hash-matched row
    "semantic_dedup_keep",
    "training_data_run",
    # (c) r3-stale ∩ r1-cohort (floor contributors)
    "file_counts",
    "file_profile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_count",
    "mr_wc",
    "dedup_exact",
    "minhash_signatures",
    "dedup_minhash_pairs",
    "ngram_jaccard_pairs",
    "knn_bruteforce",
    # (d) r1-cohort refreshes to the >=15 floor (+1 spare)
    "q5_local_supplier",
    "q6_revenue_forecast",
    "quality_scores",
    "emb_neardup_pairs",   # feeds the new semantic flagship stage
    # (e) r2-stale cohort (21 of 33; the rest defer to round 7, see above)
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q19_discounted_revenue",
    "q21_waiting_suppliers",
    "q22_dormant_rich_customers",
    "window_range_7day_spend",
    "simhash_neardup_pairs",
    "lsh_rp_topk",
    "salted_word_count",
    "salted_join_revenue",
    "hotkey_salted_join_revenue",
]

def _ordered(dicts: list[dict]) -> dict:
    merged: dict = {}
    for d in dicts:
        merged.update(d)
    out = {name: merged[name] for name in _ROUND6_WINDOW if name in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return mr_parity.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _MODULES])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLES for mod in _MODULES])
