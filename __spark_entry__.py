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
#: queries only, so _ROUND5_WINDOW IS the round's driver window: exactly the
#: first 50 names below get a CORRECTNESS row; EVERYTHING after entry 50
#: is unchecked by the driver this round and is covered instead by the
#: mandatory local type-sensitive parity suite
#: (tests/test_oracle_parity.py, parameterized over all oracle-backed
#: queries — keep it green in CI; it is the compensating gate).
#:
#: Round-5 window (VERDICT r4 #1 sets the rotation): (a) the 13
#: round-4 operators that have never earned a driver row (added after
#: the r4 window froze, per the rotate-after-recording convention) —
#: with these recorded, every query registered through round 4 has at
#: least one driver row across r1-r5; (b) the operators NEW this round
#: (PII stats/redaction, SemDeDup-style semantic dedup, event-sequence
#: n-gram mining — VERDICT r4 #2/#5/#6), so no new-op driver debt
#: carries into round 6; (c) queries whose code path changed this
#: round: vocab_topk (TakeOrderedAndProject rewrite, VERDICT r4 #3),
#: training_data_run (temperature-rebalance stage composed in, VERDICT
#: r4 #4), knn_numpy_batched (zero-norm mask in the shared batched
#: scorer, ADVICE r4; its other consumers matryoshka_recall /
#: knn_label_vote are already in (a)); (d) the 8 relational shapes the
#: late-r4 BLAS batch displaced plus the other 3 queries whose last row
#: is round 1; (e) r1-cohort refreshes (json_events,
#: simhash_signatures, wc, indexer) bringing the window's r1-cohort
#: count to exactly the >=15 floor; then (f) the 7 alphabetically
#: first of the r2-stale cohort (the late-round operator batch — DSIR,
#: budget selection, normalized dedup, novelty curve, incremental
#: triage, BPE fertility, streaming PII, DSIR top-k — claimed 8 of
#: the 15 (f) slots; new code outranks stale-but-checked cohorts).
#: Round-6 leftovers: the remaining 33 r2-stale queries
#: (hotkey_salted_join_revenue through window_range_7day_spend, plus
#: q1x TPC-H shapes), all parity-covered meanwhile.
_ROUND5_WINDOW = [
    # (a) never driver-checked: the 13 late-round-4 operators
    "temperature_rebalance_sample",  # also changed: temp_rates refactor
    "balance_langs_sample",
    "event_transition_matrix",
    "minhash_calibration",       # also changed: est persist (ADVICE r4)
    "knn_label_vote",
    "matryoshka_recall",         # also changed: zero-prefix guard
    "doc_length_histogram",
    "quality_linear_score",
    "sentence_stats",
    "subword_sample_stats",
    "blob_exact_dedup",
    "source_token_concentration",
    "contamination_rate_by_source",
    # (b) new this round
    "pii_rates",
    "pii_redacted_sample",
    "semantic_dedup_keep",
    "event_ngram_patterns",
    "dsir_importance_weights",
    "source_budget_select",
    "dedup_normalized",
    "ngram_novelty_curve",
    "dedup_incremental_triage",
    "bpe_fertility_by_lang",
    "streaming_pii_rates",
    "dsir_topk_selection",
    # (c) code path changed this round
    "vocab_topk",
    "training_data_run",
    "knn_numpy_batched",
    # (d) stalest cohort: last driver row is round 1
    "agg_cube_orders",
    "agg_rollup_returns",
    "correlated_min_price_parts",
    "date_funcs",
    "distinct_stats",
    "join_anti_inactive_customers",
    "join_left_order_counts",
    "join_semi_big_spenders",
    "media_blob_stats",
    "scalar_funcs",
    "set_ops_segments",
    # (e) r1-cohort refreshes (floor: >= 15 r1-cohort entries/window)
    "json_events",
    "simhash_signatures",
    "wc",
    "indexer",
    # (f) oldest r2-stale cohort (alphabetical prefix; rest to round 6)
    "ann_recall_at_k",
    "asof_purchase_click",
    "bpe_token_stats",
    "dataset_split_counts",
    "funnel_conversion",
    "grouping_sets_orders",
    "hash_sample_docs",
]

def _ordered(dicts: list[dict]) -> dict:
    merged: dict = {}
    for d in dicts:
        merged.update(d)
    out = {name: merged[name] for name in _ROUND5_WINDOW if name in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return mr_parity.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _MODULES])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLES for mod in _MODULES])
