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
    multimodal,
    advanced,
    skew,
    corpus,
    incremental,
]

#: The external driver records correctness for the FIRST 50 registered
#: queries only, so _ROUND4_WINDOW IS the round's driver window: exactly the
#: first 50 names below get a CORRECTNESS row; EVERYTHING after entry 50
#: is unchecked by the driver this round and is covered instead by the
#: mandatory local type-sensitive parity suite
#: (tests/test_oracle_parity.py, parameterized over all 137 oracle-backed
#: queries — keep it green in CI; it is the compensating gate).
#:
#: Round-4 window (VERDICT r3 #2/#6 set the rotation): (a) the 13
#: queries that had never earned a driver row across r1-r3 — including
#: the two rows-only sketches, which can never hash-match but get the
#: driver's rows+schema check here, (b) every query whose code path
#: changed this round: the clusters_from consumers (adaptive
#: pointer-doubling rewrite), image_phash_pairs (empty-blob guard on
#: both engine and oracle), and the streaming family
#: (events_ts_layout now returns the batch-inferred type verbatim),
#: then (c) the stalest round-1 cohort — the queries whose last driver
#: row is round 1 (r2 rotated them out, r3's window filled before
#: reaching them), which also satisfies the standing ">= 15 of the r1
#: cohort per window" convention.  Round-5 leftovers (displaced when the
#: late-round-4 BLAS rewrites claimed 8 slots, or never in contention):
#: media_blob_stats, agg_cube_orders, agg_rollup_returns,
#: correlated_min_price_parts, distinct_stats,
#: join_anti_inactive_customers, join_left_order_counts,
#: join_semi_big_spenders, date_funcs (bench.py's warmup query,
#: exercised every run), set_ops_segments, scalar_funcs, the 46 queries
#: whose latest row is r2, and the six new round-4 operators
#: (balance_langs_sample, doc_length_histogram, quality_linear_score,
#: source_token_concentration, contamination_rate_by_source,
#: knn_label_vote) — all parity-covered meanwhile.
_ROUND4_WINDOW = [
    # (a) never driver-checked (VERDICT r3 item 2 list)
    "hourly_anomalies",
    "mr_indexer",
    "dup_cluster_histogram",
    "neardup_method_agreement",
    "dedup_keep_best",
    "embedding_outliers",
    "char_trigram_lang_profiles",
    "vocab_topk",
    "join_skew_diagnostics",
    "packing_efficiency",
    "scd2_customer_orders",
    "approx_percentile_prices",  # rows-only by design (sketch)
    "approx_distinct_users",     # rows-only by design (sketch)
    # (b) code path changed this round
    "neardup_clusters",          # pointer-doubling CC
    "clean_corpus",              # composes clusters_from
    "clean_corpus_decontaminated",
    "training_data_run",
    "paragraph_dedup",           # composes clusters_from
    "image_phash_pairs",         # empty-blob guard both sides
    "streaming_tumbling_hourly",  # events_ts_layout change (+ stale r1)
    "streaming_dedup",
    "streaming_packed_sequences",
    "streaming_click_attribution",
    "stateful_sessionize",
    # (b, late round 4) the BLAS rewrite of the IVF assignment pass, PQ
    # encoders, and within-cluster pair scoring changed every consumer
    # below — changed code outranks the stale cohort, so these claim the
    # window's tail slots (displacing 8 r1-stale relational shapes to
    # round 5; 19 r1-cohort entries remain, >= the 15-per-window floor)
    "ann_ivf_topk",
    "ann_ivf_adaptive",
    "pq_codes",
    "pq_adc_topk",
    "pq_residual_topk",
    "emb_neardup_pairs",
    "emb_neardup_multiprobe",
    "ivf_int8_topk",
    # (c) stalest cohort: last driver row is round 1
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "topk_orders_per_customer",
    "tumbling_hourly",
    "sliding_10m_5m",
    "session_windows_30m",
    "window_running_spend",
    "lang_doc_stats",
    "lang_id_heuristic",
    "quality_scores",
    "token_stats",
    "doc_fingerprints",
    "bigram_counts",
    "winnow_fingerprints",
    "multimodal_join",
]

def _ordered(dicts: list[dict]) -> dict:
    merged: dict = {}
    for d in dicts:
        merged.update(d)
    out = {name: merged[name] for name in _ROUND4_WINDOW if name in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return mr_parity.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _MODULES])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLES for mod in _MODULES])
