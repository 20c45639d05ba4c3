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
#: queries only, so _ROUND3_WINDOW IS the round's driver window: exactly the
#: first 50 names below get a CORRECTNESS row; EVERYTHING after entry 50
#: is unchecked by the driver this round and is covered instead by the
#: mandatory local type-sensitive parity suite
#: (tests/test_oracle_parity.py, parameterized over all 125 oracle-backed
#: queries — keep it green in CI; it is the compensating gate).
#:
#: Round-3 window: (a) the six operators NEW this round (corpus
#: pipeline, int8 quantization, streaming dedup — never driver-checked),
#: (b) the four IVF/PQ-family queries whose shared centroid family
#: changed to the adaptive ~sqrt(N) step this round (r2-green, but on
#: the old code), (c) the four media queries whose fake-decode paths
#: gained SQL oracles this round (previously rows-only — never
#: value-checked by the driver), (d) knn_numpy_batched, whose default
#: path changed to per-batch local top-k this round, then (e) the
#: round-1-green cohort that round 2 rotated out — their last driver row
#: predates round 2's shared-helper changes.  The 10 stablest relational
#: shapes of that cohort (distinct/cube/rollup/join-variants/set-ops/
#: scalar/date) fell past entry 50 to make room for (a)+(b) and queue
#: for round 4, as do the final r1-green entries this list no longer
#: fits (session_windows_30m onward: streaming_tumbling_hourly,
#: lang_doc_stats, lang_id_heuristic, quality_scores, token_stats,
#: doc_fingerprints, bigram_counts, winnow_fingerprints,
#: multimodal_join, media_blob_stats, window_running_spend — everything
#: past position 50 of this list).
_ROUND3_WINDOW = [
    # (a) new this round
    "merge_upsert_orders",
    "runtime_filtered_join",
    "resample_gapfill_hourly",
    "decontaminate_docs",
    "boilerplate_ngrams",
    "source_mixture_sample",
    "packed_sequences",
    "int8_quant_topk",
    "streaming_dedup",
    "doc_perplexity",
    # (b) shared centroid family changed this round (adaptive step)
    "emb_neardup_pairs",
    "emb_neardup_multiprobe",
    "pq_codes",
    "pq_adc_topk",
    # (c) oracle-backed this round for the first time
    "image_features",
    "image_resize",
    "audio_chunk_features",
    "video_frame_sample",
    # (d) default path changed this round (per-batch local top-k)
    "knn_numpy_batched",
    # (d') added late in round 3, never driver-checked
    "lang_stopword_quality",
    "ann_ivf_adaptive",
    "clean_corpus_decontaminated",
    "streaming_packed_sequences",
    "pq_residual_topk",
    "doc_repetition_scores",
    "image_phash_pairs",
    "bm25_search",
    "shuffle_shard_manifest",
    "ivf_int8_topk",
    "source_reputation",
    "doc_perplexity_bigram",
    "retention_cohorts",
    "hard_negative_mining",
    "embedding_dim_stats",
    "training_data_run",
    # (e) round-1-green cohort, last driver-certified in r1 —
    # composite / helper-sensitive shapes first
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "dedup_minhash_pairs",
    "minhash_signatures",
    "dedup_exact",
    "knn_bruteforce",
    "ann_ivf_topk",
    "mr_wc",
    "wc",
    "indexer",
    "file_counts",
    "file_profile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_count",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "tumbling_hourly",
    "sliding_10m_5m",
    "session_windows_30m",
    "streaming_tumbling_hourly",
    "lang_doc_stats",
    "lang_id_heuristic",
    "quality_scores",
    "token_stats",
    "doc_fingerprints",
    "bigram_counts",
    "winnow_fingerprints",
    "multimodal_join",
    "media_blob_stats",
    "window_running_spend",
]

def _ordered(dicts: list[dict]) -> dict:
    merged: dict = {}
    for d in dicts:
        merged.update(d)
    out = {name: merged[name] for name in _ROUND3_WINDOW if name in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return mr_parity.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered([mod.QUERIES for mod in _MODULES])


def oracle_sql() -> dict[str, str]:
    return _ordered([mod.ORACLES for mod in _MODULES])
