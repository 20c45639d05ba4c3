#!/usr/bin/env python
"""Headline-query benchmark.

Runs a representative slice of the engine (MR-parity, relational joins,
windows, dedup, similarity, text analysis) at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with a noop write (full computation, no
driver-side collection cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golang_mapreduce_spark.session import get_session  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

HEADLINE = [
    "wc",
    "indexer",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q10_returned_items",
    "topk_orders_per_customer",
    "window_running_spend",
    "tumbling_hourly",
    "session_windows_30m",
    "json_events",
    "dedup_exact",
    "minhash_signatures",
    "dedup_minhash_pairs",
    "simhash_signatures",
    "knn_bruteforce",
    "ann_ivf_topk",
    "quality_scores",
    "doc_fingerprints",
    "ngram_jaccard_pairs",
    "neardup_clusters",
    "tfidf_top_terms",
    "stats_summary",
    "pivot_segment_revenue",
    "salted_join_revenue",
]

#: Operators added after round 1 — timed separately so the 26-query
#: HEADLINE list (and its suite total) stays per-query comparable with
#: BENCH_r01.
EXTRA = [
    "q2_min_cost_supplier",
    "paragraph_dedup",
    "simhash_neardup_pairs",
    "quality_calibrated",
    "image_resize",
    "label_centroids",
    "nearest_centroid_confusion",
    "hotkey_salted_join_revenue",
    "ann_recall_at_k",
    "lsh_rp_topk",
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_customer_distribution",
    "q16_supplier_counts",
    "q19_discounted_revenue",
    "q21_waiting_suppliers",
    "asof_purchase_click",
    "range_clicks_before_error",
    "emb_neardup_pairs",
    "stateful_sessionize",
    "clean_corpus",
    "pq_adc_topk",
    "bpe_token_stats",
    "ngram_jaccard_pruned",
    "hash_sample_docs",
    "window_range_7day_spend",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: Per-query regression gate.  Absolute wall-clock swings uniformly with
#: machine load (round 2 measured the identical round-1 code at 1.18x its
#: round-1 time under driver load; re-run quiet, both were ~36.4 s), so a
#: raw threshold would flag the environment, not the plan.  Normalize it
#: away: compute each query's ratio vs the best recorded time
#: (bench_baseline.json), divide by the suite's MEDIAN ratio (the
#: environment factor), and flag only queries whose *normalized* ratio
#: exceeds the threshold — a per-query plan regression moves one query
#: against the suite; load moves them all together.
REGRESSION_THRESHOLD = 1.3


def regression_check(timings: dict[str, float]) -> dict:
    import statistics

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_baseline.json")
    try:
        best = json.load(open(path))["best_sec"]
    except (OSError, KeyError, ValueError):
        return {"checked": False, "flagged": {}}
    ratios = {
        k: t / best[k] for k, t in timings.items() if k in best and best[k] > 0
    }
    if not ratios:
        return {"checked": False, "flagged": {}}
    env_factor = statistics.median(ratios.values())
    flagged = {
        k: {
            "sec": timings[k],
            "best_sec": best[k],
            "normalized_ratio": round(r / env_factor, 3),
        }
        for k, r in ratios.items()
        if r / env_factor > REGRESSION_THRESHOLD
    }
    return {
        "checked": True,
        "env_factor": round(env_factor, 3),
        "flagged": flagged,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="gmrs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # JVM/codegen/scan warmup on cheap queries touching each fact table
    # so the first timed query doesn't pay one-time boot costs.
    for warm in ("file_counts", "q6_revenue_forecast", "date_funcs"):
        force(queries[warm](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    extra: dict[str, float] = {}
    for name in EXTRA:
        t0 = time.perf_counter()
        force(queries[name](spark, sf_dir))
        extra[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = sf_dir
    gate = regression_check({**timings, **extra})
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_extra": extra,
                "sf": sf,
                "regression_gate": gate,
            }
        )
    )
    spark.stop()
    if gate["flagged"] and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        sys.exit(1)


if __name__ == "__main__":
    main()
