"""One-shot round-9 baseline seeding (delete after use).

Quiet best-of-4 cache-clean minima at sf0.1 for the 16 round-9
operators, with the q6 env proxy timed first per the standing protocol;
min-merges into bench_baseline.json only when the proxy certifies a
calm-enough host (<= 1.6x of q6's recorded best).
"""
from __future__ import annotations

import json
import time

import bench
import __spark_entry__ as entry_mod
from golang_mapreduce_spark.session import get_session

NEW_OPS = [
    "graph_triangle_counts",
    "rare_ngram_uniqueness",
    "normalization_ladder",
    "char_coverage_audit",
    "session_funnel_paths",
    "token_budget_pack_plan",
    "quality_ablation_matrix",
    "centroid_drift_by_label",
    "cms_heavy_hitters",
    "lang_vocab_overlap",
    "image_phash_clusters",
    "embedding_power_iteration",
    "streaming_cms_cells",
    "streaming_upsert_snapshot",
    "hll_distinct_by_source",
    "user_activity_power_law",
]

def main() -> None:
    sf = "/root/testdata/sf0.1"
    spark = get_session(app_name="seed-r9", master="local[32]",
                        shuffle_partitions=32,
                        extra_conf={"spark.ui.enabled": "false",
                                    "spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_mod.queries()
    for w in ("file_counts", "q6_revenue_forecast", "date_funcs"):
        bench.force(q[w](spark, sf))
    spark.catalog.clearCache()
    proxy = min(bench.timed(spark, q["q6_revenue_forecast"], sf) for _ in range(3))
    with open("bench_baseline.json") as fh:
        base = json.load(fh)
    q6_best = base["best_sec"]["q6_revenue_forecast"]
    print(f"SEED proxy q6={proxy} best={q6_best} factor={round(proxy/q6_best,2)}",
          flush=True)
    results = {}
    for name in NEW_OPS:
        best = min(bench.timed(spark, q[name], sf) for _ in range(4))
        results[name] = best
        print(f"SEED {name}: {best}", flush=True)
    factor = proxy / q6_best
    if factor <= 1.6:
        for name, sec in results.items():
            prev = base["best_sec"].get(name)
            base["best_sec"][name] = min(prev, sec) if prev else sec
        base["protocol_notes"] += (
            " round 9: the 16 round-9 operators seeded from a quiet "
            f"best-of-4 cache-clean probe (q6 proxy {round(factor, 2)}x its "
            "best)."
        )
        with open("bench_baseline.json", "w") as fh:
            json.dump(base, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print("SEED merged into bench_baseline.json", flush=True)
    else:
        print("SEED host too loaded; NOT merged — rerun when calm", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
