#!/usr/bin/env python
"""Round-15 start: quiet best-of-5 adjudication of the 7 BENCH_r14
driver-gate flags (VERDICT r14 #5), q6-proxy bracketed — the standing
protocol from SCALE.md r13/r14.  Emits one JSON blob for the SCALE.md
adjudication table."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from golang_mapreduce_spark.session import get_session  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from bench import force, timed  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
FLAGS = [
    "clean_corpus",
    "incremental_triage_materialized",
    "neardup_weighted_sample",
    "ngram_containment_pairs",
    "rfm_segments",
    "simhash_signatures",
    "split_leakage_audit",
]


def main() -> None:
    spark = get_session(
        app_name="gmrs-adjudicate-r15",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    best = json.load(open("/root/repo/bench_baseline.json"))["best_sec"]

    for warm in ("file_counts", "q6_revenue_forecast", "date_funcs"):
        force(queries[warm](spark, SF_DIR))
    spark.catalog.clearCache()

    def proxy(n=3):
        return [timed(spark, queries["q6_revenue_forecast"], SF_DIR) for _ in range(n)]

    out = {"proxy_best": best.get("q6_revenue_forecast"), "pre_proxy": proxy()}
    runs: dict[str, list[float]] = {name: [] for name in FLAGS}
    # interleave rounds (not 5 consecutive shots per query) so one load
    # burst cannot poison a single query's whole sample
    for _ in range(5):
        for name in FLAGS:
            runs[name].append(timed(spark, queries[name], SF_DIR))
    out["post_proxy"] = proxy()
    out["flags"] = {
        name: {
            "runs": rs,
            "min": min(rs),
            "best": best.get(name),
            "raw_x_at_min": round(min(rs) / best[name], 3) if best.get(name) else None,
        }
        for name, rs in runs.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
