"""Warm-minimum scale probe over scalegen fixtures.

Automates the SCALE.md measurement protocol (round-3 drift rules: the
sandbox host stalls make single shots lie, so every number is the MIN
of ``runs`` warm executions after one untimed warmup, caches cleared
between runs).  Typical use — the perturbed 10×/100× pair-mass probe:

    python -m golang_mapreduce_spark.tools.scaleprobe \
        --names split_leakage_audit,quality_by_dup_class \
        --k 10,100 --perturb

writes one JSON line per (k, query) with the warm minimum, plus the
wall ratio between successive k values per query.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def probe(
    spark,
    names: list[str],
    src_dir: str,
    k: int,
    perturb: bool,
    runs: int = 2,
) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from golang_mapreduce_spark.tools import scalegen

    suffix = f"sf{k}" + ("p" if perturb else "")
    out_dir = os.path.join(tempfile.gettempdir(), f"gmrs_{suffix}")
    t0 = time.perf_counter()
    scalegen.generate(spark, src_dir, out_dir, k=k, perturb=perturb)
    print(f"# fixtures {out_dir}: {time.perf_counter() - t0:.1f}s")
    queries = entry_mod.queries()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for i in range(runs + 1):  # run 0 is the untimed warmup
            t0 = time.perf_counter()
            queries[name](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = time.perf_counter() - t0
            if i > 0:
                best = min(best, sec)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(json.dumps({"k": k, "query": name, "warm_min_sec": out[name]}))
    return out


def main() -> None:  # pragma: no cover - CLI
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--k", default="10,100")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--perturb", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--driver-mem", default="48g")  # k=100 parquet writers OOM below ~48g
    args = ap.parse_args()

    from golang_mapreduce_spark.session import get_session

    spark = get_session(
        app_name="gmrs-scaleprobe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": args.driver_mem,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names.split(",")
    results: dict[int, dict[str, float]] = {}
    ks = [int(x) for x in args.k.split(",")]
    for k in ks:
        results[k] = probe(spark, names, args.src, k, args.perturb, args.runs)
    for a, b in zip(ks, ks[1:]):
        for name in names:
            if results[a].get(name) and results[b].get(name):
                print(json.dumps({
                    "query": name,
                    f"ratio_{b}x_over_{a}x": round(
                        results[b][name] / results[a][name], 2
                    ),
                }))
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
