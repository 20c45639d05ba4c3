"""Scale-up fixture generator for benchmarking beyond the shipped SFs.

The shipped testdata tops out at sf0.1, where every headline query
finishes in <4 s and fixed overhead hides plan differences (VERDICT r2
#6).  This derives an sf~1 volume by unioning k offset-keyed replicas of
the sf0.1 FACT tables (lineitem, orders, events, documents, embeddings)
while keeping the dimension tables as-is: primary keys are offset per
replica so uniqueness survives; foreign keys into dimensions are left
unchanged, so each dim key simply gains k× the fact rows — exactly the
fan-out growth a real scale-up produces.  FOR PERFORMANCE RUNS ONLY:
replicated text/embedding payloads make dedup/similarity answers
degenerate (every doc has k-1 exact copies), which is itself a useful
worst-case for the dedup family, but no correctness oracle applies here.

Generation is one narrow Spark job per table (union of k column-offset
selects — no shuffle, no python), ~a minute at k=10 on local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.session import ensure_session_invariants
from golang_mapreduce_spark.sources.fixtures import load_table

#: key columns that must stay unique across replicas, per fact table
_FACT_OFFSET_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_DIMS = ["region", "nation", "customer", "supplier", "part"]

#: offset stride between replicas — far above any key at sf0.1
KEY_STRIDE = 100_000_000


def generate(
    spark: SparkSession, src_dir: str, out_dir: str, k: int = 10
) -> None:
    """Write a k-times scaled copy of src_dir's tables into out_dir.
    Idempotent via a completion marker; safe to call from bench.py."""
    marker = os.path.join(out_dir, f"_SCALED_x{k}")
    if os.path.exists(marker):
        return
    ensure_session_invariants(spark, events=True)  # legacy-nanos events read
    os.makedirs(out_dir, exist_ok=True)
    for name in _DIMS:
        load_table(spark, src_dir, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name, keys in _FACT_OFFSET_KEYS.items():
        # read the raw file (no ts normalization) so the scaled dir keeps
        # the source's physical layout and reads back through the same
        # layout-adaptive load_table branch as the original
        base = spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))
        replicas = []
        for i in range(k):
            rep = base
            for key in keys:
                rep = rep.withColumn(
                    key, F.col(key) + F.lit(i * KEY_STRIDE)
                )
            replicas.append(rep)
        out = replicas[0]
        for rep in replicas[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok\n")
