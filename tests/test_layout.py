"""Write-path layout: partition pruning must reach the scan (directories
skipped, PartitionFilters populated), and compaction must actually
reduce file counts without changing data."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from golang_mapreduce_spark.plans.checks import formatted_plan
from golang_mapreduce_spark.sources.fixtures import load_table
from golang_mapreduce_spark.sources.layout import (
    compact,
    partition_file_counts,
    write_partitioned,
)


def test_partitioned_write_prunes_at_scan(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="gmrs_layout_") + "/orders_by_year"
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned(orders, base, ["order_year"])

    # physical layout: one directory per year
    years = sorted(glob.glob(base + "/order_year=*"))
    assert len(years) >= 5, years

    pruned = spark.read.parquet(base).where(F.col("order_year") == 1997)
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1][:200]
    # row parity with a non-partitioned filter
    expected = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1997)
        .count()
    )
    assert pruned.count() == expected


def test_compaction_reduces_files_preserves_rows(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="gmrs_compact_")
    src = base + "/fragmented"
    load_table(spark, sf_dir, "customer").repartition(16).write.parquet(src)
    n_before = len(glob.glob(src + "/part-*"))
    assert n_before == 16

    out = base + "/compacted"
    compact(spark, src, target_files=2, out_path=out)
    n_after = len(glob.glob(out + "/part-*"))
    assert n_after == 2
    assert (
        spark.read.parquet(out).count()
        == load_table(spark, sf_dir, "customer").count()
    )

    counts = {r["dir"]: r["n_files"] for r in partition_file_counts(spark, out).collect()}
    assert sum(counts.values()) == 2


def test_ivf_cluster_partitioned_layout_prunes(spark, sf_dir):
    """The IVF write-path claim made in operators/similarity.py: assign
    once at ingest, write cluster as a partition column, and a probe
    query scans ONLY its probed partitions (PartitionFilters, not a
    full-collection scan)."""
    from golang_mapreduce_spark.operators.similarity import (
        _centroids,
        _emb,
        _ivf_assign,
    )

    emb = _emb(spark, sf_dir)
    assign = _ivf_assign(emb, _centroids(emb))
    base = tempfile.mkdtemp(prefix="gmrs_ivf_") + "/emb_by_cluster"
    write_partitioned(
        assign.select("vec_id", "emb", "cluster"), base, ["cluster"]
    )

    clusters = sorted(glob.glob(base + "/cluster=*"))
    assert len(clusters) >= 2, clusters

    # probing one cluster must prune to its directory
    one = assign.select("cluster").limit(1).collect()[0]["cluster"]
    probed = spark.read.parquet(base).where(F.col("cluster") == one)
    plan = formatted_plan(probed)
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1][:200]
    assert probed.count() == assign.where(F.col("cluster") == one).count()


def test_training_shards_deterministic_order(spark, sf_dir, tmp_path):
    """Shard contents and intra-shard order must be a pure function of
    the data: two writes agree file-by-file, rows are hash-ordered, and
    every shard is non-trivially filled."""
    import glob

    from golang_mapreduce_spark.functions.hashing import hash32
    from golang_mapreduce_spark.sources.fixtures import load_table
    from golang_mapreduce_spark.sources.layout import write_training_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for path in (a, b):
        write_training_shards(docs, path, id_col="doc_id", num_shards=4)

    files_a = sorted(glob.glob(f"{a}/part-*.parquet"))
    assert len(files_a) == 4
    total = 0
    for fa, fb in zip(files_a, sorted(glob.glob(f"{b}/part-*.parquet"))):
        rows_a = [r["doc_id"] for r in spark.read.parquet(fa).collect()]
        rows_b = [r["doc_id"] for r in spark.read.parquet(fb).collect()]
        assert rows_a == rows_b  # deterministic across writes
        keys = [
            r["h"]
            for r in spark.read.parquet(fa)
            .select(hash32(F.col("doc_id").cast("string")).alias("h"))
            .collect()
        ]
        assert keys == sorted(keys)  # hash-ordered within shard
        assert rows_a != sorted(rows_a)  # genuinely shuffled vs id order
        total += len(rows_a)
    assert total == docs.count()
