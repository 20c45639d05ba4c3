"""Property tests for the round-6 dedup-signal operators:
dup_ngram_fraction (RefinedWeb-style duplicated-span share),
ngram_containment_pairs (asymmetric containment), and the semantic
per-source rollup."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dup_ngram_fraction_bounds_and_exact_dups(spark, sf_dir):
    """Fractions live in [0, 1]; every doc that has an exact duplicate
    (same normalized text) must score dup_frac == 1.0 — all its spans
    exist verbatim in the copy."""
    from golang_mapreduce_spark.operators.dedup import dup_ngram_fraction
    from golang_mapreduce_spark.sources.fixtures import load_table

    rows = {r["doc_id"]: r for r in dup_ngram_fraction(spark, sf_dir).collect()}
    assert rows
    assert all(0.0 <= r["dup_frac"] <= 1.0 for r in rows.values())
    assert all(0 <= r["dup_pos"] <= r["n_pos"] for r in rows.values())

    docs = load_table(spark, sf_dir, "documents")
    dup_groups = (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .collect()
    )
    dup_ids = [i for g in dup_groups for i in g["ids"]]
    checked = [i for i in dup_ids if i in rows]  # >=5-token docs only
    # the sf0.001 slice may hold no byte-exact duplicates; the invariant
    # still must hold for any that exist at the chosen SF
    assert all(rows[i]["dup_frac"] == 1.0 for i in checked)
    # the fixture vocabulary guarantees cross-document span reuse
    assert any(r["dup_frac"] > 0.0 for r in rows.values())


def test_containment_asymmetry_and_bounds(spark, sf_dir):
    """Containments live in (0, 1]; n_common never exceeds either side's
    shingle count; and at least one reported pair clears the threshold
    on one side."""
    from golang_mapreduce_spark.operators.dedup import (
        CONTAINMENT_MIN,
        ngram_containment_pairs,
    )

    rows = ngram_containment_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["containment_a"] <= 1.0
        assert 0.0 < r["containment_b"] <= 1.0
        assert (
            r["containment_a"] >= CONTAINMENT_MIN
            or r["containment_b"] >= CONTAINMENT_MIN
        )
    spark.catalog.clearCache()


def test_semantic_drop_by_source_consistent_with_drop_ids(spark, sf_dir):
    from golang_mapreduce_spark.operators.dedup import (
        semantic_drop_by_source,
        semantic_drop_ids,
    )

    total_drops = semantic_drop_ids(spark, sf_dir).count()
    per_source = semantic_drop_by_source(spark, sf_dir).collect()
    assert sum(r["n_dropped"] for r in per_source) == total_drops
    assert all(0.0 <= r["drop_rate"] <= 1.0 for r in per_source)
    spark.catalog.clearCache()


def test_neardup_weighted_sample_soft_dedup(spark, sf_dir):
    """Unclustered docs always survive; the expected surviving mass of
    a cluster is ~1 (rate = PPM div size); and survivors report their
    true cluster size."""
    from golang_mapreduce_spark.operators.dedup import (
        clusters_from,
        dedup_minhash_pairs,
        neardup_weighted_sample,
    )
    from golang_mapreduce_spark.sources.fixtures import load_table

    kept = {r["doc_id"]: r for r in neardup_weighted_sample(spark, sf_dir).collect()}
    assert kept
    clustered = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters_from(
            dedup_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
        ).collect()
    }
    all_ids = {
        r["doc_id"] for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    # every unclustered doc (cluster_size 1) must survive
    for d in all_ids - set(clustered):
        assert d in kept and kept[d]["cluster_size"] == 1
    # survivors of real clusters report a size >= 2
    for d, r in kept.items():
        if d in clustered:
            assert r["cluster_size"] >= 2
            assert r["cluster_id"] == clustered[d]
    spark.catalog.clearCache()


def test_perplexity_tail_split_terciles(spark, sf_dir):
    """Within each language the three buckets are non-empty (enough
    docs) and ordered: every head surprisal <= every middle <= every
    tail."""
    from collections import defaultdict

    from golang_mapreduce_spark.operators.textstats import perplexity_tail_split

    by_lang = defaultdict(lambda: defaultdict(list))
    for r in perplexity_tail_split(spark, sf_dir).collect():
        by_lang[r["lang"]][r["bucket"]].append(r["avg_surprisal"])
    assert by_lang
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        if n >= 9:
            assert set(buckets) == {"head", "middle", "tail"}, (lang, set(buckets))
        if buckets.get("head") and buckets.get("middle"):
            assert max(buckets["head"]) <= min(buckets["middle"])
        if buckets.get("middle") and buckets.get("tail"):
            assert max(buckets["middle"]) <= min(buckets["tail"])


def test_cos_threshold_curve_monotone(spark, sf_dir):
    """The cumulative at-or-above count is non-increasing in the bin
    floor, and the NEARDUP_COS bin's cumulative count is at least the
    number of pairs emb_neardup_pairs reports at that threshold."""
    from golang_mapreduce_spark.operators.similarity import (
        CURVE_BINS,
        NEARDUP_COS,
        emb_cos_threshold_curve,
        emb_neardup_pairs,
    )

    rows = sorted(
        (r["cos_bin"], r["n_pairs"], r["n_at_or_above"])
        for r in emb_cos_threshold_curve(spark, sf_dir).collect()
    )
    assert rows
    # cumulative counts decrease as the bin floor rises
    for (b1, _, c1), (b2, _, c2) in zip(rows, rows[1:]):
        assert b1 < b2 and c1 >= c2
    n_neardup = emb_neardup_pairs(spark, sf_dir).count()
    thr_bin = int(NEARDUP_COS * CURVE_BINS)
    at_thr = max((c for b, _, c in rows if b >= thr_bin), default=0)
    assert at_thr >= n_neardup


def test_quality_drift_deltas_sum_consistent(spark, sf_dir):
    """Per-source, the doc-weighted mean of batch averages equals the
    source average (so deltas are centered), within rounding."""
    from collections import defaultdict

    from golang_mapreduce_spark.operators.textstats import quality_drift_by_batch

    rows = quality_drift_by_batch(spark, sf_dir).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        n = sum(r["n_docs"] for r in rs)
        weighted_delta = sum(r["delta_vs_source"] * r["n_docs"] for r in rs) / n
        assert abs(weighted_delta) < 1e-4, (src, weighted_delta)
