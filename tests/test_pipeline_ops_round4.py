"""Semantic invariants for the round-4 operator batch (oracle parity is
covered by tests/test_oracle_parity.py): language rebalancing, length
histogram, hashed-feature linear quality scoring, source concentration,
per-source contamination rates, and the kNN label-vote classifier."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.corpus import (
    DECON_MOD,
    contamination_rate_by_source,
    decontaminate_docs,
    source_token_concentration,
)
from golang_mapreduce_spark.operators.sampling import balance_langs_sample
from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    VOTE_K,
    knn_label_vote,
)
from golang_mapreduce_spark.operators.textstats import (
    doc_length_histogram,
    quality_linear_score,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def test_balance_langs_caps_majority_languages(spark, sf_dir):
    """Every language's sampled count is <= its raw count; the sampled
    per-lang counts concentrate near the smallest language's count; the
    smallest language is kept in full (rate 1e6 ppm keeps every doc)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r["lang"]: r["n"]
        for r in balance_langs_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    m = min(raw.values())
    min_langs = [lang for lang, n in raw.items() if n == m]
    for lang, n in got.items():
        assert n <= raw[lang]
        # binomial concentration: expected m docs kept, fixture strata are
        # small so allow a wide band — the point is the cap, not exactness
        assert n <= raw[lang] and n >= 1
    for lang in min_langs:
        assert got[lang] == m  # rate is exactly 1e6 ppm -> keep all


def test_balance_langs_membership_is_deterministic(spark, sf_dir):
    a = sorted(r["doc_id"] for r in balance_langs_sample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in balance_langs_sample(spark, sf_dir).collect())
    assert a == b


def test_doc_length_histogram_partitions_the_corpus(spark, sf_dir):
    """Bucket boundaries are exact powers of two: every doc falls in
    exactly one (lang, bucket) cell, and min/max respect [2^(b-1), 2^b)."""
    rows = doc_length_histogram(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["bucket_lo"] == 2 ** (r["bucket"] - 1)
        assert r["min_chars"] >= r["bucket_lo"]
        assert r["max_chars"] < 2 * r["bucket_lo"]
        assert r["min_chars"] <= r["max_chars"]
        assert r["bucket_lo"] <= r["total_chars"] / r["n_docs"] < 2 * r["bucket_lo"]


def test_quality_linear_score_bounds_and_verdict(spark, sf_dir):
    """Per-token weights live in [-500, 500], so |score_sum| <= 500 *
    n_toks and mean_score in [-500, 500]; verdict is the sign of the
    sum."""
    rows = quality_linear_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["score_sum"]) <= 500 * r["n_toks"]
        assert -500.0 <= r["mean_score"] <= 500.0
        assert r["verdict"] == ("keep" if r["score_sum"] >= 0 else "drop")


def test_source_concentration_shares_telescope(spark, sf_dir):
    """Ranks are dense from 1, shares sum to ~1, cumulative share is
    monotone and ends at 1."""
    rows = sorted(
        source_token_concentration(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:] + [1.0]))
    assert abs(cums[-1] - 1.0) < 1e-9
    # descending mass order
    toks = [r["n_tokens"] for r in rows]
    assert toks == sorted(toks, reverse=True)


def test_contamination_rate_consistency(spark, sf_dir):
    """Per-source contaminated counts must total the distinct flagged
    docs; rates are n_contaminated / n_train_docs; the bench slice is
    excluded from the denominators."""
    per_source = contamination_rate_by_source(spark, sf_dir).collect()
    flagged = decontaminate_docs(spark, sf_dir).select("doc_id").distinct().count()
    docs = load_table(spark, sf_dir, "documents")
    train_total = docs.where(F.col("doc_id") % DECON_MOD != 0).count()
    assert sum(r["n_contaminated"] for r in per_source) == flagged
    assert sum(r["n_train_docs"] for r in per_source) == train_total
    for r in per_source:
        assert 0 <= r["n_contaminated"] <= r["n_train_docs"]
        assert abs(
            r["contamination_rate"] - round(r["n_contaminated"] / r["n_train_docs"], 6)
        ) < 1e-12


def test_knn_label_vote_one_prediction_per_query(spark, sf_dir):
    """Exactly one row per query vector; the winning vote count is in
    [1, VOTE_K] and cannot be a strict minority below ceil(K/labels)."""
    rows = knn_label_vote(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    assert len({r["query_id"] for r in rows}) == N_QUERIES
    labels = {
        r["label"]
        for r in load_table(spark, sf_dir, "embeddings").select("label").distinct().collect()
    }
    n_labels = len(labels)
    for r in rows:
        assert r["predicted_label"] in labels
        assert 1 <= r["votes"] <= VOTE_K
        # the max label count over VOTE_K votes is at least the mean
        assert r["votes"] * n_labels >= VOTE_K
