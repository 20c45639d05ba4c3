"""Semantic invariants for the late round-4 batch: blob-level exact
dedup, matryoshka truncated-dim recall, sentence segmentation stats,
and deterministic BPE-dropout subword sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.functions.bpe import (
    BPE_COUNTS,
    BPE_DROPOUT_COUNTS,
    MERGES,
    VOCAB,
    apply_merges,
    apply_merges_dropout,
)
from golang_mapreduce_spark.operators.multimodal import blob_exact_dedup
from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    matryoshka_recall,
)
from golang_mapreduce_spark.operators.textstats import (
    sentence_stats,
    subword_sample_stats,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def test_blob_dedup_matches_text_dedup(spark, sf_dir):
    """Blob content-hash groups must be exactly the duplicated-text
    groups (the fake blob is the UTF-8 encoding of text), and every
    canonical id must be the minimum of its group."""
    docs = load_table(spark, sf_dir, "documents")
    text_groups = {
        r["text"]: (r["n"], r["mn"])
        for r in docs.groupBy("text")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("mn"))
        .where(F.col("n") > 1)
        .collect()
    }
    rows = blob_exact_dedup(spark, sf_dir).collect()
    assert len(rows) == len(text_groups)
    assert sorted((r["n_copies"], r["canonical_doc_id"]) for r in rows) == sorted(
        text_groups.values()
    )
    for r in rows:
        assert r["total_bytes"] > 0


def test_matryoshka_recall_bounds(spark, sf_dir):
    """One row per query; recall in [0, 1] with n_hits/TOP_K exact."""
    rows = matryoshka_recall(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_at_k"] - round(r["n_hits"] / TOP_K, 6)) < 1e-12


def test_sentence_stats_invariants(spark, sf_dir):
    rows = sentence_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_sentences"] >= 1
        assert r["mean_sentence_chars"] > 0
        assert r["max_sentence_chars"] >= r["mean_sentence_chars"]


def test_bpe_dropout_only_fragments(spark):
    """Skipping merge sites can only fragment further: every sampled
    count >= the frozen-BPE count, <= the character count; and the
    sampled segmentation still concatenates back to the word."""
    for w in VOCAB:
        assert BPE_DROPOUT_COUNTS[w] >= BPE_COUNTS[w]
        assert BPE_DROPOUT_COUNTS[w] <= len(w)
        assert "".join(apply_merges_dropout(w, MERGES)) == w
        assert "".join(apply_merges(w, MERGES)) == w
    # the dropout must actually fire somewhere, or the operator is a no-op
    assert any(BPE_DROPOUT_COUNTS[w] > BPE_COUNTS[w] for w in VOCAB)


def test_subword_sample_inflation(spark, sf_dir):
    rows = subword_sample_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_sampled_tokens"] >= r["n_bpe_tokens"]
        assert r["inflation"] >= 1.0


def test_minhash_calibration_bounds(spark, sf_dir):
    """Calibration rows are exactly the LSH candidates; estimate and
    truth live in [0,1]; abs_err is their absolute difference."""
    from golang_mapreduce_spark.operators.dedup import (
        MINHASH_EST_THRESHOLD,
        dedup_minhash_pairs,
        minhash_calibration,
    )

    rows = minhash_calibration(spark, sf_dir).collect()
    n_cand = dedup_minhash_pairs(spark, sf_dir).count()
    assert len(rows) == n_cand and rows
    for r in rows:
        assert MINHASH_EST_THRESHOLD <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - round(abs(r["est_jaccard"] - r["exact_jaccard"]), 6)) < 1e-9


def test_event_transitions_telescope(spark, sf_dir):
    """Row-normalized probabilities sum to 1 per prev_type, and the
    transition total equals (events - users-with-events): each user
    contributes len(sequence) - 1 transitions."""
    from collections import defaultdict

    from golang_mapreduce_spark.operators.analytics import event_transition_matrix

    rows = event_transition_matrix(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    expected = e.count() - e.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == expected
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r["prev_type"]] += r["prob"]
    for prev, tot in by_prev.items():
        assert abs(tot - 1.0) < 1e-4, (prev, tot)


def test_temperature_interpolates_between_keep_all_and_balance(spark, sf_dir):
    """sqrt smoothing keeps at least as much of every language as full
    equalization and never more than the raw corpus; the smallest
    language is kept in full."""
    from golang_mapreduce_spark.operators.sampling import (
        balance_langs_sample,
        temperature_rebalance_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    bal = {
        r["lang"]: r["n"]
        for r in balance_langs_sample(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    tmp = {
        r["lang"]: r["n"]
        for r in temperature_rebalance_sample(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    m = min(raw.values())
    for lang, n_raw in raw.items():
        assert tmp.get(lang, 0) <= n_raw
        if n_raw == m:
            assert tmp[lang] == m  # rate exactly 1e6 ppm
    # temperature keeps MORE total mass than full equalization
    assert sum(tmp.values()) >= sum(bal.values())
