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


def test_matryoshka_zero_prefix_guard(spark):
    """A vector whose first MRL_DIM dims are all zero has no defined
    truncated cosine: the batched scorer must DROP it (both as query
    and as candidate) rather than emit NaN sims — same drop semantics
    as _ivf_assign's zero-norm mask.  Truncation makes zero prefixes
    far likelier than full-dim zero vectors, so this path is real."""
    import math
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from golang_mapreduce_spark.operators.similarity import (
        EMB_DIM,
        MRL_DIM,
        N_QUERIES,
        knn_batched_scored,
        matryoshka_recall,
    )

    def dense(i):
        return [math.sin(0.1 * i + 0.01 * j) + 0.2 for j in range(EMB_DIM)]

    vecs = {i: dense(i) for i in range(30)}
    # query 1: zero PREFIX, nonzero tail — valid full-dim, undefined truncated
    vecs[1] = [0.0] * MRL_DIM + [1.0 + 0.01 * j for j in range(EMB_DIM - MRL_DIM)]
    # collection 20: zero prefix; collection 21: fully zero
    vecs[20] = [0.0] * MRL_DIM + [2.0] * (EMB_DIM - MRL_DIM)
    vecs[21] = [0.0] * EMB_DIM
    d = tempfile.mkdtemp(prefix="gmrs_mrlzero_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array(
                    [vecs[i] for i in range(30)], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 4 for i in range(30)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )

    trunc = knn_batched_scored(spark, d, dims=MRL_DIM).collect()
    assert trunc, "nonzero-prefix rows must still score"
    qids = {r["query_id"] for r in trunc}
    nids = {r["neighbor_id"] for r in trunc}
    assert 1 not in qids, "zero-prefix query must emit no candidates"
    assert 20 not in nids and 21 not in nids, "zero-prefix candidates dropped"
    assert all(not math.isnan(r["sim_raw"]) for r in trunc)

    rec = {r["query_id"]: r for r in matryoshka_recall(spark, d).collect()}
    assert set(rec) == set(range(N_QUERIES))  # full-dim side defines the keys
    assert rec[1]["n_hits"] == 0 and rec[1]["recall_at_k"] == 0.0
    assert all(not math.isnan(r["recall_at_k"]) for r in rec.values())
