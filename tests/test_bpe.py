"""BPE trainer/applier determinism and the closed-vocabulary fixture
property the bpe_token_stats oracle depends on."""

from __future__ import annotations

import duckdb
import pytest

from golang_mapreduce_spark.functions.bpe import (
    BPE_COUNTS,
    MERGES,
    N_MERGES,
    VOCAB,
    apply_merges,
    train_merges,
)


def test_training_is_deterministic():
    assert train_merges(VOCAB, N_MERGES) == MERGES
    assert len(MERGES) <= N_MERGES


def test_apply_matches_training_segmentation():
    # applying the frozen merges reproduces the training segmentation
    for w in VOCAB:
        toks = apply_merges(w, MERGES)
        assert "".join(toks) == w
        assert len(toks) == BPE_COUNTS[w]
        assert 1 <= len(toks) <= len(w)


def test_merges_reduce_token_counts():
    # BPE must actually compress: some multi-char word reaches 1 token,
    # and the vocabulary-wide token count shrinks vs character splitting
    # (words made of rare pairs may legitimately stay unmerged)
    assert any(len(w) > 1 and n == 1 for w, n in BPE_COUNTS.items())
    assert sum(BPE_COUNTS.values()) < sum(len(w) for w in VOCAB)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_fixture_vocabulary_is_closed(sf):
    rows = duckdb.sql(
        f"""
        SELECT DISTINCT unnest(list_filter(
            regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
        FROM '/root/testdata/{sf}/documents.parquet'
        """
    ).fetchall()
    assert {r[0] for r in rows} <= set(VOCAB)
