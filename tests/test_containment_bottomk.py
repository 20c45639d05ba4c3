"""Adversarial recall pin for the containment family (VERDICT r6 #2):
a short document fully quoted inside a long one has containment_a = 1.0
but Jaccard ~ |A|/|B|, far below the MinHash banding's recall range — so
the LSH-candidate form (ngram_containment_pairs) must MISS the pair at
its candidate stage, while the bottom-k containment-preserving sketch
(containment_bottomk_pairs, Broder 1997 §4) must CATCH it: every one of
the short doc's bottom-k shingle hashes occurs in the long doc, so the
sketch-vs-inverted-index join cannot lose the candidate."""

from __future__ import annotations

import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from golang_mapreduce_spark.operators.dedup import (
    CONTAINMENT_BOTTOMK_SQL,
    containment_bottomk_pairs,
    ngram_containment_pairs,
)


def _write_docs(rows: list[tuple[int, str]]) -> str:
    """Write a minimal documents.parquet fixture dir; returns the dir."""
    d = tempfile.mkdtemp(prefix="gmrs_cont_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["syn"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    return d


def _adversarial_dir() -> str:
    # long doc: 300 distinct tokens; short doc: a 12-token span of it.
    # Jaccard = 10 shared shingles / 298 union ~ 0.034 — an order of
    # magnitude under MINHASH_EST_THRESHOLD and effectively invisible to
    # a 4x4 band collision; containment of the short side is exactly 1.0.
    long_toks = [f"w{i:03d}" for i in range(300)]
    short_toks = long_toks[100:112]
    return _write_docs([(1, " ".join(long_toks)), (2, " ".join(short_toks))])


def test_lsh_candidates_miss_extreme_size_ratio_pair(spark):
    d = _adversarial_dir()
    assert ngram_containment_pairs(spark, d).count() == 0
    spark.catalog.clearCache()


def test_bottomk_candidates_catch_extreme_size_ratio_pair(spark):
    d = _adversarial_dir()
    rows = containment_bottomk_pairs(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # the short side (doc 2, 10 shingles) is fully contained
    assert r["containment_b"] == 1.0 and r["n_common"] == 10
    assert r["containment_a"] < 0.05
    spark.catalog.clearCache()


def test_bottomk_oracle_parity_on_adversarial_corpus(spark):
    """The DuckDB twin must reproduce the adversarial catch too — parity
    on the shipped fixtures alone would not exercise the recall gap."""
    import duckdb

    from tests.oracle import compare

    d = _adversarial_dir()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    compare(
        containment_bottomk_pairs(spark, d),
        con,
        CONTAINMENT_BOTTOMK_SQL,
        name="containment_bottomk_pairs[adversarial]",
    )
    con.close()
    spark.catalog.clearCache()
