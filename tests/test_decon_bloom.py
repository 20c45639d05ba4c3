"""decontaminate_bloom must equal decontaminate_docs bit-for-bit: the
Bloom pre-filter has no false negatives and the exact recheck absorbs
its false positives.  A degenerate filter (1 bit/key, 1 probe — FP rate
near 1) is the adversarial case: almost everything passes the Bloom
stage, and the answer must STILL be exact."""

from __future__ import annotations

from golang_mapreduce_spark.operators.corpus import (
    decontaminate_bloom,
    decontaminate_docs,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bloom_equals_plain_default_params(spark, sf_dir):
    assert _rows(decontaminate_bloom(spark, sf_dir)) == _rows(
        decontaminate_docs(spark, sf_dir)
    )


def test_bloom_equals_plain_under_forced_false_positives(spark, sf_dir):
    degenerate = decontaminate_bloom(spark, sf_dir, bits_per_key=1, n_probes=1)
    assert _rows(degenerate) == _rows(decontaminate_docs(spark, sf_dir))
