"""Property tests for the paragraph chunker behind `paragraph_dedup`:
for ANY corpus of space-separated word documents, (1) each document
yields exactly ceil(n_words / PARA_WORDS) chunks, (2) chunks partition
the word sequence in order (concatenating them reconstructs the
document), and (3) duplicate accounting is first-occurrence-wins: the
number of non-duplicate chunks equals the number of distinct chunk
texts in the whole corpus."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_mapreduce_spark.operators.dedup import PARA_WORDS

WORD = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x", "longword", "q7"]
)
DOC = st.lists(WORD, min_size=1, max_size=23).map(" ".join)


def _chunk_df(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    return words.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("words") / PARA_WORDS).cast("long") - 1,
            )
        ).alias("chunk_idx"),
        F.concat_ws(
            " ",
            F.slice("words", F.col("chunk_idx") * PARA_WORDS + 1, PARA_WORDS),
        ).alias("para"),
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=1, max_size=8))
def test_paragraph_chunking_properties(spark, texts):
    chunks = _chunk_df(spark, texts).collect()

    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["para"]))

    all_paras = []
    for i, t in enumerate(texts):
        n_words = len(t.split(" "))
        got = sorted(by_doc[i])
        # (1) chunk count
        assert len(got) == math.ceil(n_words / PARA_WORDS)
        # (2) ordered reconstruction
        assert " ".join(p for _, p in got) == t
        all_paras.extend(p for _, p in got)

    # (3) first-occurrence-wins accounting matches distinct chunk texts
    marked = (
        _chunk_df(spark, texts)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("para")).orderBy("doc_id", "chunk_idx")
            ),
        )
        .agg(F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("firsts"))
        .first()
    )
    assert marked["firsts"] == len(set(all_paras))
