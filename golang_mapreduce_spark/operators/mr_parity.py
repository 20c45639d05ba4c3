"""Reference-parity workloads — the queries the reference actually ships
(its mrapps/, SURVEY.md §2.3), re-expressed as declarative DataFrame plans
over the ``documents`` fixture table (stand-in for the pg-*.txt corpus).

Scale disposition: every query below is a scan → narrow transform →
hash-aggregate pipeline.  Spark performs map-side partial aggregation
automatically, which the reference notably lacks (wc ships one KV per word
occurrence through the shuffle, 6.5840/src/mrapps/wc.go:27-30) — at 100 TB
that partial-agg is the difference between shuffling ~tokens and shuffling
~distinct-words×partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.functions.text import letter_words
from golang_mapreduce_spark.sources.fixtures import load_table


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wc (6.5840/src/mrapps/wc.go:19-40): split contents on non-letter
    runes, count occurrences per word.

    Reference shape: map emits (word,"1") per occurrence; reduce counts.
    Spark shape: explode + groupBy().count() — partial agg map-side, one
    shuffle keyed on word.  Word keys are near-uniform; skew only from
    stopwords, which AQE skew handling absorbs.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(letter_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


WORD_COUNT_SQL = """
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """indexer (6.5840/src/mrapps/indexer.go:20-39): for each word, the
    count of documents containing it plus the sorted comma-joined doc list.

    Reference shape: map emits each distinct (word, docname) once (set
    semantics via map[string]bool); reduce sorts the doc list and prints
    "count doc1,doc2,...".  Spark shape: distinct → groupBy word →
    collect_set + array_sort + concat_ws.

    Scale note: the doc-list string is unbounded per word (a stopword at
    100 TB collects every doc id).  This preserves reference semantics for
    parity; the scalable variant is `doc_frequency` (counts only) or a
    bounded `slice(array_sort(collect_set(...)), 1, K)` posting-list
    prefix.
    """
    docs = load_table(spark, sf_dir, "documents")
    word_doc = (
        docs.select(
            F.explode(letter_words("text")).alias("word"),
            F.col("doc_id").cast("string").alias("doc"),
        )
        .distinct()
    )
    return word_doc.groupBy("word").agg(
        F.count("*").alias("doc_cnt"),
        F.concat_ws(",", F.array_sort(F.collect_set("doc"))).alias("docs"),
    )


INVERTED_INDEX_SQL = """
WITH word_doc AS (
  SELECT DISTINCT word, CAST(doc_id AS VARCHAR) AS doc
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
    FROM documents
  )
  WHERE word <> ''
)
SELECT word,
       COUNT(*) AS doc_cnt,
       string_agg(doc, ',' ORDER BY doc) AS docs
FROM word_doc
GROUP BY word
"""


def file_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """early_exit (6.5840/src/mrapps/early_exit.go:19-36): one record per
    input file, reduced to a per-file count (the 3 s sherlock/tom sleep is
    test instrumentation, dropped).  Here: docs per source."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(F.count("*").alias("cnt"))


FILE_COUNTS_SQL = """
SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
"""


def file_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nocrash/crash payload (6.5840/src/mrapps/nocrash.go:26-47): per
    input file emit ("a", filename), ("b", len(filename)), ("c",
    len(contents)), ("d", "xyzzy"); reduce sorts each key's values and
    joins with a single space.

    The filename analog is source || '/' || doc_id; len(contents) analog
    is n_chars.  Spark shape: ``stack`` unpivot → groupBy →
    concat_ws(' ', array_sort(collect_list(...))).

    Scale note: 4 keys total means 4 groups regardless of input size —
    the reference design has the same property (and the same bounded-key
    skew).  The collected value list grows with file count, not bytes;
    for truly huge file inventories the scalable variant aggregates
    per-key statistics instead of materializing the sorted value string.
    """
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        F.expr(
            "stack(4, "
            "'a', concat(source, '/', CAST(doc_id AS STRING)), "
            "'b', CAST(length(concat(source, '/', CAST(doc_id AS STRING))) AS STRING), "
            "'c', CAST(n_chars AS STRING), "
            "'d', 'xyzzy') AS (k, v)"
        )
    )
    return rows.groupBy("k").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list("v"))).alias("vals")
    )


FILE_PROFILE_SQL = """
WITH f AS (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) AS fname, n_chars
  FROM documents
), rows AS (
  SELECT 'a' AS k, fname AS v FROM f
  UNION ALL SELECT 'b', CAST(length(fname) AS VARCHAR) FROM f
  UNION ALL SELECT 'c', CAST(n_chars AS VARCHAR) FROM f
  UNION ALL SELECT 'd', 'xyzzy' FROM f
)
SELECT k, string_agg(v, ' ' ORDER BY v) AS vals
FROM rows
GROUP BY k
"""


QUERIES = {
    "wc": word_count,
    "indexer": inverted_index,
    "file_counts": file_counts,
    "file_profile": file_profile,
}

ORACLES = {
    "wc": WORD_COUNT_SQL,
    "indexer": INVERTED_INDEX_SQL,
    "file_counts": FILE_COUNTS_SQL,
    "file_profile": FILE_PROFILE_SQL,
}
