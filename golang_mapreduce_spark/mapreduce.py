"""MapReduce paradigm facade — UDF-surface parity with the reference.

The reference's entire programmability is two Go plugin symbols
(6.5840/src/main/mrworker.go:32-49):

    Map:    func(filename, contents string) []KeyValue   # a flatMap/UDTF
    Reduce: func(key string, values []string) string     # a fold per key

:func:`map_reduce` preserves that contract on Spark: the map UDF runs in
Arrow-batched ``mapInPandas`` (not row-at-a-time Python UDFs), the shuffle
is Spark's (replacing the reference's JSON-files-through-S3 transport,
worker.go:150-216), and the reduce UDF runs per key in ``applyInPandas``
(replacing the sort + run-length group at worker.go:219-243).

Scale notes (100 TB):
* ``mapInPandas`` streams batches — no whole-partition materialization.
* ``applyInPandas`` materializes ONE key's rows in memory, exactly the
  reference's reduce contract (worker.go:228-239); a hot key OOMs both
  designs equally.  Prefer the declarative operators (groupBy().agg())
  whenever the reduction is expressible as an algebraic aggregate —
  Spark then does map-side partial aggregation, which this facade (and
  the reference) cannot.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]

_KV_SCHEMA = "key string, value string"


def map_reduce(
    df: DataFrame,
    mapf: MapFn,
    reducef: ReduceFn,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run a reference-style (Map, Reduce) job over a two-column DataFrame.

    ``df``'s first two columns play (filename, contents) — the map input
    record of the reference (worker.go:127-134).  Returns a DataFrame
    ``(key string, value string)`` — the reference's output record shape
    (mr-out lines, worker.go:228-243).
    """
    in_cols = df.columns[:2]

    def run_map(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            keys: list[str] = []
            vals: list[str] = []
            for k, v in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                for ok, ov in mapf(str(k), str(v)):
                    keys.append(ok)
                    vals.append(ov)
            yield pd.DataFrame({"key": keys, "value": vals})

    mapped = df.select(*in_cols).mapInPandas(run_map, schema=_KV_SCHEMA)
    if num_partitions:
        mapped = mapped.repartition(num_partitions, "key")

    def run_reduce(pdf):
        import pandas as pd

        key = str(pdf["key"].iloc[0])
        return pd.DataFrame({"key": [key], "value": [reducef(key, list(pdf["value"]))]})

    return mapped.groupBy("key").applyInPandas(run_reduce, schema=_KV_SCHEMA)


# --- reference app UDFs, re-expressed in python -------------------------

def wc_map(_name: str, contents: str) -> Iterable[tuple[str, str]]:
    """Whitespace-token word count map (the facade demo keeps whitespace
    tokens so the DuckDB oracle can mirror it with \\s+; the letter-run
    variant of the reference's wc.go:21 lives in operators.mr_parity)."""
    return ((w, "1") for w in contents.split())


def wc_reduce(_key: str, values: list[str]) -> str:
    """wc reduce (6.5840/src/mrapps/wc.go:34-40): count of occurrences."""
    return str(len(values))


# --- driver-contract queries -------------------------------------------

def mr_wc(spark, sf_dir: str) -> DataFrame:
    """Word count run through the (Map, Reduce) facade — proves the
    reference's UDF contract end-to-end on Spark: mapInPandas flatMap →
    shuffle on key → applyInPandas per-key fold, output (key, value)
    strings exactly like an mr-out file (worker.go:228-243)."""
    from pyspark.sql import functions as F

    from golang_mapreduce_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("fname"),
        "text",
    )
    return map_reduce(docs, wc_map, wc_reduce)


MR_WC_SQL = """
SELECT word AS "key", CAST(COUNT(*) AS VARCHAR) AS "value"
FROM (
  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents
)
WHERE word <> ''
GROUP BY word
"""

def indexer_map(name: str, contents: str) -> Iterable[tuple[str, str]]:
    """Indexer map (6.5840/src/mrapps/indexer.go:23-30): one (word,
    document) pair per token occurrence; the reduce dedups documents."""
    return ((w, name) for w in contents.split())


def indexer_reduce(_key: str, values: list[str]) -> str:
    """Indexer reduce (indexer.go:33-39): '<count> <sorted doc list>' —
    distinct documents containing the word, comma-joined in sorted
    order."""
    docs = sorted(set(values))
    return f"{len(docs)} {','.join(docs)}"


def mr_indexer(spark, sf_dir: str) -> DataFrame:
    """The reference's SECOND app through the same (Map, Reduce) facade:
    inverted index with per-word distinct sorted posting lists.  Where
    mr_wc proves the contract on an algebraic fold, this proves it on a
    HOLISTIC reduce (set-dedup + global sort of the posting list) — the
    kind of reduce the declarative engine expresses as
    collect_set/array_sort but the plugin contract must run as-is."""
    from pyspark.sql import functions as F

    from golang_mapreduce_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("/", "source", F.col("doc_id").cast("string")).alias("fname"),
        "text",
    )
    return map_reduce(docs, indexer_map, indexer_reduce)


MR_INDEXER_SQL = """
SELECT word AS "key",
       CAST(COUNT(DISTINCT fname) AS VARCHAR) || ' ' ||
       string_agg(DISTINCT fname, ',' ORDER BY fname) AS "value"
FROM (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) AS fname,
         unnest(regexp_split_to_array(text, '\\s+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""

QUERIES = {"mr_wc": mr_wc, "mr_indexer": mr_indexer}
ORACLES = {"mr_wc": MR_WC_SQL, "mr_indexer": MR_INDEXER_SQL}
