"""Adversarial-input parity: run every documents-family query AND its
DuckDB oracle over a synthetic corpus with empty / whitespace-only /
null / unicode / single-token texts.  The fixtures are clean, so this is
where null-handling and divide-by-zero semantics get exercised — both
engines must still agree row-for-row."""

from __future__ import annotations

import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from golang_mapreduce_spark.operators import dedup, mr_parity, pipeline, sampling, textstats
from tests.oracle import compare

EDGE_DOCS = [
    (0, "", "en", "src0", 0),
    (1, "   ", "en", "src0", 3),
    (2, None, "en", "src1", 0),
    (3, "word", "en", "src1", 4),
    (4, "a b", "es", "src1", 3),
    (5, "ñandú 日本語 mixé", "zh", "src2", 14),
    (6, "tab\tsep\nnewline end", "fr", "src2", 19),
    (7, "dup dup dup dup dup dup", "de", "src2", 23),
    (8, "dup dup dup dup dup dup", "de", "src2", 23),
    (9, "punct!!! ... ??? ###", "en", "src3", 20),
]

DOC_QUERIES = sorted(
    (
        set(mr_parity.ORACLES)
        | set(textstats.ORACLES)
        | set(dedup.ORACLES)
        | set(pipeline.ORACLES)  # exact-dup docs exercise the collapse stage
        | set(sampling.ORACLES)
    )
    # semantic_dedup_keep blocks on the EMBEDDINGS table (text is never
    # read); this corpus-only fixture can't drive it — its adversarial
    # coverage is tests/test_emb_fuzz_parity.py's vector edge cases
    - {"semantic_dedup_keep"}
)


@pytest.fixture(scope="module")
def edge_dir():
    d = tempfile.mkdtemp(prefix="gmrs_edge_")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in EDGE_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in EDGE_DOCS], pa.string()),
            "lang": pa.array([r[2] for r in EDGE_DOCS], pa.string()),
            "source": pa.array([r[3] for r in EDGE_DOCS], pa.string()),
            "n_chars": pa.array([r[4] for r in EDGE_DOCS], pa.int64()),
        }
    )
    pq.write_table(table, f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_corpus_parity(name, spark, edge_dir, edge_duck):
    queries = {
        **mr_parity.QUERIES, **textstats.QUERIES, **dedup.QUERIES,
        **pipeline.QUERIES, **sampling.QUERIES,
    }
    oracles = {
        **mr_parity.ORACLES, **textstats.ORACLES, **dedup.ORACLES,
        **pipeline.ORACLES, **sampling.ORACLES,
    }
    df = queries[name](spark, edge_dir)
    compare(df, edge_duck, oracles[name], name=f"edge:{name}")
