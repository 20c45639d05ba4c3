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
    set(mr_parity.ORACLES)
    | set(textstats.ORACLES)
    | set(dedup.ORACLES)
    | set(pipeline.ORACLES)  # exact-dup docs exercise the collapse stage
    | set(sampling.ORACLES)
)

#: Edge embeddings for the semantic/topic family: exact duplicates
#: (7, 8), a negated copy (5 = -4), near-parallel pairs, and tiny
#: magnitudes — but NO zero vectors: zero-norm drop semantics are
#: Spark-side by design (_ivf_assign docstring) and deliberately NOT
#: mirrored by the SQL oracles; the zero-vector path is pinned in
#: tests/test_emb_fuzz_parity.py instead.
EDGE_EMBS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0, 0.0], 0),
    (2, [1e-6, 2e-6, 0.0, 0.0], 1),
    (3, [0.0, 1.0, 0.0, 0.0], 1),
    (4, [0.5, 0.5, 0.5, 0.5], 2),
    (5, [-0.5, -0.5, -0.5, -0.5], 2),
    (6, [0.0, 0.0, 1.0, 0.0], 0),
    (7, [0.25, 0.25, 0.8, 0.1], 1),
    (8, [0.25, 0.25, 0.8, 0.1], 1),
    (9, [0.1, 0.2, 0.3, 0.4], 2),
]


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
    emb = pa.table(
        {
            "vec_id": pa.array([r[0] for r in EDGE_EMBS], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in EDGE_EMBS], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in EDGE_EMBS], pa.int64()),
        }
    )
    pq.write_table(emb, f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{edge_dir}/embeddings.parquet'"
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
