"""Adversarial-embedding parity for the similarity family.

The generated embeddings are near-random unit-ish float32 vectors, so
the tie and degeneracy paths — exact duplicate vectors, scaled copies
(cosine exactly 1), negated copies (cosine -1), axis-aligned one-hots,
duplicate queries — were never exercised.  This suite builds a
deterministic adversarial embeddings.parquet (fixture schema:
list<float32>, int32 labels) and re-runs the full Spark-vs-DuckDB
comparison for every oracle-backed similarity operator, which stresses
the whole BLAS-candidates + JVM-rounded-rank machinery exactly where
slack and tie order do the deciding.

Deliberately absent: zero vectors — the BLAS paths give them DEFINED
drop semantics while the SQL oracles' NULL/NaN handling is
engine-accidental (documented in _ivf_assign); that divergence is a
design decision, not a bug to fuzz."""

from __future__ import annotations

import math
import os
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from golang_mapreduce_spark.operators import similarity
from tests.oracle import compare

DIM = 64


def _vec(fn):
    return [float(fn(j)) for j in range(DIM)]


def _build_vectors() -> list[list[float]]:
    vecs: dict[int, list[float]] = {}
    dense = _vec(lambda j: math.sin(2.0 + 0.01 * j) + 1.5)
    # queries 0-7: one-hots, a ramp, duplicates of collection rows
    for i in range(4):
        vecs[i] = [1.0 if j == i else 0.0 for j in range(DIM)]
    vecs[4] = _vec(lambda j: 0.1 * j + 1.0)          # ramp
    vecs[5] = list(dense)                             # duplicate of 20-22
    vecs[6] = _vec(lambda j: (-1.0) ** j)             # alternating
    vecs[7] = _vec(lambda j: math.cos(0.05 * j))
    # collection: exact duplicate group
    vecs[20] = list(dense)
    vecs[21] = list(dense)
    vecs[22] = list(dense)
    # scaled copies (cosine exactly 1 with the dense family)
    vecs[23] = [2.0 * x for x in dense]
    vecs[24] = [0.5 * x for x in dense]
    # negated copy (cosine -1)
    vecs[25] = [-x for x in dense]
    # one-hot echoes of the queries
    for i in range(4):
        vecs[26 + i] = [1.0 if j == i else 0.0 for j in range(DIM)]
    # deterministic pseudo-random fill
    for i in range(40):
        if i not in vecs:
            vecs[i] = _vec(lambda j, i=i: math.sin(0.1 * i + 0.01 * j) + 0.1)
    return [vecs[i] for i in range(40)]


@pytest.fixture(scope="module")
def emb_fuzz_dir():
    d = tempfile.mkdtemp(prefix="gmrs_embfuzz_")
    vectors = _build_vectors()
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vectors)), pa.int64()),
            "embedding": pa.array(vectors, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(len(vectors))], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def emb_fuzz_duck(emb_fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{emb_fuzz_dir}/embeddings.parquet'"
    )
    yield con
    con.close()


#: every oracle-backed similarity op that reads ONLY embeddings
FAMILY = [
    "label_centroids",
    "nearest_centroid_confusion",
    "ann_recall_at_k",
    "lsh_rp_topk",
    "knn_bruteforce",
    "knn_numpy_batched",
    "ann_ivf_topk",
    "ann_ivf_adaptive",
    "emb_neardup_pairs",
    "emb_neardup_multiprobe",
    "pq_codes",
    "pq_adc_topk",
    "pq_residual_topk",
    "int8_quant_topk",
    "ivf_int8_topk",
    "hard_negative_mining",
    "embedding_dim_stats",
    "embedding_outliers",
    "knn_label_vote",
    "matryoshka_recall",
    # round-12 addition: the pair-joint reranker audit — the duplicate
    # group (cos exactly 1) and the one-hot echoes force bi-rank ties
    # that only the neighbor_id tie-break orders, and the negated copy
    # exercises the sign-agreement gate of the ce score
    "crossencoder_rerank_audit",
    # round-13 addition: the composed IVF->CE serving pipeline — the
    # same adversarial ties now have to survive centroid assignment
    # and probe selection BEFORE the rerank sees them (rounded-csim
    # ties at the probe cut are the composed op's own edge)
    "ivf_ce_retrieval",
    # round-14 addition: the probe-budget curve — the adversarial ties
    # stress BOTH cumulations (duplicate vectors collapse cluster
    # sizes; rounded-csim ties at every walk position must order by
    # cid identically in the two engines for the needed-rank CDF to
    # match)
    "ivf_probe_recall_curve",
    # round-15 addition: the mass-budget curve — same adversarial ties
    # as its probe-count sibling, but the grid comparisons are against
    # ceil(f·N) mass targets, so duplicate-collapsed cluster SIZES
    # (not just ranks) must agree bit-for-bit across the engines
    "ivf_mass_recall_curve",
]


@pytest.mark.parametrize("name", FAMILY)
def test_emb_fuzz_parity(name, spark, emb_fuzz_dir, emb_fuzz_duck):
    df = similarity.QUERIES[name](spark, emb_fuzz_dir)
    compare(df, emb_fuzz_duck, similarity.ORACLES[name], name=f"embfuzz:{name}")


def test_fuzz_corpus_hits_the_edges(emb_fuzz_duck):
    """The corpus must exercise what the suite claims: an exact
    duplicate group of >= 4 same-direction vectors (dups + scaled) and a
    perfectly negated pair."""
    rows = emb_fuzz_duck.execute(
        "SELECT list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " FROM embeddings a, embeddings b WHERE a.vec_id=20 AND b.vec_id IN (21,23,24,25,5)"
        " ORDER BY b.vec_id"
    ).fetchall()
    sims = [r[0] for r in rows]                     # order: 5,21,23,24,25
    assert sims[0] == 1.0 and sims[1] == 1.0        # 5 and 21 exact dups
    assert abs(sims[2] - 1.0) < 1e-12               # scaled x2
    assert abs(sims[3] - 1.0) < 1e-12               # scaled x0.5
    assert abs(sims[4] + 1.0) < 1e-12               # negated
