"""Structural invariants for the round-13 operator — oracle parity is
covered by tests/test_oracle_parity.py and the adversarial corpora by
tests/test_emb_fuzz_parity.py; these pin what parity alone can't see:
the composed IVF→CE pipeline serves the RERANKER's order (a planted
cosine-vs-pair-score inversion must reach the final rows), stage 1's
cluster pruning decides pool membership, and the output is a valid
per-query top-k under (ce_score DESC, neighbor_id)."""

from __future__ import annotations

from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    centroid_step,
    ivf_ce_retrieval,
    ivf_n_probe,
)
from tests.test_round12_ops import _basis, _emb_fixture


def test_planted_inversion_reaches_the_served_rows(spark):
    """The r12 audit fixture, end-to-end: query e0 with planted
    candidates A = 2*e0 (cosine 1.0 but soft-Jaccard 0.5),
    B = e0 + 0.125*e1 (ce ~0.889), C = e0 - 0.25*e1 (ce 0.8).  With 11
    vectors centroid_step is 4 → centroids {0, 4, 8}; A (vec 8) IS a
    centroid but assignment tie-breaks send all of A/B/C to cluster 0,
    and q0 probes clusters {0, 8} (csim ties at rounded 1.0 break on
    cid), so all three planted rows survive stage 1.  The SERVED order
    must be the reranker's: B #1, C #2, A #3 — cosine's #1 demoted in
    the final table, which is the observable difference between this
    op and ann_ivf_topk over the same candidates."""
    vecs = [_basis(i) for i in range(N_QUERIES)]
    va = _basis(0, 2.0)   # vec_id 8
    vb = _basis(0)
    vb[1] = 0.125         # vec_id 9
    vc = _basis(0)
    vc[1] = -0.25         # vec_id 10
    d = _emb_fixture(vecs + [va, vb, vc])
    assert centroid_step(11) == 4
    assert ivf_n_probe(3) == 2

    rows = ivf_ce_retrieval(spark, d).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)

    q0 = {r["ce_rank"]: r for r in per_q[0]}
    assert len(q0) == TOP_K
    # reranker order: B, C, A — with stage-1 (bi) ranks preserved
    assert q0[1]["neighbor_id"] == 9 and q0[1]["bi_rank"] == 2
    assert q0[2]["neighbor_id"] == 10 and q0[2]["bi_rank"] == 3
    assert q0[3]["neighbor_id"] == 8 and q0[3]["bi_rank"] == 1
    assert q0[1]["ce_score"] == 0.888889
    assert q0[2]["ce_score"] == 0.8
    assert q0[3]["ce_score"] == 0.5
    # the zero-score tail fills ranks 4..5 by neighbor_id — e4 (vec 4)
    # can never appear for q0: it lives in unprobed cluster 4
    assert q0[4]["neighbor_id"] == 1 and q0[5]["neighbor_id"] == 2
    assert all(r["neighbor_id"] != 4 for r in per_q[0])

    for qid, qrows in per_q.items():
        assert len(qrows) <= TOP_K
        ranks = sorted(r["ce_rank"] for r in qrows)
        assert ranks == list(range(1, len(qrows) + 1)), qid
        served = sorted(
            qrows, key=lambda r: (-r["ce_score"], r["neighbor_id"])
        )
        assert [r["ce_rank"] for r in served] == ranks, qid


def test_pool_exhaustion_surfaces_as_short_results(spark):
    """A query whose probed clusters hold fewer than TOP_K candidates
    returns FEWER than TOP_K rows — IVF's recall trade must surface as
    short results, never as silent padding from unprobed clusters.
    Nine vectors, step 3 → centroids {0, 3, 6}: v0 = e0, v3 = e1,
    v6 = e2, and the remaining six all equal e2 (cluster 6 holds them
    all; zero-cosine assignment ties would otherwise default to
    cluster 0 and refill the pool).  q0's probe order is c0 (csim 1)
    then c3 (zero tie, lowest cid) — clusters {0, 3} hold exactly one
    candidate, v3."""
    vecs = [_basis(2)] * 9
    vecs[0], vecs[3], vecs[6] = _basis(0), _basis(1), _basis(2)
    d = _emb_fixture(vecs)
    assert centroid_step(9) == 3
    rows = [r for r in ivf_ce_retrieval(spark, d).collect() if r["query_id"] == 0]
    assert len(rows) == 1
    assert rows[0]["neighbor_id"] == 3
    assert rows[0]["ce_rank"] == 1 and rows[0]["bi_rank"] == 1
    assert rows[0]["ce_score"] == 0.0 and rows[0]["bi_sim"] == 0.0
