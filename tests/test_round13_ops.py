"""Structural invariants for the round-13 operator batch — oracle
parity is covered by tests/test_oracle_parity.py and the adversarial
corpora by the fuzz suites; these pin what parity alone can't see: the
composed IVF→CE pipeline serves the RERANKER's order (a planted
cosine-vs-pair-score inversion must reach the final rows), stage 1's
cluster pruning decides pool membership, and the shard balance audit
is a pure md5 recount obeying the layout/dedup conservation
identities."""

from __future__ import annotations

import hashlib

from golang_mapreduce_spark.operators.dedup import (
    MANIFEST_SHARDS,
    SHARD_RANGE_WIDTH,
    training_shard_balance_audit,
)
from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    centroid_step,
    ivf_ce_retrieval,
    ivf_n_probe,
)
from tests.test_round12_ops import _basis, _docs, _emb_fixture


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


def _range_shard(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) // SHARD_RANGE_WIDTH


def test_shard_balance_audit_is_md5_recount(spark, tmp_path):
    """The audit equals a pure-Python recount over the writer's exact
    key rule (hash32 of the bare doc_id string — write_training_shards'
    key, NOT the manifest's 'shard:'-prefixed bucket) and dedup_exact's
    keep-min rule: 160 docs, every fourth a copy of 'dup-{i%5}'."""
    docs = []
    for i in range(160):
        text = f"dup-{i % 5}" if i % 4 == 0 else f"unique text {i}"
        docs.append((i, text, "en", "s0", len(text)))
    d = str(tmp_path / "balaudit")
    _docs(spark, d, docs)

    keep: dict[str, int] = {}
    for i, text, *_ in docs:
        h = hashlib.md5(text.lower().strip().encode()).hexdigest()
        keep[h] = min(keep.get(h, i), i)
    keepers = set(keep.values())
    n_docs: dict[int, int] = {}
    n_kept: dict[int, int] = {}
    for i, *_ in docs:
        s = _range_shard(i)
        n_docs[s] = n_docs.get(s, 0) + 1
        n_kept[s] = n_kept.get(s, 0) + (1 if i in keepers else 0)

    out = {r["shard"]: r for r in training_shard_balance_audit(spark, d).collect()}
    assert set(out) == set(n_docs)
    tot_docs, tot_kept = sum(n_docs.values()), sum(n_kept.values())
    for s, r in out.items():
        assert r["n_docs"] == n_docs[s], s
        assert r["n_kept"] == n_kept[s], s
        assert r["kept_frac"] == round(n_kept[s] / n_docs[s], 6), s
        assert r["load_factor"] == round(
            n_docs[s] * MANIFEST_SHARDS / tot_docs, 6
        ), s
        assert r["kept_load_factor"] == round(
            n_kept[s] * MANIFEST_SHARDS / tot_kept, 6
        ), s
    # conservation: shards partition the corpus and the deduped epoch
    assert sum(r["n_docs"] for r in out.values()) == 160
    assert sum(r["n_kept"] for r in out.values()) == len(keepers) == 5 + 120


def test_shard_balance_audit_null_texts_one_group(spark, tmp_path):
    """NULL texts hash to NULL and form ONE dup group under the window
    form (the r12 lesson: an equi-join oracle would drop them): three
    NULL-text docs keep exactly one survivor — the min doc_id."""
    rows = [
        (0, None, "en", "s0", 0),
        (1, None, "en", "s0", 0),
        (2, None, "en", "s0", 0),
        (3, "real", "en", "s0", 4),
    ]
    d = str(tmp_path / "balnull")
    _docs(spark, d, rows)
    out = training_shard_balance_audit(spark, d).collect()
    assert sum(r["n_docs"] for r in out) == 4
    assert sum(r["n_kept"] for r in out) == 2  # one NULL keeper + 'real'
    keeper_shard = _range_shard(0)
    null_kept = {r["shard"]: r["n_kept"] for r in out}
    # the NULL group's survivor sits in doc 0's shard
    assert null_kept.get(keeper_shard, 0) >= 1
