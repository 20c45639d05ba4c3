"""Structural invariants for the round-12 operator batch — oracle
parity is covered by tests/test_oracle_parity.py and the adversarial
corpora by tests/test_text_fuzz_parity.py / test_emb_fuzz_parity.py;
these pin the semantics parity alone can't see: the shard manifest is a
pure md5 recomputation whose columns obey the dedup conservation
identities, and the reranker audit provably REORDERS a planted pool
(the pair-joint score must disagree with cosine) while capping the
expensive stage at RERANK_POOL pairs per query."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from golang_mapreduce_spark.operators.dedup import (
    MANIFEST_SHARDS,
    shard_dup_manifest,
)
from golang_mapreduce_spark.operators.similarity import (
    EMB_DIM,
    N_QUERIES,
    RERANK_POOL,
    TOP_K,
    crossencoder_rerank_audit,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        f"{path}/documents.parquet"
    )


def _shard(doc_id: int) -> int:
    return int(hashlib.md5(f"shard:{doc_id}".encode()).hexdigest()[:8], 16) % MANIFEST_SHARDS


def _text_hash(text: str) -> str:
    return hashlib.md5(text.lower().strip().encode()).hexdigest()


def test_shard_manifest_is_md5_recomputation(spark, tmp_path):
    """The manifest equals a pure-Python recount over the same md5
    shard/hash rules: 120 docs, every third a copy of text 'dup-{i%7}'
    (7 dup groups spanning arbitrary shards), the rest unique."""
    docs = []
    for i in range(120):
        text = f"dup-{i % 7}" if i % 3 == 0 else f"unique text {i}"
        docs.append((i, text, "en", "s0", len(text)))
    d = str(tmp_path / "shardman")
    _docs(spark, d, docs)

    cells: dict = {}
    for doc_id, text, *_ in docs:
        key = (_text_hash(text), _shard(doc_id))
        n, mn = cells.get(key, (0, None))
        cells[key] = (n + 1, doc_id if mn is None else min(mn, doc_id))
    groups: dict = {}
    for (h, s), (n, mn) in cells.items():
        tot, nsh, keep = groups.get(h, (0, 0, None))
        groups[h] = (tot + n, nsh + 1, mn if keep is None else min(keep, mn))
    want: dict = {}
    for (h, s), (n_local, cell_min) in cells.items():
        n_copies, n_shards, keep_id = groups[h]
        r = want.setdefault(s, [0, 0, 0, 0, 0, 0])
        r[0] += n_local
        r[1] += 1
        r[2] += n_local if n_copies > 1 else 0
        r[3] += n_local - 1 if n_local > 1 else 0
        r[4] += n_local - (1 if cell_min == keep_id else 0)
        r[5] += n_local if n_shards > 1 else 0

    got = {
        r["shard"]: [
            r["n_docs"], r["n_groups"], r["dup_docs"],
            r["local_excess"], r["global_excess"], r["cross_shard_dup_docs"],
        ]
        for r in shard_dup_manifest(spark, d).collect()
    }
    assert got == want


def test_shard_manifest_conservation_identities(spark, tmp_path):
    """Corpus-level identities every dedup planner relies on:
    sum(global_excess) = n_docs - n_distinct_texts (global keep-one),
    sum(local_excess) = what shard-local dedup alone removes, and the
    gap between them = the extra copies only cross-shard groups carry
    (one survivor per extra shard).  All-unique corpus: every dup
    column is zero."""
    docs = [
        (i, f"dup-{i % 5}" if i < 40 else f"solo {i}", "en", "s0", 1)
        for i in range(80)
    ]
    d = str(tmp_path / "conserve")
    _docs(spark, d, docs)
    rows = shard_dup_manifest(spark, d).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    assert n_docs == 80
    n_distinct = len({_text_hash(t) for _, t, *_ in docs})
    assert sum(r["global_excess"] for r in rows) == n_docs - n_distinct
    # gap = sum over cross-shard groups of (n_shards - 1)
    spans: dict = {}
    for doc_id, text, *_ in docs:
        spans.setdefault(_text_hash(text), set()).add(_shard(doc_id))
    gap = sum(len(s) - 1 for s in spans.values() if len(s) > 1)
    assert (
        sum(r["global_excess"] for r in rows)
        - sum(r["local_excess"] for r in rows)
        == gap
    )

    d2 = str(tmp_path / "unique")
    _docs(spark, d2, [(i, f"one {i}", "en", "s0", 1) for i in range(30)])
    for r in shard_dup_manifest(spark, d2).collect():
        assert r["dup_docs"] == 0 and r["local_excess"] == 0
        assert r["global_excess"] == 0 and r["cross_shard_dup_docs"] == 0
        assert r["n_docs"] == r["n_groups"]


def _emb_fixture(vectors: list[list[float]]) -> str:
    d = tempfile.mkdtemp(prefix="gmrs_r12ce_")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vectors)), pa.int64()),
            "embedding": pa.array(vectors, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(len(vectors))], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return d


def _basis(i: int, scale: float = 1.0) -> list[float]:
    return [scale if j == i else 0.0 for j in range(EMB_DIM)]


def test_rerank_audit_reorders_the_planted_pool(spark):
    """Query e0 against three planted candidates: A = 2*e0 (cosine
    exactly 1, but soft-Jaccard min/max = 0.5), B = e0 + 0.125*e1
    (cosine ~0.992, ce ~0.889), C = e0 - 0.25*e1 (cosine ~0.970, ce
    0.8 — the sign-agreement gate zeroes dim 1).  The bi-encoder order
    is A > B > C; the pair-joint reranker must invert it to B > C > A
    — cosine CANNOT see the magnitude mismatch that min/max does, which
    is the whole point of paying for a reranker."""
    vecs = [_basis(i) for i in range(N_QUERIES)]  # queries: e0..e7
    va = _basis(0, 2.0)                                    # vec_id 8
    vb = _basis(0)
    vb[1] = 0.125                                          # vec_id 9
    vc = _basis(0)
    vc[1] = -0.25                                          # vec_id 10
    d = _emb_fixture(vecs + [va, vb, vc])
    out = {
        r["query_id"]: r for r in crossencoder_rerank_audit(spark, d).collect()
    }
    q0 = out[0]
    assert q0["pool_n"] == N_QUERIES - 1 + 3  # everything but the query
    # bi top-3 is A(8), B(9), C(10); ce promotes B to #1 and A sinks
    assert q0["top1_bi_rank"] == 2  # ce #1 (B) sat at bi rank 2
    assert q0["footrule"] > 0
    # exact overlap pin (ADVICE r12 — the old <= TOP_K bound was true
    # by construction): bi top-5 is {A, B, C, e1, e2} and ce top-5 is
    # {B, C, A, e1, e2} — the zero-score tail ties break by vec_id in
    # BOTH orders, so the two top-k sets coincide exactly and the
    # planted inversion reorders WITHIN k without promotion
    assert q0["overlap_at_k"] == TOP_K
    assert q0["promoted_into_k"] == 0


def test_rerank_audit_caps_the_pool_and_matches_python_mirror(spark):
    """With a 40-vector collection the expensive stage sees exactly
    RERANK_POOL pairs per query (pool_n == RERANK_POOL for all 8
    queries), and every audit column equals a plain-Python recompute
    that mirrors the operator's fold order, rounding, and tie-breaks
    exactly."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    vecs = [_basis(i) for i in range(N_QUERIES)]
    va = _basis(0, 2.0)
    vb = _basis(0)
    vb[1] = 0.125
    vc = _basis(0)
    vc[1] = -0.25
    fillers = [
        [((v * 31 + j * 17) % 101 - 50) / 256.0 for j in range(EMB_DIM)]
        for v in range(12, 41)
    ]
    allv = vecs + [va, vb, vc] + fillers  # 8 + 3 + 29 = 40 vectors
    d = _emb_fixture(allv)

    def rnd6(x: float) -> float:
        # mirrors Spark round(): HALF_UP over the double's shortest repr
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    f32 = [list(np.asarray(v, dtype=np.float32).astype(float)) for v in allv]

    def fold_cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return rnd6(dot / ((na ** 0.5) * (nb ** 0.5)))

    def fold_ce(a, b):
        num = 0.0
        den = 0.0
        for x, y in zip(a, b):
            if (x >= 0) == (y >= 0):
                num += min(abs(x), abs(y))
            den += max(abs(x), abs(y))
        return rnd6(num / den)

    want = {}
    for qid in range(N_QUERIES):
        scored = sorted(
            (
                (-fold_cos(f32[qid], f32[n]), n)
                for n in range(len(allv))
                if n != qid
            ),
        )
        pool = [n for _, n in scored[:RERANK_POOL]]
        bi_rank = {n: i + 1 for i, n in enumerate(pool)}
        ce_sorted = sorted((-fold_ce(f32[qid], f32[n]), n) for n in pool)
        ce_rank = {n: i + 1 for i, (_, n) in enumerate(ce_sorted)}
        want[qid] = (
            len(pool),
            sum(abs(bi_rank[n] - ce_rank[n]) for n in pool),
            sum(1 for n in pool if bi_rank[n] <= TOP_K and ce_rank[n] <= TOP_K),
            sum(1 for n in pool if bi_rank[n] > TOP_K and ce_rank[n] <= TOP_K),
            bi_rank[ce_sorted[0][1]],
        )

    got = {
        r["query_id"]: (
            r["pool_n"], r["footrule"], r["overlap_at_k"],
            r["promoted_into_k"], r["top1_bi_rank"],
        )
        for r in crossencoder_rerank_audit(spark, d).collect()
    }
    assert got == want
    assert all(v[0] == RERANK_POOL for v in got.values())


def test_shard_manifest_null_texts_form_one_group(spark, tmp_path):
    """NULL texts hash to NULL and form ONE dup group (PARTITION BY
    groups NULLs together, matching the GROUP BY that builds the
    cells) — the semantics the edge-corpus suite caught the first
    oracle draft violating (its equi-join dropped the NULL group).
    Three NULL-text docs + two distinct real docs: the NULL group has
    n_copies 3, so all three count as dup_docs, global dedup keeps the
    min doc_id, and the group spans however many shards the ids hash
    to."""
    rows = [
        (0, None, "en", "s0", 0),
        (1, None, "en", "s0", 0),
        (2, None, "en", "s0", 0),
        (3, "real one", "en", "s0", 8),
        (4, "real two", "en", "s0", 8),
    ]
    d = str(tmp_path / "nulls")
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    out = shard_dup_manifest(spark, d).collect()
    assert sum(r["n_docs"] for r in out) == 5
    assert sum(r["dup_docs"] for r in out) == 3  # exactly the NULL trio
    # global keep-one drops 2 of the 3 NULL docs, none of the real ones
    assert sum(r["global_excess"] for r in out) == 2
    null_shards = {_shard(i) for i in (0, 1, 2)}
    want_cross = 3 if len(null_shards) > 1 else 0
    assert sum(r["cross_shard_dup_docs"] for r in out) == want_cross
