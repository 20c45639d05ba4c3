"""Property test for ``ivf_ce_retrieval``: for ANY small collection the
served rows equal a pure-Python mirror of the whole pipeline —
adaptive centroid family, nearest-centroid assignment, top-n_probe
probing, pool cut, pair-joint rescore, final top-k — including every
tie-break (rounded score DESC, id ASC) at every stage.

All vector components are drawn from the exact grid k/256 with
|k| ≤ 64: every value, every product, and every ≤64-term sum is
exactly representable in both float32 and float64, so the engine's
BLAS/fold arithmetic and the mirror's Python floats agree to the last
bit BEFORE the 6-dp rounding — the mirror checks ORDERING LOGIC, not
float drift (zero vectors are excluded: the NULL-similarity path is
the DuckDB oracle suite's job)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from golang_mapreduce_spark.operators.similarity import (
    EMB_DIM,
    N_QUERIES,
    RERANK_POOL,
    TOP_K,
    centroid_step,
    ivf_ce_retrieval,
    ivf_n_probe,
)
from tests.test_round12_ops import _emb_fixture

COMPONENT = st.integers(min_value=-64, max_value=64).map(lambda k: k / 256.0)


def _vector() -> st.SearchStrategy:
    # first component forced nonzero so no vector has zero norm
    head = st.sampled_from([0.25, 0.5, 1.0, 2.0, -0.5])
    tail = st.lists(COMPONENT, min_size=EMB_DIM - 1, max_size=EMB_DIM - 1)
    return st.tuples(head, tail).map(lambda t: [t[0], *t[1]])


def _rnd6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return _rnd6(dot / (math.sqrt(na) * math.sqrt(nb)))


def _ce(a, b):
    num = den = 0.0
    for x, y in zip(a, b):
        if (x >= 0) == (y >= 0):
            num += min(abs(x), abs(y))
        den += max(abs(x), abs(y))
    return _rnd6(num / den) if den else None


def _mirror(vecs) -> set:
    n = len(vecs)
    step = centroid_step(n)
    cents = [i for i in range(n) if i % step == 0]
    n_probe = ivf_n_probe(len(cents))
    cluster = {
        v: min(cents, key=lambda c: (-_cos(vecs[v], vecs[c]), c))
        for v in range(n)
    }
    want = set()
    for q in range(min(n, N_QUERIES)):
        probed = sorted(cents, key=lambda c: (-_cos(vecs[q], vecs[c]), c))[:n_probe]
        pool = [v for v in range(n) if v != q and cluster[v] in probed]
        pool.sort(key=lambda v: (-_cos(vecs[q], vecs[v]), v))
        pool = pool[:RERANK_POOL]
        bi_rank = {v: i + 1 for i, v in enumerate(pool)}
        reranked = sorted(pool, key=lambda v: (-_ce(vecs[q], vecs[v]), v))
        for i, v in enumerate(reranked[:TOP_K]):
            want.add(
                (q, v, _cos(vecs[q], vecs[v]), bi_rank[v], _ce(vecs[q], vecs[v]), i + 1)
            )
    return want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(vecs=st.lists(_vector(), min_size=2, max_size=24))
def test_served_rows_equal_the_python_mirror(spark, vecs):
    d = _emb_fixture(vecs)
    got = {
        (
            r["query_id"],
            r["neighbor_id"],
            r["bi_sim"],
            r["bi_rank"],
            r["ce_score"],
            r["ce_rank"],
        )
        for r in ivf_ce_retrieval(spark, d).collect()
    }
    assert got == _mirror(vecs)
