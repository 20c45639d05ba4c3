"""Property test for ``training_shard_balance_audit``: for ANY corpus —
duplicate texts, NULLs, empty/whitespace-only strings, mixed-script
words, arbitrary doc_id offsets — the audit equals a pure-Python md5
recount of the writer's hash-range rule and dedup_exact's keep-min
rule, and the conservation identities hold (shards partition the
corpus; keepers partition the normalized-text groups with NULLs as one
group).

The generated alphabet deliberately avoids characters where Python's
``str.lower()``/``str.strip()`` and Spark's ``lower()``/``trim()``
disagree (Turkish dotted I, ß, non-ASCII whitespace): the mirror
below is a TEST oracle, and the cross-ENGINE normalization parity is
the oracle-parity suite's job, not this one's."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from golang_mapreduce_spark.operators.dedup import (
    MANIFEST_SHARDS,
    SHARD_RANGE_WIDTH,
    training_shard_balance_audit,
)
from tests.test_round12_ops import _docs

WORD = st.sampled_from(
    ["Alpha", "beta", "ГАММА", "дельта", "漢字", "🚀", "x", "Q7", "mixed"]
)
TEXT = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.lists(WORD, min_size=1, max_size=6).map(" ".join),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    texts=st.lists(TEXT, min_size=1, max_size=40),
    id_base=st.integers(min_value=0, max_value=10**9),
)
def test_audit_matches_python_recount(spark, tmp_path_factory, texts, id_base):
    rows = [
        (id_base + i, t, "en", "s0", len(t) if t else 0)
        for i, t in enumerate(texts)
    ]
    d = str(tmp_path_factory.mktemp("balprop"))
    _docs(spark, d, rows)

    keep: dict[object, int] = {}
    for i, t, *_ in rows:
        h = (
            hashlib.md5(t.lower().strip().encode()).hexdigest()
            if t is not None
            else None
        )
        keep[h] = min(keep.get(h, i), i)
    keepers = set(keep.values())
    n_docs: dict[int, int] = {}
    n_kept: dict[int, int] = {}
    for i, *_ in rows:
        s = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) // SHARD_RANGE_WIDTH
        n_docs[s] = n_docs.get(s, 0) + 1
        n_kept[s] = n_kept.get(s, 0) + (1 if i in keepers else 0)

    out = {r["shard"]: r for r in training_shard_balance_audit(spark, d).collect()}
    assert set(out) == set(n_docs)
    tot_docs, tot_kept = sum(n_docs.values()), sum(n_kept.values())
    for s, r in out.items():
        assert r["n_docs"] == n_docs[s], s
        assert r["n_kept"] == n_kept[s], s
        assert r["load_factor"] == round(
            n_docs[s] * MANIFEST_SHARDS / tot_docs, 6
        ), s
        assert r["kept_load_factor"] == round(
            n_kept[s] * MANIFEST_SHARDS / tot_kept, 6
        ), s
    assert tot_docs == len(rows)
    assert tot_kept == len(keepers)
