"""Adversarial pin for the bottom-k df-cap recall edge (VERDICT r7 #4).

Corpus: a 12-token boilerplate span B planted contiguously in 70
"carrier" docs and one long doc, plus a short doc that IS exactly B.
Every one of the short doc's 10 shingles therefore has document
frequency 72 > BOTTOMK_DF_CAP (64), so under the default cap the short
doc contributes zero inverted-index rows and zero sketch matches:

* the bottom-k form misses every pair involving it (this is the edge),
* the LSH form misses them too (Jaccard vs any container is <= 0.14,
  far under the banding's recall range),
* ground truth at CONTAINMENT_MIN=0.5 is exactly 71 pairs (short ⊂ long
  + short ⊂ each carrier; carrier/carrier and carrier/long overlaps sit
  well under the threshold).

Mitigation pinned here: df_cap=128 (> the planted df of 72) recovers
all 71 pairs through the same exact phase — the documented cap-bump
trade-off on ``containment_bottomk_pairs``.
"""

from __future__ import annotations

from golang_mapreduce_spark.operators.dedup import (
    containment_bottomk_pairs,
    ngram_containment_pairs,
)
from tests.test_containment_bottomk import _write_docs

N_CARRIERS = 70
SHORT_ID = 2
LONG_ID = 1


def _boilerplate_dir() -> str:
    bp = [f"bp{i:02d}" for i in range(12)]  # 10 shingles, df = 72
    rows = [
        (LONG_ID, " ".join(bp + [f"w{i:03d}" for i in range(300)])),
        (SHORT_ID, " ".join(bp)),
    ]
    for c in range(N_CARRIERS):
        fill = [f"c{c:02d}x{j:03d}" for j in range(150)]
        rows.append((100 + c, " ".join(bp + fill)))
    return _write_docs(rows)


def test_default_cap_misses_boilerplate_contained_doc(spark):
    d = _boilerplate_dir()
    got = containment_bottomk_pairs(spark, d).collect()
    short_pairs = [
        r for r in got if SHORT_ID in (r["doc_a"], r["doc_b"])
    ]
    # the edge this test exists to pin: the short doc's whole sketch
    # exceeds the df cap, so the default form goes silent on it
    assert short_pairs == []
    spark.catalog.clearCache()


def test_lsh_candidates_also_miss(spark):
    """The LSH union is NOT a sufficient fallback here: every container
    pair has Jaccard <= 10/160, invisible to the banding — which is why
    the documented mitigation is the cap bump (or de-boilerplating),
    not the union."""
    d = _boilerplate_dir()
    got = ngram_containment_pairs(spark, d).collect()
    assert [r for r in got if SHORT_ID in (r["doc_a"], r["doc_b"])] == []
    spark.catalog.clearCache()


def test_cap_bump_recovers_all_planted_pairs(spark):
    d = _boilerplate_dir()
    got = containment_bottomk_pairs(spark, d, df_cap=128).collect()
    short_pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in got
        if SHORT_ID in (r["doc_a"], r["doc_b"])
    }
    assert len(short_pairs) == N_CARRIERS + 1
    # the short side is fully contained in every container
    for r in short_pairs.values():
        side = "containment_b" if r["doc_b"] == SHORT_ID else "containment_a"
        assert r[side] == 1.0 and r["n_common"] == 10
    # no false positives: every surviving pair involves the short doc
    # (carrier/carrier overlap is 10/160, far under CONTAINMENT_MIN)
    assert len(got) == len(short_pairs)
    spark.catalog.clearCache()
