"""Connected components must handle deep graphs within the round cap.

Plain min-label propagation needs one round per hop, so its 20-round
cap silently under-merged any component with diameter > 20; the
adaptive pointer-doubling escalation (VERDICT r3 #5, ROADMAP §2) runs
{CC_PLAIN_ROUNDS} cheap plain rounds (the measured common case — real
near-dup graphs converge in 2) and then doubles reach every round, so
diameters up to ~2^16 fit in the same cap.  This test pins correctness
and the logarithmic round count on a worst-case graph shape (a single
long path — maximal diameter per edge), and the common-case action
count on a star graph.
"""

from __future__ import annotations

from golang_mapreduce_spark.operators.dedup import CC_PLAIN_ROUNDS, clusters_from


def test_long_chain_converges_logarithmically(spark):
    # Path 0-1-...-40 (diameter 40 — plain propagation would need >20
    # rounds, past the loop cap and silently wrong) plus a separate
    # 2-node component to prove labels don't bleed across components.
    rows = [(i, i + 1) for i in range(40)] + [(100, 101)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    stats: dict = {}
    got = {
        r.doc_id: r.cluster_id
        for r in clusters_from(pairs, stats=stats).collect()
    }
    want = {i: 0 for i in range(41)}
    want.update({100: 100, 101: 100})
    assert got == want
    # 4 plain rounds cover 4 hops, then reach roughly doubles per
    # doubling round: 4 -> 9 -> 19 -> 39 -> 40 needs ~4-5 doubling
    # rounds + 1 confirmation; allow 12 total — the point is "well
    # under the 20-round cap", where plain propagation needs 40+.
    assert CC_PLAIN_ROUNDS < stats["rounds"] <= 12, stats


def test_shallow_graph_stays_on_the_cheap_path(spark):
    # Star components (diameter 2, the realistic near-dup shape) must
    # converge inside the plain phase with the batched action cadence:
    # 2 rounds, 1 driver action, no doubling joins.
    rows = [(0, i) for i in range(1, 6)] + [(10, 11), (10, 12)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    stats: dict = {}
    got = {
        r.doc_id: r.cluster_id
        for r in clusters_from(pairs, stats=stats).collect()
    }
    want = {i: 0 for i in range(6)}
    want.update({10: 10, 11: 10, 12: 10})
    assert got == want
    assert stats["rounds"] <= CC_PLAIN_ROUNDS, stats
    assert stats["actions"] == 1, stats
