"""Round-15 addition: the adaptive-mass tuning table.

``ivf_mass_recall_curve`` is property-tested against a full Python
mirror (centroid family → assignment → walk mass cumulation →
brute-force truth → grid comparison) on exact-grid vectors — the
test_round14_ops pattern for its fixed-probe sibling: components are
k/256 with |k| ≤ 64 so engine BLAS and Python floats agree
bit-for-bit before the 6-dp rounding; the mirror checks the ORDERING,
MASS ARITHMETIC, AND COUNTING logic, not float drift."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from golang_mapreduce_spark.operators.similarity import (
    MASS_GRID_N,
    N_QUERIES,
    PROBE_MASS,
    TOP_K,
    centroid_step,
    ivf_mass_recall_curve,
)
from golang_mapreduce_spark.plans.checks import formatted_plan
from tests.test_ivf_ce_property import _cos, _rnd6, _vector
from tests.test_plan_quality import count_nodes
from tests.test_round12_ops import _emb_fixture


def _mirror_mass_curve(vecs) -> set:
    n = len(vecs)
    step = centroid_step(n)
    cents = [i for i in range(n) if i % step == 0]
    cluster = {
        v: min(cents, key=lambda c: (-_cos(vecs[v], vecs[c]), c))
        for v in range(n)
    }
    sizes = Counter(cluster.values())
    walks = {}
    for q in range(min(n, N_QUERIES)):
        walk = sorted(cents, key=lambda c: (-_cos(vecs[q], vecs[c]), c))
        cum, rows = 0, []
        for c in walk:
            before = cum
            cum += sizes.get(c, 0)
            rows.append((c, before, cum))
        walks[q] = rows
    needed = []
    for q, rows in walks.items():
        pos = {c: before for c, before, _ in rows}
        truth = sorted(
            (v for v in range(n) if v != q),
            key=lambda v: (-_cos(vecs[q], vecs[v]), v),
        )[:TOP_K]
        needed.extend(pos[cluster[v]] for v in truth)
    want = set()
    for g in range(1, MASS_GRID_N + 1):
        target = (n * g + MASS_GRID_N - 1) // MASS_GRID_N
        n_hits = sum(1 for m in needed if m < target)
        scanned = sum(
            min(after for _, _, after in rows if after >= target)
            for rows in walks.values()
        )
        want.add(
            (
                round(g / MASS_GRID_N, 2),
                target,
                n_hits,
                _rnd6(n_hits / float(N_QUERIES * TOP_K)),
                _rnd6(scanned / (float(N_QUERIES) * n)),
                g == int(round(PROBE_MASS * MASS_GRID_N)),
            )
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
def test_mass_curve_equals_the_python_mirror(spark, vecs):
    d = _emb_fixture(vecs)
    got = {
        (
            r["mass_frac"],
            r["target_rows"],
            r["n_hits"],
            r["recall_at_k"],
            r["avg_scan_frac"],
            r["is_engine_default"],
        )
        for r in ivf_mass_recall_curve(spark, d).collect()
    }
    spark.catalog.clearCache()  # release the op's emb/assign persists
    assert got == _mirror_mass_curve(vecs)


def test_mass_curve_fixture_invariants(spark, sf_dir):
    """On the real fixture: exactly MASS_GRID_N rows; recall and scan
    fraction monotone nondecreasing in the budget; the f = 1.0 row
    scans everything and recalls every truth pair; exactly one row
    carries the engine-default marker, at PROBE_MASS."""
    rows = sorted(
        ivf_mass_recall_curve(spark, sf_dir).collect(),
        key=lambda r: r["mass_frac"],
    )
    spark.catalog.clearCache()
    assert len(rows) == MASS_GRID_N
    for a, b in zip(rows, rows[1:]):
        assert b["recall_at_k"] >= a["recall_at_k"]
        assert b["avg_scan_frac"] >= a["avg_scan_frac"]
        assert b["target_rows"] > a["target_rows"]
    assert rows[-1]["mass_frac"] == 1.0
    assert rows[-1]["avg_scan_frac"] == 1.0
    assert rows[-1]["recall_at_k"] == 1.0
    defaults = [r["mass_frac"] for r in rows if r["is_engine_default"]]
    assert defaults == [round(PROBE_MASS, 2)]


def test_mass_curve_no_smj(spark, sf_dir):
    """Same plan discipline as its fixed-probe sibling: truth, sizes,
    walk, and grid are all broadcast; the ints-only assignment and the
    shared emb projection are persisted — NO join in the plan sorts
    anything and at most one parquet read survives cache population."""
    spark.catalog.clearCache()
    try:
        df = ivf_mass_recall_curve(spark, sf_dir)
        for c in df._gmrs_shared_caches:
            c.count()
        plan = formatted_plan(df)
        assert count_nodes(plan, "SortMergeJoin") == 0, plan
        assert count_nodes(plan, "CartesianProduct") == 0, plan
        assert "InMemoryTableScan" in plan, plan
        assert plan.count("ReadSchema: ") <= 1, plan
    finally:
        spark.catalog.clearCache()
