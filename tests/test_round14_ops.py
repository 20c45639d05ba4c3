"""Round-14 tuning-table operators.

``ivf_probe_recall_curve`` is property-tested against a full Python
mirror of the pipeline (centroid family → assignment → walk ranks →
brute-force truth → cumulative curve) on exact-grid vectors, the
test_ivf_ce_property pattern: components are k/256 with |k| ≤ 64 so
engine BLAS and Python floats agree bit-for-bit before the 6-dp
rounding — the mirror checks ORDERING AND COUNTING LOGIC, not float
drift.

``lsh_threshold_sweep`` composes the certified minhash_calibration
relation, so its test recomputes the sweep in pure Python FROM that
relation's collected rows (the composition — grid, counting,
precision, conditional recall — is what is new; the underlying
est/exact pair values are already oracle-certified and
property-tested upstream)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from golang_mapreduce_spark.operators.dedup import (
    SWEEP_GRID_N,
    SWEEP_TRUE_JACCARD,
    lsh_threshold_sweep,
    minhash_calibration,
)
from golang_mapreduce_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    centroid_step,
    ivf_n_probe,
    ivf_probe_recall_curve,
)
from tests.test_ivf_ce_property import _cos, _rnd6, _vector
from tests.test_round12_ops import _emb_fixture


def _mirror_curve(vecs) -> set:
    n = len(vecs)
    step = centroid_step(n)
    cents = [i for i in range(n) if i % step == 0]
    C = len(cents)
    npd = ivf_n_probe(C)
    cluster = {
        v: min(cents, key=lambda c: (-_cos(vecs[v], vecs[c]), c))
        for v in range(n)
    }
    sizes = Counter(cluster.values())
    rows_at = [0] * (C + 1)
    hits_at = [0] * (C + 1)
    for q in range(min(n, N_QUERIES)):
        walk = sorted(cents, key=lambda c: (-_cos(vecs[q], vecs[c]), c))
        prof = {c: i + 1 for i, c in enumerate(walk)}
        for i, c in enumerate(walk):
            rows_at[i + 1] += sizes.get(c, 0)
        truth = sorted(
            (v for v in range(n) if v != q),
            key=lambda v: (-_cos(vecs[q], vecs[v]), v),
        )[:TOP_K]
        for v in truth:
            hits_at[prof[cluster[v]]] += 1
    total = sum(rows_at)
    want, hc, rc = set(), 0, 0
    for pr in range(1, C + 1):
        hc += hits_at[pr]
        rc += rows_at[pr]
        want.add(
            (
                pr,
                hc,
                _rnd6(hc / float(N_QUERIES * TOP_K)),
                _rnd6(rc / total),
                pr == npd,
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
def test_probe_curve_equals_the_python_mirror(spark, vecs):
    d = _emb_fixture(vecs)
    got = {
        (
            r["n_probe"],
            r["hits_cum"],
            r["recall_at_k"],
            r["avg_scan_frac"],
            r["is_engine_default"],
        )
        for r in ivf_probe_recall_curve(spark, d).collect()
    }
    spark.catalog.clearCache()  # release the op's assign_ids persist
    assert got == _mirror_curve(vecs)


def test_probe_curve_fixture_invariants(spark, sf_dir):
    """On the real fixture: one row per centroid; both cumulative
    columns monotone nondecreasing; the last row covers the whole
    collection (scan fraction 1.0) and ALL truth pairs (recall 1.0 —
    every truth neighbor is assigned to some cluster, every cluster is
    walked); exactly one row carries the engine-default marker, at
    ivf_n_probe(C)."""
    rows = sorted(
        ivf_probe_recall_curve(spark, sf_dir).collect(),
        key=lambda r: r["n_probe"],
    )
    spark.catalog.clearCache()
    C = len(rows)
    assert [r["n_probe"] for r in rows] == list(range(1, C + 1))
    for a, b in zip(rows, rows[1:]):
        assert b["hits_cum"] >= a["hits_cum"]
        assert b["avg_scan_frac"] >= a["avg_scan_frac"]
    assert rows[-1]["avg_scan_frac"] == 1.0
    assert rows[-1]["hits_cum"] == N_QUERIES * TOP_K
    assert rows[-1]["recall_at_k"] == 1.0
    defaults = [r["n_probe"] for r in rows if r["is_engine_default"]]
    assert defaults == [ivf_n_probe(C)]


def test_threshold_sweep_matches_python_recount(spark, sf_dir):
    """Recompute the sweep in pure Python from the certified
    calibration relation: identical counts, precision, and conditional
    recall on every grid row (grid values rebuilt with the same
    integer/20 arithmetic)."""
    cal = [
        (r["est_jaccard"], r["exact_jaccard"])
        for r in minhash_calibration(spark, sf_dir).collect()
    ]
    spark.catalog.clearCache()
    got = {
        (
            r["threshold"],
            r["n_selected"],
            r["n_true_dups"],
            r["precision_at_t"],
            r["cond_recall"],
        )
        for r in lsh_threshold_sweep(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    n_true_all = sum(1 for e, x in cal if e >= 5 / 20.0 and x >= SWEEP_TRUE_JACCARD)
    want = set()
    for i in range(SWEEP_GRID_N):
        t = float(i + 5) / 20.0
        sel = [(e, x) for e, x in cal if e >= t]
        n_true = sum(1 for _, x in sel if x >= SWEEP_TRUE_JACCARD)
        want.add(
            (
                round(t, 2),
                len(sel),
                n_true,
                _rnd6(n_true / len(sel)) if sel else None,
                _rnd6(n_true / n_true_all) if n_true_all else None,
            )
        )
    assert got == want


def test_cache_handles_account_for_every_persist(spark, sf_dir):
    """The r14 self-review caught `getattr(projected_df,
    '_gmrs_shared_caches', ())` silently returning () because
    .select() creates a NEW DataFrame that drops Python-side attrs —
    the op persisted two relations while exposing an empty handle.
    Pin the accounting for every handle-bearing round-14 op: after a
    collect, the number of persisted RDDs equals the number of exposed
    handles, and unpersisting via the handles empties the registry
    (the lifecycle eager callers rely on)."""
    from golang_mapreduce_spark.operators.dedup import lsh_threshold_sweep
    from golang_mapreduce_spark.operators.similarity import (
        ivf_probe_recall_curve,
    )

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    # DELTA-based, not absolute-zero: earlier tests in a full-suite
    # session can leave RDD-level persists clearCache cannot release
    # (localCheckpoint marks its RDDs persistent outside the catalog)
    base = jsc.getPersistentRDDs().size()
    for fn in (lsh_threshold_sweep, ivf_probe_recall_curve):
        df = fn(spark, sf_dir)
        df.collect()
        handles = df._gmrs_shared_caches
        grown = jsc.getPersistentRDDs().size() - base
        assert grown == len(handles), (fn.__name__, grown, len(handles))
        for h in handles:
            h.unpersist(blocking=True)
        assert jsc.getPersistentRDDs().size() == base, fn.__name__
    spark.catalog.clearCache()


def test_threshold_sweep_fixture_invariants(spark, sf_dir):
    """16 grid rows at 0.25..1.00; n_selected and n_true_dups are
    nonincreasing in the threshold; the floor row (0.25 ==
    MINHASH_EST_THRESHOLD) selects every calibration pair, so its
    conditional recall is 1.0 whenever any true duplicate exists."""
    rows = sorted(
        lsh_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    spark.catalog.clearCache()
    assert len(rows) == SWEEP_GRID_N
    assert rows[0]["threshold"] == 0.25 and rows[-1]["threshold"] == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b["n_selected"] <= a["n_selected"]
        assert b["n_true_dups"] <= a["n_true_dups"]
    n_cal = minhash_calibration(spark, sf_dir).count()
    spark.catalog.clearCache()
    assert rows[0]["n_selected"] == n_cal
    if rows[0]["n_true_dups"] > 0:
        assert rows[0]["cond_recall"] == 1.0
