"""No operator-created persist outlives its query in a bench run
(VERDICT r7 #3).

``bench.timed`` owns the cache release: several operators persist()
DataFrames their lazy result re-reads (minhash signature trees, the
bottom-k containment shingle relation, `dedup.py:1890`), so the clear
must come from the harness after each force.  This pins both halves:

1. the known persist-creating operators DO leave caches behind when
   forced bare (the precondition that makes the release load-bearing),
2. ``bench.timed`` leaves the session cache-empty afterwards.
"""

from __future__ import annotations

import bench
from golang_mapreduce_spark.operators import dedup


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_timed_releases_operator_persists(spark, sf_dir):
    assert _n_persisted(spark) == 0 or spark.catalog.clearCache() is None
    spark.catalog.clearCache()
    # bare force: the operator's internal persists survive the action
    bench.force(dedup.containment_bottomk_pairs(spark, sf_dir))
    assert _n_persisted(spark) > 0, (
        "precondition lost: containment_bottomk_pairs no longer persists; "
        "update this test and the dedup.py lifecycle comment together"
    )
    spark.catalog.clearCache()

    # harness-owned release: timed() leaves the cache empty
    sec = bench.timed(spark, dedup.containment_bottomk_pairs, sf_dir)
    assert sec > 0
    assert _n_persisted(spark) == 0


def test_timed_releases_minhash_persists(spark, sf_dir):
    spark.catalog.clearCache()
    bench.timed(spark, dedup.dedup_minhash_pairs, sf_dir)
    assert _n_persisted(spark) == 0


def test_gate_retried_is_a_name_list():
    """Per-query retry visibility (VERDICT r8 #5): the gate's `retried`
    field is the sorted list of query names whose reported reading came
    from the warm best-of-3 path — never a bare bool, so BENCH_DETAIL
    can distinguish first-reading flags from post-retry flags."""
    import inspect

    # r16 moved the retry loop (and the `retried` bookkeeping) into
    # apply_warm_retries so the fixpoint logic is unit-testable
    src = inspect.getsource(bench.apply_warm_retries)
    assert 'gate["retried"] = sorted(retried)' in src
    assert 'gate["retried"] = True' not in src
    assert "apply_warm_retries" in inspect.getsource(bench.main)


def test_detail_written_per_cpus_and_fixed_path(tmp_path, monkeypatch):
    """VERDICT r16 #2: the driver's 8-CPU scaling run used to overwrite
    BENCH_DETAIL.json, destroying the graded 32-CPU run's per-query
    extra/big record.  write_detail now emits a cpus-suffixed copy next
    to the fixed path, so two runs at different core counts leave two
    surviving per-query records."""
    import json

    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    bench.write_detail({"cpus": "32", "queries": {"wc": 1.0}}, "32")
    bench.write_detail({"cpus": "8", "queries": {"wc": 4.0}}, "8")

    fixed = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    c32 = json.loads((tmp_path / "BENCH_DETAIL_c32.json").read_text())
    c8 = json.loads((tmp_path / "BENCH_DETAIL_c8.json").read_text())
    assert fixed["cpus"] == "8", "fixed path is the last run (back-compat)"
    assert c32["queries"]["wc"] == 1.0, "32-CPU record survived the 8-CPU run"
    assert c8["queries"]["wc"] == 4.0
    assert "write_detail" in __import__("inspect").getsource(bench.main)
