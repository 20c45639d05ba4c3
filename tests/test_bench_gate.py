"""The bench regression gate must separate uniform machine drift from a
per-query plan regression (SCALE.md 'Bench drift postmortem'): round 2
proved identical code can time 1.18x slower under load, so the gate
normalizes by the suite-median ratio before flagging.
"""

import json

import bench


def test_uniform_drift_not_flagged():
    best = json.load(open("bench_baseline.json"))["best_sec"]
    # every query 1.25x slower: pure environment, median absorbs it
    timings = {k: v * 1.25 for k, v in best.items()}
    gate = bench.regression_check(timings)
    assert gate["checked"]
    assert gate["flagged"] == {}
    assert abs(gate["env_factor"] - 1.25) < 1e-9


def test_single_query_regression_flagged_through_drift():
    best = json.load(open("bench_baseline.json"))["best_sec"]
    timings = {k: v * 1.25 for k, v in best.items()}
    victim = sorted(best)[0]
    timings[victim] = best[victim] * 1.25 * 2.0  # 2x plan regression
    gate = bench.regression_check(timings)
    assert list(gate["flagged"]) == [victim]
    assert gate["flagged"][victim]["normalized_ratio"] > 1.9


def test_missing_baseline_is_soft(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _: str(tmp_path)
    )
    gate = bench.regression_check({"wc": 1.0})
    assert gate == {"checked": False, "flagged": {}}
