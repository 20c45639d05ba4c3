"""The driver window is generated, not narrated (VERDICT r7 #5).

``_ROUND8_WINDOW`` in ``__spark_entry__.py`` must equal the output of
``tools/rotation.round8_window()`` exactly, and satisfy the standing
invariants (size 50, unique, registered, ≥15 r1-cohort entries).  No
Spark session needed — pure ledger math over CORRECTNESS_r0*.json.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from golang_mapreduce_spark.tools import rotation


def test_round8_window_matches_ledger():
    problems = rotation.validate_window(
        entry_mod._ROUND8_WINDOW,
        rotation.latest_rounds(),
        rotation.r1_cohort(),
        rotation.registration_order(),
        new=rotation.ROUND8_NEW,
        changed=rotation.ROUND8_CHANGED,
        pins=rotation.ROUND8_PINS,
    )
    assert problems == []


def test_window_leads_registration():
    """queries() must serve the window names first, in window order."""
    names = list(entry_mod.queries())
    assert names[: len(entry_mod._ROUND8_WINDOW)] == entry_mod._ROUND8_WINDOW


def test_every_window_query_is_oracle_backed():
    oracles = entry_mod.oracle_sql()
    missing = [n for n in entry_mod._ROUND8_WINDOW if n not in oracles]
    assert missing == []


def test_floor_enforcement_is_deterministic():
    """Synthetic ledger: floor displacement removes newest-latest non-r1
    fill entries and admits the stalest unpicked r1 entries."""
    reg = [f"q{i}" for i in range(8)]
    latest = {n: (2 if i < 4 else 3) for i, n in enumerate(reg)}
    r1 = {"q5", "q6", "q7"}
    window = rotation.propose_window(
        latest, r1, reg, size=5, floor=2,
    )
    # stalest-first fill would pick q0..q3 + q5 (r1-first within r3 tier);
    # q5 alone gives 1 r1 entry, so the floor displaces q3 for q6.
    assert window == ["q0", "q1", "q2", "q5", "q6"]
    assert sum(1 for n in window if n in r1) == 2


def test_unsatisfiable_floor_raises():
    reg = ["a", "b"]
    latest = {"a": 1, "b": 1}
    try:
        rotation.propose_window(latest, {"zz"}, reg, size=2, floor=1)
    except ValueError as exc:
        assert "r1 floor" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")
