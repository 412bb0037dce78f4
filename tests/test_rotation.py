"""The correctness-window rotation invariant is enforced mechanically.

VERDICT r6 task 8: the ≤3-round oracle-evidence-age rule was hand-tracked
prose in NOTES; this test makes it self-enforcing by simulating the next
driver round against the current ``_RECORD_FIRST`` ordering.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import rotation_check  # noqa: E402


def test_window_rotation_invariant():
    from rgd_rnaseq_workflows_spark import registry
    ordered = list(registry.queries())
    latest, max_round = rotation_check.load_latest_green()
    if not max_round:  # fresh clone without driver records
        return
    problems = rotation_check.check(ordered, latest, max_round)
    assert not problems, "\n".join(problems)


def test_check_flags_overage_query():
    ordered = [f"q{i}" for i in range(60)]
    latest = {n: 4 for n in ordered}
    latest["q59"] = 1  # would be age 6 after r7, and it's outside the window
    problems = rotation_check.check(ordered, latest, max_round=6)
    assert any("q59" in p for p in problems)


def test_check_flags_buried_newcomer():
    ordered = [f"q{i}" for i in range(10)]
    latest = {n: 6 for n in ordered if n != "q5"}  # q5 never stamped, pos 5
    problems = rotation_check.check(ordered, latest, max_round=6, window=8)
    assert any("q5" in p for p in problems)


def test_record_first_names_exist_and_oracles_are_total():
    """_RECORD_FIRST typos are silently dropped by _ordered_names —
    pin that every priority name resolves, and that every registered
    query carries an oracle (rows-only entries would need an explicit
    exemption here)."""
    from rgd_rnaseq_workflows_spark.registry import (
        _RECORD_FIRST, REGISTRY, oracle_sql, queries)
    missing = [n for n in _RECORD_FIRST if n not in REGISTRY]
    assert not missing, f"_RECORD_FIRST names not in REGISTRY: {missing}"
    assert len(set(_RECORD_FIRST)) == len(_RECORD_FIRST)
    q, o = queries(), oracle_sql()
    assert set(o) == set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())
