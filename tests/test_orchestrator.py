"""M7 — orchestration: markers, admission policy, retry, failure policy."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.plans.orchestrator import (
    Orchestrator, ProjectRun, Stage, with_retry)


def test_markers_skip_completed_stages(tmp_path):
    orch = Orchestrator(str(tmp_path))
    calls = []
    run = ProjectRun("PRJ1", 5, [
        Stage("step1", lambda: calls.append("step1")),
        Stage("step2", lambda: calls.append("step2")),
    ])
    assert orch.run_project(run)
    assert calls == ["step1", "step2"]
    # second invocation: both stages short-circuit on markers
    assert orch.run_project(run)
    assert calls == ["step1", "step2"]
    assert ("PRJ1", "step1", "skipped") in orch.log


def test_critical_failure_stops_noncritical_continues(tmp_path):
    orch = Orchestrator(str(tmp_path))
    calls = []

    def boom():
        raise RuntimeError("idxstats missing")

    run = ProjectRun("PRJ2", 5, [
        Stage("sex", boom, critical=False),           # ComputeSex is non-critical
        Stage("matrix", lambda: calls.append("m")),
        Stage("rsem", boom, critical=True),
        Stage("never", lambda: calls.append("n")),
    ])
    assert not orch.run_project(run)
    assert calls == ["m"]
    assert not orch.is_done("PRJ2", "sex")
    assert orch.is_done("PRJ2", "matrix")


def test_admission_waves(tmp_path):
    orch = Orchestrator(str(tmp_path), small_threshold=20,
                        max_concurrent_small=4)
    runs = [ProjectRun(f"S{i}", 5) for i in range(5)]       # 5 small
    runs.insert(2, ProjectRun("BIG", 50))                    # 1 large
    waves = orch.schedule(runs)
    # S0,S1 admitted; BIG blocks the wave → runs alone; rest ≤4 together
    assert waves == [["S0", "S1"], ["BIG"], ["S2", "S3", "S4"]]


def test_with_retry_backoff_then_success():
    state = {"n": 0}
    delays = []

    def flaky():
        state["n"] += 1
        if state["n"] < 4:
            raise IOError("net")
        return "ok"

    assert with_retry(flaky, attempts=8, base_delay=1,
                      sleep=delays.append) == "ok"
    assert delays == [1, 2, 4]          # exponential ×2


def test_with_retry_exhausts():
    def always():
        raise IOError("down")
    with pytest.raises(RuntimeError):
        with_retry(always, attempts=3, base_delay=0.01, sleep=lambda d: None)
