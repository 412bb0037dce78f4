"""SRC8 distributed fetch connector: retry schedule, typed exit-2
routing, failure accounting — kernel mocked, distribution real."""

from __future__ import annotations

import os

from rgd_rnaseq_workflows_spark.sources.fetch import RoutedLayout, fetch_runs


def _mk_fetch(state_dir: str):
    """Picklable kernel: counts attempts per run in the filesystem (shared
    across executor worker processes); SRRFLAKY succeeds on attempt 3,
    SRRSE routes single-end, SRRDEAD always fails."""
    def fetch(run: str) -> str:
        marker = os.path.join(state_dir, run)
        n = sum(1 for _ in open(marker)) if os.path.exists(marker) else 0
        with open(marker, "a") as f:
            f.write("x\n")
        if run == "SRRSE":
            raise RoutedLayout("SE")
        if run == "SRRDEAD":
            raise IOError("connection reset")
        if run == "SRRFLAKY" and n < 2:
            raise IOError("timeout")
        return "PE"
    return fetch


def test_fetch_retry_routing_and_failure(spark, tmp_out):
    acclist = spark.createDataFrame(
        [("SRROK",), ("SRRFLAKY",), ("SRRSE",), ("SRRDEAD",)], ["Run"])
    out = {r["Run"]: r for r in fetch_runs(
        acclist, _mk_fetch(tmp_out), attempts=4,
        base_delay=0.01, max_delay=0.05).collect()}
    assert (out["SRROK"]["status"], out["SRROK"]["n_attempts"]) == ("ok", 1)
    # flaky: two transient errors, success on the 3rd attempt
    assert (out["SRRFLAKY"]["status"], out["SRRFLAKY"]["n_attempts"]) == \
        ("ok", 3)
    # exit-2 contract: routed is NOT retried and NOT a failure
    assert (out["SRRSE"]["status"], out["SRRSE"]["detail"],
            out["SRRSE"]["n_attempts"]) == ("routed", "SE", 1)
    assert (out["SRRDEAD"]["status"], out["SRRDEAD"]["n_attempts"]) == \
        ("failed", 4)
    assert "IOError" in out["SRRDEAD"]["detail"] or \
        "OSError" in out["SRRDEAD"]["detail"]
