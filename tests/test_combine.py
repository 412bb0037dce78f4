"""M6 — combine/merge workflow (SURVEY SET1, SET2, JN3+AGG10)."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.plans.combine import (
    duplicate_keys, merge_matrices, union_reports)


def test_union_strips_crlf_and_blank_rows(spark):
    a = spark.createDataFrame([("GSM1", "M\r"), ("", "")],
                              ["SampleID", "Sex"])
    b = spark.createDataFrame([("GSM2", "F")], ["SampleID", "Sex"])
    out = union_reports(a, b)
    rows = sorted((r["SampleID"], r["Sex"]) for r in out.collect())
    assert rows == [("GSM1", "M"), ("GSM2", "F")]


def test_merge_matrices_inner_with_loss_metrics(spark):
    m1 = spark.createDataFrame(
        [("Xist", 1.0), ("Uty", 2.0), ("OnlyIn1", 3.0)], ["Symbol", "s1"])
    m2 = spark.createDataFrame(
        [("Xist", 9.0), ("Uty", 8.0), ("OnlyIn2", 7.0)], ["Symbol", "s2"])
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup())
    merged, loss = merge_matrices(m1, m2)
    # observe-backed: building the merge runs NO eager anti-join jobs
    assert len(tracker.getJobIdsForGroup()) == jobs_before
    assert sorted(r["Symbol"] for r in merged.collect()) == ["Uty", "Xist"]
    # the reference's row-loss warning (combine_multStrategy:247-256),
    # populated by the collect above — one pass total
    assert loss.get == {"lost_left": 1, "lost_right": 1}


def test_loss_metrics_fail_fast_before_action(spark):
    """Reading loss metrics before ANY action must raise immediately, not
    block forever on Observation.get (r2 ADVICE)."""
    import pytest

    m1 = spark.createDataFrame([("Xist", 1.0)], ["Symbol", "s1"])
    m2 = spark.createDataFrame([("Xist", 9.0)], ["Symbol", "s2"])
    merged, loss = merge_matrices(m1, m2)
    with pytest.raises(RuntimeError, match="before any action"):
        loss.get
    merged.count()
    assert loss.get == {"lost_left": 0, "lost_right": 0}


def test_duplicate_keys_intersection(spark):
    a = spark.createDataFrame([("GSM1",), ("GSM2",)], ["SampleID"])
    b = spark.createDataFrame([("GSM2",), ("GSM3",)], ["SampleID"])
    assert [r["SampleID"] for r in
            duplicate_keys(a, b, "SampleID").collect()] == ["GSM2"]


def test_combine_projects_full(spark):
    from rgd_rnaseq_workflows_spark.plans.combine import combine_projects
    pe = {
        "tpm": spark.createDataFrame([("Xist", 1.0), ("Uty", 2.0)],
                                     ["Symbol", "pe_s1"]),
        "sex": spark.createDataFrame([("GSM1", "M", "M", "2.0", "Agree")],
                                     ["SampleID", "InputSex", "ComputedSex",
                                      "Ratio", "Agreement"]),
    }
    se = {
        "tpm": spark.createDataFrame([("Xist", 9.0), ("OnlySE", 7.0)],
                                     ["Symbol", "se_s2"]),
        "sex": spark.createDataFrame([("GSM1", "M", "F", "99.0", "Conflict"),
                                      ("GSM2", "F", "F", "50.0", "Agree")],
                                     ["SampleID", "InputSex", "ComputedSex",
                                      "Ratio", "Agreement"]),
    }
    out, metrics = combine_projects(pe, se)
    assert [r["Symbol"] for r in out["tpm"].collect()] == ["Xist"]
    assert metrics["tpm_loss"].get == {"lost_left": 1, "lost_right": 1}
    assert out["sex"].count() == 3
    # GSM1 processed in both runs → flagged duplicate (comm -12 analog)
    assert metrics["duplicate_samples"] == ["GSM1"]


def test_dense_rank_palette_distinct_variant_matches_window(spark):
    """rank_distinct=True (distinct keys + broadcast join back) must give
    byte-identical assignments to the single-task whole-input window,
    including on null keys."""
    from rgd_rnaseq_workflows_spark.operators.relational import (
        dense_rank_palette)
    df = spark.createDataFrame(
        [(1, "bw"), (2, "bed"), (3, "bw"), (4, None), (5, "vcf"),
         (6, "bed")], ["track_id", "kind"])
    fast = {(r["track_id"]): r["palette_idx"]
            for r in dense_rank_palette(df, ["kind"], palette_size=2)
            .collect()}
    slow = {(r["track_id"]): r["palette_idx"]
            for r in dense_rank_palette(df, ["kind"], palette_size=2,
                                        rank_distinct=False).collect()}
    assert fast == slow and len(fast) == 6
    # the scale-safe plan's global window runs over the distinct keys
    # only: the full input reaches it through a broadcast join
    plan = (dense_rank_palette(df, ["kind"])
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "Window" in plan and "Join" in plan
