"""As-of join and interval join operators (SURVEY §2.3 extensions)."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.asof import asof_join
from rgd_rnaseq_workflows_spark.operators.intervals import (
    coverage_annotation, interval_join_binned, interval_join_broadcast)


def test_asof_join_strict_picks_latest_preceding(spark):
    probe = spark.createDataFrame(
        [("u1", 100, 1), ("u1", 50, 2), ("u2", 10, 3)],
        ["user", "t", "pid"])
    ref = spark.createDataFrame(
        [("u1", 40, 4.0), ("u1", 99, 9.0), ("u1", 100, 11.0), ("u2", 20, 5.0)],
        ["user", "t", "payload"])
    out = asof_join(probe, ref, keys=["user"], order_cols=["t"],
                    payload_cols=["payload"], strict=True)
    got = {r["pid"]: r["asof_payload"] for r in out.collect()}
    # pid=1 at t=100: latest ref strictly before is t=99 (t=100 excluded)
    assert got[1] == 9.0
    assert got[2] == 4.0
    assert got[3] is None        # u2's only ref is after the probe


def test_asof_join_non_strict_includes_same_instant(spark):
    probe = spark.createDataFrame([("u1", 100, 1)], ["user", "t", "pid"])
    ref = spark.createDataFrame([("u1", 100, 7.0)], ["user", "t", "payload"])
    out = asof_join(probe, ref, keys=["user"], order_cols=["t"],
                    payload_cols=["payload"], strict=False)
    assert out.collect()[0]["asof_payload"] == 7.0


def _intervals(spark, rows):
    return spark.createDataFrame(rows, ["chrom", "start", "end", "name"])


def test_interval_join_binned_matches_broadcast(spark):
    left = _intervals(spark, [
        ("chr1", 0, 150, "L1"), ("chr1", 140, 300, "L2"),
        ("chr1", 1000, 2000, "L3"), ("chr2", 0, 100, "L4")])
    right = _intervals(spark, [
        ("chr1", 100, 145, "R1"), ("chr1", 1999, 5000, "R2"),
        ("chr2", 100, 200, "R3"),     # touches L4 at 100 — half-open: no
        ("chr3", 0, 10, "R4")])
    binned = {(r["name"], r["b_name"]) for r in
              interval_join_binned(left, right, bin_width=100).collect()}
    bcast = {(r["name"], r["b_name"]) for r in
             interval_join_broadcast(left, right)
             .select("a.name", "b.name").toDF("name", "b_name").collect()}
    assert binned == bcast
    assert binned == {("L1", "R1"), ("L2", "R1"), ("L3", "R2")}


def test_coverage_annotation_mean_depth(spark):
    cov = spark.createDataFrame(
        [("chr1", 0, 10, 5.0), ("chr1", 10, 10, 15.0), ("chr1", 500, 10, 99.0)],
        ["chrom", "bin_start", "bin_width", "depth"])
    genes = _intervals(spark, [("chr1", 0, 20, "Xist")])
    out = coverage_annotation(cov, genes).collect()
    assert len(out) == 1
    assert out[0]["name"] == "Xist"
    assert out[0]["mean_depth"] == 10.0 and out[0]["n_bins"] == 2
