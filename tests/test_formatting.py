"""Formatting fidelity (SURVEY §7.2 hard part #1): bc truncation vs printf
rounding, sentinel rendering."""

from __future__ import annotations

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.formatting import (
    bc_scale_truncate, printf_round, sentinel_na)


def test_bc_truncates_printf_rounds(spark):
    # bc scale=6 TRUNCATES (ComputeSex_v5.sh:113): 1/3 → 0.333333,
    # 2/3 → 0.666666 (not ...67); printf %.2f rounds half-up
    df = spark.createDataFrame([(2.0, 3.0)], ["a", "b"])
    row = df.select(
        bc_scale_truncate(F.col("a") / F.col("b")).alias("bc"),
        printf_round(F.lit(0.005) + F.lit(1.0), 2).alias("pf"),
    ).collect()[0]
    assert row["bc"] == 0.666666
    assert row["pf"] == 1.01


def test_bc_matches_reference_ratio_example(spark):
    # mapped/length coverage then x/y ratio, both at scale 6 like
    # ComputeSex_v5.sh:113-124
    df = spark.createDataFrame([(100000, 152453651, 1000, 18730765)],
                               ["xm", "xl", "ym", "yl"])
    out = df.select(
        bc_scale_truncate(F.col("xm") / F.col("xl")).alias("xcov"),
        bc_scale_truncate(F.col("ym") / F.col("yl")).alias("ycov"),
    ).collect()[0]
    assert out["xcov"] == 0.000655           # truncated, not 0.000656
    assert out["ycov"] == 0.000053


def test_sentinel_na(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    got = [r["s"] for r in df.select(sentinel_na("v").alias("s")).collect()]
    assert got == ["NA", "5"]
