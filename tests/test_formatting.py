"""Formatting fidelity (SURVEY §7.2 hard part #1): bc truncation vs printf
rounding, bc fixed-point rendering, sentinel rendering."""

from __future__ import annotations

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.formatting import (
    bc_div, bc_div_scaled, bc_fixed_str, printf_round, sentinel_na)


def test_bc_truncates_printf_rounds(spark):
    # bc scale=6 TRUNCATES (ComputeSex_v5.sh:113): 2/3 → 0.666666
    # (not ...67); printf %.2f rounds half-up
    df = spark.createDataFrame([(2, 3)], ["a", "b"])
    row = df.select(
        bc_div("a", "b").alias("bc"),
        printf_round(F.lit(0.005) + F.lit(1.0), 2).alias("pf"),
    ).collect()[0]
    assert row["bc"] == 0.666666
    assert row["pf"] == 1.01


def test_bc_div_is_exact_integer_arithmetic(spark):
    # 249/1000000 through a double gives 0.000249*1e6 = 248.999… → a
    # cast-based truncation yields 0.000248; bc (and bc_div) yield 0.000249
    df = spark.createDataFrame([(249, 1000000)], ["m", "l"])
    row = df.select(bc_div_scaled("m", "l").alias("s"),
                    bc_div("m", "l").alias("v")).collect()[0]
    assert row["s"] == 249
    assert row["v"] == 0.000249


def test_bc_matches_reference_ratio_example(spark):
    # mapped/length coverage then x/y ratio, both at scale 6 like
    # ComputeSex_v5.sh:113-124
    df = spark.createDataFrame([(100000, 152453651, 1000, 18730765)],
                               ["xm", "xl", "ym", "yl"])
    out = df.select(
        bc_div("xm", "xl").alias("xcov"),
        bc_div("ym", "yl").alias("ycov"),
    ).collect()[0]
    assert out["xcov"] == 0.000655           # truncated, not 0.000656
    assert out["ycov"] == 0.000053


def test_bc_fixed_str_matches_bc_output_format(spark):
    # bc prints 0 for zero, drops the leading integer zero below 1, and
    # keeps 6 fixed fractional digits otherwise
    df = spark.createDataFrame(
        [(0,), (249,), (2500000,), (41666666,)], "s long")
    got = [r["t"] for r in
           df.select(bc_fixed_str("s").alias("t")).orderBy("s").collect()]
    assert got == ["0", ".000249", "2.500000", "41.666666"]


def test_sentinel_na(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    got = [r["s"] for r in df.select(sentinel_na("v").alias("s")).collect()]
    assert got == ["NA", "5"]
