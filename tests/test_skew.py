"""Skew operators must be result-identical to their naive forms."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.skew import (
    replicate_join_skewed, salted_sum)


def _skewed(spark, n=2000):
    rng = random.Random(1)
    # 90% of rows share one hot key
    rows = [("hot" if rng.random() < 0.9 else f"k{rng.randint(0, 20)}",
             float(i % 100)) for i in range(n)]
    return spark.createDataFrame(rows, ["k", "v"]).repartition(8)


def test_salted_sum_matches_naive(spark):
    df = _skewed(spark)
    naive = {(r["k"]): (r["s"], r["n"]) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count("*").alias("n")).collect()}
    salted = {(r["k"]): (r["sum_v"], r["n"]) for r in
              salted_sum(df, ["k"], ["v"]).collect()}
    assert salted == naive


def test_replicate_join_matches_naive(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k5", "K5")], ["k", "label"])
    naive = sorted((r["k"], r["v"], r["label"]) for r in
                   big.join(small, "k").collect())
    fast = sorted((r["k"], r["v"], r["label"]) for r in
                  replicate_join_skewed(big, small, "k").collect())
    assert fast == naive
