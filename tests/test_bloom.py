"""Bloom prefilter: no false negatives, fp rate near theory, plan purity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.bloom import (
    bloom_filter_probe, bloom_might_contain, build_bloom, suggest_params)


@pytest.fixture(scope="module")
def build_keys(spark):
    return spark.range(0, 2000).select(
        F.col("id").cast("string").alias("k"))


@pytest.fixture(scope="module")
def bitmap(build_keys):
    return build_bloom(build_keys, "k", m_bits=32768, k=7, seed=17)


def test_no_false_negatives(spark, build_keys, bitmap):
    missed = build_keys.filter(
        ~bloom_might_contain(F.col("k"), bitmap, 32768, 7, seed=17)).count()
    assert missed == 0


def test_fp_rate_near_theory(spark, bitmap):
    probe = spark.range(100_000, 140_000).select(
        F.col("id").cast("string").alias("k"))  # disjoint from build
    fp = bloom_filter_probe(probe, "k", bitmap, 32768, 7, seed=17).count()
    rate = fp / 40_000
    theory = (1 - math.exp(-7 * 2000 / 32768)) ** 7
    assert rate < 4 * max(theory, 1e-4)


def test_probe_plan_is_pure_filter(spark, bitmap):
    probe = spark.range(100).select(F.col("id").cast("string").alias("k"))
    plan = bloom_filter_probe(probe, "k", bitmap, 32768, 7, seed=17) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_suggest_params_sane():
    m, k = suggest_params(10_000, 0.01)
    assert m & (m - 1) == 0 and m >= 64
    # realized rate at suggested params is within 2x of target
    rate = (1 - math.exp(-k * 10_000 / m)) ** k
    assert rate < 0.02


def test_bad_m_raises(spark, build_keys):
    with pytest.raises(ValueError):
        build_bloom(build_keys, "k", m_bits=100, k=3)


def test_might_contain_respects_hash_fn(spark, build_keys):
    """A bitmap built with the xxhash64 fast path must be probed with
    the same family — bloom_might_contain now threads hash_fn (ADVICE
    r4: it used to probe md5 unconditionally, losing the
    no-false-negative guarantee)."""
    bm = build_bloom(build_keys, "k", m_bits=32768, k=7, seed=17,
                     hash_fn="xxhash64")
    missed = build_keys.filter(
        ~bloom_might_contain(F.col("k"), bm, 32768, 7, seed=17,
                             hash_fn="xxhash64")).count()
    assert missed == 0
