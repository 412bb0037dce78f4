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


class TestFileBloomIndex:
    def test_point_lookup_prunes_and_stays_correct(self, spark, tmp_out):
        from rgd_rnaseq_workflows_spark.operators.bloom import (
            bloom_pruned_point_read, file_bloom_manifest)
        # 8 files, ids hash-scattered -> min/max stats would never
        # prune, blooms must
        df = spark.range(0, 4000).withColumnRenamed("id", "key")
        path = f"{tmp_out}/tbl"
        df.repartition(8, "key").write.parquet(path)
        man = file_bloom_manifest(spark, path, "key",
                                  m_bits=4096, k=4)
        assert len(man) == 8
        got, n_read, n_total = bloom_pruned_point_read(
            spark, path, man, "key", [123, 2777], m_bits=4096, k=4)
        rows = sorted(r.key for r in got.collect())
        assert rows == [123, 2777]           # residual filter exact
        assert n_total == 8
        # each key lives in exactly 1 file; fp rate at n=500/m=4096,
        # k=4 is ~2% so reading more than 4 of 8 would mean a broken
        # index
        assert n_read <= 4

    def test_absent_key_reads_few_or_no_files(self, spark, tmp_out):
        from rgd_rnaseq_workflows_spark.operators.bloom import (
            bloom_pruned_point_read, file_bloom_manifest)
        df = spark.range(0, 1000).withColumnRenamed("id", "key")
        path = f"{tmp_out}/tbl2"
        df.repartition(4, "key").write.parquet(path)
        man = file_bloom_manifest(spark, path, "key", m_bits=4096, k=4)
        got, n_read, _ = bloom_pruned_point_read(
            spark, path, man, "key", [999_999], m_bits=4096, k=4)
        assert got.count() == 0
        assert n_read <= 1                    # fp tail at most

    def test_python_positions_match_spark(self, spark):
        import pyspark.sql.functions as F
        from rgd_rnaseq_workflows_spark.operators.bloom import (
            _km_position, _km_positions_py)
        keys = [0, 7, 12345, 987654321]
        df = spark.createDataFrame([(x,) for x in keys], "key long")
        for i in range(4):
            got = {r.key: r.p for r in df.select(
                "key", _km_position(F.col("key"), i, 4096, 17)
                .alias("p")).collect()}
            for x in keys:
                assert got[x] == _km_positions_py(x, 4096, 4, 17)[i]
