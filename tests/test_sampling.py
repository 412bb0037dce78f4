"""Stratified hash sampling: determinism, monotone rates, stratum defaults."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.sampling import (
    BUCKETS, sample_bucket, stratified_hash_sample)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        ["doc_id", "lang"]).cache()


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_deterministic_and_seed_sensitive(docs):
    a = _ids(stratified_hash_sample(docs, "lang", {"en": 0.5, "de": 0.5},
                                    "doc_id", seed=1))
    b = _ids(stratified_hash_sample(docs, "lang", {"en": 0.5, "de": 0.5},
                                    "doc_id", seed=1))
    c = _ids(stratified_hash_sample(docs, "lang", {"en": 0.5, "de": 0.5},
                                    "doc_id", seed=2))
    assert a == b            # same seed → identical kept set
    assert a != c            # different seed → different set
    assert 800 < len(a) < 1200   # ~50% of 2000


def test_rates_are_monotone_nested(docs):
    # raising a stratum's rate only ADDS rows (bucket thresholds nest) —
    # the property that makes mix iteration auditable
    small = _ids(stratified_hash_sample(docs, "lang", {"en": 0.2}, "doc_id"))
    big = _ids(stratified_hash_sample(docs, "lang", {"en": 0.6}, "doc_id"))
    assert small <= big


def test_per_stratum_rates_and_default(docs):
    out = stratified_hash_sample(docs, "lang", {"en": 1.0}, "doc_id",
                                 default=0.0)
    rows = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    assert by_lang == {"en": 1000}          # de fully dropped via default


def test_bucket_range_and_bounds(docs, spark):
    from pyspark.sql import functions as F
    stats = (docs.select(sample_bucket("doc_id").alias("b"))
             .agg(F.min("b"), F.max("b")).collect()[0])
    assert 0 <= stats[0] and stats[1] < BUCKETS
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "lang", {"en": 1.5}, "doc_id")


def test_plan_is_pure_filter(docs):
    # the 100 TB contract: sampling must not shuffle — no Exchange in the
    # physical plan, just filter over the scan
    plan = (stratified_hash_sample(docs, "lang", {"en": 0.5}, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
