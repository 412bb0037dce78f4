"""DSIR importance weights: direction, determinism, selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.dsir import (
    feature_log_ratios, importance_weights, select_top_fraction)


@pytest.fixture(scope="module")
def corpus_df(spark):
    target_words = "alpha beta gamma delta"
    other_words = "noise clutter filler junk"
    rows = []
    for i in range(20):
        rows.append((i, f"{target_words} {target_words}", "tgt"))
    for i in range(20, 60):
        rows.append((i, f"{other_words} {other_words}", "raw"))
    # a raw doc written in target vocabulary — should score high
    rows.append((60, target_words, "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_target_like_docs_score_higher(spark, corpus_df):
    w = importance_weights(corpus_df, F.col("src") == "tgt",
                           n_buckets=32, seed=3)
    by_id = {r.doc_id: r.weight for r in w.collect()}
    tgt_mean = sum(by_id[i] for i in range(20)) / 20
    raw_mean = sum(by_id[i] for i in range(20, 60)) / 40
    assert tgt_mean > 0 > raw_mean
    # the target-vocabulary raw doc outscores every noise doc
    assert by_id[60] > max(by_id[i] for i in range(20, 60))


def test_weights_scale_with_length(spark, corpus_df):
    """Log weights are sums over tokens: doubling a doc doubles it."""
    w = {r.doc_id: r for r in importance_weights(
        corpus_df, F.col("src") == "tgt", n_buckets=32, seed=3).collect()}
    assert w[0].n_tokens == 8 and w[60].n_tokens == 4
    assert w[0].weight == pytest.approx(2 * w[60].weight, abs=1e-6)


def test_model_is_bucket_sized(spark, corpus_df):
    model = feature_log_ratios(corpus_df, F.col("src") == "tgt",
                               n_buckets=32, seed=3)
    assert model.count() <= 32


def test_select_top_fraction(spark, corpus_df):
    w = importance_weights(corpus_df, F.col("src") == "tgt",
                           n_buckets=32, seed=3)
    top = select_top_fraction(w, 0.25)
    ids = {r.doc_id for r in top.collect()}
    assert len(ids) == 15  # 25% of 61, floored, min 1
    # the 20 double-length target docs outweigh everything (sum-of-logs
    # scales with length) — selection stays inside them, ties id-broken
    assert ids == set(range(15))
