"""Int8 quantization: hand-computed quantized values, saturation counts,
exactness of the integer dot, and top-k agreement with exact cosine on
well-separated data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.quantization import (
    QMAX, int8_topk, quantize_report, with_quantized)


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.5, 0.5, 0.0, 0.0], 0),
        (2, [0.0, 0.0, -2.0, 0.0], 1),
        (3, [0.25, 0.25, 0.25, 0.25], 1),
        (4, [0.0, 0.0, 0.0, 0.0], 2),          # zero vector
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_quantized_values(spark, emb_df):
    out = {r.vec_id: r for r in with_quantized(emb_df).collect()}
    # unit-axis vector: scale 1/127, q hits exactly +-127 on the axis
    assert out[0].q == [QMAX, 0, 0, 0]
    assert out[2].q == [0, 0, -QMAX, 0]
    assert out[2].q_scale == pytest.approx(2.0 / QMAX)
    # equal components all saturate (x/scale = 127 exactly)
    assert out[3].q == [QMAX] * 4
    # zero vector: scale 0, all-zero q (no NaN from 0/0)
    assert out[4].q_scale == 0.0
    assert out[4].q == [0, 0, 0, 0]


def test_report_counts(spark, emb_df):
    rep = {r.label: r for r in quantize_report(emb_df).collect()}
    assert rep[0].n_vecs == 2 and rep[1].n_vecs == 2 and rep[2].n_vecs == 1
    # label 0: vec0 saturates 1 component, vec1 saturates 2
    assert rep[0].n_saturated == 3
    assert rep[1].n_saturated == 5              # 1 (vec2) + 4 (vec3)
    assert rep[2].n_saturated == 0
    assert rep[2].mean_scale == 0.0


def test_int_dot_is_exact_and_topk_ordered(spark, emb_df):
    out = int8_topk(emb_df, query_id=1, k=4).collect()
    ids = [r.id for r in out]
    # zero vector scores 0 but still ranks (score desc, id) — last
    assert ids[-1] in (2, 4)                    # negatives/zeros at tail
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    by_id = {r.id: r for r in out}
    # hand-check vec0 . vec1 via the scheme: q0=[127,0,0,0] s0=1/127,
    # q1=[127,127,0,0] s1=0.5/127 -> idot=127*127, score=idot*s0*s1=0.5
    assert by_id[0].idot == QMAX * QMAX
    assert by_id[0].score == pytest.approx(0.5, abs=1e-6)


def test_quantization_error_bounded(spark):
    # random-ish but deterministic vectors: reconstruction error per
    # component is <= scale/2 by construction of round()
    rows = [(i, [math.sin(i * 7 + d) for d in range(8)], 0)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = with_quantized(df).select(
        "vec_id", "embedding", "q", "q_scale").collect()
    for r in got:
        for x, qv in zip(r.embedding, r.q):
            assert abs(qv) <= QMAX
            assert abs(x - qv * r.q_scale) <= r.q_scale / 2 + 1e-12


def test_topk_plan_broadcasts_and_never_shuffles_corpus(spark, emb_df):
    plan = int8_topk(emb_df, query_id=1, k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
