"""JL random projection: exactness vs an independent reference, linearity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.projection import (
    V_SCALE, random_projection, sign_matrix)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(42)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(30)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_matches_reference_fold(spark, vecs):
    """The distributed plan equals the obvious driver-side computation:
    p_int[j] = Σ_i sign(j,i)·round(v_i·10^6), exactly."""
    rows, df = vecs
    signs = {(j, i): s for j, i, s in sign_matrix(16, 4, seed=9)}
    out = random_projection(df, 16, 4, seed=9).collect()
    got = {(r.vec_id, r.dim): r.proj for r in out}
    assert len(got) == 30 * 4
    for vid, v in rows:
        vi = [round(x * V_SCALE) for x in v]
        for j in range(4):
            expect = round(sum(signs[(j, i)] * vi[i]
                               for i in range(16)) / V_SCALE, 6)
            assert got[(vid, j)] == expect


def test_signs_are_balanced_pm1(spark):
    m = sign_matrix(64, 8, seed=5)
    vals = [s for _, _, s in m]
    assert set(vals) == {-1, 1}
    # md5-derived signs should be roughly balanced
    assert 0.4 < vals.count(1) / len(vals) < 0.6


def test_linearity(spark, vecs):
    """P(a+b) = P(a) + P(b) on exact fixed-point inputs."""
    rows, _ = vecs
    a, b = rows[0][1], rows[1][1]
    # use inputs already on the 1e-6 grid so rounding is additive
    a = [round(x, 6) for x in a]
    b = [round(x, 6) for x in b]
    df = vecs[1].sparkSession.createDataFrame(
        [(0, a), (1, b), (2, [x + y for x, y in zip(a, b)])],
        "vec_id long, embedding array<double>")
    got = {(r.vec_id, r.dim): r.proj
           for r in random_projection(df, 16, 4, seed=9).collect()}
    for j in range(4):
        assert got[(2, j)] == pytest.approx(got[(0, j)] + got[(1, j)],
                                            abs=2e-6)


def test_distance_preservation_in_expectation(spark):
    """Achlioptas guarantee sanity: with out_dims=32, projected squared
    distances (scaled by 1/out_dims) land within a loose band of the
    originals for most pairs."""
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(12)]
    spark_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = random_projection(spark_df, 64, 32, seed=1)
    pv = {i: [0.0] * 32 for i in range(12)}
    for r in proj.collect():
        pv[r.vec_id][r.dim] = r.proj
    ok = total = 0
    for i in range(12):
        for k in range(i + 1, 12):
            d_orig = sum((x - y) ** 2 for x, y in zip(rows[i][1], rows[k][1]))
            d_proj = sum((x - y) ** 2 for x, y in zip(pv[i], pv[k])) / 32
            total += 1
            if 0.4 * d_orig < d_proj < 1.9 * d_orig:
                ok += 1
    assert ok / total > 0.85
