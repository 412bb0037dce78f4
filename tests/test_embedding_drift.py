"""Centroid drift: numpy reference, empty/zero guards, SQL twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.embedding_drift import (
    SCALE, centroid_drift, centroid_drift_sql)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(240):
        v = (rng.random(8) - 0.5).astype(np.float32)
        rows.append((i, [float(x) for x in v], int(i % 3)))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def _ref(rows):
    """Reference from the fix-pointed integers (the operator's exact
    contract, applied in plain numpy)."""
    out = {}
    bygroup = {}
    for vid, emb, lab in rows:
        xi = np.round(np.array(emb, dtype=np.float64) * SCALE).astype(
            np.int64)
        bygroup.setdefault(lab, ([], []))[vid % 2].append(xi)
    for lab, (a, b) in bygroup.items():
        na, nb = len(a), len(b)
        sa = np.sum(a, axis=0, dtype=np.int64) if na else None
        sb = np.sum(b, axis=0, dtype=np.int64) if nb else None
        shift = cos = None
        if na and nb:
            d = sa.astype(object) * nb - sb.astype(object) * na
            dd = sum(int(x) * int(x) for x in d)
            shift = round(float(np.sqrt(float(dd)))
                          / (na * nb * float(SCALE)), 6)
            dot = sum(int(x) * int(y) for x, y in zip(sa, sb))
            ssa = sum(int(x) * int(x) for x in sa)
            ssb = sum(int(x) * int(x) for x in sb)
            if ssa > 0 and ssb > 0:
                cos = round(float(dot) / (np.sqrt(float(ssa))
                                          * np.sqrt(float(ssb))), 6)
        out[lab] = (na, nb, shift, cos)
    return out


def test_matches_numpy_reference(spark, vecs):
    rows = [(r.vec_id, r.embedding, r.label) for r in vecs.collect()]
    exp = _ref(rows)
    got = centroid_drift(vecs, F.col("vec_id") % 2 == 0).collect()
    assert len(got) == len(exp)
    for r in got:
        na, nb, shift, cos = exp[r.label]
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.mean_shift == pytest.approx(shift, abs=1e-6)
        assert r.cos_centroids == pytest.approx(cos, abs=1e-6)


def test_identical_batches_zero_shift(spark):
    emb = [0.25, -0.5, 0.125]
    df = spark.createDataFrame(
        [(0, emb, 0), (1, emb, 0)],
        "vec_id long, embedding array<float>, label int")
    [r] = centroid_drift(df, F.col("vec_id") % 2 == 0).collect()
    assert r.mean_shift == 0.0 and r.cos_centroids == 1.0


def test_single_sided_group_null_metrics(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2], 0), (2, [0.3, 0.1], 0)],
        "vec_id long, embedding array<float>, label int")
    [r] = centroid_drift(df, F.col("vec_id") % 2 == 0).collect()
    assert (r.n_a, r.n_b) == (2, 0)
    assert r.mean_shift is None and r.cos_centroids is None


def test_zero_vector_batch_null_cosine(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [0.3, 0.1], 0)],
        "vec_id long, embedding array<float>, label int")
    [r] = centroid_drift(df, F.col("vec_id") % 2 == 0).collect()
    assert r.cos_centroids is None
    assert r.mean_shift is not None


def test_matches_sql_twin(spark, vecs):
    import duckdb
    got = sorted(tuple(r) for r in
                 centroid_drift(vecs, F.col("vec_id") % 2 == 0).collect())
    con = duckdb.connect()
    con.register("emb", vecs.toPandas())
    exp = sorted(tuple(r) for r in con.execute(centroid_drift_sql(
        "emb", "vec_id % 2 = 0")).fetchall())
    assert got == exp
