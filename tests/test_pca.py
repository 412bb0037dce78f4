"""Distributed PCA: exact scatter statistics, eigen fit vs numpy,
projection kernel, SQL-twin equality."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from rgd_rnaseq_workflows_spark.operators.clustering import SCALE
from rgd_rnaseq_workflows_spark.operators.pca import (
    PCAModel, pca_fit, pca_project, scatter_matrix, scatter_matrix_sql)


def _vecs(spark, X):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rand(n, d, seed=5):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32) * 0.3


class TestScatter:
    def test_entries_match_numpy_exactly(self, spark):
        X = _rand(40, 6)
        got = {(r.i, r.j): r for r in
               scatter_matrix(_vecs(spark, X), dims=6).collect()}
        XI = np.floor(np.abs(X.astype(np.float64) * SCALE) + 0.5) \
            * np.sign(X)
        XI = XI.astype(np.int64)
        G = XI.T @ XI
        s = XI.sum(axis=0)
        assert len(got) == 6 * 7 // 2
        for (i, j), r in got.items():
            assert i <= j
            assert r.g_ij == G[i, j]
            assert r.s_i == s[i] and r.s_j == s[j]
            assert r.n == 40

    def test_partition_invariant(self, spark):
        X = _rand(50, 4)
        base = _vecs(spark, X)
        a = sorted(map(tuple, scatter_matrix(base, dims=4).collect()))
        b = sorted(map(tuple, scatter_matrix(
            base.repartition(7), dims=4).collect()))
        assert a == b

    def test_sql_twin_matches(self, spark):
        X = _rand(30, 5)
        sdf = sorted(map(tuple,
                         scatter_matrix(_vecs(spark, X),
                                        dims=5).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings (vec_id BIGINT, "
                    "embedding FLOAT[])")
        con.executemany(
            "INSERT INTO embeddings VALUES (?, ?)",
            [(i, [float(v) for v in X[i]]) for i in range(len(X))])
        ddf = sorted(map(tuple, con.execute(
            scatter_matrix_sql("embeddings")).fetchall()))
        assert sdf == ddf


class TestFit:
    def test_matches_direct_numpy_pca(self, spark):
        X = _rand(200, 8, seed=11)
        model = pca_fit(scatter_matrix(_vecs(spark, X), dims=8), k=3)
        # reference: numpy covariance eig on the QUANTIZED data (the
        # documented contract - fix-point at SCALE)
        XQ = np.round(X.astype(np.float64) * SCALE) / SCALE
        C = np.cov(XQ, rowvar=False, bias=True)
        vals = np.sort(np.linalg.eigvalsh(C))[::-1]
        assert np.allclose(model.explained_var, vals[:3], rtol=1e-9)
        assert np.allclose(model.mean, XQ.mean(axis=0), atol=1e-12)
        # axes orthonormal
        assert np.allclose(model.components @ model.components.T,
                           np.eye(3), atol=1e-9)
        assert model.explained_var_ratio[0] <= 1.0
        assert np.all(np.diff(model.explained_var) <= 1e-12)

    def test_sign_deterministic(self, spark):
        X = _rand(60, 5, seed=2)
        sc = scatter_matrix(_vecs(spark, X), dims=5)
        m1, m2 = pca_fit(sc, k=2), pca_fit(sc, k=2)
        assert np.array_equal(m1.components, m2.components)
        for axis in m1.components:
            assert axis[np.abs(axis).argmax()] > 0

    def test_empty_raises(self, spark):
        X = _rand(5, 3)
        empty = scatter_matrix(_vecs(spark, X), dims=3).filter("i > 99")
        with pytest.raises(ValueError):
            pca_fit(empty)


class TestProject:
    def test_projection_matches_numpy(self, spark):
        X = _rand(50, 6, seed=9)
        model = pca_fit(scatter_matrix(_vecs(spark, X), dims=6), k=2)
        out = (pca_project(_vecs(spark, X), model)
               .orderBy("vec_id").collect())
        P = (X.astype(np.float64) - model.mean) @ model.components.T
        got = np.array([r.pc for r in out])
        assert got.shape == (50, 2)
        assert np.allclose(got, P, atol=1e-9)

    def test_variance_concentrates_on_planted_axis(self, spark):
        rng = np.random.default_rng(3)
        t = rng.normal(size=(300, 1)) * 2.0
        axis = np.ones((1, 6)) / np.sqrt(6)
        X = (t @ axis + rng.normal(size=(300, 6)) * 0.01) \
            .astype(np.float32)
        model = pca_fit(scatter_matrix(_vecs(spark, X), dims=6), k=2)
        assert model.explained_var_ratio[0] > 0.99
        assert np.allclose(np.abs(model.components[0]),
                           1 / np.sqrt(6), atol=0.01)


class TestIsotropy:
    def test_matches_numpy_pairwise_identity(self, spark):
        from rgd_rnaseq_workflows_spark.operators.pca import (
            isotropy_report)
        X = _rand(30, 5, seed=9)
        row = isotropy_report(_vecs(spark, X), dims=5).collect()[0]
        XI = (np.floor(np.abs(X.astype(np.float64) * SCALE) + 0.5)
              * np.sign(X)).astype(np.int64)
        n = len(XI)
        t = int((XI * XI).sum())
        ns = int((XI.sum(axis=0) ** 2).sum())
        assert row["n_vecs"] == n
        assert row["sum_sq_norm"] == t
        assert row["sq_norm_of_sum"] == ns
        # brute-force all-pairs dot sum equals the identity
        pair_sum = 0
        for p in range(n):
            for q_ in range(n):
                if p != q_:
                    pair_sum += int(XI[p] @ XI[q_])
        assert ns - t == pair_sum
        assert row["avg_cos_bp"] == pytest.approx(
            10000.0 * pair_sum / ((n - 1) * t))

    def test_degenerate_all_zero_yields_nulls(self, spark):
        from rgd_rnaseq_workflows_spark.operators.pca import (
            isotropy_report)
        X = np.zeros((3, 4), dtype=np.float32)
        row = isotropy_report(_vecs(spark, X), dims=4).collect()[0]
        assert row["sum_sq_norm"] == 0
        assert row["avg_cos_bp"] is None
        assert row["max_dim_energy_bp"] is None

    def test_sql_twin_agrees(self, spark, tmp_path):
        from rgd_rnaseq_workflows_spark.operators.pca import (
            isotropy_report, isotropy_report_sql)
        X = _rand(25, 4, seed=11)
        df = _vecs(spark, X)
        pq = str(tmp_path / "emb.parquet")
        df.write.parquet(pq)
        got = isotropy_report(df, dims=4).collect()[0].asDict()
        con = duckdb.connect()
        want = con.execute(isotropy_report_sql(
            f"read_parquet('{pq}/*.parquet')")).df().iloc[0].to_dict()
        assert got["n_vecs"] == want["n_vecs"]
        assert got["sum_sq_norm"] == want["sum_sq_norm"]
        assert got["sq_norm_of_sum"] == want["sq_norm_of_sum"]
        assert got["avg_cos_bp"] == pytest.approx(want["avg_cos_bp"])
        assert got["max_dim_energy_bp"] == pytest.approx(
            want["max_dim_energy_bp"])
