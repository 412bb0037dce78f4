"""k-means + SemDeDup: determinism, partition invariants, duplicate
dropping, empty-cluster semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rgd_rnaseq_workflows_spark.operators import clustering as CL

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_partitions_all_rows(spark, emb):
    n = emb.count()
    summary = CL.kmeans_summary(CL.kmeans_assign(emb, k=10, iters=2))
    rows = summary.collect()
    assert sum(r.n_members for r in rows) == n
    assert all(r.centroid_norm > 0 for r in rows)
    assert all(1 <= r.n_members for r in rows)


def test_kmeans_deterministic(spark, emb):
    a = sorted(CL.kmeans_assign(emb, k=10, iters=2)
               .select("vec_id", "cluster").collect())
    b = sorted(CL.kmeans_assign(emb, k=10, iters=2)
               .select("vec_id", "cluster").collect())
    assert a == b


def test_kmeans_recovers_planted_clusters(spark):
    """Three tight direction clusters in 8 dims (deterministic jitter):
    spherical k-means must recover them exactly. (The driver's synthetic
    labels carry no cosine structure — within/cross label mean cosine is
    ~0.001 — so recovery is asserted on planted geometry, not labels.)"""
    import math
    dims, per = 8, 20
    rows = []
    for i in range(3 * per):
        c = i % 3
        v = [0.0] * dims
        v[c] = 1.0
        for d in range(dims):
            v[d] += 0.05 * math.sin(7.0 * i + d)      # deterministic jitter
        rows.append((i, v, c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    summary = CL.kmeans_summary(CL.kmeans_assign(df, k=3, iters=3))
    got = summary.collect()
    assert len(got) == 3
    assert sum(r.top_label_n for r in got) == 3 * per  # purity 1.0
    assert all(r.n_members == per for r in got)


def test_empty_clusters_vanish(spark):
    # 4 identical points, k=3 seeded from 3 of them: every point lands in
    # the seed cluster with the smallest id; the other centroids go empty
    # after the update and must not reappear in the summary.
    df = spark.createDataFrame(
        [(i, [1.0, 2.0], 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int")
    assigned = CL.kmeans_assign(df, k=3, iters=2, vec_col="embedding")
    rows = assigned.groupBy("cluster").count().collect()
    assert len(rows) == 1
    assert rows[0]["count"] == 4


def test_semdedup_drops_planted_duplicate(spark, emb):
    max_id = emb.agg(F.max("vec_id")).first()[0]
    dup = (emb.filter(F.col("vec_id") == 0)
           .select((F.lit(max_id + 1)).alias("vec_id"), "embedding", "label"))
    with_dup = emb.unionByName(dup)
    base = CL.semdedup(emb, k=10, iters=2, threshold=0.99)
    plus = CL.semdedup(with_dup, k=10, iters=2, threshold=0.99)
    # exact duplicate co-clusters with its twin (identical distances) and
    # cosine=1.0 >= any threshold => exactly one extra drop
    assert (plus.agg(F.sum("n_dropped")).first()[0]
            == base.agg(F.sum("n_dropped")).first()[0] + 1)
    # invariant: kept + dropped == members, on every cluster
    bad = plus.filter(
        F.col("n_kept") + F.col("n_dropped") != F.col("n_members")).count()
    assert bad == 0


def test_silhouette_planted_separation(spark):
    """Two tight planted clusters far apart: every point sits near its
    own centroid -> s near 1e6, zero misplaced; flipping one label
    marks exactly that point misplaced."""
    far = [(i, [10.0 + (i % 3) * 0.01, 0.0], 0) for i in range(6)]
    near = [(10 + i, [0.0, 5.0 + (i % 3) * 0.01], 1) for i in range(6)]
    df = spark.createDataFrame(
        far + near, "vec_id long, embedding array<float>, label int")
    rep = {r["label"]: r for r in
           CL.label_silhouette_report(df).collect()}
    assert rep[0]["n_misplaced"] == 0 and rep[1]["n_misplaced"] == 0
    assert rep[0]["mean_silhouette_ppm"] > 900_000
    assert rep[1]["mean_silhouette_ppm"] > 900_000
    # flip one point's label: it lands nearer the foreign centroid
    flipped = far[:5] + [(far[5][0], far[5][1], 1)] + near
    df2 = spark.createDataFrame(
        flipped, "vec_id long, embedding array<float>, label int")
    rep2 = {r["label"]: r for r in
            CL.label_silhouette_report(df2).collect()}
    assert rep2[1]["n_misplaced"] == 1
    assert rep2[1]["mean_silhouette_ppm"] < rep[1]["mean_silhouette_ppm"]


def test_silhouette_single_label_and_singleton(spark):
    """Single-label input: no foreign centroid -> s = 0. Singleton
    label: a = 0 -> s = 1e6 (simplified-silhouette convention)."""
    one = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [0.9, 0.1], 7)],
        "vec_id long, embedding array<float>, label int")
    r = CL.label_silhouette_report(one).collect()
    assert len(r) == 1 and r[0]["mean_silhouette_ppm"] == 0
    mix = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.99, 0.01], 0), (3, [0.0, 1.0], 9)],
        "vec_id long, embedding array<float>, label int")
    r2 = {x["label"]: x for x in
          CL.label_silhouette_report(mix).collect()}
    assert r2[9]["mean_silhouette_ppm"] == 1_000_000


def test_silhouette_matches_duckdb_twin(spark, emb):
    import duckdb
    got = [tuple(r) for r in CL.label_silhouette_report(emb).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF}/embeddings.parquet'")
    exp = [tuple(r) for r in
           con.execute(CL.label_silhouette_sql()).fetchall()]
    assert got == exp
