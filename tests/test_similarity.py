"""Similarity search: brute-force cosine vs numpy; LSH variant recall."""

from __future__ import annotations

import math
import random

import pytest

from rgd_rnaseq_workflows_spark.operators.similarity import (
    brute_force_topk, embedding_near_dup, lsh_topk, query_vector)


def _emb(spark, n=50, d=8, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(d)], i % 3)
            for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"]), rows


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(y * y for y in b)))


def test_brute_force_matches_python(spark):
    emb, rows = _emb(spark)
    q = query_vector(emb, 0)
    got = [(r["vec_id"], r["cosine_sim"])
           for r in brute_force_topk(emb, q, k=5).collect()]
    expected = sorted(((i, round(_cos(v, rows[0][1]), 6))
                       for i, v, _ in rows),
                      key=lambda t: (-t[1], t[0]))[:5]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (gi, gs), (ei, es) in zip(got, expected):
        assert gs == pytest.approx(es, abs=1e-6)


def test_lsh_topk_is_subset_with_query_hit(spark):
    emb, _ = _emb(spark)
    q = query_vector(emb, 0)
    approx = [r["vec_id"] for r in
              lsh_topk(emb, q, dims=8, k=5, n_planes=8,
                       max_hamming=3).collect()]
    # the query itself (cosine 1.0, hamming 0) must always survive pruning
    assert approx[0] == 0
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=50).collect()]
    assert set(approx) <= set(exact)


def test_embedding_near_dup_blocked(spark):
    emb, rows = _emb(spark)
    # plant a duplicate of vec 0 in the same label block (3 ≡ 0 mod 3)
    dup = spark.createDataFrame([(999, rows[0][1], 0)],
                                ["vec_id", "embedding", "label"])
    pairs = embedding_near_dup(emb.unionByName(dup), threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 999) in got
