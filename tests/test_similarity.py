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


def test_signature_kernel_bit_identical_to_fold(spark):
    """The vectorized Arrow signature must equal the sequential HOF fold
    bit-for-bit on real float embeddings — same plane signs, same IEEE
    accumulation order (the oracle reproduces the fold)."""
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.similarity import (
        _as_double, hyperplane_signature, with_signature)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hof = emb.select(
        "vec_id",
        hyperplane_signature(_as_double("embedding"), 64, 16).alias("s"))
    kern = with_signature(emb, dims=64, n_planes=16).select(
        "vec_id", F.col("_sig").alias("s"))
    assert hof.exceptAll(kern).count() == 0
    assert kern.exceptAll(hof).count() == 0


def test_embedding_near_dup_blocked(spark):
    emb, rows = _emb(spark)
    # plant a duplicate of vec 0 in the same label block (3 ≡ 0 mod 3)
    dup = spark.createDataFrame([(999, rows[0][1], 0)],
                                ["vec_id", "embedding", "label"])
    pairs = embedding_near_dup(emb.unionByName(dup), threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 999) in got


def test_embedding_near_dup_hot_block_guard(spark):
    """One hot label (all 120 rows) → the guard sub-blocks it by a
    secondary LSH signature: candidate pairs drop from O(n²) while a
    planted exact-duplicate pair is still reported."""
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.similarity import (
        _as_double, _blocked_candidates)

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)], 0) for i in range(120)]
    rows.append((999, rows[7][1], 0))            # exact dup of vec 7
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    def candidates(max_block):
        v = emb.select("vec_id", F.col("label").alias("_blk"),
                       _as_double("embedding").alias("v"))
        if max_block is None:
            v = v.withColumn("_sub", F.lit(0))
        else:
            from rgd_rnaseq_workflows_spark.operators.similarity import (
                hyperplane_signature_kernel)
            sizes = v.groupBy("_blk").agg(F.count("*").alias("_bn"))
            k = hyperplane_signature_kernel(8, 8, 11)
            v = (v.join(sizes, "_blk")
                 .withColumn("_sub", F.when(F.col("_bn") > max_block,
                                            k(F.col("v")))
                             .otherwise(F.lit(0))).drop("_bn"))
        return _blocked_candidates(v, "vec_id").count()

    naive = candidates(None)
    guarded = candidates(20)
    assert naive == 121 * 120 // 2
    assert guarded < naive // 4                  # sub-blocking really cuts

    pairs = embedding_near_dup(emb, threshold=0.999, max_block=20, dims=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (7, 999) in got                       # exact dup survives guard


def test_near_dup_zero_norm_vector_dropped_on_both_impls(spark):
    """Zero-norm embeddings produce NaN cosine; Spark orders NaN above
    every number, so the join path needs an explicit NaN guard to agree
    with the GEMM path's pandas mask (ADVICE r4)."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [1.0, 0.0, 0.0, 0.0], 0),
            (2, [0.0, 0.0, 0.0, 0.0], 0)]       # zero-norm → NaN cosine
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    for impl in ("gemm", "join"):
        got = {(r["id_a"], r["id_b"])
               for r in embedding_near_dup(emb, threshold=0.5,
                                           impl=impl).collect()}
        assert got == {(0, 1)}, impl


def test_margin_alignment_keeps_distinct_matches(spark):
    """The margin criterion: a left vector with ONE standout match
    passes; one sitting in a uniform neighborhood (margin ~1) drops;
    one with fewer than k positive matches drops."""
    import math

    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment)

    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    left = spark.createDataFrame(
        [(0, vec(0.0)),             # standout match at R10
         (1, vec(2.0)),             # uniform ring around it -> margin ~1
         (2, [0.0, 0.0, 1.0, 0.0])],  # only 2 positive matches -> drop
        "vec_id long, embedding array<double>")
    right = spark.createDataFrame(
        [(10, vec(0.01)),                        # ~identical to L0
         (11, vec(0.9)), (12, vec(-0.9)),        # far from L0, ~72 deg
         (13, vec(1.2)), (14, vec(-1.2)),
         # the uniform ring for L1 (four ~equally close neighbors, so
         # the top-4 mean ~= the top-1 and the margin stays ~1)
         (15, vec(1.9)), (16, vec(2.1)),
         (19, vec(1.85)), (21, vec(2.15)),
         # two positive-only neighbors for L2's plane
         (17, [0.0, 0.1, 0.99, 0.0]), (18, [0.1, 0.0, 0.99, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r.id_left: r for r in
           margin_alignment(left, right, k=4,
                            min_margin_ppm=1_150_000).collect()}
    assert 0 in out and out[0].id_right == 10      # the standout pair
    assert out[0].cosine_sim > 0.99
    assert out[0].margin6 >= 1.15
    assert 1 not in out                            # uniform neighborhood
    assert 2 not in out                            # < k positive matches
    # sanity: with no margin gate, L1 DOES have a best match
    loose = {r.id_left for r in
             margin_alignment(left, right, k=4,
                              min_margin_ppm=0).collect()}
    assert 1 in loose and 2 not in loose


def test_margin_alignment_block_col_restricts_candidates(spark):
    """With block_col the candidate join is equi on the block: a better
    match in ANOTHER block is invisible (the LSH-bucket scale path)."""
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment)
    left = spark.createDataFrame(
        [("b1", 0, [1.0, 0.0, 0.0, 0.0])],
        "blk string, vec_id long, embedding array<double>")
    right = spark.createDataFrame(
        [("b1", 10, [0.9, 0.1, 0.0, 0.0]),
         ("b1", 11, [0.5, 0.5, 0.0, 0.0]),
         ("b1", 12, [0.4, 0.6, 0.0, 0.0]),
         ("b1", 13, [0.3, 0.7, 0.0, 0.0]),
         ("b2", 20, [1.0, 0.0, 0.0, 0.0])],   # perfect, wrong block
        "blk string, vec_id long, embedding array<double>")
    out = margin_alignment(left, right, k=4, min_margin_ppm=0,
                           block_col="blk").collect()
    assert [r.id_right for r in out] == [10]


def test_margin_alignment_ivf_lists_and_recall(spark):
    """IVF blocking: the top-nprobe kernel's first choice equals the
    rank-1 assign kernel, pairs are unique, and with nprobe=kc (probe
    everything) the IVF result equals the unblocked exact form."""
    import random

    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        assign_kernel, assign_topn_kernel, kmeans_fit)
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment, margin_alignment_ivf)
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding "
                                      "array<double>")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)

    _, cents = kmeans_fit(right, k=4, iters=2, persist=False)
    both = right.withColumn("c1", assign_kernel(cents)("embedding")) \
                .withColumn("cn", assign_topn_kernel(cents, 2)("embedding"))
    for r in both.collect():
        assert r.cn[0] == r.c1 and len(set(r.cn)) == len(r.cn)

    ivf = margin_alignment_ivf(left, right, kc=4, nprobe=4, iters=2,
                               k=3, min_margin_ppm=0)
    exact = margin_alignment(left, right, k=3, min_margin_ppm=0)
    got = {(r.id_left, r.id_right, r.cosine_sim, r.margin6)
           for r in ivf.collect()}
    want = {(r.id_left, r.id_right, r.cosine_sim, r.margin6)
            for r in exact.collect()}
    assert got == want and got
    # pair uniqueness under partial probing
    part = margin_alignment_ivf(left, right, kc=4, nprobe=2, iters=2,
                                k=3, min_margin_ppm=0).collect()
    assert len({(r.id_left, r.id_right) for r in part}) == len(part)


def test_cross_split_leakage_plants_and_finds_a_leak(spark):
    # two near-identical vectors forced into different splits by their
    # ids; one orthogonal pair stays out; the report counts exactly one
    # leaking pair and the exact e6 similarity sum
    from rgd_rnaseq_workflows_spark.operators.sampling import split_assign
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        cross_split_leakage)
    from pyspark.sql import functions as F
    # find two ids that land in different splits under seed=1
    probe = spark.range(1, 200).select(
        F.col("id"), split_assign(F.col("id"), seed=1).alias("s"))
    by_split = {r["s"]: r["id"] for r in probe.collect()}
    id_tr, id_te = by_split["train"], by_split["test"]
    rows = [(int(id_tr), 0, [1.0, 0.0, 0.0]),
            (int(id_te), 0, [1.0, 0.001, 0.0]),
            (9999, 0, [0.0, 0.0, 1.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"]) \
        .select("vec_id", "label",
                F.col("embedding").cast("array<float>").alias("embedding"))
    out = cross_split_leakage(emb, threshold=0.9, seed=1).collect()
    assert len(out) == 1
    r = out[0]
    assert {r["split_lo"], r["split_hi"]} <= {"train", "val", "test"}
    assert r["n_pairs"] == 1
    assert r["sum_sim_e6"] == round(r["max_sim"] * 1_000_000)


# ---------------------------------------------------------------------------
# retrieval recall report
# ---------------------------------------------------------------------------

def test_recall_report_perfect_for_exhaustive_retriever(spark):
    """With max_hamming = n_planes the candidate set IS the corpus, so
    recall must be 10000 bp and MRR 1e6 for every query."""
    import numpy as np
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        retrieval_recall_report)
    rng = np.random.RandomState(3)
    v = rng.randn(60, 8)
    rows = [(i, v[i].tolist()) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = retrieval_recall_report(emb, [1, 5], dims=8, k=5,
                                  n_planes=8, max_hamming=8).collect()
    assert [(r["recall_bp"], r["mrr_e6"]) for r in out] == \
        [(10000, 1000000)] * 2


def test_recall_report_excludes_self_match(spark):
    import numpy as np
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        retrieval_recall_report)
    rng = np.random.RandomState(4)
    v = rng.randn(40, 8)
    rows = [(i, v[i].tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # truth@k never contains the query id itself: with k = corpus-1 an
    # exhaustive retriever still reports exactly corpus-1 hits
    out = retrieval_recall_report(emb, [3], dims=8, k=39,
                                  n_planes=8, max_hamming=8).collect()
    assert out[0]["n_hits"] == 39


def test_recall_report_matches_duckdb_twin(spark):
    import duckdb
    import numpy as np
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        retrieval_recall_report, retrieval_recall_report_sql)
    rng = np.random.RandomState(9)
    v = rng.randn(80, 16)
    rows = [(i, [float(x) for x in v[i]]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [tuple(r) for r in retrieval_recall_report(
        emb, [2, 11, 33], dims=16, k=8, n_planes=12,
        max_hamming=3).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE et(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO et VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(retrieval_recall_report_sql(
        "et", [2, 11, 33], dims=16, k=8, n_planes=12,
        max_hamming=3)).fetchall()]
    assert got == exp


def test_recall_report_rejects_bad_input(spark):
    import pytest
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        retrieval_recall_report, retrieval_recall_report_sql)
    emb = spark.createDataFrame([(0, [1.0])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        retrieval_recall_report(emb, [], dims=1)
    with pytest.raises(ValueError):
        retrieval_recall_report_sql("t", [0], dims=1, k=0)


def test_truncation_report_full_dims_is_perfect(spark):
    """Truncating to the FULL dimensionality is the identity retriever:
    recall 10000 bp and MRR 1e6 for every query."""
    import numpy as np
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        truncation_recall_report)
    rng = np.random.RandomState(6)
    v = rng.randn(50, 12)
    rows = [(i, [float(x) for x in v[i]]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = truncation_recall_report(emb, [2, 9], [12], k=5).collect()
    assert [(r["recall_bp"], r["mrr_e6"]) for r in out] == \
        [(10000, 1000000)] * 2


def test_truncation_report_matches_duckdb_twin(spark):
    import duckdb
    import numpy as np
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        truncation_recall_report, truncation_recall_report_sql)
    rng = np.random.RandomState(8)
    v = rng.randn(70, 16)
    rows = [(i, [float(x) for x in v[i]]) for i in range(70)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [tuple(r) for r in truncation_recall_report(
        emb, [1, 44], [4, 8, 16], k=6).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE et(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO et VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(truncation_recall_report_sql(
        "et", [1, 44], [4, 8, 16], k=6)).fetchall()]
    assert got == exp


def test_truncation_report_rejects_bad_input(spark):
    import pytest
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        truncation_recall_report, truncation_recall_report_sql)
    emb = spark.createDataFrame([(0, [1.0])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        truncation_recall_report(emb, [0], [])
    with pytest.raises(ValueError):
        truncation_recall_report(emb, [0], [4, 4])
    with pytest.raises(ValueError):
        truncation_recall_report_sql("t", [0], [0])


def test_ivf_probe_sweep_monotone_and_exact_at_full_probe(spark):
    """Recall is non-decreasing in nprobe, probing every cluster IS
    brute force (recall 10000, mrr 1e6), and the DuckDB twin agrees
    exactly."""
    import random

    import duckdb

    from rgd_rnaseq_workflows_spark.operators.similarity import (
        ivf_probe_sweep_report, ivf_probe_sweep_sql)

    rng = random.Random(23)
    rows = [(i, i % 3,
             [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(60)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    out = ivf_probe_sweep_report(emb, [0, 5], probes=[1, 2, 3], k=5)
    got = {(r["query_id"], r["nprobe"]):
           (r["n_hits"], r["recall_bp"], r["mrr_e6"])
           for r in out.collect()}
    assert len(got) == 6
    for q in (0, 5):
        recalls = [got[(q, p)][1] for p in (1, 2, 3)]
        assert recalls == sorted(recalls)          # monotone in nprobe
        assert got[(q, 3)] == (5, 10000, 1000000)  # full probe = brute

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, label INTEGER, "
                "embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    exp = {(q, p): (h, r, m) for q, p, h, r, m in con.execute(
        ivf_probe_sweep_sql("embeddings", [0, 5], probes=[1, 2, 3],
                            k=5)).fetchall()}
    assert got == exp


# --- hard-negative mining -----------------------------------------------------

def _brute_hardneg(rows, k, margin_ppm):
    out = []
    for aid, av, al in rows:
        cands = []
        pos = []
        for bid, bv, bl in rows:
            if bid == aid:
                continue
            ci = round(round(_cos(av, bv), 6) * 1_000_000)
            (pos if bl == al else cands).append((ci, bid))
        pb = max(p[0] for p in pos) if pos else None
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (ci, bid) in enumerate(cands[:k], 1):
            if pb is None:
                st = "no_positive"
            elif ci >= pb:
                st = "violation"
            elif ci + margin_ppm >= pb:
                st = "semi_hard"
            else:
                st = "easy"
            out.append((aid, bid, rank, ci / 1e6,
                        None if pb is None else pb / 1e6, st))
    return sorted(out)


def test_hard_negatives_match_brute_force(spark):
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        hard_negative_report)
    emb, rows = _emb(spark, n=40, d=6, seed=13)
    got = sorted(
        (r["anchor_id"], r["neg_id"], r["rank"], r["cosine_sim"],
         r["pos_best_sim"], r["status"])
        for r in hard_negative_report(emb, k=3,
                                      margin_ppm=100_000).collect())
    want = _brute_hardneg(rows, k=3, margin_ppm=100_000)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and g[5] == w[5]
        assert g[3] == pytest.approx(w[3], abs=2e-6)
        if w[4] is None:
            assert g[4] is None
        else:
            assert g[4] == pytest.approx(w[4], abs=2e-6)


def test_hard_negatives_no_positive_status(spark):
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        hard_negative_report)
    rows = [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 1), (2, [0.0, 1.0], 1)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {(r["anchor_id"], r["neg_id"]): r["status"]
           for r in hard_negative_report(emb, k=2).collect()}
    # anchor 0 has no same-label partner → no_positive on all its rows
    assert got[(0, 1)] == "no_positive" and got[(0, 2)] == "no_positive"
    # anchor 1's positive is 2 (cos≈0.11); negative 0 (cos≈0.995) wins
    assert got[(1, 0)] == "violation"


def test_hard_negatives_ivf_full_probe_exact_and_partial_subset(spark):
    """At nprobe == kc every anchor probes every list and candidates
    live in exactly one list, so the IVF pool is the full pair set and
    the report must equal the exact one; at nprobe < kc each surviving
    pair keeps its exact cosine and status taxonomy."""
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        hard_negative_report, hard_negative_report_ivf)
    emb, rows = _emb(spark, n=30, d=5, seed=29)
    cols = ["anchor_id", "neg_id", "rank", "cosine_sim", "status"]
    exact = sorted(tuple(r[c] for c in cols)
                   for r in hard_negative_report(
                       emb, k=3, margin_ppm=100_000).collect())
    full = sorted(tuple(r[c] for c in cols)
                  for r in hard_negative_report_ivf(
                      emb, kc=4, nprobe=4, iters=2, k=3,
                      margin_ppm=100_000).collect())
    assert full == exact
    exact_cos = {(a, n): c for a, n, _, c, _ in exact}
    part = hard_negative_report_ivf(emb, kc=4, nprobe=1, iters=2, k=3,
                                    margin_ppm=100_000).collect()
    assert 0 < len(part) <= len(exact)
    for r in part:
        key = (r["anchor_id"], r["neg_id"])
        if key in exact_cos:  # rank/pos_best may differ on the pool
            assert r["cosine_sim"] == pytest.approx(exact_cos[key],
                                                    abs=2e-6)
