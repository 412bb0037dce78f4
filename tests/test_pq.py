"""Product quantization: codebook training invariants, encode bounds,
ADC exactness vs a numpy reference, and recall against exact search on
separable data."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.clustering import SCALE
from rgd_rnaseq_workflows_spark.operators.pq import (
    ADC_SCALE, adc_table, pq_encode, pq_topk)


@pytest.fixture(scope="module")
def emb_df(spark):
    # two well-separated blobs per subspace half: ids 0-9 near +e1,
    # ids 10-19 near -e1 (8 dims, m=2 -> sub_dims=4)
    rows = []
    for i in range(20):
        base = 0.5 if i < 10 else -0.5
        jitter = 0.01 * (i % 5)
        rows.append((i, [base + jitter, 0.1, 0.0, 0.0,
                         base, 0.0, jitter, 0.1], i // 10))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_encode_codes_in_range(spark, emb_df):
    enc, books = pq_encode(emb_df, m=2, k=4, iters=2)
    got = enc.select("vec_id", "codes").collect()
    valid = [{c.cid for c in cents} for cents in books]
    for r in got:
        assert len(r.codes) == 2
        for j, code in enumerate(r.codes):
            assert code in valid[j]
    # blobs land in different codes in the first subspace
    by_id = {r.vec_id: r.codes for r in got}
    assert by_id[0][0] != by_id[15][0]


def test_codebook_counts_partition_corpus(spark, emb_df):
    _, books = pq_encode(emb_df, m=2, k=4, iters=2)
    for cents in books:
        assert sum(c.n for c in cents) == 20


def test_adc_table_matches_numpy(spark, emb_df):
    enc, books = pq_encode(emb_df, m=2, k=4, iters=2)
    qvec = [0.5, 0.1, 0.0, 0.0, 0.5, 0.0, 0.0, 0.1]
    tab = adc_table(books, qvec, sub_dims=4)
    QI = np.round(np.asarray(qvec) * SCALE).astype(np.int64)
    for j, cents in enumerate(books):
        for c in cents:
            S = np.asarray(c.s, dtype=np.int64)
            num = int(((QI[j * 4:(j + 1) * 4] * c.n - S) ** 2).sum())
            want = round(num / (c.n * c.n) * ADC_SCALE)
            assert abs(tab[j][c.cid] - want) <= 1     # half-away vs py round


def test_topk_finds_same_blob(spark, emb_df):
    out = pq_topk(emb_df, query_id=3, k=5, m=2, k_codes=4, iters=2).collect()
    ids = [r.id for r in out]
    assert all(i < 10 for i in ids)                   # all from blob 0
    dists = [r.adc_dist6 for r in out]
    assert dists == sorted(dists)


def test_topk_deterministic(spark, emb_df):
    a = pq_topk(emb_df, query_id=3, k=5, m=2, k_codes=4, iters=2).collect()
    b = pq_topk(emb_df, query_id=3, k=5, m=2, k_codes=4, iters=2).collect()
    assert a == b


def test_topk_plan_is_projection_plus_takeordered(spark, emb_df):
    plan = pq_topk(emb_df, query_id=3, k=5, m=2, k_codes=4,
                   iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# --- IVF + PQ composition -----------------------------------------------------

def test_ivfpq_full_probe_equals_pq(spark, emb_df):
    # probing every inverted list must reproduce plain PQ exactly — the
    # probe only prunes, never rescores
    from rgd_rnaseq_workflows_spark.operators.pq import ivfpq_topk
    full = [(r.id, r.adc_dist6)
            for r in pq_topk(emb_df, query_id=0, k=5, m=2, k_codes=4,
                             iters=2).collect()]
    probed = [(r.id, r.adc_dist6)
              for r in ivfpq_topk(emb_df, query_id=0, k=5, kc=4, nprobe=4,
                                  c_iters=2, m=2, k_codes=4,
                                  iters=2).collect()]
    assert probed == full


def test_ivfpq_narrow_probe_subset_and_scores_consistent(spark, emb_df):
    # a 1-of-4 probe returns a subset of the corpus whose ADC scores
    # agree with the full scoring (same codebooks — trained corpus-wide)
    from rgd_rnaseq_workflows_spark.operators.pq import ivfpq_topk
    full = {r.id: r.adc_dist6
            for r in pq_topk(emb_df, query_id=0, k=20, m=2, k_codes=4,
                             iters=2).collect()}
    narrow = ivfpq_topk(emb_df, query_id=0, k=5, kc=4, nprobe=1,
                        c_iters=2, m=2, k_codes=4, iters=2).collect()
    assert 0 < len(narrow) <= 5
    for r in narrow:
        assert full[r.id] == r.adc_dist6
    # the query's own blob (+e1 cluster, ids 1-9) is what a 1-probe finds
    assert all(r.id < 10 for r in narrow)


def test_rerank_pool_is_tie_complete(spark):
    # 30 vectors collapsing into few code cells: rerank=2's pool must
    # still include the whole minimum tie group, so the exact-L2 winner
    # is found even though an id-tiebroken top-2 would miss it
    rows = []
    for i in range(30):
        base = 0.5 if i < 15 else -0.5
        rows.append((i, [base + 0.001 * i, 0.1, 0.0, 0.0,
                         base, 0.0, 0.0, 0.1], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    plain = [r.id for r in pq_topk(emb, query_id=14, k=5, m=2, k_codes=4,
                                   iters=2).collect()]
    rr = [r.id for r in pq_topk(emb, query_id=14, k=5, m=2, k_codes=4,
                                iters=2, rerank=2).collect()]
    # exact re-scoring must place the geometrically closest ids first:
    # query 14 sits at the top of the +0.5 blob, so 13, 12, ... lead
    assert rr[0] == 13
    assert set(rr) <= set(range(15))          # never the far blob
    assert len(rr) == 5 and len(plain) == 5
