"""ANN scale + recall experiment: every approximate path measured
against exact brute-force cosine on a synthetic clustered corpus.

Corpus: N unit vectors in 64 dims around 32 cluster centers (numpy
seeded — deterministic), query = corpus vector 0. Unit-normalized, so
L2 order ≡ cosine order and the PQ/ADC (L2) ranking is comparable with
the cosine rankings. Reports wall time + recall@10 vs brute force.

Usage: python tools/ann_scale.py [N ...]   (default: 20000 80000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rgd_rnaseq_workflows_spark.session import get_spark

K = 10
DIMS = 64


def synth(spark, n: int):
    rng = np.random.RandomState(7)
    centers = rng.randn(32, DIMS)
    assign = rng.randint(0, 32, size=n)
    v = centers[assign] + 0.3 * rng.randn(n, DIMS)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(int(i), v[i].astype(float).tolist(), int(assign[i]))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"), v


def run(n: int) -> None:
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators import similarity as SIM
    from rgd_rnaseq_workflows_spark.operators.pq import ivfpq_topk, pq_topk
    from rgd_rnaseq_workflows_spark.operators.quantization import int8_topk

    spark = get_spark(f"ann-scale-{n}")
    emb, _ = synth(spark, n)
    emb = emb.localCheckpoint()
    print(f"\n== N={n} dims={DIMS} k={K} ==")

    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"))
    t0 = time.time()
    # K+1 then drop the query's self-match (cosine paths include it,
    # the id-keyed paths exclude it) so every method ranks the same pool
    truth = [r["vec_id"] for r in
             SIM.brute_force_topk(emb, qvec, k=K + 1).collect()
             if r["vec_id"] != 0][:K]
    t_brute = time.time() - t0
    print(f"brute cosine : {t_brute:5.1f}s  (ground truth)")

    def recall(ids):
        return len(set(ids) & set(truth)) / K

    t0 = time.time()
    got = [r["vec_id"] for r in
           SIM.lsh_topk(emb, qvec, DIMS, k=K + 1, max_hamming=4).collect()
           if r["vec_id"] != 0][:K]
    print(f"LSH prune    : {time.time()-t0:5.1f}s  recall@10="
          f"{recall(got):.2f}")

    t0 = time.time()
    got = [r["id"] for r in int8_topk(emb, query_id=0, k=K).collect()]
    print(f"int8 dot     : {time.time()-t0:5.1f}s  recall@10="
          f"{recall(got):.2f}")

    t0 = time.time()
    got = [r["id"] for r in
           pq_topk(emb, query_id=0, k=K, m=8, k_codes=16,
                   iters=2).collect()]
    print(f"PQ/ADC m=8   : {time.time()-t0:5.1f}s  recall@10="
          f"{recall(got):.2f}  (no rerank: tie-dominated, see NOTES)")

    t0 = time.time()
    got = [r["id"] for r in
           pq_topk(emb, query_id=0, k=K, m=8, k_codes=16, iters=2,
                   rerank=200).collect()]
    print(f"PQ+rerank200 : {time.time()-t0:5.1f}s  recall@10="
          f"{recall(got):.2f}")

    t0 = time.time()
    got = [r["id"] for r in
           ivfpq_topk(emb, query_id=0, k=K, kc=32, nprobe=4, m=8,
                      k_codes=16, rerank=200).collect()]
    print(f"IVFPQ+rerank : {time.time()-t0:5.1f}s  recall@10="
          f"{recall(got):.2f}")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 80000]
    for n in sizes:
        run(n)
