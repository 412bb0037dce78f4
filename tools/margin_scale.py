"""100x scale row for the margin-alignment family (VERDICT r6 task 4).

The full-bench replica (tools/scale_sweep.py) keeps the base label
enum, so the bench form of ``ann_margin_alignment`` — blocked on
``label div 2`` — grows its blocks 100x dense and pairs 10,000x:
quadratic BY CONSTRUCTION, which says nothing about the production
design. The honest replica gives every copy REPLICA-SCOPED labels
(``label + i*1000`` — semantic groups multiply as content grows, the
ann_embedding_neardup r4 precedent) and rotates embeddings per copy, so
blocks stay base-sized while block COUNT tracks the corpus. The IVF
form additionally scales its coarse-quantizer cardinality with the
corpus (kc ∝ N / list size — its documented production contract).

Usage: python tools/margin_scale.py [--rep 100] [--sf-dir .../sf0.1]
Prints one alpha row per query; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_embeddings_replica(src: str, dst: str, rep: int) -> None:
    import duckdb
    con = duckdb.connect()
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    con.execute(f"""
COPY (
  SELECT vec_id + r.i * 100000000 AS vec_id,
         CASE WHEN r.i = 0 THEN embedding ELSE
           CAST(list_concat(embedding[(r.i % 63 + 1 + 1):],
                            embedding[1:(r.i % 63 + 1)]) AS FLOAT[])
         END AS embedding,
         label + r.i * 1000 AS label
  FROM '{src}/embeddings.parquet', range({rep}) r(i)
) TO '{dst}' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"[replica] embeddings x{rep}: {n} rows", file=sys.stderr)


def _emb(spark, path: str):
    return spark.read.parquet(path)


def time_queries(spark, path: str, kc: int) -> dict[str, float]:
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment, margin_alignment_ivf)
    emb = _emb(spark, path).withColumn("blk", F.expr("label div 2"))
    left = emb.filter(F.col("label") % 2 == 0)
    right = emb.filter(F.col("label") % 2 == 1)
    out: dict[str, float] = {}
    t0 = time.time()
    (margin_alignment(left, right, k=4, min_margin_ppm=1_200_000,
                      block_col="blk")
     .write.format("noop").mode("overwrite").save())
    out["ann_margin_alignment"] = round(time.time() - t0, 2)
    t0 = time.time()
    (margin_alignment_ivf(left.drop("blk"), right.drop("blk"),
                          kc=kc, nprobe=2, iters=2, k=4,
                          min_margin_ppm=1_200_000)
     .write.format("noop").mode("overwrite").save())
    out["ann_margin_ivf"] = round(time.time() - t0, 2)
    return out


def time_index_probe(spark, path: str, kc: int,
                     batch) -> tuple[float, float]:
    """(build_s, probe_s) for the INDEX-ROUTED margin shape: the lake
    side is fit + partitioned + centroid-summarized once (amortized —
    the ivf/lsh/bm25 probe-row convention), then a FIXED-SIZE alignment
    batch pays only its coarse ranking + the pruned scan of its probed
    lists. This is the production margin query: delta batches against
    an indexed lake, not corpus × corpus."""
    import shutil
    import tempfile

    from rgd_rnaseq_workflows_spark.operators.clustering import kmeans_fit
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        write_ivf_index)
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment_from_index)
    lake = _emb(spark, path).filter(F.col("label") % 2 == 1)
    idx = tempfile.mkdtemp(prefix="margin_idx_")
    shutil.rmtree(idx)
    t0 = time.time()
    assigned, _ = kmeans_fit(lake, k=kc, iters=2, persist=False)
    write_ivf_index(assigned, idx, label_col="cluster")
    build = round(time.time() - t0, 2)
    t0 = time.time()
    (margin_alignment_from_index(spark, idx, batch, nprobe=2, k=4,
                                 min_margin_ppm=1_200_000)
     .write.format("noop").mode("overwrite").save())
    probe = round(time.time() - t0, 2)
    shutil.rmtree(idx, ignore_errors=True)
    return build, probe


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=100)
    ap.add_argument("--out", default="/tmp/margin_scale")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--index-probe", action="store_true",
                    help="also measure the index-routed margin probe "
                         "(fixed-size batch vs 1x/Nx indexed lake)")
    args = ap.parse_args()

    base = os.path.join(args.out, "emb_1x.parquet")
    big = os.path.join(args.out, f"emb_{args.rep}x.parquet")
    if not args.skip_build:
        os.makedirs(args.out, exist_ok=True)
        build_embeddings_replica(args.sf_dir, base, 1)
        build_embeddings_replica(args.sf_dir, big, args.rep)

    from rgd_rnaseq_workflows_spark.session import get_spark
    spark = get_spark("margin_scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Arrow path once so t_1x is not JIT-bound
    time_queries(spark, base, kc=8)
    t1 = time_queries(spark, base, kc=8)
    tn = time_queries(spark, big, kc=8 * args.rep)
    print(f"\n| query | t_1x (s) | t_{args.rep}x (s) | alpha |")
    print("|---|---|---|---|")
    for name in t1:
        alpha = math.log(tn[name] / t1[name]) / math.log(args.rep)
        print(f"| {name} | {t1[name]} | {tn[name]} | {alpha:.2f} |")
    if args.index_probe:
        batch = (_emb(spark, base).filter(F.col("label") % 2 == 0)
                 .select("vec_id", "embedding"))
        batch.cache().count()       # the FIXED delta batch, both scales
        time_index_probe(spark, base, 8, batch)        # warm
        b1, p1 = time_index_probe(spark, base, 8, batch)
        bn, pn = time_index_probe(spark, big, 8 * args.rep, batch)
        alpha = math.log(pn / p1) / math.log(args.rep)
        print(f"| margin_from_index probe (fixed batch) "
              f"| {p1} | {pn} | {alpha:.2f} |")
        print(f"  (index build, amortized: {b1} s -> {bn} s)")


if __name__ == "__main__":
    main()
