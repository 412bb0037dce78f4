"""Persisted IVF index layout — the layout-family treatment for ANN.

The in-query IVF path (``registry.ann_ivf_topk``,
``similarity.ivf_probe_sweep_report``) recomputes centroids and probes
per query; a production deployment builds the index ONCE and amortizes
it across every query. This module persists exactly two artifacts:

- the vector table written ``partitionBy(cluster)`` — one directory per
  cluster, so a probe that touches ``nprobe`` of ``k`` clusters reads
  ``nprobe/k`` of the lake via DIRECTORY pruning (coarser and cheaper
  than footer min/max pruning: the files are never even listed);
- a ``centroids`` parquet of EXACT integer centroid component sums (the
  ``ann_ivf_topk`` probe rule — ``sum(round(x·1e7))`` per dimension), so
  query-time label ranking reads a k×dims metadata table, never vectors.

Scale shape: the index build is one repartition-on-cluster write (the
write_zordered contract) plus one per-dimension aggregation; the probe
is a centroid rank (metadata) + a pruned scan + exact cosine top-k over
the probed fraction only.

Reference scope note: the reference pipeline has no ANN surface; this
is part of the LLM-pipeline extension family (similarity search scale
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CENT_SCALE = 10_000_000  # the ann_ivf_topk exact-integer centroid scale


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def centroid_components(emb: DataFrame, label_col: str = "label",
                        vec_col: str = "embedding") -> DataFrame:
    """(label, d, c): exact BIGINT centroid component sums — the
    division-free probe statistic (ranking by ``Σ c·q`` needs no
    per-label count, the count cancels in the argmax for equal-norm
    comparisons and the fixed rule is what the oracle replays)."""
    e = (emb.select(F.col(label_col).alias("label"),
                    F.posexplode(_as_double(vec_col)).alias("_d0", "_x"))
         .select("label", (F.col("_d0") + 1).alias("d"),
                 F.round(F.col("_x") * CENT_SCALE).cast("long")
                 .alias("_xi")))
    return e.groupBy("label", "d").agg(F.sum("_xi").alias("c"))


def write_ivf_index(emb: DataFrame, path: str, label_col: str = "label",
                    vec_col: str = "embedding") -> None:
    """Persist the IVF layout: vectors under ``{path}/vectors``
    partitioned by cluster directory (one repartition-on-label write —
    balanced, and every cluster's rows are co-located for the probe
    scan), centroid components under ``{path}/centroids``."""
    # Drop the source label column from the data files: its value is
    # fully preserved in the _pt partition directory, and keeping both
    # would make probe_scan's _pt->label rename produce an AMBIGUOUS
    # duplicate 'label' column when label_col='label' (ADVICE r8).
    (emb.withColumn("_pt", F.col(label_col)).drop(label_col)
     .repartition(F.col("_pt"))
     .write.mode("overwrite").partitionBy("_pt")
     .parquet(f"{path}/vectors"))
    (centroid_components(emb, label_col, vec_col)
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))


def probe_labels(spark: SparkSession, path: str, query_vec: list[float],
                 nprobe: int = 2) -> list[int]:
    """Rank clusters for one query by the exact integer centroid dot
    (the ``ann_ivf_topk`` rule: dot DESC, label ASC) and return the
    top ``nprobe`` — reads only the k×dims centroid table."""
    cents = spark.read.parquet(f"{path}/centroids")
    q = [(d + 1, int(round(float(x) * CENT_SCALE)))
         for d, x in enumerate(query_vec)]
    qdf = spark.createDataFrame(q, "d int, qx long")
    ranked = (cents.join(F.broadcast(qdf), "d")
              .groupBy("label")
              .agg(F.sum(F.col("c") * F.col("qx")).alias("_dot"))
              .orderBy(F.desc("_dot"), "label").limit(nprobe))
    return [r["label"] for r in ranked.collect()]


def probe_scan(spark: SparkSession, path: str,
               labels: list[int]) -> DataFrame:
    """The pruned probe read: an IN-list on the partition column, so
    only the probed cluster DIRECTORIES are scanned (PartitionFilters
    in the plan; unprobed files are never listed)."""
    return (spark.read.parquet(f"{path}/vectors")
            .filter(F.col("_pt").isin([int(x) for x in labels]))
            .withColumnRenamed("_pt", "label"))


def ivf_index_topk(spark: SparkSession, path: str,
                   query_vec: list[float], k: int = 10,
                   nprobe: int = 2, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """End-to-end probe: centroid rank (metadata) → pruned directory
    scan → exact rounded cosine top-k over the probed fraction. Equals
    the in-query ``ann_ivf_topk`` rule applied to the same artifacts
    (test-pinned against the unpartitioned filter)."""
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        cosine_kernel)
    labels = probe_labels(spark, path, query_vec, nprobe)
    probed = probe_scan(spark, path, labels)
    cos = cosine_kernel()
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (probed
            .select(F.col(id_col),
                    F.round(cos(_as_double(vec_col), qlit), 6)
                    .alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), id_col).limit(k))
