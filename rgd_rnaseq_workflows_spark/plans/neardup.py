"""Near-duplicate graph analysis: compute the pair graph ONCE, feed
every consumer.

The pair generators (PPJoin n-gram Jaccard, SimHash Hamming blocks) are
by far the most expensive stage of any near-dup pipeline — shingle
explode + candidate join over the whole corpus. Three registry consumers
need the resulting edge list: connected components / cluster keepers
(``operators.components``), PageRank centrality (``operators.graph``),
and the train/val/test leakage report. Run standalone, each recomputes
the pairs from scratch; a pipeline that wants all three should pay the
pair-gen cost exactly once.

``near_dup_pairs_cached`` materializes the pair graph behind a lineage
truncation (reliable ``checkpoint()`` when a checkpoint dir is
configured, ``localCheckpoint`` otherwise — ``session.checkpoint_df``),
and ``neardup_analysis`` derives all three reports from that one frame.
At 100 TB the edge list is tiny next to the corpus (two longs + a score
per candidate pair), so checkpointing it is cheap insurance against
re-running the shingle join per consumer.

Mirrors the ``kmeans_fit`` contract: the returned pairs frame is
CALLER-OWNED — pass it to as many consumers as needed; nothing here
re-triggers pair generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.components import cluster_keepers
from rgd_rnaseq_workflows_spark.operators.dedup import ngram_jaccard_pairs
from rgd_rnaseq_workflows_spark.operators.graph import pagerank
from rgd_rnaseq_workflows_spark.operators.sampling import split_assign
from rgd_rnaseq_workflows_spark.session import checkpoint_df


def near_dup_pairs_cached(docs: DataFrame, shingle_n: int = 2,
                          threshold: float = 0.8,
                          block_col: str = "lang") -> DataFrame:
    """The PPJoin pair graph, materialized once (eager checkpoint) so
    downstream consumers replay an edge scan, not the shingle join."""
    pairs = ngram_jaccard_pairs(docs, block_col=block_col,
                                shingle_n=shingle_n, threshold=threshold)
    return checkpoint_df(pairs)


def leakage_report(pairs: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id", seed: int = 13) -> DataFrame:
    """Cross-split near-dup pair counts from a precomputed pair graph:
    off-diagonal rows are leakage the n-gram decontamination can't see.
    The split join is two broadcast-size key lookups."""
    s = docs.select(id_col, split_assign(id_col, seed=seed).alias("split"))
    sa = s.select(F.col(id_col).alias("id_a"), F.col("split").alias("_sa"))
    sb = s.select(F.col(id_col).alias("id_b"), F.col("split").alias("_sb"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select(F.least("_sa", "_sb").alias("split_lo"),
                    F.greatest("_sa", "_sb").alias("split_hi"))
            .groupBy("split_lo", "split_hi")
            .agg(F.count("*").alias("n_pairs")))


def neardup_analysis(pairs: DataFrame, docs: DataFrame,
                     pagerank_iters: int = 3, damping_pct: int = 85,
                     split_seed: int = 13) -> dict[str, DataFrame]:
    """All three pair-graph consumers from ONE caller-owned edge frame:
    {"keepers", "pagerank", "leakage"}. ``pairs`` should come from
    :func:`near_dup_pairs_cached` (or any checkpointed (id_a, id_b)
    frame) — this function never regenerates pairs."""
    return {
        "keepers": cluster_keepers(pairs),
        "pagerank": pagerank(pairs, iters=pagerank_iters,
                             damping_pct=damping_pct),
        "leakage": leakage_report(pairs, docs, seed=split_seed),
    }
