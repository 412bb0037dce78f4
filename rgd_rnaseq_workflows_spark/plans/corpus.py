"""End-to-end training-corpus curation: the flagship LLM-data pipeline.

Chains the engine's text + dedup operator families into one declarative
lineage (Catalyst plans the quality/language/exact-dedup stages as a
single pass over the corpus; only the near-dup stage adds joins):

1. quality gate — token count ≥ ``min_tokens`` (``functions.text``);
2. language consistency — n-gram/stopword language ID must agree with the
   labeled language (mislabeled docs are the classic web-corpus defect);
3. exact dedup — keep the lowest doc_id per content md5 fingerprint;
4. near-dup removal — PPJoin n-gram Jaccard pairs (blocked by language)
   → connected components → drop every non-keeper cluster member, so
   replay CHAINS collapse (a~b, b~c drops both b and c even when (a,c)
   was never a candidate pair).

Every stage is an independently oracle-checked operator; the composite is
itself value-checked end-to-end (registry ``corpus_full_curation``).

Scale notes (100 TB): stages 1-3 are one scan + one shuffle (the dedup
window); stage 4's cost profile is the PPJoin + component loop documented
in ``operators/dedup.py`` / ``operators/components.py``. The pipeline
never collects documents to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX
from rgd_rnaseq_workflows_spark.session import checkpoint_df
from rgd_rnaseq_workflows_spark.operators.components import connected_components
from rgd_rnaseq_workflows_spark.operators.dedup import (
    exact_dedup, hashed_shingles, ngram_jaccard_pairs)


def curate_corpus_graph(docs: DataFrame, min_tokens: int = 20,
                        shingle_n: int = 2,
                        threshold: float = 0.8
                        ) -> tuple[DataFrame, DataFrame]:
    """Curation WITH the near-dup pair graph exposed: returns
    ``(curated, pairs)`` where ``pairs`` is the checkpointed PPJoin edge
    list — computed ONCE and shared between the cluster removal here and
    any caller-side analysis (``plans.neardup.neardup_analysis``:
    keepers, PageRank, split leakage). The pair generator is the
    pipeline's most expensive stage; exposing the cached frame means a
    pipeline wanting curation + graph reports never runs it twice."""
    feats = docs.select("doc_id", "lang", "source", "text",
                        TX.token_count("text").alias("n_tokens"),
                        TX.lang_id("text").alias("lang_pred"))
    kept = (feats.filter((F.col("n_tokens") >= min_tokens)
                         & (F.col("lang_pred") == F.col("lang")))
            .drop("lang_pred"))
    # ONE shared token frame (r11): the deduped survivor set carries
    # its PPJoin shingle hashes and is materialized ONCE — it feeds the
    # near-dup pair generator (which skips its own derivation +
    # checkpoint round via hashed_col), the verify-join set table, AND
    # the final keeper anti-join. Shingles are computed post-dedup
    # (survivors only), and the expensive lineage (lang-ID stopword
    # scoring, dedup window, shingle hashing) runs exactly once.
    uniq = (exact_dedup(kept, text_col="text", id_col="doc_id")
            .withColumn("_hs", hashed_shingles("text", shingle_n))
            .transform(checkpoint_df, eager=False))
    # lazy: the only in-chain consumer is connected_components' adjacency
    # build (which checkpoints eagerly itself) — an eager checkpoint here
    # would add a whole extra materialization action; callers that also
    # analyse the returned pair frame read the same materialized blocks
    pairs = checkpoint_df(ngram_jaccard_pairs(
        uniq, block_col="lang", shingle_n=shingle_n, threshold=threshold,
        hashed_col="_hs"), eager=False)
    comps = connected_components(pairs)
    non_keepers = (comps.filter(F.col("comp") != F.col("id"))
                   .select(F.col("id").alias("doc_id")))
    return (uniq.drop("_hs").join(non_keepers, "doc_id", "left_anti"),
            pairs)


def curate_corpus(docs: DataFrame, min_tokens: int = 20,
                  shingle_n: int = 2,
                  threshold: float = 0.8) -> DataFrame:
    """documents(doc_id, lang, source, text, …) → the curated subset
    (same columns + ``n_tokens``), deterministic keeper choice."""
    curated, _pairs = curate_corpus_graph(docs, min_tokens=min_tokens,
                                          shingle_n=shingle_n,
                                          threshold=threshold)
    return curated


def curation_stats(curated: DataFrame) -> DataFrame:
    """Per-language corpus report over the curated subset."""
    return (curated.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


def build_training_mix(docs: DataFrame, benchmark: DataFrame,
                       fractions: dict[str, float],
                       min_tokens: int = 20, shingle_n: int = 2,
                       threshold: float = 0.8, contam_n: int = 4,
                       min_shared: int = 1, seed: int = 7,
                       default: float = 0.0) -> DataFrame:
    """The full training-data pipeline: curation → benchmark
    decontamination → stratified mix sampling, one lineage.

    Extends :func:`curate_corpus` with the two steps a real pretraining
    corpus needs between "clean" and "train on it": drop docs sharing
    ``contam_n``-gram shingles with the eval ``benchmark``
    (``operators.contamination``), then sample each language at its mix
    rate, deterministically in doc_id (``operators.sampling``). Both
    steps are broadcast/filter-shaped — the corpus is never reshuffled
    after the dedup stage.
    """
    from rgd_rnaseq_workflows_spark.operators.contamination import decontaminate
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        stratified_hash_sample)
    curated = curate_corpus(docs, min_tokens, shingle_n, threshold)
    clean = decontaminate(curated, benchmark, shingle_n=contam_n,
                          min_shared=min_shared)
    return stratified_hash_sample(clean, "lang", fractions, "doc_id",
                                  seed=seed, default=default)
