"""Incremental corpus curation over a document stream.

The streaming twin of ``plans.corpus.curate_corpus``'s first three stages:
quality gate and language-consistency filter are STATELESS (the identical
codegen expressions run on the stream), exact dedup is the stateful
first-seen kernel (``stateful.stream_dedup``) with the document payload
carried through.

The near-dup stage (pair join + connected components) is deliberately NOT
streaming: set-similarity joins and iterative label propagation need the
full candidate neighborhood, so production runs them as a periodic batch
compaction over the streamed-in curated set (the classic hot/cold split);
``plans.corpus.curate_corpus`` is that compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX
from rgd_rnaseq_workflows_spark.streaming.stateful import stream_dedup


def quality_lang_gate(docs: DataFrame, min_tokens: int = 20) -> DataFrame:
    """The stateless curation stages — one definition, both modes."""
    return (docs.withColumn("n_tokens", TX.token_count("text"))
            .withColumn("_lang_pred", TX.lang_id("text"))
            .filter((F.col("n_tokens") >= min_tokens)
                    & (F.col("_lang_pred") == F.col("lang")))
            .drop("_lang_pred"))


def stream_curate(doc_stream: DataFrame, min_tokens: int = 20,
                  ts_col: str | None = None,
                  ttl: str = "30 minutes") -> DataFrame:
    """Streaming curation: quality + language gates, then stateful exact
    dedup emitting each content fingerprint's first qualifying document
    (payload columns carried through; state = one long per fingerprint,
    event-time bounded when ``ts_col`` is given)."""
    kept = quality_lang_gate(doc_stream, min_tokens)
    return stream_dedup(kept, ts_col=ts_col, ttl=ttl,
                        carry_cols=("lang", "source", "text", "n_tokens"))
