"""Persisted MinHash/LSH bucket index — the layout-family treatment
for dedup (the ``ivf_index`` discipline applied to near-duplicate
lookup).

The in-query LSH path (``dedup.lsh_candidate_pairs``,
``dedup.cross_corpus_minhash_pairs``) re-signatures the LAKE on every
run; a production dedup service signatures the lake ONCE and amortizes
it across every delta batch and every interactive "is this document
already in the corpus?" probe. This module persists one artifact:

- the banded signature table (doc_id, band_hash) written
  ``partitionBy(_epoch, band_idx)`` and band_hash-sorted within
  partitions — one directory per band within each ingest epoch, and
  inside each band's files the rows are band_hash-ordered, so a
  probe's ``band_hash`` predicates prune at the parquet ROW-GROUP
  level (min/max footers over a sorted column — the ``write_zordered``
  contract, one-dimensional case). The ``_epoch`` level plus the
  ``ledger`` commit table make every append exactly-once retryable
  (the ``index_ledger`` contract);
- a 1-row ``meta`` parquet (num_hashes, band_size, shingle_n) so
  probes are self-describing — a probe with mismatched parameters
  would silently return garbage candidates otherwise.

Probe shapes:
- :func:`probe_lsh_index` (interactive, one document): the query's
  k-hash signature is computed on a 1-row frame (metadata-scale
  collect), then ONE index scan with an OR-of-(band_idx, band_hash)
  predicate — directory pruning on band_idx plus footer pruning on the
  sorted band_hash; the lake corpus is never touched until the caller
  verifies candidates.
- :func:`probe_lsh_index_batch` (delta crawl): the new batch's banded
  table equi-joins the index on (band_idx, band_hash) — the
  ``cross_corpus_minhash_pairs`` join with the lake side PRE-SIGNED,
  so only the delta pays the signature cost.

Candidates are candidates: exact-Jaccard verification
(``dedup.verify_jaccard``) stays a separate, corpus-joining step by
design — the index stores 3 longs per (doc, band), never shingle sets.

Reference scope note: the reference pipeline has no dedup surface;
LLM-pipeline extension family (dedup at 100 TB: the lake's signature
is the asset, not a per-run intermediate).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.dedup import (
    lsh_bands, minhash_signatures)


def _write_bands(bands: DataFrame, path: str, epoch_key: str,
                 base: bool) -> None:
    """One epoch's band-partitioned signatures + its ledger commit row
    (the exactly-once discipline of ``index_ledger``)."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        clear_dir, commit_ledger_row)
    if base:
        clear_dir(bands.sparkSession, f"{path}/bands")
    # sort by (band_idx, band_hash), not band_hash alone: the file
    # writer requires its input ordered by the partition columns and
    # would otherwise insert its own Sort(band_idx), destroying the
    # band_hash order the footer pruning relies on. The epoch is the
    # TARGET DIRECTORY, never a constant column (the index_ledger
    # sort-preservation rule); mode("overwrite") on the epoch dir = a
    # retried epoch heals its own partial files.
    (bands.repartition(F.col("band_idx"))
     .sortWithinPartitions("band_idx", "band_hash")
     .write.mode("overwrite").partitionBy("band_idx")
     .parquet(f"{path}/bands/_epoch={epoch_key}"))
    commit_ledger_row(
        bands.agg(F.count("*").cast("long").alias("n_rows")),
        path, epoch_key, base=base)


def write_lsh_index(docs: DataFrame, path: str, text_col: str = "text",
                    id_col: str = "doc_id", num_hashes: int = 8,
                    band_size: int = 2, shingle_n: int = 3) -> None:
    """Persist the banded-signature layout under ``{path}/bands``
    (epoch ``base``), the parameter row under ``{path}/meta``, and the
    base epoch's commit row under ``{path}/ledger``."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        BASE_EPOCH)
    if num_hashes % band_size:
        raise ValueError("band_size must divide num_hashes")
    sigs = minhash_signatures(docs, text_col, id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    bands = lsh_bands(sigs, id_col, num_hashes=num_hashes,
                      band_size=band_size)
    _write_bands(bands, path, BASE_EPOCH, base=True)
    spark = docs.sparkSession
    (spark.createDataFrame(
        [(num_hashes, band_size, shingle_n)],
        "num_hashes int, band_size int, shingle_n int")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))


def append_to_lsh_index(new_docs: DataFrame, path: str,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        epoch_key: str | None = None) -> bool:
    """Incremental index maintenance: a delta batch's banded signatures
    land in their own epoch directory under each band (other epochs'
    files are never rewritten). The signature parameters are read from
    the index's own meta, so an append can never silently mix hash
    families; probes see the appended docs immediately and equal a
    from-scratch rebuild (test-pinned).

    Exactly-once per ``epoch_key`` (the ``index_ledger`` contract): a
    replayed key is a no-op (returns False), a crash-retry dynamically
    overwrites its own partitions — so a retried streaming micro-batch
    never duplicates signature rows. ``epoch_key=None`` mints a fresh
    ``batch-N`` key.

    Appended files are band_hash-sorted WITHIN themselves, so footer
    pruning still skips row groups per file; ``optimize_index``
    restores the single-sorted-run layout if append churn fragments
    it (the standard LSM-ish compaction trade)."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        assert_unclaimed_epoch_dir, ledger_keys, next_batch_key)
    spark = new_docs.sparkSession
    if epoch_key is None:
        epoch_key = next_batch_key(spark, path)
        assert_unclaimed_epoch_dir(spark, f"{path}/bands", epoch_key)
    elif epoch_key in ledger_keys(spark, path):
        return False
    num_hashes, band_size, shingle_n = read_lsh_meta(spark, path)
    sigs = minhash_signatures(new_docs, text_col, id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    bands = lsh_bands(sigs, id_col, num_hashes=num_hashes,
                      band_size=band_size)
    _write_bands(bands, path, epoch_key, base=False)
    return True


def read_lsh_meta(spark: SparkSession, path: str) -> tuple[int, int, int]:
    [r] = spark.read.parquet(f"{path}/meta").collect()
    return r["num_hashes"], r["band_size"], r["shingle_n"]


def probe_lsh_index(spark: SparkSession, path: str, text: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Candidate lake doc_ids for ONE query document: distinct ids
    colliding with the query in ANY band. One pruned index scan; the
    predicate is the OR of per-band (band_idx = b AND band_hash = h)
    conjunctions, which parquet pushdown turns into directory pruning
    + sorted-footer row-group pruning."""
    num_hashes, band_size, shingle_n = read_lsh_meta(spark, path)
    qdf = spark.createDataFrame([("q", text)], f"{id_col} string, text string")
    qsig = minhash_signatures(qdf, "text", id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    qbands = lsh_bands(qsig, id_col, num_hashes=num_hashes,
                       band_size=band_size)
    keys = [(r["band_idx"], r["band_hash"]) for r in qbands.collect()]
    if not keys:    # empty/short doc: no shingles, no signature
        idx = spark.read.parquet(f"{path}/bands")
        return idx.select(id_col).filter(F.lit(False))
    pred = functools.reduce(operator.or_, [
        (F.col("band_idx") == int(b)) & (F.col("band_hash") == int(h))
        for b, h in keys])
    return (spark.read.parquet(f"{path}/bands")
            .filter(pred).select(id_col).distinct())


def probe_lsh_index_batch(spark: SparkSession, path: str,
                          new_docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Candidate (id_new, id_lake) pairs for a DELTA batch: the new
    side's banded table equi-joins the persisted index on
    (band_idx, band_hash) — the lake is pre-signed, only the delta
    pays shingle + signature cost. Distinct pairs out; verify with
    ``dedup.verify_jaccard`` against the corpora."""
    num_hashes, band_size, shingle_n = read_lsh_meta(spark, path)
    nsig = minhash_signatures(new_docs, text_col, id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    nbands = (lsh_bands(nsig, id_col, num_hashes=num_hashes,
                        band_size=band_size)
              .withColumnRenamed(id_col, "id_new"))
    idx = (spark.read.parquet(f"{path}/bands")
           .withColumnRenamed(id_col, "id_lake"))
    return (nbands.join(idx, ["band_idx", "band_hash"])
            .select("id_new", "id_lake").distinct())
