"""Index compaction — the small-file hygiene pass for the persisted
index triad (``inverted_index`` / ``ivf_index`` / ``lsh_index``).

Every append/streaming epoch adds one file set per partition
directory; after K epochs a probe pays K× file-open and footer-read
cost at exactly the layer built for pruning — the classic LSM/lakehouse
small-file problem. :func:`optimize_index` rewrites the data tree into
the same layout a from-scratch build produces (one epoch directory,
one sorted run per partition) and swaps it in ATOMICALLY:

1. rewrite into ``<data>__compact_tmp`` — repartitioned on the layout's
   partition key and re-sorted on its footer-pruning column (term /
   band_hash), so row-group min/max pruning is restored to the
   single-sorted-run shape;
2. publish via rename: ``data`` → ``data__predecessor``, tmp → ``data``,
   then delete the predecessor — the reference pipeline's ``.tmp`` +
   ``mv`` idiom (RGD_Illumina_PairedEnd_RNAseq_pipeline/scripts/
   pSTARQC_v1.sh:46,63,99) applied to a directory tree. A crash before
   the first rename leaves the index untouched; between the renames,
   the predecessor directory still holds the full data for manual
   rollback.

The ``ledger`` and ``meta``/``centroids`` artifacts are NOT touched:
the ledger is the commit record of which epochs are IN the index, so a
late replay of a pre-compaction epoch still no-ops (the
``index_ledger`` contract) even though its directory no longer exists.
Probe results are identical before and after (test-pinned for all
three kinds); only the file count changes.

Single-writer discipline: run compaction when no append is in flight
(the standard maintenance-window contract of every LSM store); readers
racing the swap see either the old or the new complete tree.

Scale shape: one pruned-free full scan of the index data + one
repartition-on-partition-key write — index-scale, not corpus-scale,
and embarrassingly parallel across partition directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.index_ledger import (
    COMPACTED_EPOCH)

# kind -> (data subdir, partition column, within-partition sort tail);
# contam is the unpartitioned member (eval-scale fingerprint table —
# compaction coalesces its epoch files into one sorted run)
_LAYOUTS = {
    "bm25": ("postings", "_tb", ["term"]),
    "ivf": ("vectors", "_pt", []),
    "lsh": ("bands", "band_idx", ["band_hash"]),
    "contam": ("fingerprints", None, ["fp"]),
}


def _hadoop(spark: SparkSession, p: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _count_data_files(spark: SparkSession, p: str) -> int:
    fs, hpath, _ = _hadoop(spark, p)
    it, n = fs.listFiles(hpath, True), 0
    while it.hasNext():
        f = it.next().getPath().getName()
        if f.endswith(".parquet"):
            n += 1
    return n


def _rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, sp, jvm = _hadoop(spark, src)
    if not fs.rename(sp, jvm.org.apache.hadoop.fs.Path(dst)):
        raise IOError(f"optimize_index: rename {src} -> {dst} failed")


def optimize_index(spark: SparkSession, path: str, kind: str) -> dict:
    """Compact the ``kind`` index at ``path`` (see module docstring).
    Returns ``{"kind", "files_before", "files_after"}``."""
    if kind not in _LAYOUTS:
        raise ValueError(f"unknown index kind {kind!r}; "
                         f"one of {sorted(_LAYOUTS)}")
    sub, part, sort_tail = _LAYOUTS[kind]
    data = f"{path}/{sub}"
    tmp = f"{data}__compact_tmp"
    old = f"{data}__predecessor"
    # self-healing rollback: a crash between the two renames below
    # leaves the full data under __predecessor and NO live directory —
    # without this, every probe fails path-not-found and a retried
    # optimize_index dies in _count_data_files, so recovery would be a
    # manual rename. Roll the predecessor back before compacting.
    fs0, datap, jvm0 = _hadoop(spark, data)
    oldp0 = jvm0.org.apache.hadoop.fs.Path(old)
    if fs0.exists(oldp0) and not fs0.exists(datap):
        _rename(spark, old, data)
    files_before = _count_data_files(spark, data)

    df: DataFrame = spark.read.parquet(data)
    # collapse every epoch into ONE directory (the epoch is the target
    # directory, never a constant sort column — the index_ledger
    # sort-preservation rule); the ledger (untouched) keeps the
    # historical keys so replays still no-op
    w = df.drop("_epoch")
    if part is None:        # unpartitioned layout (eval-scale table)
        (w.coalesce(1).sortWithinPartitions(*sort_tail)
         .write.mode("overwrite")
         .parquet(f"{tmp}/_epoch={COMPACTED_EPOCH}"))
    else:
        (w.repartition(F.col(part))
         .sortWithinPartitions(part, *sort_tail)
         .write.mode("overwrite").partitionBy(part)
         .parquet(f"{tmp}/_epoch={COMPACTED_EPOCH}"))

    fs, oldp, _ = _hadoop(spark, old)
    if fs.exists(oldp):         # leftover from a crashed prior run
        fs.delete(oldp, True)
    _rename(spark, data, old)
    _rename(spark, tmp, data)
    fs.delete(oldp, True)
    return {"kind": kind, "files_before": files_before,
            "files_after": _count_data_files(spark, data)}
