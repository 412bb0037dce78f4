"""Epoch ledger — the exactly-once commit record shared by the
persisted index triad (``inverted_index`` / ``ivf_index`` /
``lsh_index``).

Every index write (base build or incremental append) is an EPOCH with
a caller-supplied string key. The layout makes each epoch
independently retryable:

- data files live under a leading ``_epoch=<key>`` partition
  directory, and each epoch is written DIRECTLY to its own directory
  with mode ``overwrite`` — a retried epoch replaces exactly its own
  tree, byte-for-byte, instead of appending a second copy (and the
  within-file sort the footer pruning relies on survives, because the
  epoch never appears as a constant sort column the optimizer would
  eliminate);
- ``{path}/ledger`` is a tiny parquet table (one row per committed
  epoch, partitioned by ``_epoch``) written LAST — the commit marker.
  Appenders check it first: a replayed epoch key is a no-op.

Together the two rules close both at-least-once failure modes of
``foreachBatch`` streaming ingest (and of a retried batch CLI append):

1. retry after full success → key is in the ledger → no-op;
2. retry after a crash BETWEEN the data write and the ledger write →
   the key is absent, the retry overwrites the same ``_epoch=<key>``
   directory (healing any partial files) and then commits the ledger
   row.

Additive corpus statistics (BM25's N and Σdl, vector/doc counts) live
in the ledger rows and are summed at read time, so they can never
double-count — the meta file holds only FROZEN parameters.

The ledger also survives compaction (``index_maintenance``): compacted
data collapses into one ``_epoch=compacted`` directory while the
ledger keeps every historical key, so a late replay of a
pre-compaction epoch still no-ops.

Epoch keys must uniquely identify the DATA: one streaming query
lineage (one checkpoint dir) per ``stream_id``, and distinct batch
appends get distinct auto-keys. Restarting a stream with a FRESH
checkpoint dir resets Spark's epoch_id to 0 — pass a new ``stream_id``
or the restarted stream's first batches would be silently skipped.

Reference scope note: the reference pipeline's ``.tmp`` + ``mv``
publish idiom (RGD_Illumina_PairedEnd_RNAseq_pipeline/scripts/
pSTARQC_v1.sh:46,63,99) is the same crash-safe commit discipline,
applied here to a partitioned lake layout.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = "base"
COMPACTED_EPOCH = "compacted"
_BATCH_RE = re.compile(r"^batch-(\d+)$")


def ledger_keys(spark: SparkSession, path: str) -> set[str]:
    """Committed epoch keys. Empty set when the ledger doesn't exist
    yet (pre-v2 layouts have no ledger — appends to those must
    rebuild, which read-time schema checks surface loudly)."""
    from pyspark.errors import AnalysisException
    try:
        return {r["_epoch"] for r in
                (spark.read.parquet(f"{path}/ledger")
                 .select("_epoch").distinct().collect())}
    except AnalysisException:
        return set()


def ledger_sum(spark: SparkSession, path: str,
               cols: list[str]) -> list[int]:
    """Exact additive corpus statistics: the sum of each named ledger
    column over every committed epoch (0 for an empty ledger)."""
    from pyspark.errors import AnalysisException
    try:
        led = spark.read.parquet(f"{path}/ledger")
    except AnalysisException as e:
        raise ValueError(
            f"{path}: no ledger — this index predates the epoch-ledger "
            "layout (or the path is not an index root); rebuild it with "
            "the current writer") from e
    [r] = led.agg(*[F.sum(c).alias(c) for c in cols]).collect()
    return [int(r[c] or 0) for c in cols]


def next_batch_key(spark: SparkSession, path: str) -> str:
    """Auto key for an ad-hoc batch append: one past the highest
    committed ``batch-N``. Distinct calls get distinct keys, so plain
    CLI appends keep append semantics; pass an explicit ``epoch_key``
    to make a specific append retry-safe.

    SINGLE-WRITER contract (the compaction/maintenance-window rule):
    two writers minting auto keys concurrently would both read the
    same ledger high-water mark and the second epoch-dir overwrite
    would silently replace the first — concurrent appenders must pass
    explicit, distinct epoch keys. The appenders back this contract
    with :func:`assert_unclaimed_epoch_dir`, which detects the
    collision at write time instead of trusting the docstring."""
    nums = [int(m.group(1)) for k in ledger_keys(spark, path)
            if (m := _BATCH_RE.match(k))]
    return f"batch-{(max(nums) + 1) if nums else 1:06d}"


def assert_unclaimed_epoch_dir(spark: SparkSession, data_root: str,
                               epoch_key: str) -> None:
    """Loud collision check for a FRESHLY MINTED auto key: if the
    epoch's data directory already exists, another writer minted the
    same ``batch-N`` (read-modify-write race on the ledger high-water
    mark) and has started writing — or a prior auto append crashed
    between its data write and its ledger commit. Overwriting would
    silently replace that writer's data while the ledger shows one
    commit, so refuse instead; a crashed append is healed by retrying
    with the EXPLICIT key (the explicit path overwrites its own
    partials idempotently)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{data_root}/_epoch={epoch_key}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        raise RuntimeError(
            f"{data_root}: epoch directory for freshly minted key "
            f"{epoch_key!r} already exists — a concurrent auto-key "
            "appender or a crashed prior append owns it; pass an "
            f"explicit epoch_key (retry the crashed append with "
            f"epoch_key={epoch_key!r} to heal it, or pick a distinct "
            "key for new data)")
    # the exists() probe alone is check-then-write: two minters can
    # both pass it before either write task creates the epoch dir.
    # FileSystem.create(..., overwrite=false) is the atomic claim —
    # exactly one concurrent minter wins the marker; the loser raises
    # here instead of silently overwriting the winner's data. The
    # marker persists (a crashed claim blocks only this exact key,
    # which is the desired heal-with-explicit-key behavior).
    claim = jvm.org.apache.hadoop.fs.Path(
        f"{data_root}__claims/{epoch_key}.claim")
    try:
        out = fs.create(claim, False)
        out.close()
    except Exception as e:  # noqa: BLE001 — FS-specific AlreadyExists
        raise RuntimeError(
            f"{data_root}: epoch key {epoch_key!r} is already CLAIMED "
            "by a concurrent auto-key appender (or a crashed claim) — "
            "pass an explicit, distinct epoch_key") from e


def commit_ledger_row(stats: DataFrame, path: str,
                      epoch_key: str, base: bool = False) -> None:
    """Write the 1-row commit record for ``epoch_key``. ``base=True``
    truncates the whole ledger first (a from-scratch build); otherwise
    the write replaces only this epoch's directory (idempotent
    retry)."""
    if base:
        clear_dir(stats.sparkSession, f"{path}/ledger")
    (stats.coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/ledger/_epoch={epoch_key}"))


def clear_dir(spark: SparkSession, p: str) -> None:
    """Recursively delete ``p`` if it exists (Hadoop FS — works for
    any supported scheme, not just the local test filesystem)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)
