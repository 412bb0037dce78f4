"""SparkSession factory tuned for both local testing and cluster scale.

The reference pipeline hand-tunes per-stage SLURM resources
(``scripts/STAR_bigwig2.sh:4-6`` et al.); in Spark the equivalents are
session-level knobs: AQE for runtime re-planning (skew joins, partition
coalescing), shuffle-partition sizing, and Arrow for the Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test harness runs on local[$SPARK_GRAFT_CPUS]; a production
# deployment passes its own master/conf and only inherits the SQL conf.
_SQL_CONF = {
    # AQE: runtime partition coalescing, skew-join splitting, dynamic
    # broadcast — essential at 100 TB where static planning misjudges.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime bloom-filter pushdown: a selective join's build side prunes
    # the probe-side SCAN — at 100 TB this is the difference between
    # shuffling the fact table and shuffling the matching slice.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas boundary (vectorized UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: reference semantics are permissive (awk math never throws).
    "spark.sql.ansi.enabled": "false",
}


def engine_session(spark: SparkSession) -> SparkSession:
    """A conf-isolated sibling of ``spark`` carrying the engine's
    documented SQL semantics (UTC, ANSI off, AQE, Arrow, nanos-as-long
    parquet reads) — WITHOUT mutating the caller's session.

    Registry frames are lazy: timeZone/ansi are read at *execution*
    time, so a set-then-restore scope around the builder would evaluate
    the query under the restored (wrong) confs when the caller collects
    it later. Binding the frames to a separate session solves this
    properly — ``newSession()`` shares the SparkContext (executors,
    cached blocks, addPyFile state, checkpoint dir) but owns its
    SQLConf, so the engine's pins live exactly as long as the frames
    that need them and the caller's ANSI/timezone choices survive
    untouched. Cached per SparkContext; calling it on the engine clone
    itself is the identity.
    """
    if getattr(spark, "_rgd_is_engine", False):
        return spark
    sc = spark.sparkContext
    eng = getattr(sc, "_rgd_engine_session", None)
    if eng is None:
        eng = spark.newSession()
        # newSession() seeds from the CONTEXT conf, not the sibling's
        # runtime conf — every engine-required value must be set here
        for k, v in _SQL_CONF.items():
            eng.conf.set(k, v)
        # events.parquet stores TIMESTAMP(NANOS) (registry._events)
        eng.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        eng._rgd_is_engine = True
        sc._rgd_engine_session = eng
    return eng


def checkpoint_df(df, eager: bool = True):
    """Truncate a DataFrame's lineage for iterative / multiply-consumed
    plans (connected components, LSH shingle tables, BPE vocab rounds).

    ``localCheckpoint`` keeps blocks on executor storage only — fast, but
    on a real cluster a lost executor makes the truncated lineage
    unrecoverable and fails the whole job. When a checkpoint directory is
    configured (``SparkContext.setCheckpointDir`` — e.g. an HDFS/S3 path
    via ``SPARK_GRAFT_CHECKPOINT_DIR``), this upgrades to the reliable
    ``checkpoint()``, which survives executor loss; at 100 TB that's the
    correct default for any multi-hour lineage. With no directory set it
    falls back to ``localCheckpoint`` (the right local-mode choice).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        # reliable checkpoint writes to the configured fault-tolerant dir
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def get_spark(app_name: str = "rgd_rnaseq_workflows_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — the guide's
    "~cores for local" rule; on a real cluster leave AQE to coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in _SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
