"""Incremental event analytics with Structured Streaming.

The reference's closest streaming shape is its 60s polling scheduler loop
(``scripts/bulk_orchestrator_production_diskGuard.bash:299-452``); the
engine upgrades incremental ingestion to real Structured Streaming:
watermarked event-time windows with late-data handling. The same windowed
aggregation is exposed in batch form (`windowed_counts`) so correctness is
oracle-checkable; the streaming wrapper reuses the identical expression
tree — one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.

    Works identically on a batch DataFrame and a streaming one — window()
    is the same Catalyst expression. Output uses epoch seconds for the
    window start (portable across engines)."""
    # value is 2-decimal fixed-point: sum exactly in integer cents so the
    # result is independent of partition/summation order (oracle-stable).
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (events
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                (F.sum(cents) / 100.0).alias("sum_value")))
    return (agg.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "event_type", "n_events", "sum_value"))


def stream_windowed_counts(spark: SparkSession, source_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming variant: file source + watermark for late-data eviction.
    State is bounded by the watermark horizon — the knob that keeps a
    100 TB/day stream's state store finite."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .parquet(source_dir)
              .withWatermark("ts", watermark))
    return windowed_counts(stream, window)


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes") -> DataFrame:
    """Sliding event-time window counts per event_type (each event lands
    in window/slide overlapping windows — Spark's window() generates
    them; the oracle enumerates the same 4 starts with a range join).
    Batch and streaming share this expression tree."""
    agg = (events
           .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
           .agg(F.count("*").alias("n")))
    return agg.select(F.unix_timestamp(F.col("w.start"))
                      .alias("window_start"), "event_type", "n")


def sliding_topk(events: DataFrame, k: int = 3, window: str = "1 hour",
                 slide: str = "15 minutes") -> DataFrame:
    """Trending event types: top-k by count per sliding window (rank by
    count desc, type asc for determinism). The rank runs AFTER the
    windowed aggregation — at scale the window partitions are
    metadata-bounded (windows × types), so the rank's window never sees
    corpus-scale rows; streaming runs the agg incrementally and ranks in
    the sink's downstream batch (append-mode cannot rank mid-stream)."""
    from pyspark.sql import Window as W
    c = sliding_counts(events, window, slide)
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), "event_type"))
    return (c.withColumn("rk", rk.cast("long"))
            .filter(F.col("rk") <= k))


def stream_sliding_counts(spark: SparkSession, source_dir: str,
                          window: str = "1 hour",
                          slide: str = "15 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming variant of :func:`sliding_counts`: watermark bounds the
    per-window state exactly as in the tumbling case — overlap multiplies
    live state by window/slide, not by stream length."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .parquet(source_dir)
              .withWatermark("ts", watermark))
    return sliding_counts(stream, window, slide)


def interval_join(clicks: DataFrame, views: DataFrame,
                  max_lag: str = "1 hour") -> DataFrame:
    """Event-time interval join: each click pairs with the same user's
    views at or before it within ``max_lag`` — the attribution-join shape.

    One definition, two modes: on batch DataFrames it is a plain range
    equi-join (Catalyst: hash join on user_id + time-range residual); on
    two watermarked streams the SAME condition becomes a stream-stream
    join whose state is bounded by the watermark + the lag bound (the
    join condition's time range tells Spark when buffered rows expire —
    a stream-stream join WITHOUT a range condition grows state forever).
    """
    secs = {"minute": 60, "minutes": 60, "hour": 3600, "hours": 3600,
            "second": 1, "seconds": 1}
    num, unit = max_lag.split()
    lag_s = int(float(num) * secs[unit])
    c = clicks.select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
    v = views.select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts"))
    cond = ((F.col("c_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("c_ts"))
            & (F.col("v_ts") >= F.col("c_ts") - F.expr(
                f"INTERVAL {lag_s} SECONDS")))
    return (c.join(v, cond)
            .select(F.col("c_user").alias("user_id"), "click_id", "view_id",
                    (F.col("c_ts").cast("long")
                     - F.col("v_ts").cast("long")).alias("lag_seconds")))


def stream_interval_join(spark: SparkSession, source_dir: str,
                         max_lag: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming twin: two watermarked readers over the same feed, split
    by event_type, joined with the identical interval condition."""
    def side(t):
        return (spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
                .withWatermark("ts", watermark)
                .filter(F.col("event_type") == t))
    return interval_join(side("click"), side("view"), max_lag)


def assign_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-EVENT session assignment: the input plus a ``session_id``
    column (lag-gap cumulative ids per user). The building block
    :func:`sessionize` aggregates and the session-scoped funnel groups
    by — same one (user)-key window either way."""
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (events
            .withColumn("_new", new_sess)
            .withColumn("session_id",
                        F.sum("_new").over(
                            w.rowsBetween(W.unboundedPreceding, 0)))
            .drop("_new"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: lag-gap cumulative session ids per user
    (the classic window composition; streaming twin would use
    ``session_window``). Returns (user_id, session_id, n_events,
    session_start_epoch, session_seconds)."""
    sess = assign_sessions(events, gap_minutes)
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(F.col("ts").cast("long")).alias("session_start_epoch"),
                 (F.max(F.col("ts").cast("long"))
                  - F.min(F.col("ts").cast("long"))).alias("session_seconds")))


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session_window variant (streaming-capable stateful op)."""
    return (events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.unix_timestamp("w.start").alias("session_start_epoch"),
                    "n_events"))


def stream_hll_registers(spark: SparkSession, source_dir: str,
                         col: str = "user_id", p: int = 8,
                         seed: int = 1) -> DataFrame:
    """Incremental distinct-count sketch: the portable HLL register table
    (operators/sketches.py) maintained by Structured Streaming.

    The register update is a plain ``groupBy(bucket).max(rank)`` — an
    always-monotone aggregation, so streaming state is exactly the m≤2^p
    registers regardless of input volume (the sketch IS the state), and
    every micro-batch folds in with the same register-max merge a batch
    rollup uses. Read the current estimate at any time by running
    ``hll_estimate`` over the memory-sink register table — it equals the
    batch sketch of everything ingested so far (test-pinned).
    """
    from rgd_rnaseq_workflows_spark.operators.sketches import hll_registers
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    return hll_registers(stream, col, p=p, seed=seed)
