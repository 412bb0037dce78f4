"""Stateful streaming dedup: state persists across micro-batches, is sized
one row per distinct fingerprint, and is evicted once the event-time
watermark passes a fingerprint's last sighting + TTL."""

from __future__ import annotations

import os
from datetime import datetime

from rgd_rnaseq_workflows_spark.streaming.stateful import (
    batch_dedup_kernel, stream_dedup)

SCHEMA = "doc_id long, text string"
TS_SCHEMA = "doc_id long, text string, ts timestamp"


def test_batch_kernel_dedups(spark):
    docs = spark.createDataFrame([(1, "aaa"), (2, "aaa"), (3, "bbb")],
                                 schema=SCHEMA)
    out = batch_dedup_kernel(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]


def _state_rows(q):
    return next(op["numRowsTotal"] for op in q.lastProgress["stateOperators"])


def test_stream_dedup_across_microbatches(spark, tmp_out):
    src = os.path.join(tmp_out, "stream_src")
    os.makedirs(src)
    # micro-batch 1: docs 1,2 (2 duplicates 1); micro-batch 2 replays the
    # same text with new ids — state must drop them
    b1 = spark.createDataFrame([(1, "xxx"), (2, "xxx"), (3, "yyy")],
                               schema=SCHEMA)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (stream_dedup(stream).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append").start())
    try:
        q.processAllAvailable()
        first = {r["doc_id"] for r in
                 spark.sql("SELECT * FROM dedup_out").collect()}
        assert first == {1, 3}

        b2 = spark.createDataFrame([(10, "xxx"), (11, "zzz")], schema=SCHEMA)
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        after = {r["doc_id"] for r in
                 spark.sql("SELECT * FROM dedup_out").collect()}
        # doc 10 replays batch-1 content → dropped; doc 11 is new
        assert after == {1, 3, 11}

        # state is ONE ROW PER DISTINCT FINGERPRINT (xxx, yyy, zzz) — not
        # a per-shard set that re-serializes wholesale every batch
        assert _state_rows(q) == 3
    finally:
        q.stop()


def test_stream_dedup_multi_chunk_group(spark, tmp_out):
    """A fingerprint group spanning multiple Arrow chunks in one trigger:
    the kernel's concat must reindex (ignore_index) or idxmin/.loc returns
    a multi-row frame and the query crashes (r2 ADVICE)."""
    src = os.path.join(tmp_out, "chunk_src")
    os.makedirs(src)
    docs = [(i, "same-text") for i in range(9, 2, -1)] + [(100, "other")]
    spark.createDataFrame(docs, schema=SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (stream_dedup(stream).writeStream.format("memory")
             .queryName("dedup_chunks").outputMode("append").start())
        try:
            q.processAllAvailable()
            assert q.exception() is None
            got = {r["doc_id"] for r in
                   spark.sql("SELECT * FROM dedup_chunks").collect()}
            assert got == {3, 100}      # min doc_id across ALL chunks
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_stream_dedup_event_time_ttl_evicts_state(spark, tmp_out):
    """TTL = 30 min of EVENT time: eviction is driven by the watermark, so
    the test advances timestamps, not the wall clock."""
    src = os.path.join(tmp_out, "ttl_src")
    os.makedirs(src)

    def send(*rows):
        spark.createDataFrame(
            [(i, t, datetime(2026, 1, 1, h, m)) for i, t, h, m in rows],
            schema=TS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

    stream = spark.readStream.schema(TS_SCHEMA).parquet(src)
    q = (stream_dedup(stream, ts_col="ts", ttl="30 minutes")
         .writeStream.format("memory").queryName("dedup_ttl")
         .outputMode("append").start())
    try:
        send((1, "xxx", 10, 0), (2, "xxx", 10, 0), (3, "yyy", 10, 0))
        send((10, "xxx", 10, 5), (11, "zzz", 10, 5))   # replay dropped
        got = {r["doc_id"] for r in
               spark.sql("SELECT * FROM dedup_ttl").collect()}
        assert got == {1, 3, 11}
        assert _state_rows(q) == 3

        # jump event time to 12:00 → next batch's watermark (11:30) passes
        # every timeout (≤ 10:35), evicting xxx/yyy/zzz
        send((20, "www", 12, 0))
        send((21, "qqq", 12, 1))
        assert _state_rows(q) == 2                      # www, qqq only

        # an evicted fingerprint is re-admitted on its next sighting —
        # the dropDuplicatesWithinWatermark contract
        send((30, "xxx", 12, 2))
        got = {r["doc_id"] for r in
               spark.sql("SELECT * FROM dedup_ttl").collect()}
        assert got == {1, 3, 11, 20, 21, 30}
    finally:
        q.stop()
