"""Stateful streaming dedup: state persists across micro-batches."""

from __future__ import annotations

import os

from rgd_rnaseq_workflows_spark.streaming.stateful import (
    batch_dedup_kernel, stream_dedup)

SCHEMA = "doc_id long, text string"


def test_batch_kernel_dedups(spark):
    docs = spark.createDataFrame([(1, "aaa"), (2, "aaa"), (3, "bbb")],
                                 schema=SCHEMA)
    out = batch_dedup_kernel(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]


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
    finally:
        q.stop()
