"""Sequence packing for training-data preparation: concat-and-chunk
documents (ordered by id) into fixed-size context windows.

The standard LLM pretraining packer: lay every document's tokens on one
global tape in a deterministic order, cut the tape every ``ctx`` tokens,
and attribute each document to the chunk where it STARTS. What training
needs from the engine is the chunk map + per-chunk stats; the byte-level
concatenation happens downstream in the tokenizer feeder.

Scale design — the global running sum is the textbook two-phase
distributed prefix sum, NOT a single unpartitioned window (which would
funnel 100 TB through one task):

1. bucket docs by ``id div bucket_width`` (ids are the deterministic
   order, so a bucket is a contiguous id range);
2. within-bucket cumulative sums run as a window PARTITIONED by bucket
   (parallel, no global funnel);
3. bucket offsets are a cumulative sum over the per-bucket totals —
   N/bucket_width rows, metadata scale (1e7 rows at 1e10 docs), the one
   place a tiny unpartitioned window is acceptable; it then broadcasts
   back.

The oracle twin is the plain global-window form — same values, the
partitioned plan is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import hashing as HX
from rgd_rnaseq_workflows_spark.functions import text as TX


def pack_chunks(docs: DataFrame, ctx: int = 512, bucket_width: int = 1_000,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Assign each document a chunk id = ``(global token offset) div ctx``
    and aggregate per-chunk stats. Returns (chunk_id, n_docs, n_tokens,
    first_doc, last_doc)."""
    t = docs.select(F.col(id_col).alias("id"),
                    TX.token_count(text_col).alias("n_tok"),
                    (F.col(id_col) / bucket_width).cast("long").alias("bkt"))
    in_bucket = Window.partitionBy("bkt").orderBy("id")
    t = t.withColumn("run", F.sum("n_tok").over(in_bucket))
    totals = t.groupBy("bkt").agg(F.max("run").alias("bkt_total"))
    over_buckets = Window.orderBy("bkt")  # metadata-scale frame (N/width)
    offsets = totals.withColumn(
        "bkt_offset",
        F.coalesce(F.sum("bkt_total").over(over_buckets) - F.col("bkt_total"),
                   F.lit(0)))
    placed = (t.join(F.broadcast(offsets.select("bkt", "bkt_offset")), "bkt")
              .withColumn("start",
                          F.col("bkt_offset") + F.col("run") - F.col("n_tok"))
              .withColumn("chunk_id", F.floor(F.col("start") / ctx)
                          .cast("long")))
    return (placed.groupBy("chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.min("id").alias("first_doc"),
                 F.max("id").alias("last_doc")))


def shard_corpus(docs: DataFrame, n_shards: int = 16, seed: int = 11,
                 id_col: str = "doc_id", text_col: str = "text",
                 lang_col: str = "lang") -> DataFrame:
    """Deterministic pseudorandom sharding of a corpus for training-data
    layout: shard = md5-bucket of the document id, within-shard order =
    the md5 value itself. This is the scale-safe global shuffle — no
    global sort or prefix sum, just a hash partitioning whose output is a
    uniform random permutation of the corpus (what the trainer's data
    loader needs), reproducible from (seed, id) alone on any engine.

    Returns the per-shard manifest (what a 100 TB run writes alongside
    ``partitionBy("shard")`` parquet): document/token counts, language
    breadth, and the first/last document in shard order (``min_by`` on
    the shard key — one map-side-combined agg, one shuffle on ``shard``,
    k rows out).
    """
    h = HX.md5_long(F.col(id_col).cast("string"), seed=seed)
    t = docs.select(
        F.col(id_col).alias("id"), F.col(lang_col).alias("lang"),
        TX.token_count(text_col).alias("n_tok"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("ord"))
    return (t.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.min_by("id", "ord").alias("first_doc"),
                 F.max_by("id", "ord").alias("last_doc"))
            .orderBy("shard"))


def shard_corpus_sql(table: str = "documents", n_shards: int = 16,
                     seed: int = 11, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang") -> str:
    h = HX.md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    n_tok = TX.token_count_sql(text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {lang_col} AS lang, {n_tok} AS n_tok,
         CAST({h} % {n_shards} AS INTEGER) AS shard, {h} AS ord
  FROM {table})
SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       arg_min(id, ord) AS first_doc, arg_max(id, ord) AS last_doc
FROM t GROUP BY shard ORDER BY shard
"""


def pack_chunks_sql(table: str = "documents", ctx: int = 512,
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    n_tok = TX.token_count_sql(text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {n_tok} AS n_tok FROM {table}),
placed AS (
  SELECT id, n_tok,
         CAST((sum(n_tok) OVER (ORDER BY id) - n_tok) // {ctx} AS BIGINT)
           AS chunk_id
  FROM t)
SELECT chunk_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(id) AS first_doc, max(id) AS last_doc
FROM placed GROUP BY chunk_id
"""
