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


def shard_fingerprints(docs: DataFrame, n_shards: int = 16,
                       seed: int = 11, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-shard content fingerprint table — what a snapshot publishes
    next to its shards so the NEXT release can re-publish only dirty
    ones: (shard, n_docs, n_tokens, xor_a, xor_b) where the xors fold
    md5(id:text) under two independent seeds. XOR is order-free, so
    the fingerprint is partition-order-independent; an identical-pair
    insertion cancels in any XOR, which is why ``n_docs`` rides along
    (count catches cardinality moves, the two 60-bit xors catch
    content moves — a collision needs a simultaneous 120-bit accident
    at equal counts). One map-side-combined aggregation; k rows out."""
    sid = F.concat(F.col(id_col).cast("string"), F.lit(":"),
                   F.col(text_col))
    return (docs.select(
        F.pmod(HX.md5_long(F.col(id_col).cast("string"), seed=seed),
               F.lit(n_shards)).cast("int").alias("shard"),
        TX.token_count(text_col).alias("_nt"),
        HX.md5_long(sid, seed=1).alias("_ha"),
        HX.md5_long(sid, seed=2).alias("_hb"))
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("_nt").cast("long").alias("n_tokens"),
             F.expr("bit_xor(_ha)").cast("long").alias("xor_a"),
             F.expr("bit_xor(_hb)").cast("long").alias("xor_b")))


def shard_manifest_diff(old: DataFrame, new: DataFrame,
                        n_shards: int = 16, seed: int = 11,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Which shards must be re-published between two corpus versions:
    full-outer join of the two snapshot fingerprint tables on the
    shard key → per shard, old/new doc counts, the token delta, and a
    CHANGED/UNCHANGED/NEW/GONE status. At 100 TB this is the
    difference between rewriting every shard and rewriting the three
    a crawl refresh actually touched — both fingerprint scans are one
    map-side aggregation each and the diff is k rows."""
    fo = shard_fingerprints(old, n_shards, seed, id_col, text_col)
    fn = shard_fingerprints(new, n_shards, seed, id_col, text_col)
    o = fo.select(F.col("shard"),
                  F.col("n_docs").alias("old_docs"),
                  F.col("n_tokens").alias("_ot"),
                  F.col("xor_a").alias("_oa"), F.col("xor_b").alias("_ob"))
    n = fn.select(F.col("shard"),
                  F.col("n_docs").alias("new_docs"),
                  F.col("n_tokens").alias("_nt"),
                  F.col("xor_a").alias("_na"), F.col("xor_b").alias("_nb"))
    j = o.join(n, "shard", "full_outer")
    status = (F.when(F.col("old_docs").isNull(), F.lit("NEW"))
              .when(F.col("new_docs").isNull(), F.lit("GONE"))
              .when((F.col("old_docs") == F.col("new_docs"))
                    & (F.col("_oa") == F.col("_na"))
                    & (F.col("_ob") == F.col("_nb")),
                    F.lit("UNCHANGED"))
              .otherwise(F.lit("CHANGED")))
    return (j.select("shard", status.alias("status"),
                     F.coalesce("old_docs", F.lit(0)).cast("long")
                     .alias("old_docs"),
                     F.coalesce("new_docs", F.lit(0)).cast("long")
                     .alias("new_docs"),
                     (F.coalesce("_nt", F.lit(0))
                      - F.coalesce("_ot", F.lit(0))).cast("long")
                     .alias("d_tokens"))
            .orderBy("shard"))


def shard_manifest_diff_sql(old_src: str, new_src: str,
                            n_shards: int = 16, seed: int = 11,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """DuckDB twin of :func:`shard_manifest_diff`."""
    def fp(src: str) -> str:
        h = HX.md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
        ha = HX.md5_long_sql(
            f"CAST({id_col} AS VARCHAR) || ':' || {text_col}", seed=1)
        hb = HX.md5_long_sql(
            f"CAST({id_col} AS VARCHAR) || ':' || {text_col}", seed=2)
        nt = TX.token_count_sql(text_col)
        return f"""
  SELECT CAST({h} % {n_shards} AS INTEGER) AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({nt}) AS BIGINT) AS n_tokens,
         CAST(bit_xor(CAST({ha} AS BIGINT)) AS BIGINT) AS xor_a,
         CAST(bit_xor(CAST({hb} AS BIGINT)) AS BIGINT) AS xor_b
  FROM ({src}) GROUP BY 1"""
    return f"""
WITH fo AS ({fp(old_src)}),
fn AS ({fp(new_src)})
SELECT coalesce(fo.shard, fn.shard) AS shard,
       CASE WHEN fo.shard IS NULL THEN 'NEW'
            WHEN fn.shard IS NULL THEN 'GONE'
            WHEN fo.n_docs = fn.n_docs AND fo.xor_a = fn.xor_a
                 AND fo.xor_b = fn.xor_b THEN 'UNCHANGED'
            ELSE 'CHANGED' END AS status,
       CAST(coalesce(fo.n_docs, 0) AS BIGINT) AS old_docs,
       CAST(coalesce(fn.n_docs, 0) AS BIGINT) AS new_docs,
       CAST(coalesce(fn.n_tokens, 0) - coalesce(fo.n_tokens, 0)
            AS BIGINT) AS d_tokens
FROM fo FULL OUTER JOIN fn ON fo.shard = fn.shard
ORDER BY shard
"""


def _pow2_buckets(ctx: int) -> list[int]:
    """The bucket boundaries 1, 2, 4, ... ctx (ctx must be a power of
    two) — enumerated in Python and emitted as identical CASE chains
    into both engines, so no engine ever computes a floating log2."""
    if ctx < 1 or ctx & (ctx - 1):
        raise ValueError(f"ctx {ctx} must be a positive power of two")
    out, b = [], 1
    while b <= ctx:
        out.append(b)
        b *= 2
    return out


def padding_report(docs: DataFrame, ctx: int = 512, batch_size: int = 16,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Length-bucketed batching efficiency: the padding-waste report a
    training feeder reads before choosing between pow-2 length
    bucketing and full sequence packing (:func:`pack_chunks`).

    Every non-empty document is truncated to ``ctx`` tokens and
    assigned the smallest power-of-two bucket that holds it; a batch
    pads every member to the bucket width. Per bucket:
    ``n_docs``, ``n_batches = ceil(n_docs / batch_size)``, the
    effective (kept) tokens, padded tokens ``Σ (bucket − len)``,
    truncated tokens, and ``pad_bp`` — the exact-integer basis-point
    share of the batch tape that is padding. Bucket membership, the
    ceil and the ratio are all integer arithmetic, so both engines cut
    identical buckets.

    Scale shape: one map-side-combined aggregation to ≤ log2(ctx)+1
    rows — the corpus is scanned once and never shuffled (the group
    key has ~10 values, so partial aggregation collapses everything
    executor-side)."""
    sizes = _pow2_buckets(ctx)
    eff = F.least(F.col("n_tok"), F.lit(ctx))
    bucket = F.lit(sizes[-1])
    for b in reversed(sizes[:-1]):
        bucket = F.when(F.col("eff") <= b, F.lit(b)).otherwise(bucket)
    t = (docs.select(TX.token_count(text_col).alias("n_tok"))
         .filter(F.col("n_tok") > 0)
         .select(eff.alias("eff"),
                 (F.col("n_tok") - eff).alias("trunc"))
         .withColumn("bucket", bucket.cast("long")))
    return (t.groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.expr(f"(count(*) + {batch_size - 1}) "
                        f"div {batch_size}").cast("long")
                 .alias("n_batches"),
                 F.sum("eff").cast("long").alias("eff_tokens"),
                 F.sum(F.col("bucket") - F.col("eff")).cast("long")
                 .alias("pad_tokens"),
                 F.sum("trunc").cast("long").alias("trunc_tokens"))
            .withColumn("pad_bp", F.expr(
                "10000 * pad_tokens div (pad_tokens + eff_tokens)")
                .cast("long"))
            .orderBy("bucket"))


def padding_report_sql(table: str = "documents", ctx: int = 512,
                       batch_size: int = 16, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin of :func:`padding_report` — the identical CASE
    bucket chain and integer folds."""
    sizes = _pow2_buckets(ctx)
    n_tok = TX.token_count_sql(text_col)
    chain = " ".join(f"WHEN eff <= {b} THEN {b}" for b in sizes[:-1])
    return f"""
WITH t AS (
  SELECT least(n_tok, {ctx}) AS eff, n_tok - least(n_tok, {ctx}) AS trunc,
         CAST(CASE {chain} ELSE {sizes[-1]} END AS BIGINT) AS bucket
  FROM (SELECT {n_tok} AS n_tok FROM {table}) WHERE n_tok > 0)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST((count(*) + {batch_size - 1}) // {batch_size} AS BIGINT)
         AS n_batches,
       CAST(sum(eff) AS BIGINT) AS eff_tokens,
       CAST(sum(bucket - eff) AS BIGINT) AS pad_tokens,
       CAST(sum(trunc) AS BIGINT) AS trunc_tokens,
       CAST(10000 * sum(bucket - eff)
            // (sum(bucket - eff) + sum(eff)) AS BIGINT) AS pad_bp
FROM t GROUP BY bucket ORDER BY bucket
"""
