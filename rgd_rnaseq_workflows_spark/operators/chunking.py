"""Overlapping document chunking — the retrieval/RAG indexing shape.

Passage dedup (operators/dedup.py) uses NON-overlapping windows because
its unit is "content that repeats"; retrieval indexing wants OVERLAPPING
windows (stride < window) so no query-relevant span is split across a
chunk boundary. This module produces the chunk table an embedding or
BM25 index builds over, with deterministic chunk identity
(doc id + start offset), so re-chunking a grown corpus yields stable ids
for unchanged documents.

Scale: pure codegen — tokens → per-doc start-offset sequence →
slice/join per chunk; the explode streams through the scan stage, no
shuffle at all until whatever consumes the chunks aggregates. Chunk
count per doc is ceil(max(n-window,0)/stride)+1 ≈ n/stride.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.text import tokens, tokens_sql


def chunk_documents(docs: DataFrame, window: int = 64, stride: int = 48,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id_col, chunk_idx, chunk_start, chunk_text, n_tokens) — one row
    per overlapping window. The last chunk starts at the largest
    multiple of ``stride`` < n, so trailing tokens are always covered;
    empty documents yield no rows."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride({stride}) <= window({window})")
    toks = tokens(text_col)
    n = F.size(toks)
    # start offsets 0, stride, ... , covering the last token
    n_chunks = (F.ceil((F.greatest(n - window, F.lit(0)))
                       / F.lit(stride)).cast("int") + 1)
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: i * stride)
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, window)
    return (docs.filter(n > 0)
            .select(F.col(id_col), toks.alias("_toks"),
                    F.posexplode(starts).alias("chunk_idx", "chunk_start"))
            .select(id_col, "chunk_idx", "chunk_start",
                    F.array_join(chunk, " ").alias("chunk_text"),
                    F.size(chunk).cast("int").alias("n_tokens")))


def chunk_documents_sql(table: str, window: int = 64, stride: int = 48,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    toks = tokens_sql(text_col)
    return f"""
WITH tk AS (
  SELECT {id_col}, {toks} AS toks FROM {table}
  WHERE len({toks}) > 0),
st AS (
  SELECT {id_col}, toks, CAST(i AS INTEGER) AS chunk_idx,
         CAST(i * {stride} AS INTEGER) AS chunk_start
  FROM tk, unnest(range(CAST(ceil(greatest(len(toks) - {window}, 0)
                                  / {stride}.0) AS BIGINT) + 1)) AS r(i))
SELECT {id_col}, chunk_idx, chunk_start,
       array_to_string(toks[(chunk_start + 1)
                            :(chunk_start + {window})], ' ') AS chunk_text,
       CAST(len(toks[(chunk_start + 1):(chunk_start + {window})])
            AS INTEGER) AS n_tokens
FROM st"""


# =============================================================================
# Content-defined chunking (CDC) duplication audit
# =============================================================================

# Cut probability 1/CDC_DIVISOR per token position -> mean chunk length
# ~= CDC_DIVISOR tokens. The hash is the house md5 60-bit family, so the
# SQL twin replays identical boundaries.
CDC_DIVISOR = 8


def _md5_long_expr(s: str) -> str:
    """Spark-SQL text of functions.hashing.md5_long over expression
    ``s`` (60-bit: 15 hex digits)."""
    return f"CAST(conv(substring(md5({s}), 1, 15), 16, 10) AS BIGINT)"


def cdc_chunk_stats(docs: DataFrame, k: int = 2,
                    divisor: int = CDC_DIVISOR,
                    by: str = "source", id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Content-defined-chunking duplication audit per group — the
    boundary-shift-robust exact-substring dedup primitive (Rabin/gear
    CDC as used in storage dedup and corpus exact-substring work):
    fixed-window passage dedup misses a duplicate paragraph shifted by
    ONE token, because every downstream window realigns; CDC cuts where
    the CONTENT says to (hash of the k-gram ending at a token ≡ 0 mod
    ``divisor``), so identical passages chunk identically regardless of
    position, and chunk-hash equality finds them.

    Construction (engine-identical): boundaries after token j whenever
    ``md5_60bit(k-gram ending at j) % divisor == 0`` (positions j < k
    never cut; a final boundary always lands at n), chunks are the
    token spans between consecutive boundaries, identity is the md5 of
    the chunk's token string. All exact integers.

    Output per ``by`` group: (by, n_docs, n_chunks, n_unique_chunks,
    dup_chunks, dup_bp, sum_chunk_tokens) — ``dup_bp`` the duplicated-
    chunk share in basis points, ``sum_chunk_tokens`` the exact token
    mass (equals the group's token count: chunks partition each doc).

    Scale shape: chunk construction is per-document ARRAY work in the
    scan stage (map-side, no explode-regroup round trip — the chunk
    list never leaves its row until the final hash explode); the only
    corpus-scale shuffle is the chunk-HASH aggregation, which carries
    (group, 60-bit hash) rows, never text. A 100 TB corpus shuffles
    ~tokens/divisor longs once.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    from rgd_rnaseq_workflows_spark.functions.text import shingles_all
    base = (docs.select(F.col(by).alias("g"), F.col(id_col).alias("_id"),
                        tokens(text_col).alias("_t"),
                        shingles_all(text_col, k).alias("_g"))
            .filter(F.size("_t") > 0))
    n = "size(_t)"
    cut_h = _md5_long_expr("element_at(_g, CAST(i AS INT))")
    ends = (f"filter(transform(sequence(1, size(_g)), "
            f"i -> CASE WHEN {cut_h} % {divisor} = 0 "
            f"THEN least(CAST(i AS INT) + {k - 1}, {n}) END), "
            f"x -> x IS NOT NULL)")
    ends2 = (f"CASE WHEN size({ends}) = 0 OR element_at({ends}, -1) <> {n} "
             f"THEN concat({ends}, array({n})) ELSE {ends} END")
    chunk_str = (f"array_join(slice(_t, _start, _end - _start + 1), ' ')")
    spans = (f"transform(sequence(1, size(_e)), j -> named_struct("
             f"'_start', CASE WHEN j = 1 THEN 1 "
             f"ELSE element_at(_e, CAST(j AS INT) - 1) + 1 END, "
             f"'_end', element_at(_e, CAST(j AS INT))))")
    chunks = (base.withColumn("_e", F.expr(ends2))
              .select("g", "_id", "_t",
                      F.explode(F.expr(spans)).alias("_s"))
              .select("g", "_id",
                      F.expr(f"{_md5_long_expr(chunk_str.replace('_start', '_s._start').replace('_end', '_s._end'))}")
                      .alias("_h"),
                      F.expr("_s._end - _s._start + 1").cast("long")
                      .alias("_len")))
    return (chunks.groupBy("g")
            .agg(F.countDistinct("_id").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_chunks"),
                 F.countDistinct("_h").cast("long")
                 .alias("n_unique_chunks"),
                 F.sum("_len").cast("long").alias("sum_chunk_tokens"))
            .withColumn("dup_chunks",
                        F.col("n_chunks") - F.col("n_unique_chunks"))
            .withColumn("dup_bp",
                        F.expr("10000 * dup_chunks div n_chunks")
                        .cast("long"))
            .select(F.col("g").alias(by), "n_docs", "n_chunks",
                    "n_unique_chunks", "dup_chunks", "dup_bp",
                    "sum_chunk_tokens")
            .orderBy(by))


def cdc_chunk_stats_sql(table: str, k: int = 2,
                        divisor: int = CDC_DIVISOR,
                        by: str = "source", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`cdc_chunk_stats` — identical k-gram cut
    rule, span construction and chunk identity hash."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import (
        shingles_all_sql, tokens_sql)
    toks = tokens_sql(text_col)
    grams = shingles_all_sql(text_col, k)
    cut_h = md5_long_sql("g[i]")
    return f"""
WITH base AS (
  SELECT {by} AS g, {id_col} AS id, {toks} AS t, {grams} AS gr
  FROM {table} WHERE len({toks}) > 0),
cuts AS (
  SELECT g, id, t,
    list_filter(list_transform(range(1, len(gr) + 1),
      i -> CASE WHEN {cut_h.replace('g[i]', 'gr[i]')} % {divisor} = 0
           THEN least(i + {k - 1}, len(t)) END),
      x -> x IS NOT NULL) AS e0
  FROM base),
ends AS (
  SELECT g, id, t,
    CASE WHEN len(e0) = 0 OR e0[-1] <> len(t)
         THEN list_append(e0, len(t)) ELSE e0 END AS e
  FROM cuts),
spans AS (
  SELECT g, id,
    unnest(list_transform(range(1, len(e) + 1),
      j -> {{'s': CASE WHEN j = 1 THEN 1 ELSE e[j - 1] + 1 END,
            'e': e[j]}})) AS sp,
    t
  FROM ends),
chunks AS (
  SELECT g, id,
    {md5_long_sql("array_to_string(t[(sp.s):(sp.e)], ' ')")} AS h,
    CAST(sp.e - sp.s + 1 AS BIGINT) AS len
  FROM spans)
SELECT g AS {by}, CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique_chunks,
       CAST(count(*) - count(DISTINCT h) AS BIGINT) AS dup_chunks,
       (10000 * (count(*) - count(DISTINCT h))) // count(*) AS dup_bp,
       CAST(sum(len) AS BIGINT) AS sum_chunk_tokens
FROM chunks GROUP BY g
"""
