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
