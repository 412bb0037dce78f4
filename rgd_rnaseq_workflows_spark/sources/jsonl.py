"""JSONL corpus interchange: the de-facto wire format for LLM training
data (Dolma, RedPajama, FineWeb all ship `.jsonl.gz` shards).

Spark's native JSON source does the heavy lifting — line-split,
schema-projected, codec-transparent (`.gz`/`.zst` by extension),
predicate/column pushdown into the scan. This module pins the CORPUS
contract on top:

- an explicit schema (never `inferSchema` — a schema-inference pass
  reads the whole corpus once before the real job, and a single odd
  row silently widens a column for everyone);
- malformed lines are CAPTURED, not dropped or fatal: PERMISSIVE mode
  with a `_corrupt_record` column, plus a helper to split good from
  bad — at 100 TB there WILL be truncated shards, and the pipeline
  needs to quarantine them, not die at hour nine (the reference's
  NO_LOG/INVALID_LOG idiom, FIL9, applied to corpus ingest);
- the sink writes shard-partitioned gzip JSONL — re-shardable
  downstream by `operators.packing.shard_corpus`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("text", T.StringType()),
])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOC_SCHEMA) -> DataFrame:
    """Schema-pinned JSONL scan with corrupt-line capture: returns the
    schema's columns plus `_corrupt_record` (NULL for clean rows, the
    raw line for malformed ones)."""
    full = T.StructType(list(schema.fields)
                        + [T.StructField("_corrupt_record", T.StringType())])
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the capture column dropped,
    quarantine rows as (raw line). Spark requires caching the scanned
    frame before filtering on the corrupt column alone — done here."""
    cached = df.cache()
    clean = (cached.filter(F.col("_corrupt_record").isNull())
             .drop("_corrupt_record"))
    bad = (cached.filter(F.col("_corrupt_record").isNotNull())
           .select(F.col("_corrupt_record").alias("raw_line")))
    return clean, bad


def write_jsonl(df: DataFrame, path: str, n_shards: int | None = None,
                compression: str = "gzip") -> None:
    """Gzip JSONL sink; with ``n_shards`` the output is repartitioned to
    that many shard files (a training loader reads each independently)."""
    out = df.repartition(n_shards) if n_shards else df
    out.write.mode("overwrite").option("compression", compression).json(path)
