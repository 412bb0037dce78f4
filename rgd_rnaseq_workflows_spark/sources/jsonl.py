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


def read_jsonl_split(spark: SparkSession, path: str,
                     schema: T.StructType = DOC_SCHEMA
                     ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows in the target schema, quarantine
    rows as (raw_line).

    No cache: Spark forbids JSON-scan queries whose referenced columns
    are ONLY the internal corrupt column, and the documented workaround
    is caching the scan — but pinning a 100 TB corpus in storage to
    extract a handful of bad lines is the wrong trade. The clean side
    is the normal pruned JSON scan; the quarantine side re-reads the
    file as TEXT and parses with ``from_json`` (same schema + corrupt
    field — no raw-scan restriction applies), so both branches stream
    with zero storage footprint."""
    clean = (read_jsonl(spark, path, schema)
             .filter(F.col("_corrupt_record").isNull())
             .select(*[f.name for f in schema.fields]))
    full = T.StructType(list(schema.fields)
                        + [T.StructField("_corrupt_record", T.StringType())])
    parsed = F.from_json(
        F.col("value"), full,
        {"mode": "PERMISSIVE",
         "columnNameOfCorruptRecord": "_corrupt_record"})
    bad = (spark.read.text(path)
           .select(F.col("value"), parsed.alias("_p"))
           .filter(F.col("_p._corrupt_record").isNotNull())
           .select(F.col("value").alias("raw_line")))
    return clean, bad


def write_jsonl(df: DataFrame, path: str, n_shards: int | None = None,
                compression: str = "gzip") -> None:
    """Gzip JSONL sink; with ``n_shards`` the output is repartitioned to
    that many shard files (a training loader reads each independently)."""
    out = df.repartition(n_shards) if n_shards else df
    out.write.mode("overwrite").option("compression", compression).json(path)
