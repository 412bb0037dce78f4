"""SRC3 — STAR ``Log.final.out`` key-value scan.

The reference extracts numeric fields from ``"key | value"`` lines with awk
(split on ``|``, trim both sides, strip comma grouping) one file at a time:
``scripts/pSTARQC_v1.sh:50-61``. Spark version reads *all* logs in one
distributed text scan, derives the sample from the file path, and emits the
long-form (sample, key, value) table — the UDTF-shaped operator of SURVEY
§2.10, done with built-ins only (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_star_logs(spark: SparkSession, glob_path: str,
                   sample_pattern: str = r"([^/]+)/Log\.final\.out$") -> DataFrame:
    """Distributed scan of many Log.final.out files → (sample, key, value).

    ``sample_pattern`` extracts the sample ID from the file path (group 1);
    the reference derives it from the per-sample directory layout.
    Values keep the reference's cleanup: trim + de-comma
    (``pSTARQC_v1.sh:55-56``, functions F2).
    """
    lines = (spark.read.text(glob_path)
             .withColumn("path", F.input_file_name()))
    kv = (lines
          .filter(F.col("value").contains("|"))
          .withColumn("sample", F.regexp_extract("path", sample_pattern, 1))
          # the reference pads with tabs AND spaces (pSTARQC_v1.sh:55-56);
          # trim() only strips spaces, so strip all leading/trailing \s
          .withColumn("key",
                      F.regexp_replace(F.split("value", r"\|").getItem(0),
                                       r"^\s+|\s+$", ""))
          .withColumn("val",
                      F.regexp_replace(
                          F.regexp_replace(F.split("value", r"\|").getItem(1),
                                           r"^\s+|\s+$", ""),
                          ",", ""))
          .select("sample", "key", "val"))
    return kv.withColumnRenamed("val", "value")


def kv_long_to_wide(kv: DataFrame, keys: list[str]) -> DataFrame:
    """Pivot the long key-value table to one wide row per sample for the
    named keys (the reference greps one key at a time; one shuffle here).

    ``pivot`` with an explicit key list keeps the plan static (no extra
    job to discover pivot values) — important at scale.
    """
    return (kv.filter(F.col("key").isin(keys))
            .groupBy("sample")
            .pivot("key", keys)
            .agg(F.first("value")))
