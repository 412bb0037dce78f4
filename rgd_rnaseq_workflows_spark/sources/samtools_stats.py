"""F18 — fragment-length stats from ``samtools stats`` output (SE path).

The single-end pipeline extracts ``average length`` and ``insert size
standard deviation`` from the ``SN`` section of ``samtools stats`` to feed
RSEM's ``--fragment-length-mean/-sd``
(``RGD_Illumina_SingleEnd_RNAseq_pipeline/RSEM_SE_v1.sh:101-114``). The
engine form is the SRC3 key-value scan over all samples at once, with the
NaN/empty guard as a relational validation column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K_MEAN = "average length"
K_SD = "insert size standard deviation"


def read_samtools_stats(spark: SparkSession, glob_path: str,
                        sample_pattern: str = r"([^/]+)\.stats$") -> DataFrame:
    """``SN`` key-value section of many samtools-stats files →
    (sample, key, value) long table. Lines look like ``SN\\tkey:\\tvalue``."""
    lines = (spark.read.text(glob_path)
             .withColumn("sample",
                         F.regexp_extract(F.input_file_name(),
                                          sample_pattern, 1)))
    sn = lines.filter(F.col("value").startswith("SN\t"))
    parts = F.split("value", "\t")
    return sn.select(
        "sample",
        F.regexp_replace(parts.getItem(1), ":$", "").alias("key"),
        parts.getItem(2).alias("value"))


def fragment_stats(stats_kv: DataFrame) -> DataFrame:
    """(sample, key, value) → (sample, fragment_mean, fragment_sd, valid).

    ``valid`` is the reference's empty/NaN guard (``RSEM_SE_v1.sh:110-114``)
    as a column instead of a per-sample exit 1 — downstream quantification
    filters on it, invalid samples surface in one report.
    """
    wide = (stats_kv.filter(F.col("key").isin(K_MEAN, K_SD))
            .groupBy("sample").pivot("key", [K_MEAN, K_SD])
            .agg(F.first("value")))
    mean = F.col(f"`{K_MEAN}`").cast("double")
    sd = F.col(f"`{K_SD}`").cast("double")
    return wide.select(
        "sample",
        mean.alias("fragment_mean"),
        sd.alias("fragment_sd"),
        (mean.isNotNull() & sd.isNotNull()
         & ~F.isnan(mean) & ~F.isnan(sd)).alias("valid"))
