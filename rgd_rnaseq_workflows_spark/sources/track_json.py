"""SRC7/SNK3/SNK4 — JSON track document scan and sinks.

Reference: per-sample track JSONs are loaded recursively with a glob that
excludes ``*geneTPMbed.json``/``*TXTPMbed.json``
(``scripts/make_jbrowse_session_for_bioproject.py:62-70``); track JSON is
emitted by a bash heredoc with a handwritten ``json_escape``
(``scripts/BWjson_v7.sh:57-64,119-164``) then validated by re-parsing
(``:169-173``). Spark's ``to_json`` gives escaping and validity for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_track_jsons(spark: SparkSession, root: str,
                     glob: str = "RNAseq_*.json") -> DataFrame:
    """Recursive JSON scan with the reference's TPMbed exclusions applied
    via ``input_file_name()`` filter (SRC7)."""
    df = (spark.read
          .option("recursiveFileLookup", True)
          .option("pathGlobFilter", glob)
          .option("multiLine", True)
          .json(root)
          .withColumn("_path", F.input_file_name()))
    return df.filter(
        ~F.col("_path").rlike(r"(geneTPMbed|TXTPMbed)\.json$"))


def track_document(sample_col: str = "SampleID") -> F.Column:
    """Assemble the per-sample JBrowse2 track document as a nested struct
    column mirroring ``BWjson_v7.sh:119-164``; serialize with ``to_json``."""
    return F.struct(
        F.lit("QuantitativeTrack").alias("type"),
        F.concat(F.lit("RNAseq_"), F.col(sample_col)).alias("trackId"),
        F.col("track_name").alias("name"),
        F.array(F.lit("RNA-Seq Coverage")).alias("category"),
        F.array(F.col("assembly")).alias("assemblyNames"),
        F.struct(
            F.col("Tissue").alias("Tissue"),
            F.col("Strain").alias("Strain"),
            F.col("Sex").alias("Sex"),
            F.coalesce(F.col("ComputedSex"), F.lit("Unknown")).alias("ComputedSex"),
            F.col("Sample_characteristics").alias("SampleCharacteristics"),
        ).alias("metadata"),
        F.struct(
            F.struct(F.col("bigwig_uri").alias("uri"))
            .alias("bigWigLocation")
        ).alias("adapter"),
    )


def write_track_jsons(df: DataFrame, path: str) -> None:
    """One JSON document per row (SNK3). ``to_json`` handles the escaping
    the reference implements by hand (``BWjson_v7.sh:57-64``, F6)."""
    df.select(F.to_json(track_document()).alias("value")) \
      .write.mode("overwrite").text(path)
