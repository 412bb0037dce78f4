"""SRC7/SNK3/SNK4 — JSON track document scan and sinks.

Reference: per-sample track JSONs are loaded recursively with a glob that
excludes ``*geneTPMbed.json``/``*TXTPMbed.json``
(``scripts/make_jbrowse_session_for_bioproject.py:62-70``); track JSON is
emitted by a bash heredoc with a handwritten ``json_escape``
(``scripts/BWjson_v7.sh:57-64,119-164``) then validated by re-parsing
(``:169-173``). Spark's ``to_json`` gives escaping and validity for free;
the document layout below is golden-tested against BWjson_v7.sh itself.
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


def track_document(bioproject_id: str, assembly: str = "GRCr8") -> F.Column:
    """The per-sample JBrowse2 track document of ``BWjson_v7.sh:119-164``
    as one nested struct column. Requires columns: unique_name,
    geo_accession, Tissue, Strain, Sex, ComputedSex (nullable →
    ``Unknown``, JN5 ``:79-87``), Sample_characteristics, StrainInfo,
    PMID, GEOpath, Title.

    Serialized with ``to_json``, which performs the escaping the
    reference implements by hand (F6).
    """
    track_id = F.concat(F.lit("RNAseq_"), F.col("unique_name"))
    meta = F.struct(
        F.col("Sample_characteristics").alias("Sample Characteristic"),
        F.col("Tissue").alias("Tissue"),
        F.col("Strain").alias("Strain"),
        F.col("StrainInfo").alias("RGD Strain Report"),
        F.col("Sex").alias("Sex"),
        F.coalesce(F.col("ComputedSex"), F.lit("Unknown"))
        .alias("Computed Sex"),
        F.concat(
            F.lit("https://rgd.mcw.edu/rgdweb/report/expressionStudy/"
                  "main.html?geoAcc="), F.lit(bioproject_id))
        .alias("RGD Metadata Report"),
        F.col("Title").alias("Project Title"),
        F.col("GEOpath").alias("Project Repository Link"),
        F.lit(bioproject_id).alias("Project Accession ID"),
        F.col("geo_accession").alias("Sample Accession ID"),
        F.concat(F.lit("PMID:"), F.col("PMID")).alias("PubMed ID"),
        F.lit("HPC RGD workflow").alias("Data Processing"),
        F.lit("STAR v2.7.10b").alias("Read alignment"),
        F.lit("GCF_036323735.1 GRCr8").alias("Genome version"),
        F.lit("RSEM v1.3.1").alias("Expression Quantification"),
    )
    return F.struct(
        F.lit("FeatureTrack").alias("type"),
        track_id.alias("trackId"),
        track_id.alias("name"),
        F.array(F.lit("RNA-Seq"), F.col("Tissue"), F.col("Strain"))
        .alias("category"),
        F.array(F.lit(assembly)).alias("assemblyNames"),
        meta.alias("metadata"),
        F.struct(
            F.lit("BigWigAdapter").alias("type"),
            F.struct(
                F.lit("UriLocation").alias("locationType"),
                F.concat(track_id, F.lit(".bigwig")).alias("uri"),
            ).alias("bigWigLocation"),
        ).alias("adapter"),
        F.array(F.struct(
            F.lit("LinearWiggleDisplay").alias("type"),
            F.concat(track_id, F.lit("-LinearWiggleDisplay"))
            .alias("displayId"),
        )).alias("displays"),
    )


def write_track_jsons(df: DataFrame, path: str, bioproject_id: str) -> None:
    """One JSON document per row (SNK3)."""
    df.select(F.to_json(track_document(bioproject_id)).alias("value")) \
      .write.mode("overwrite").text(path)
