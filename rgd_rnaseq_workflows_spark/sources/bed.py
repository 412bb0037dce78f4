"""SRC6/SNK5 — BED interval annotation scan and sorted BED sink.

Reference: BED consumed at ``archive/illuminaPaired_multipleSRA_IDperSample_v3/
GeneTPMbed_v2.sh:49,93``; sorted/bgzip/tabix sink at ``:139-161``. The engine
reads BED as a typed DataFrame and writes the sorted TSV; block compression
and tabix indexing are binary post-processing outside relational scope
(SURVEY SNK5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rgd_rnaseq_workflows_spark.schemas import BED4


def read_bed(spark: SparkSession, path: str, extra_cols: int = 0) -> DataFrame:
    """Read a 4+-column BED file. ``extra_cols`` string columns beyond name."""
    schema = BED4
    if extra_cols:
        from pyspark.sql import types as T
        schema = T.StructType(
            BED4.fields
            + [T.StructField(f"col{i + 5}", T.StringType())
               for i in range(extra_cols)])
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def write_sorted_bed(df: DataFrame, path: str) -> None:
    """SRT2 genomic sort (chrom, start, end) + single-file TSV sink,
    matching ``sort -k1,1 -k2,2n -k3,3n`` at ``GeneTPMbed_v2.sh:141``.
    Range-partitioned sort distributes; coalesce(1) only because the
    reference contract is a single indexable file."""
    (df.orderBy("chrom", "start", "end").coalesce(1)
     .write.mode("overwrite").option("sep", "\t").csv(path))


def index_commands(bed_path: str) -> list[list[str]]:
    """SNK5's binary post-process, as the reference runs it
    (``GeneTPMbed_v2.sh:139-161``): block-compress the sorted BED with
    ``bgzip`` then index with ``tabix -p bed``. Returns the argv lists so
    callers (CLI, orchestrator stage) can run them where htslib is
    installed — the compression/indexing codecs are deliberately outside
    the relational engine."""
    return [["bgzip", "-f", bed_path],
            ["tabix", "-p", "bed", f"{bed_path}.gz"]]


def write_indexed_bed(df: DataFrame, dir_path: str,
                      bed_name: str = "out.bed") -> list[list[str]]:
    """Sorted single-file BED sink + the bgzip/tabix post-step: writes the
    part file, renames it to ``bed_name``, and returns the index commands
    (executed by the caller if htslib is present — matching the reference's
    sink contract end-to-end)."""
    import os

    from rgd_rnaseq_workflows_spark.sources.tsv import promote_single_part
    write_sorted_bed(df, dir_path)
    target = promote_single_part(dir_path, os.path.join(dir_path, bed_name))
    return index_commands(target)
